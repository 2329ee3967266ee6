"""Agent loop + evaluation harness tests (reference week-4 day-1/7):
scripted responses as the model, loop limits, steering linearization,
sealed-task grading."""

import json
import os

import pytest

from tiny_llm_tpu.agent import (
    AgentLimits,
    CancellationToken,
    SteeringHandle,
    TaskPackage,
    ToolPolicy,
    Workspace,
    evaluate_task,
    memory_session,
    run_agent,
)
from tiny_llm_tpu.agent.evaluation import StagedTask, StaticHeldOutGrader


def scripted(*replies):
    """Generator-backed fake model (reference test_week_4_day_6.py:34-38)."""
    it = iter(replies)

    def generate(messages):
        return next(it), None

    return generate


def make_ws(tmp_path, **kw):
    (tmp_path / "f.txt").write_text("original")
    policy = ToolPolicy(root=str(tmp_path), allow_writes=True, **kw)
    return Workspace(policy, confirm=lambda a: True)


def final(msg):
    return json.dumps({"type": "final", "message": msg})


def tool(name, **args):
    return json.dumps({"type": "tool", "tool": name, **args})


class TestLoop:
    def test_immediate_final(self, tmp_path):
        run = run_agent(
            "say done", scripted(final("done")), make_ws(tmp_path)
        )
        assert run.status == "final" and run.final_message == "done"
        assert run.steps == 1

    def test_tool_then_final(self, tmp_path):
        run = run_agent(
            "read it",
            scripted(tool("read_file", path="f.txt"), final("it says original")),
            make_ws(tmp_path),
        )
        assert run.status == "final"
        types = [e.type for e in run.session.events]
        assert "tool_call" in types and "tool_result" in types

    def test_tool_result_reaches_next_prompt(self, tmp_path):
        seen = []

        def generate(messages):
            seen.append(messages)
            if len(seen) == 1:
                return tool("read_file", path="f.txt"), None
            return final("ok"), None

        run_agent("task", generate, make_ws(tmp_path))
        last_prompt = seen[1]
        assert any("original" in m["content"] for m in last_prompt)

    def test_step_limit(self, tmp_path):
        replies = [tool("list_files", path=".") if i % 2 == 0
                   else tool("read_file", path="f.txt") for i in range(10)]
        run = run_agent(
            "loop forever", scripted(*replies), make_ws(tmp_path),
            limits=AgentLimits(max_steps=3),
        )
        assert run.status == "step_limit" and run.steps == 3

    def test_invalid_action_feedback_then_recovery(self, tmp_path):
        run = run_agent(
            "task",
            scripted("gibberish", final("recovered")),
            make_ws(tmp_path),
        )
        assert run.status == "final" and run.final_message == "recovered"
        assert any(e.type == "protocol_error" for e in run.session.events)

    def test_invalid_limit(self, tmp_path):
        run = run_agent(
            "task",
            scripted("bad1", "bad2", "bad3", final("never")),
            make_ws(tmp_path),
            limits=AgentLimits(max_invalid_actions=3),
        )
        assert run.status == "invalid_limit"

    def test_identical_action_loop_detection(self, tmp_path):
        same = tool("read_file", path="f.txt")
        run = run_agent(
            "task",
            scripted(same, same, same, final("never")),
            make_ws(tmp_path),
            limits=AgentLimits(max_identical_actions=2),
        )
        assert run.status == "loop"

    def test_cancellation_interrupts(self, tmp_path):
        cancel = CancellationToken()

        def generate(messages):
            cancel.cancel("user hit ctrl-c")
            return final("too late"), None

        run = run_agent(
            "task", generate, make_ws(tmp_path), cancellation=cancel
        )
        assert run.status == "interrupted"
        assert any(e.type == "interrupted" for e in run.session.events)

    def test_steering_outranks_final(self, tmp_path):
        session = memory_session()
        steering = SteeringHandle(session)
        calls = []

        def generate(messages):
            calls.append(messages)
            if len(calls) == 1:
                steering.submit("actually, check the README first")
                return final("done early"), None
            return final("done after steering"), None

        run = run_agent(
            "task", generate, make_ws(tmp_path), session=session
        )
        assert run.status == "final"
        assert run.final_message == "done after steering"
        # The steering text reached the second prompt.
        assert any("README" in m["content"] for m in calls[1])


@pytest.fixture
def package(tmp_path):
    root = tmp_path / "pkg"
    (root / "workspace").mkdir(parents=True)
    (root / "held_out_tests").mkdir()
    (root / "workspace" / "config.py").write_text("TIMEOUT = 10\n")
    (root / "workspace" / "keep.txt").write_text("do not touch\n")
    (root / "task.json").write_text(json.dumps({
        "id": "set-timeout",
        "instructions": "Set TIMEOUT to 30 in config.py.",
        "editable_paths": ["config.py"],
    }))
    (root / "held_out_tests" / "checks.json").write_text(json.dumps([
        {"type": "python_constant", "path": "config.py", "name": "TIMEOUT",
         "value": 30},
        {"type": "unchanged", "path": "keep.txt"},
        {"type": "path_exists", "path": "config.py"},
    ]))
    return TaskPackage.load(str(root))


class TestEvaluation:
    def test_package_load(self, package):
        assert package.task_id == "set-timeout"
        assert len(package.checks) == 3

    def test_stage_copies_workspace(self, package):
        staged = StagedTask.stage(package)
        assert sorted(staged.original) == ["config.py", "keep.txt"]
        assert os.path.exists(os.path.join(staged.workdir, "config.py"))

    def test_grader_passes_correct_solution(self, package):
        staged = StagedTask.stage(package)
        with open(os.path.join(staged.workdir, "config.py"), "w") as f:
            f.write("TIMEOUT = 30\n")
        results = StaticHeldOutGrader(package, staged.original).grade(staged.freeze())
        assert all(r.passed for r in results)

    def test_grader_fails_wrong_value_and_forbidden_edit(self, package):
        staged = StagedTask.stage(package)
        with open(os.path.join(staged.workdir, "keep.txt"), "w") as f:
            f.write("touched!\n")
        results = StaticHeldOutGrader(package, staged.original).grade(staged.freeze())
        by_type = {r.check["type"]: r for r in results}
        assert not by_type["python_constant"].passed
        assert not by_type["unchanged"].passed
        assert not by_type["editable_paths"].passed

    def test_evaluate_task_with_scripted_agent(self, package):
        report = evaluate_task(
            package,
            scripted(
                tool("read_file", path="config.py"),
                tool("edit_file", path="config.py", old="TIMEOUT = 10",
                     new="TIMEOUT = 30"),
                final("updated TIMEOUT to 30"),
            ),
        )
        assert report["passed"], report["checks"]
        assert report["status"] == "final"
        m = report["metrics"]
        assert m["tool_calls"] == 2 and m["steps"] == 3

    def test_evaluate_task_scores_failure(self, package):
        report = evaluate_task(package, scripted(final("did nothing")))
        assert not report["passed"]
        assert report["metrics"]["tool_calls"] == 0

    def test_json_value_check(self, tmp_path):
        root = tmp_path / "pkg2"
        (root / "workspace").mkdir(parents=True)
        (root / "held_out_tests").mkdir()
        (root / "workspace" / "cfg.json").write_text('{"a": {"b": [1, 2]}}')
        (root / "task.json").write_text(json.dumps(
            {"id": "j", "instructions": "x"}))
        (root / "held_out_tests" / "checks.json").write_text(json.dumps([
            {"type": "json_value", "path": "cfg.json", "pointer": "/a/b/1",
             "value": 2},
        ]))
        pkg = TaskPackage.load(str(root))
        staged = StagedTask.stage(pkg)
        results = StaticHeldOutGrader(pkg, staged.original).grade(staged.freeze())
        assert results[0].passed
