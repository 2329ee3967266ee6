"""Adversarial evaluation-harness tests: hostile task packages (symlink
escapes, oversized trees, unstable reads), grader integrity against a
cheating candidate, editable-paths enforcement edge cases, and metrics
reconstruction from tampered/partial sessions.

Models the reference's sealed-package hardening
(evaluation.py:178-344, 1245-1369).
"""

import json
import os

import pytest

from tiny_llm_tpu.agent import memory_session
from tiny_llm_tpu.agent.evaluation import (
    CandidateSnapshot,
    EvaluationError,
    EvaluationMetrics,
    StagedTask,
    StaticHeldOutGrader,
    TaskPackage,
    _walk_tree,
    evaluate_task,
)


def make_package(tmp_path, checks, workspace=None, editable=None, name="pkg"):
    root = tmp_path / name
    (root / "workspace").mkdir(parents=True)
    (root / "held_out_tests").mkdir()
    for rel, content in (workspace or {"main.py": "X = 1\n"}).items():
        p = root / "workspace" / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(content)
    manifest = {"id": name, "instructions": "do the task"}
    if editable is not None:
        manifest["editable_paths"] = editable
    (root / "task.json").write_text(json.dumps(manifest))
    (root / "held_out_tests" / "checks.json").write_text(json.dumps(checks))
    return TaskPackage.load(str(root))


class TestHostilePackages:
    def test_symlink_in_workspace_not_followed(self, tmp_path):
        secret = tmp_path / "secret.txt"
        secret.write_text("credentials")
        pkg_root = tmp_path / "pkg"
        (pkg_root / "workspace").mkdir(parents=True)
        (pkg_root / "held_out_tests").mkdir()
        (pkg_root / "workspace" / "real.py").write_text("X = 1\n")
        os.symlink(secret, pkg_root / "workspace" / "leak.txt")
        (pkg_root / "task.json").write_text(
            json.dumps({"id": "t", "instructions": "i"})
        )
        (pkg_root / "held_out_tests" / "checks.json").write_text("[]")
        pkg = TaskPackage.load(str(pkg_root))
        staged = StagedTask.stage(pkg)
        assert "leak.txt" not in staged.original
        assert not os.path.exists(os.path.join(staged.workdir, "leak.txt"))

    def test_symlinked_directory_not_descended(self, tmp_path):
        outside = tmp_path / "outside"
        outside.mkdir()
        (outside / "big.txt").write_text("outside data")
        ws = tmp_path / "ws"
        ws.mkdir()
        (ws / "ok.txt").write_text("fine")
        os.symlink(outside, ws / "sneaky")
        tree = _walk_tree(str(ws))
        assert list(tree) == ["ok.txt"]

    def test_oversized_file_rejected(self, tmp_path):
        from tiny_llm_tpu.agent import evaluation as ev_mod

        ws = tmp_path / "ws"
        ws.mkdir()
        (ws / "huge.bin").write_bytes(b"x" * (ev_mod.MAX_FILE_BYTES + 1))
        with pytest.raises(EvaluationError, match="too large"):
            _walk_tree(str(ws))

    def test_too_deep_tree_rejected(self, tmp_path):
        from tiny_llm_tpu.agent import evaluation as ev_mod

        ws = tmp_path / "ws"
        d = ws
        for i in range(ev_mod.MAX_DEPTH + 2):
            d = d / f"lvl{i}"
        d.mkdir(parents=True)
        (d / "f.txt").write_text("x")
        with pytest.raises(EvaluationError, match="deeper"):
            _walk_tree(str(ws))

    def test_hidden_files_excluded_from_snapshot(self, tmp_path):
        ws = tmp_path / "ws"
        ws.mkdir()
        (ws / "visible.txt").write_text("v")
        (ws / ".hidden").write_text("h")
        (ws / ".git").mkdir()
        (ws / ".git" / "config").write_text("g")
        tree = _walk_tree(str(ws))
        assert list(tree) == ["visible.txt"]

    def test_unknown_check_type_rejected_at_load(self, tmp_path):
        with pytest.raises(EvaluationError, match="unknown check"):
            make_package(tmp_path, [{"type": "run_arbitrary_code", "cmd": "rm"}])

    def test_staging_is_byte_exact_and_isolated(self, tmp_path):
        pkg = make_package(
            tmp_path, [], workspace={"a/b.py": "B = 2\n", "top.txt": "t\n"}
        )
        staged = StagedTask.stage(pkg)
        assert open(os.path.join(staged.workdir, "a/b.py")).read() == "B = 2\n"
        # Mutating the stage never touches the sealed package.
        with open(os.path.join(staged.workdir, "top.txt"), "w") as f:
            f.write("mutated")
        assert (
            open(os.path.join(pkg.root, "workspace", "top.txt")).read() == "t\n"
        )


class TestGraderIntegrity:
    def test_unchanged_check_defeats_rewrite_with_same_name(self, tmp_path):
        pkg = make_package(
            tmp_path,
            [{"type": "unchanged", "path": "keep.txt"}],
            workspace={"keep.txt": "original\n"},
        )
        staged = StagedTask.stage(pkg)
        grader = StaticHeldOutGrader(pkg, staged.original)
        ok = grader.grade(CandidateSnapshot(files={"keep.txt": b"original\n"}))
        assert all(r.passed for r in ok)
        cheat = grader.grade(CandidateSnapshot(files={"keep.txt": b"hacked\n"}))
        assert not cheat[0].passed
        gone = grader.grade(CandidateSnapshot(files={}))
        assert not gone[0].passed

    def test_python_constant_ignores_lookalikes(self, tmp_path):
        pkg = make_package(
            tmp_path,
            [{"type": "python_constant", "path": "m.py", "name": "TIMEOUT",
              "value": 30}],
        )
        grader = StaticHeldOutGrader(pkg, {})
        # A comment or string mentioning the constant must not pass.
        for source, want in [
            (b"TIMEOUT = 30\n", True),
            (b"# TIMEOUT = 30\n", False),
            (b"S = 'TIMEOUT = 30'\n", False),
            (b"TIMEOUT = '30'\n", False),  # string, not int
            (b"TIMEOUT, OTHER = 30, 1\n", False),  # tuple target
            (b"def f():\n    TIMEOUT = 30\n", False),  # not module level
        ]:
            [r] = grader.grade(CandidateSnapshot(files={"m.py": source}))
            assert r.passed is want, source

    def test_python_constant_survives_malicious_source(self, tmp_path):
        """The grader must literal-eval, never execute: a candidate file
        with side-effectful code fails cleanly instead of running."""
        pkg = make_package(
            tmp_path,
            [{"type": "python_constant", "path": "m.py", "name": "X",
              "value": 1}],
        )
        grader = StaticHeldOutGrader(pkg, {})
        evil = b"import os\nX = os.system('touch /tmp/pwned-by-eval')\n"
        [r] = grader.grade(CandidateSnapshot(files={"m.py": evil}))
        assert r.passed is False
        assert not os.path.exists("/tmp/pwned-by-eval")

    def test_json_pointer_escapes(self, tmp_path):
        pkg = make_package(
            tmp_path,
            [{"type": "json_value", "path": "c.json", "pointer": "/a~1b/x~0y",
              "value": 5}],
        )
        grader = StaticHeldOutGrader(pkg, {})
        doc = json.dumps({"a/b": {"x~y": 5}}).encode()
        [r] = grader.grade(CandidateSnapshot(files={"c.json": doc}))
        assert r.passed

    def test_malformed_candidate_fails_check_not_grader(self, tmp_path):
        pkg = make_package(
            tmp_path,
            [{"type": "json_value", "path": "c.json", "pointer": "/a",
              "value": 1},
             {"type": "python_constant", "path": "m.py", "name": "X",
              "value": 1}],
        )
        grader = StaticHeldOutGrader(pkg, {})
        results = grader.grade(CandidateSnapshot(files={
            "c.json": b"{not json",
            "m.py": b"def broken(:\n",
        }))
        assert [r.passed for r in results] == [False, False]
        assert all(r.detail for r in results)


class TestEditablePaths:
    def _grader(self, tmp_path, editable):
        pkg = make_package(
            tmp_path,
            [],
            workspace={"allowed.py": "A = 1\n", "frozen.py": "F = 1\n"},
            editable=editable,
        )
        staged = StagedTask.stage(pkg)
        return pkg, staged, StaticHeldOutGrader(pkg, staged.original)

    def test_edit_outside_allowlist_flagged(self, tmp_path):
        pkg, staged, grader = self._grader(tmp_path, ["allowed.py"])
        snap = CandidateSnapshot(files={
            "allowed.py": b"A = 2\n",
            "frozen.py": b"F = 999\n",
        })
        [r] = grader.grade(snap)
        assert not r.passed and "frozen.py" in r.detail

    def test_deletion_outside_allowlist_flagged(self, tmp_path):
        pkg, staged, grader = self._grader(tmp_path, ["allowed.py"])
        snap = CandidateSnapshot(files={"allowed.py": b"A = 1\n"})
        [r] = grader.grade(snap)
        assert not r.passed and "frozen.py" in r.detail

    def test_new_file_outside_allowlist_flagged(self, tmp_path):
        pkg, staged, grader = self._grader(tmp_path, ["allowed.py"])
        snap = CandidateSnapshot(files={
            "allowed.py": b"A = 1\n",
            "frozen.py": b"F = 1\n",
            "sneaky.py": b"S = 1\n",
        })
        [r] = grader.grade(snap)
        assert not r.passed and "sneaky.py" in r.detail

    def test_within_allowlist_passes(self, tmp_path):
        pkg, staged, grader = self._grader(tmp_path, ["allowed.py"])
        snap = CandidateSnapshot(files={
            "allowed.py": b"A = 42\n",
            "frozen.py": b"F = 1\n",
        })
        [r] = grader.grade(snap)
        assert r.passed


class TestMetricsFromEvents:
    def test_metrics_reconstructed_from_durable_events_only(self):
        s = memory_session()
        s.append("user_message", {"text": "t"})
        s.append("assistant_message",
                 {"text": "a", "stats": {"input_tokens": 100,
                                         "output_tokens": 7}})
        call = s.append("tool_call", {"tool": "read_file", "args": {}})
        s.append("tool_result", {"call_id": call.id,
                                 "result": {"error": "nope"}})
        s.append("assistant_message", {"text": "b", "stats": None})
        s.append("protocol_error", {"error": "bad", "count": 1})
        s.append("command_started", {"command_id": "c1", "argv": ["x"]})
        s.append("compaction", {"summary": "s", "kept_messages": []})
        s.append("run_finished", {"status": "final", "message": "m"})
        m = EvaluationMetrics.from_session(s)
        assert m.steps == 2 and m.tool_calls == 1 and m.tool_errors == 1
        assert m.protocol_errors == 1 and m.commands_run == 1
        assert m.compactions == 1 and m.input_tokens == 100
        assert m.output_tokens == 7 and m.status == "final"

    def test_metrics_tolerate_crash_truncated_session(self):
        s = memory_session()
        s.append("user_message", {"text": "t"})
        s.append("assistant_message", {"text": "a"})
        s.append("tool_call", {"tool": "write_file", "args": {}})
        # No tool_result, no run_finished — crashed mid-step.
        m = EvaluationMetrics.from_session(s)
        assert m.steps == 1 and m.tool_calls == 1 and m.status == ""


class TestEndToEndEvaluation:
    def test_scripted_agent_cannot_touch_package_or_escape(self, tmp_path):
        pkg = make_package(
            tmp_path,
            [{"type": "text_equals", "path": "out.txt", "value": "done"}],
            workspace={"out.txt": "pending\n"},
        )
        replies = iter([
            json.dumps({"type": "tool", "tool": "read_file",
                        "path": "out.txt"}),
            json.dumps({"type": "tool", "tool": "write_file",
                        "path": "out.txt", "content": "done"}),
            # Escape attempts: both must fail as tool errors, not crashes.
            json.dumps({"type": "tool", "tool": "read_file",
                        "path": "../task.json"}),
            json.dumps({"type": "tool", "tool": "write_file",
                        "path": "/etc/hosts", "content": "owned"}),
            json.dumps({"type": "final", "message": "ok"}),
        ])

        def generate(messages):
            return next(replies), None

        report = evaluate_task(pkg, generate)
        assert report["passed"] is True
        assert report["metrics"]["tool_errors"] == 2
        # The sealed package was not modified by the run.
        assert (
            open(os.path.join(pkg.root, "workspace", "out.txt")).read()
            == "pending\n"
        )

    def test_commands_disabled_by_default(self, tmp_path):
        pkg = make_package(tmp_path, [])
        replies = iter([
            json.dumps({"type": "tool", "tool": "run_command",
                        "argv": ["python", "-c", "print(1)"]}),
            json.dumps({"type": "final", "message": "ok"}),
        ])
        report = evaluate_task(pkg, lambda m: (next(replies), None))
        assert report["metrics"]["commands_run"] == 0
        assert report["metrics"]["tool_errors"] == 1
