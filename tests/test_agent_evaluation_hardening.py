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


class TestAdversarialVariants:
    """Round-5 breadth (VERDICT r4 #8): the reference's
    test_week_4_day_7 adversarial class, re-expressed for this design
    — sealed-package VCS rejection, grading determinism and
    frozen-bytes isolation, fail-closed non-finite and escaping-path
    checks."""

    def test_package_rejects_embedded_git_metadata(self, tmp_path):
        """A sealed package workspace carrying a .git tree must refuse
        to stage: VCS metadata is evaluator-visible state, not task
        content."""
        pkg = make_package(tmp_path, [{"type": "path_exists", "path": "main.py"}])
        git = tmp_path / "pkg" / "workspace" / ".git"
        git.mkdir()
        (git / "HEAD").write_text("ref: refs/heads/main\n")
        with pytest.raises(EvaluationError, match="VCS metadata"):
            StagedTask.stage(pkg)

    def test_candidate_freeze_tolerates_dotfiles(self, tmp_path):
        """The seal applies to the PACKAGE, not the candidate: an agent
        creating a .git dir mid-run is skipped (graded tree excludes
        hidden entries), never an EvaluationError."""
        pkg = make_package(tmp_path, [{"type": "path_exists", "path": "main.py"}])
        staged = StagedTask.stage(pkg)
        git = os.path.join(staged.workdir, ".git")
        os.makedirs(git)
        with open(os.path.join(git, "HEAD"), "w") as f:
            f.write("ref\n")
        snap = staged.freeze()
        assert "main.py" in snap.files
        assert not any(r.startswith(".git") for r in snap.files)

    def test_same_candidate_bytes_grade_identically(self, tmp_path):
        """grade() is a pure function of the snapshot: equal tree
        hashes -> byte-identical reports across graders and calls."""
        checks = [
            {"type": "python_constant", "path": "main.py", "name": "X",
             "value": 2},
            {"type": "path_absent", "path": "gone.txt"},
        ]
        pkg = make_package(tmp_path, checks, editable=["main.py"])
        s1 = StagedTask.stage(pkg)
        s2 = StagedTask.stage(pkg)
        for s in (s1, s2):
            with open(os.path.join(s.workdir, "main.py"), "w") as f:
                f.write("X = 2\n")
        snap1, snap2 = s1.freeze(), s2.freeze()
        assert snap1.tree_hash == snap2.tree_hash
        r1 = StaticHeldOutGrader(pkg, s1.original).grade(snap1)
        r2 = StaticHeldOutGrader(pkg, s2.original).grade(snap2)
        assert [(r.check, r.passed, r.detail) for r in r1] == [
            (r.check, r.passed, r.detail) for r in r2
        ]

    def test_grading_uses_frozen_bytes_not_live_workspace(self, tmp_path):
        """Mutating the staged tree AFTER freeze() must not change the
        grade: the snapshot owns its bytes."""
        pkg = make_package(
            tmp_path,
            [{"type": "text_equals", "path": "main.py", "value": "X = 1"}],
        )
        staged = StagedTask.stage(pkg)
        snap = staged.freeze()
        with open(os.path.join(staged.workdir, "main.py"), "w") as f:
            f.write("X = 666\n")
        results = StaticHeldOutGrader(pkg, staged.original).grade(snap)
        assert results[0].passed  # frozen bytes, not the tampered tree

    def test_empty_file_and_missing_file_differ_in_hash(self, tmp_path):
        pkg = make_package(tmp_path, [])
        s = StagedTask.stage(pkg)
        h_base = s.freeze().tree_hash
        open(os.path.join(s.workdir, "extra"), "w").close()
        h_empty = s.freeze().tree_hash
        assert h_base != h_empty

    def test_non_finite_candidate_literal_fails_closed(self, tmp_path):
        """`X = 1e999` parses to inf; grading against a finite expected
        value must FAIL the check without crashing the grader, and a
        nan-producing expression (not a literal) fails as malformed."""
        pkg = make_package(
            tmp_path,
            [{"type": "python_constant", "path": "main.py", "name": "X",
              "value": 3}],
            editable=["main.py"],
        )
        for payload in ("X = 1e999\n", "X = float('nan')\n"):
            staged = StagedTask.stage(pkg)
            with open(os.path.join(staged.workdir, "main.py"), "w") as f:
                f.write(payload)
            results = StaticHeldOutGrader(pkg, staged.original).grade(
                staged.freeze()
            )
            const = [r for r in results if r.check.get("type") == "python_constant"]
            assert len(const) == 1 and not const[0].passed, payload

    def test_escaping_check_paths_fail_closed(self, tmp_path):
        """Checks whose path tries to escape the snapshot ('../x',
        absolute) can never match a snapshot entry: path_exists fails,
        path_absent (vacuously) passes, content checks fail as missing."""
        pkg = make_package(
            tmp_path,
            [
                {"type": "path_exists", "path": "../task.json"},
                {"type": "path_absent", "path": "/etc/passwd"},
                {"type": "text_equals", "path": "../../x", "value": "v"},
            ],
        )
        staged = StagedTask.stage(pkg)
        results = StaticHeldOutGrader(pkg, staged.original).grade(staged.freeze())
        by_type = {r.check["type"]: r for r in results[:3]}
        assert not by_type["path_exists"].passed
        assert by_type["path_absent"].passed
        assert not by_type["text_equals"].passed

    def test_malformed_check_fields_fail_that_check_only(self, tmp_path):
        """A check missing its required field (e.g. json_value without
        'pointer') fails ITSELF with the error detail; sibling checks
        still grade. (Fail-closed per check — this design's documented
        divergence from the reference's load-time config error.)"""
        pkg = make_package(
            tmp_path,
            [
                {"type": "json_value", "path": "data.json"},  # no pointer
                {"type": "path_exists", "path": "main.py"},
            ],
            workspace={"main.py": "X = 1\n", "data.json": '{"a": 1}'},
        )
        staged = StagedTask.stage(pkg)
        results = StaticHeldOutGrader(pkg, staged.original).grade(staged.freeze())
        assert not results[0].passed and "KeyError" in results[0].detail
        assert results[1].passed


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
