"""Workspace sandbox tests (reference week-4 day-4/6 suites): path
hardening, read-before-write TOCTOU, atomic writes, command allowlist."""

import os
import subprocess
import sys

import pytest

from tiny_llm_tpu.agent import ToolPolicy, Workspace
from tiny_llm_tpu.agent.protocol import ToolAction
from tiny_llm_tpu.agent.workspace import WorkspaceError


@pytest.fixture
def ws(tmp_path):
    (tmp_path / "src").mkdir()
    (tmp_path / "src" / "a.py").write_text("VALUE = 1\n")
    (tmp_path / "README.md").write_text("hello\n")
    policy = ToolPolicy(
        root=str(tmp_path),
        allow_writes=True,
        allowed_commands=((sys.executable, "-c"),),
    )
    return Workspace(policy, confirm=lambda a: True)


class TestPaths:
    @pytest.mark.parametrize(
        "bad", ["/etc/passwd", "../x", "src/../../x", "", ".git/config", ".ssh/id"]
    )
    def test_rejected_paths(self, ws, bad):
        with pytest.raises(WorkspaceError):
            ws.resolve_path(bad)

    def test_symlink_component_rejected(self, ws, tmp_path):
        os.symlink("/etc", tmp_path / "evil")
        with pytest.raises(WorkspaceError):
            ws.resolve_path("evil/passwd")

    def test_symlink_file_read_rejected(self, ws, tmp_path):
        os.symlink("/etc/hostname", tmp_path / "link.txt")
        with pytest.raises(WorkspaceError):
            ws.read_file("link.txt")


class TestReadList:
    def test_list_files(self, ws):
        entries = ws.list_files(".")
        assert "src/" in entries and "README.md" in entries

    def test_list_hides_protected(self, ws, tmp_path):
        (tmp_path / ".git").mkdir()
        assert ".git/" not in ws.list_files(".")

    def test_read_file(self, ws):
        assert ws.read_file("src/a.py") == "VALUE = 1\n"

    def test_read_size_cap(self, tmp_path):
        (tmp_path / "big").write_bytes(b"x" * 2048)
        policy = ToolPolicy(root=str(tmp_path), max_file_bytes=1024)
        with pytest.raises(WorkspaceError):
            Workspace(policy).read_file("big")


class TestWrites:
    def test_write_new_file(self, ws, tmp_path):
        out = ws.write_file("src/new.py", "X = 2\n")
        assert out["bytes"] == 6
        assert (tmp_path / "src" / "new.py").read_text() == "X = 2\n"

    def test_overwrite_requires_prior_read(self, ws):
        with pytest.raises(WorkspaceError, match="before writing"):
            ws.write_file("src/a.py", "VALUE = 2\n")

    def test_toctou_detects_external_change(self, ws, tmp_path):
        ws.read_file("src/a.py")
        (tmp_path / "src" / "a.py").write_text("MUTATED\n")
        with pytest.raises(WorkspaceError, match="changed since"):
            ws.write_file("src/a.py", "VALUE = 2\n")

    def test_read_then_write_ok(self, ws, tmp_path):
        ws.read_file("src/a.py")
        ws.write_file("src/a.py", "VALUE = 2\n")
        assert (tmp_path / "src" / "a.py").read_text() == "VALUE = 2\n"

    def test_edit_unique_match(self, ws, tmp_path):
        ws.edit_file("src/a.py", "VALUE = 1", "VALUE = 42")
        assert (tmp_path / "src" / "a.py").read_text() == "VALUE = 42\n"

    def test_edit_rejects_missing_and_ambiguous(self, ws, tmp_path):
        with pytest.raises(WorkspaceError, match="not found"):
            ws.edit_file("src/a.py", "NOPE", "X")
        (tmp_path / "dup.txt").write_text("aa aa\n")
        with pytest.raises(WorkspaceError, match="2 times"):
            ws.edit_file("dup.txt", "aa", "bb")

    def test_write_disabled_policy(self, tmp_path):
        policy = ToolPolicy(root=str(tmp_path), allow_writes=False)
        with pytest.raises(WorkspaceError, match="disabled"):
            Workspace(policy).write_file("x.txt", "y")

    def test_atomic_write_leaves_no_temp_droppings(self, ws, tmp_path):
        ws.read_file("README.md")
        ws.write_file("README.md", "updated\n")
        leftovers = [n for n in os.listdir(tmp_path) if n.startswith(".README")]
        assert leftovers == []


class TestCommands:
    def test_allowed_command_runs(self, ws):
        result = ws.run_command([sys.executable, "-c", "print('hi')"])
        assert result["returncode"] == 0
        assert "hi" in result["output"]

    def test_disallowed_command_rejected(self, ws):
        with pytest.raises(WorkspaceError, match="allowlist"):
            ws.run_command(["rm", "-rf", "/"])

    def test_prefix_must_match_exactly(self, ws):
        with pytest.raises(WorkspaceError):
            ws.run_command([sys.executable])  # shorter than the prefix

    def test_timeout_kills_process_group(self, tmp_path):
        policy = ToolPolicy(
            root=str(tmp_path),
            allowed_commands=((sys.executable, "-c"),),
            command_timeout_s=1.0,
        )
        ws = Workspace(policy)
        with pytest.raises(WorkspaceError, match="timed out"):
            ws.run_command([sys.executable, "-c", "import time; time.sleep(30)"])

    def test_output_truncated(self, tmp_path):
        policy = ToolPolicy(
            root=str(tmp_path),
            allowed_commands=((sys.executable, "-c"),),
            max_output_bytes=100,
        )
        ws = Workspace(policy)
        r = ws.run_command([sys.executable, "-c", "print('z' * 10000)"])
        assert r["truncated"] and len(r["output"]) <= 100

    def test_scrubbed_env(self, ws, monkeypatch):
        monkeypatch.setenv("SECRET_TOKEN", "hunter2")
        r = ws.run_command(
            [sys.executable, "-c", "import os; print(os.environ.get('SECRET_TOKEN'))"]
        )
        assert "hunter2" not in r["output"]


class TestExecute:
    def test_confirm_gates_side_effects(self, tmp_path):
        policy = ToolPolicy(root=str(tmp_path), allow_writes=True)
        ws = Workspace(policy, confirm=lambda a: False)
        result = ws.execute(
            ToolAction("write_file", {"path": "x.txt", "content": "y"})
        )
        assert result["error"] == "action rejected by user"
        assert not (tmp_path / "x.txt").exists()

    def test_read_does_not_need_confirm(self, tmp_path):
        (tmp_path / "f.txt").write_text("data")
        policy = ToolPolicy(root=str(tmp_path))
        ws = Workspace(policy, confirm=lambda a: False)
        result = ws.execute(ToolAction("read_file", {"path": "f.txt"}))
        assert result == {"content": "data"}

    def test_errors_become_results_not_exceptions(self, tmp_path):
        policy = ToolPolicy(root=str(tmp_path))
        ws = Workspace(policy)
        result = ws.execute(ToolAction("read_file", {"path": "missing.txt"}))
        assert "error" in result

    def test_session_records_call_and_result(self, tmp_path):
        from tiny_llm_tpu.agent import memory_session

        (tmp_path / "f.txt").write_text("data")
        log = memory_session()
        ws = Workspace(ToolPolicy(root=str(tmp_path)), session_log=log)
        ws.execute(ToolAction("read_file", {"path": "f.txt"}))
        types = [e.type for e in log.events]
        assert types == ["tool_call", "tool_result"]
        assert log.events[1].data["result"]["content"] == "data"

    def test_journal_wired_through_write(self, tmp_path):
        from tiny_llm_tpu.agent import MutationJournal, memory_session

        log = memory_session()
        j = MutationJournal(log, str(tmp_path))
        ws = Workspace(
            ToolPolicy(root=str(tmp_path), allow_writes=True),
            session_log=log, journal=j, confirm=lambda a: True,
        )
        ws.execute(ToolAction("write_file", {"path": "n.txt", "content": "v"}))
        types = [e.type for e in log.events]
        assert "mutation_intent" in types and "mutation_committed" in types
        # WAL ordering: intent precedes commit, both inside the tool call.
        assert types.index("mutation_intent") < types.index("mutation_committed")
