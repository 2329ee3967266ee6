"""Adversarial command-runner tests: killed subprocesses, descendants
holding pipes, bounded output under flood, cancellation races, and the
durability of command_started/command_finished events.

Models the reference's command hardening (workspace.py:441-653) and its
week-4 day-6 adversarial suites: every test fails when the bounded
drain thread, the process-group kill, or the durable event bracketing
is removed.
"""

import os
import signal
import subprocess
import sys
import threading
import time

import pytest

from tiny_llm_tpu.agent import ToolPolicy, Workspace, memory_session
from tiny_llm_tpu.agent.control import AgentInterrupted, CancellationToken
from tiny_llm_tpu.agent.workspace import WorkspaceError

PY = sys.executable


def make_ws(tmp_path, log=None, cancellation=None, **policy_kw):
    policy_kw.setdefault("allowed_commands", ((PY, "-c"), ("/nonexistent-bin",)))
    policy = ToolPolicy(root=str(tmp_path), **policy_kw)
    return Workspace(
        policy, session_log=log, cancellation=cancellation, confirm=lambda a: True
    )


def events_of(log, type_):
    return [e for e in log.events if e.type == type_]


class TestDurableCommandEvents:
    def test_started_and_finished_bracket_every_run(self, tmp_path):
        log = memory_session()
        ws = make_ws(tmp_path, log)
        ws.run_command([PY, "-c", "print('ok')"])
        started = events_of(log, "command_started")
        finished = events_of(log, "command_finished")
        assert len(started) == 1 and len(finished) == 1
        assert started[0].data["command_id"] == finished[0].data["command_id"]
        assert finished[0].data["launched"] is True
        assert finished[0].data["returncode"] == 0
        assert finished[0].data["timed_out"] is False

    def test_failed_launch_still_finishes_durably(self, tmp_path):
        log = memory_session()
        ws = make_ws(tmp_path, log)
        with pytest.raises(WorkspaceError, match="failed to start"):
            ws.run_command(["/nonexistent-bin"])
        finished = events_of(log, "command_finished")
        assert len(finished) == 1
        assert finished[0].data["launched"] is False
        assert "error" in finished[0].data

    def test_timeout_recorded_durably(self, tmp_path):
        log = memory_session()
        ws = make_ws(tmp_path, log, command_timeout_s=0.5)
        with pytest.raises(WorkspaceError, match="timed out"):
            ws.run_command([PY, "-c", "import time; time.sleep(30)"])
        finished = events_of(log, "command_finished")
        assert len(finished) == 1
        assert finished[0].data["timed_out"] is True
        assert finished[0].data["launched"] is True

    def test_disallowed_command_appends_no_started_event(self, tmp_path):
        log = memory_session()
        ws = make_ws(tmp_path, log)
        with pytest.raises(WorkspaceError, match="allowlist"):
            ws.run_command(["rm", "-rf", "/"])
        assert events_of(log, "command_started") == []


class TestKilledSubprocess:
    def test_externally_killed_child_reports_signal(self, tmp_path):
        log = memory_session()
        ws = make_ws(tmp_path, log)
        r = ws.run_command(
            [PY, "-c", "import os, signal; os.kill(os.getpid(), signal.SIGKILL)"]
        )
        assert r["returncode"] == -signal.SIGKILL
        finished = events_of(log, "command_finished")
        assert finished[0].data["returncode"] == -signal.SIGKILL

    def test_timeout_kills_whole_process_group(self, tmp_path):
        """The child spawns a grandchild that writes its pid to a file;
        after the timeout kill, the grandchild must be dead too."""
        pid_file = tmp_path / "grandchild.pid"
        script = (
            "import subprocess, sys, time\n"
            "p = subprocess.Popen([sys.executable, '-c', "
            "'import time; time.sleep(60)'])\n"
            f"open({str(pid_file)!r}, 'w').write(str(p.pid))\n"
            "time.sleep(60)\n"
        )
        ws = make_ws(tmp_path, command_timeout_s=1.0)
        with pytest.raises(WorkspaceError, match="timed out"):
            ws.run_command([PY, "-c", script])
        deadline = time.monotonic() + 5
        gpid = int(pid_file.read_text())
        while time.monotonic() < deadline:
            try:
                os.kill(gpid, 0)
            except ProcessLookupError:
                break
            # Reaped by init once the group SIGKILL lands.
            time.sleep(0.05)
        else:
            pytest.fail(f"grandchild {gpid} survived the group kill")

    def test_side_effect_flag_set_after_any_launch(self, tmp_path):
        ws = make_ws(tmp_path)
        assert ws.command_side_effects_untracked is False
        ws.run_command([PY, "-c", "pass"])
        assert ws.command_side_effects_untracked is True


class TestBoundedOutput:
    def test_flood_is_capped_not_buffered(self, tmp_path):
        """A child writing far more than the cap must neither block the
        runner nor grow the captured buffer past the policy limit."""
        ws = make_ws(tmp_path, max_output_bytes=4096, command_timeout_s=30.0)
        r = ws.run_command(
            [PY, "-c", "import sys\n"
             "for _ in range(5000): sys.stdout.write('x' * 4096)"]
        )
        assert r["returncode"] == 0
        assert r["truncated"] is True
        assert len(r["output"]) <= 4096

    def test_grandchild_retaining_pipe_does_not_hang_runner(self, tmp_path):
        """The parent exits immediately; a detached grandchild keeps the
        inherited stdout pipe open.  Without the bounded drain + group
        kill, communicate() would block until the grandchild exits."""
        script = (
            "import subprocess, sys\n"
            "subprocess.Popen([sys.executable, '-c', 'import time; time.sleep(45)'])\n"
            "print('parent-done')\n"
        )
        ws = make_ws(tmp_path, command_timeout_s=20.0)
        t0 = time.monotonic()
        r = ws.run_command([PY, "-c", script])
        elapsed = time.monotonic() - t0
        assert elapsed < 10, f"runner blocked {elapsed:.1f}s on a retained pipe"
        assert r["returncode"] == 0
        assert "parent-done" in r["output"]

    def test_drain_failure_is_reported_not_silent(self, tmp_path, monkeypatch):
        """If reading the pipe fails mid-drain, the result must carry a
        trusted warning and the cleanup flag must be set."""
        real_popen = subprocess.Popen

        class BrokenStdout:
            def __init__(self, inner):
                self._inner = inner
                self._reads = 0

            def read(self, n):
                self._reads += 1
                if self._reads > 1:
                    raise OSError(5, "injected read failure")
                return self._inner.read(n)

            def close(self):
                return self._inner.close()

        class PatchedPopen(real_popen):
            def __init__(self, *a, **kw):
                super().__init__(*a, **kw)
                self.stdout = BrokenStdout(self.stdout)

        monkeypatch.setattr(subprocess, "Popen", PatchedPopen)
        ws = make_ws(tmp_path, command_timeout_s=15.0)
        # Total output stays under the 64 KiB pipe capacity so the child
        # can exit even after the (injected) reader failure.
        r = ws.run_command(
            [PY, "-c", "import sys\n"
             "for _ in range(8): sys.stdout.write('y' * 4096)"]
        )
        assert any("collection failed" in w for w in r.get("warnings", []))
        assert ws.command_cleanup_incomplete is True


class TestCancellation:
    def test_cancel_before_launch_never_starts_process(self, tmp_path):
        log = memory_session()
        tok = CancellationToken()
        tok.cancel("stop")
        ws = make_ws(tmp_path, log, cancellation=tok)
        with pytest.raises(AgentInterrupted):
            ws.run_command([PY, "-c", "print('never')"])
        # Nothing launched: no started event for a command that never ran.
        assert events_of(log, "command_started") == []

    def test_cancel_mid_command_kills_and_records(self, tmp_path):
        marker = tmp_path / "still-here"
        log = memory_session()
        tok = CancellationToken()
        ws = make_ws(tmp_path, log, cancellation=tok, command_timeout_s=30.0)
        script = (
            "import time, pathlib\n"
            f"pathlib.Path({str(marker)!r}).write_text('x')\n"
            "time.sleep(60)\n"
        )

        def cancel_when_started():
            deadline = time.monotonic() + 10
            while time.monotonic() < deadline and not marker.exists():
                time.sleep(0.02)
            tok.cancel("user pressed ctrl-c")

        t = threading.Thread(target=cancel_when_started)
        t.start()
        t0 = time.monotonic()
        with pytest.raises(AgentInterrupted):
            ws.run_command([PY, "-c", script])
        t.join()
        assert time.monotonic() - t0 < 15, "cancellation did not interrupt the wait"
        finished = events_of(log, "command_finished")
        assert len(finished) == 1 and finished[0].data["launched"] is True

    def test_cancel_between_started_event_and_launch(self, tmp_path, monkeypatch):
        """Cancellation landing exactly between the durable started event
        and the fork must record a finished(launched=False) event."""
        log = memory_session()
        tok = CancellationToken()
        ws = make_ws(tmp_path, log, cancellation=tok)
        real_raise = tok.raise_if_cancelled
        calls = {"n": 0}

        def racy_raise(phase):
            calls["n"] += 1
            if calls["n"] == 2:  # the post-started-event check
                tok.cancel("raced")
            return real_raise(phase)

        monkeypatch.setattr(tok, "raise_if_cancelled", racy_raise)
        with pytest.raises(AgentInterrupted):
            ws.run_command([PY, "-c", "print('never')"])
        finished = events_of(log, "command_finished")
        assert len(finished) == 1 and finished[0].data["launched"] is False
        started = events_of(log, "command_started")
        assert len(started) == 1
        assert started[0].data["command_id"] == finished[0].data["command_id"]


class TestEnvironmentScrubbing:
    def test_only_whitelisted_env_reaches_child(self, tmp_path, monkeypatch):
        monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "hunter2")
        monkeypatch.setenv("SSH_AUTH_SOCK", "/tmp/agent.sock")
        ws = make_ws(tmp_path)
        r = ws.run_command(
            [PY, "-c",
             "import os, json; print(json.dumps(sorted(os.environ)))"]
        )
        import json

        names = json.loads(r["output"])
        assert "AWS_SECRET_ACCESS_KEY" not in names
        assert "SSH_AUTH_SOCK" not in names

    def test_home_is_workspace_root(self, tmp_path):
        ws = make_ws(tmp_path)
        r = ws.run_command([PY, "-c", "import os; print(os.environ['HOME'])"])
        assert r["output"].strip() == os.path.realpath(str(tmp_path))

    def test_cwd_is_workspace_root(self, tmp_path):
        ws = make_ws(tmp_path)
        r = ws.run_command([PY, "-c", "import os; print(os.getcwd())"])
        assert r["output"].strip() == os.path.realpath(str(tmp_path))
