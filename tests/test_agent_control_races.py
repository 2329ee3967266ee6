"""Thread-race tests for cancellation and steering linearization.

Models the reference's first-writer-wins CancellationToken
(control.py:29-71) and the terminal-final-vs-steering linearization in
the loop (loop.py:358-392): repeated randomized trials assert the
invariants hold under real thread interleavings.
"""

import threading
import time

import pytest

from tiny_llm_tpu.agent import (
    AgentLimits,
    SteeringHandle,
    ToolPolicy,
    Workspace,
    memory_session,
    run_agent,
)
from tiny_llm_tpu.agent.control import AgentInterrupted, CancellationToken


class TestFirstWriterWins:
    def test_exactly_one_cancel_wins_among_many_threads(self):
        for _ in range(20):
            tok = CancellationToken()
            winners = []
            barrier = threading.Barrier(8)

            def racer(i):
                barrier.wait()
                if tok.cancel(f"reason-{i}"):
                    winners.append(i)

            threads = [threading.Thread(target=racer, args=(i,))
                       for i in range(8)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            assert len(winners) == 1
            assert tok.reason == f"reason-{winners[0]}"

    def test_reason_immutable_after_first_write(self):
        tok = CancellationToken()
        assert tok.cancel("first") is True
        assert tok.cancel("second") is False
        assert tok.reason == "first"
        with pytest.raises(AgentInterrupted) as exc:
            tok.raise_if_cancelled("phase-x")
        assert exc.value.reason == "first" and exc.value.phase == "phase-x"

    def test_run_if_active_linearizes_against_cancel(self):
        """Either the action runs (and a later cancel cannot un-run it)
        or the token was already cancelled and it never starts.  Across
        many racy trials: ran XOR interrupted, never neither/both."""
        for trial in range(50):
            tok = CancellationToken()
            ran = []
            outcome = {}
            barrier = threading.Barrier(2)

            def actor():
                barrier.wait()
                try:
                    tok.run_if_active(lambda: ran.append(1), "action")
                    outcome["result"] = "ran"
                except AgentInterrupted:
                    outcome["result"] = "interrupted"

            def canceller():
                barrier.wait()
                tok.cancel("stop")

            a = threading.Thread(target=actor)
            c = threading.Thread(target=canceller)
            a.start(); c.start(); a.join(); c.join()
            if outcome["result"] == "ran":
                assert ran == [1]
            else:
                assert ran == []


class TestCancellationPhases:
    def test_workspace_tool_refuses_after_cancel(self, tmp_path):
        tok = CancellationToken()
        ws = Workspace(ToolPolicy(root=str(tmp_path)), cancellation=tok)
        tok.cancel("stop")
        from tiny_llm_tpu.agent.protocol import ToolAction

        with pytest.raises(AgentInterrupted):
            ws.execute(ToolAction("list_files", {"path": "."}))

    def test_file_mutation_checks_cancellation_after_journal(self, tmp_path):
        """Cancellation landing between prepare and commit interrupts at
        the file_mutation phase, leaving the target untouched."""
        (tmp_path / "f.txt").write_text("v1")
        tok = CancellationToken()
        ws = Workspace(
            ToolPolicy(root=str(tmp_path), allow_writes=True),
            cancellation=tok, confirm=lambda a: True,
        )
        ws.read_file("f.txt")
        prepared = ws.prepare_write("f.txt", "v2")
        tok.cancel("stop")
        with pytest.raises(AgentInterrupted) as exc:
            ws.commit_write(prepared)
        assert exc.value.phase == "file_mutation"
        assert (tmp_path / "f.txt").read_text() == "v1"


def scripted_generate(replies):
    it = iter(replies)

    def generate(messages):
        return next(it), None

    return generate


class FakeWorkspace:
    """Loop-only fake (reference test_week_4_day_1 style)."""

    def __init__(self):
        import tempfile
        self.policy = ToolPolicy(root=tempfile.gettempdir())
        self.session = None
        self.journal = None
        self.cancellation = None
        self.calls = []

    def execute(self, action):
        self.calls.append(action)
        return {"ok": True}


class TestSteeringLinearization:
    def _run(self, steer_at_event):
        """Run an agent whose model immediately finals, racing a thread
        that queues steering; returns (status, session)."""
        session = memory_session()
        handle = SteeringHandle(session)
        release = threading.Event()

        def generate(messages):
            release.set()
            # Give the steering thread a chance to land mid-generate.
            time.sleep(0.005)
            texts = [m["content"] for m in messages]
            if any("[steering]" in t for t in texts):
                return '{"type": "final", "message": "obeyed"}', None
            return '{"type": "final", "message": "done"}', None

        def steer():
            release.wait(timeout=5)
            try:
                handle.submit("actually, do X instead")
            except Exception:
                pass

        t = threading.Thread(target=steer)
        t.start()
        run = run_agent(
            "task", generate, FakeWorkspace(),
            limits=AgentLimits(max_steps=4), session=session,
        )
        t.join()
        return run, session

    def test_steering_never_silently_lost(self):
        """Whatever the interleaving: if the run finished as 'final',
        every queued steering was either delivered before the final
        answer was accepted, or nothing was queued at all."""
        for _ in range(25):
            run, session = self._run(steer_at_event=None)
            assert run.status == "final"
            queued = [e for e in session.events if e.type == "steering_queued"]
            if queued:
                delivered = {e.data.get("steering_id")
                             for e in session.events
                             if e.type == "steering_delivered"}
                accepted_at = [e for e in session.events
                               if e.type == "run_finished"][0].id
                for q in queued:
                    if q.id < accepted_at:
                        assert q.id in delivered, (
                            "steering queued before the final answer was "
                            "accepted but never delivered"
                        )

    def test_steering_arriving_mid_generate_outranks_final(self):
        """Steering queued AFTER the step's delivery point but BEFORE
        the final answer is parsed must not be lost: the final is
        rejected, the steering delivered, and the loop continues."""
        session = memory_session()
        replies = iter([
            '{"type": "final", "message": "premature"}',
            '{"type": "final", "message": "after steering"}',
        ])
        first = {"done": False}

        def generate(messages):
            reply = next(replies)
            if not first["done"]:
                first["done"] = True
                # Lands mid-generate, after this step's steering delivery.
                session.queue_steering("change of plans")
            return reply, None

        run = run_agent(
            "task", generate, FakeWorkspace(),
            limits=AgentLimits(max_steps=4), session=session,
        )
        assert run.status == "final"
        types = [e.type for e in session.events]
        assert "steering_delivered" in types
        assert run.final_message == "after steering"

    def test_cancel_during_generate_interrupts_run(self):
        session = memory_session()
        tok = CancellationToken()

        def generate(messages):
            tok.cancel("user hit ctrl-c")
            return '{"type": "final", "message": "too late"}', None

        run = run_agent(
            "task", generate, FakeWorkspace(),
            limits=AgentLimits(max_steps=4), session=session,
            cancellation=tok,
        )
        assert run.status == "interrupted"
        assert any(e.type == "interrupted" for e in session.events)

    def test_concurrent_cancel_and_steering_no_deadlock(self):
        """Cancellation and steering racing the loop must terminate the
        run promptly, one way or the other."""
        for _ in range(10):
            session = memory_session()
            tok = CancellationToken()
            handle = SteeringHandle(session)
            started = threading.Event()

            def generate(messages):
                started.set()
                time.sleep(0.002)
                return '{"type": "final", "message": "done"}', None

            def chaos():
                started.wait(timeout=5)
                try:
                    handle.submit("steer!")
                except Exception:
                    pass
                tok.cancel("stop")

            t = threading.Thread(target=chaos)
            t.start()
            run = run_agent(
                "task", generate, FakeWorkspace(),
                limits=AgentLimits(max_steps=8), session=session,
                cancellation=tok,
            )
            t.join()
            assert run.status in ("final", "interrupted")
