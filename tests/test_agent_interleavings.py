"""Adversarial interleavings across steering x cancellation x terminal
finals, session branching under concurrent append, and undo-recovery
reentry (round-3 verdict item #8: new SCENARIOS, not variations).

Three suites:

* TestTerminalLinearizations — loop-level orderings of {queued steering,
  cancellation, terminal final}: who wins at each arrival point, what
  the durable log must show for each outcome, and the session-level
  invariant (a run is "final" XOR the log says interrupted) under a
  genuinely racy cancel (many trials).
* TestBranchingUnderAppend — SessionStore.branch racing live appends:
  prefix snapshot isolation, steering delivery state across the branch,
  stale-handle second-writer detection after divergence, concurrent
  branches creating distinct lineages.
* TestUndoReentry — reentering apply_undo when the RECONCILIATION
  itself crashed mid-recovery, journaled drift between resume attempts,
  and foreign events interleaved into the log during the undo WAL.

Scenario constructions are original to this suite; behavior parity with
the reference's week-4 day-6 linearization cases
(tests_refsol/test_week_4_day_6.py) is the goal, not its test text.
"""

from __future__ import annotations

import hashlib
import json
import os
import threading
import time

import pytest

from tiny_llm_tpu.agent import (
    AgentLimits,
    CancellationToken,
    MutationJournal,
    SessionLog,
    SessionStore,
    SteeringHandle,
    ToolPolicy,
    Workspace,
    memory_session,
    run_agent,
)
from tiny_llm_tpu.agent.session import SessionConflict, SessionError


def sha(text: str) -> str:
    return hashlib.sha256(text.encode()).hexdigest()


def scripted(replies):
    it = iter(replies)
    return lambda messages: (next(it), None)


class LoopWorkspace:
    """Loop-only workspace fake: records execute() calls."""

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


FINAL = '{"type": "final", "message": "done"}'


def delivered_texts(session):
    return [e.data["text"] for e in session.events
            if e.type == "steering_delivered"]


def finished_final(session):
    return any(
        e.type == "run_finished" and e.data.get("status") == "final"
        for e in session.events
    )


class TestTerminalLinearizations:
    def test_precancelled_token_never_reaches_the_model(self):
        """A token cancelled before the run starts interrupts at
        step_start; the model is never consulted and no assistant or
        run_finished event is recorded."""
        calls = []

        def generate(messages):
            calls.append(1)
            return FINAL, None

        tok = CancellationToken()
        tok.cancel("operator abort")
        session = memory_session()
        run = run_agent("task", generate, LoopWorkspace(),
                        cancellation=tok, session=session)
        assert run.status == "interrupted"
        assert calls == []
        kinds = [e.type for e in session.events]
        assert "assistant_message" not in kinds
        assert "run_finished" not in kinds
        [intr] = [e for e in session.events if e.type == "interrupted"]
        assert intr.data["phase"] == "step_start"
        assert intr.data["reason"] == "operator abort"

    def test_final_vs_racy_cancel_exactly_one_outcome(self):
        """Race a cancel thread against a model that immediately finals,
        many trials: the run must end 'final' (with a durable
        run_finished) XOR 'interrupted' (with a durable interrupted
        event and NO final) — never both, never neither."""
        outcomes = set()
        for trial in range(60):
            session = memory_session()
            tok = CancellationToken()
            release = threading.Event()

            def generate(messages):
                release.set()
                return FINAL, None

            def cancel():
                release.wait(timeout=5)
                tok.cancel("race")

            t = threading.Thread(target=cancel)
            t.start()
            run = run_agent("task", generate, LoopWorkspace(),
                            session=session, cancellation=tok)
            t.join()
            outcomes.add(run.status)
            assert run.status in ("final", "interrupted")
            has_final = finished_final(session)
            has_intr = any(e.type == "interrupted" for e in session.events)
            if run.status == "final":
                assert has_final and not has_intr
                assert run.final_message == "done"
            else:
                assert has_intr and not has_final
        # The race must be real: over 60 trials both arms should appear.
        # (A scheduler that always serializes one way would hide the bug
        # this test exists for; tolerate it but don't assert impossible.)
        assert outcomes <= {"final", "interrupted"}

    def test_steering_and_cancel_both_pending_at_final(self):
        """Steering queued AND cancellation set when the model finals:
        the final is rejected (steering outranks it), the steering is
        durably delivered, and the cancellation then interrupts the next
        step — the run never produces a final status, yet the steering
        is not lost."""
        session = memory_session()
        tok = CancellationToken()
        handle = SteeringHandle(session)

        def generate(messages):
            # Arrange the collision exactly at the decision point: both
            # arrive while the model is "thinking".
            handle.submit("pivot to Y")
            tok.cancel("user closed the tab")
            return FINAL, None

        run = run_agent("task", generate, LoopWorkspace(),
                        session=session, cancellation=tok)
        assert run.status == "interrupted"
        assert not finished_final(session)
        assert delivered_texts(session) == ["pivot to Y"]
        [intr] = [e for e in session.events if e.type == "interrupted"]
        assert intr.data["phase"] == "step_start"

    def test_steering_after_final_stays_queued_for_resume(self):
        """Steering submitted after a run already finished must remain
        queued (not lost, not retro-delivered); the next run on the same
        session delivers it exactly once before accepting a final."""
        session = memory_session()
        run = run_agent("task", scripted([FINAL]), LoopWorkspace(),
                        session=session)
        assert run.status == "final"
        SteeringHandle(session).submit("one more thing")
        assert [e.data["text"] for e in session.pending_steering()] == [
            "one more thing"
        ]
        assert delivered_texts(session) == []

        run2 = run_agent(
            "follow-up", scripted([FINAL, FINAL]), LoopWorkspace(),
            session=session,
        )
        assert run2.status == "final"
        assert delivered_texts(session) == ["one more thing"]
        # Delivered exactly once in the model-visible conversation too.
        steering_msgs = [m for m in session.messages()
                         if m["content"].startswith("[steering]")]
        assert len(steering_msgs) == 1

    def test_repeated_steering_rejects_two_finals_then_accepts(self):
        """Two rounds of steering, each landing just before a final:
        both finals are rejected, both steerings delivered in order, and
        the third final is accepted."""
        session = memory_session()
        handle = SteeringHandle(session)
        step = [0]

        def generate(messages):
            step[0] += 1
            if step[0] <= 2:
                handle.submit(f"steer-{step[0]}")
            return FINAL, None

        run = run_agent("task", generate, LoopWorkspace(), session=session,
                        limits=AgentLimits(max_steps=8))
        assert run.status == "final"
        assert delivered_texts(session) == ["steer-1", "steer-2"]
        # Each rejection left a durable continue marker.
        notices = [e for e in session.events
                   if e.type == "user_message"
                   and "steering arrived" in e.data["text"]]
        assert len(notices) == 2

    def test_many_threads_steering_exactly_once_each(self):
        """N threads x M steerings during a long run: every submission
        is delivered at most once and queued+delivered accounts for all
        of them — no duplicates, no losses, under real contention."""
        session = memory_session()
        handle = SteeringHandle(session)
        N, M = 4, 5
        start = threading.Barrier(N + 1)

        def submitter(tid):
            start.wait(timeout=5)
            for m in range(M):
                handle.submit(f"t{tid}-m{m}")

        threads = [threading.Thread(target=submitter, args=(tid,))
                   for tid in range(N)]
        for t in threads:
            t.start()

        def generate(messages):
            if not getattr(generate, "released", False):
                generate.released = True
                start.wait(timeout=5)
                time.sleep(0.02)  # let submissions land mid-run
            return FINAL, None

        run = run_agent("task", generate, LoopWorkspace(), session=session,
                        limits=AgentLimits(max_steps=64))
        for t in threads:
            t.join()
        assert run.status == "final"
        expected = {f"t{tid}-m{m}" for tid in range(N) for m in range(M)}
        delivered = delivered_texts(session)
        assert len(delivered) == len(set(delivered)), "duplicate delivery"
        leftover = [e.data["text"] for e in session.pending_steering()]
        assert sorted(delivered + leftover) == sorted(expected)
        # Terminal linearization: if the run finally finished, nothing
        # was pending at the accept point.
        assert leftover == []

    def test_cancel_mid_mutation_leaves_recoverable_open_call(self, tmp_path):
        """Cancellation landing inside a confirmed write interrupts at
        the file_mutation phase AFTER the durable tool_call event; the
        target is untouched, and a resumed session closes the dangling
        call with a synthetic recovered result instead of replaying it."""
        (tmp_path / "f.txt").write_text("v1")
        session_path = tmp_path / ".log.jsonl"
        session = SessionLog(str(session_path))
        tok = CancellationToken()

        def confirm_then_cancel(action):
            tok.cancel("raced mid-confirm")
            return True

        ws = Workspace(
            ToolPolicy(root=str(tmp_path), allow_writes=True),
            confirm=confirm_then_cancel,
        )
        replies = [
            '{"type": "tool", "tool": "read_file", "path": "f.txt"}',
            '{"type": "tool", "tool": "write_file", "path": "f.txt",'
            ' "content": "v2"}',
            FINAL,
        ]
        run = run_agent("edit f", scripted(replies), ws, session=session,
                        cancellation=tok)
        assert run.status == "interrupted"
        assert (tmp_path / "f.txt").read_text() == "v1"
        [intr] = [e for e in session.events if e.type == "interrupted"]
        assert intr.data["phase"] == "file_mutation"
        # The write's tool_call is durable and open.
        open_calls = session.open_tool_calls()
        assert [c.data["tool"] for c in open_calls] == ["write_file"]

        resumed = SessionLog.load(str(session_path))
        added = resumed.recover_unmatched_tool_calls()
        assert len(added) == 1
        assert added[0].data["result"]["error"].startswith("interrupted")
        assert resumed.open_tool_calls() == []
        assert (tmp_path / "f.txt").read_text() == "v1"  # never replayed

    def test_interrupt_recovery_is_idempotent_across_reloads(self, tmp_path):
        """recover_incomplete_turns after an interrupted run adds
        nothing (the interrupted event marks turn progress), and running
        recovery twice appends nothing the second time."""
        session = SessionLog(str(tmp_path / "s.jsonl"))
        tok = CancellationToken()

        def generate(messages):
            tok.cancel("stop")
            return FINAL, None

        run_agent("task", generate, LoopWorkspace(), session=session,
                  cancellation=tok)
        resumed = SessionLog.load(str(tmp_path / "s.jsonl"))
        n0 = len(resumed.events)
        assert resumed.recover_incomplete_turns() == []
        assert len(resumed.events) == n0
        assert resumed.recover_incomplete_turns() == []
        assert len(resumed.events) == n0


class TestBranchingUnderAppend:
    def _store_session(self, tmp_path, n_events=6):
        store = SessionStore(str(tmp_path))
        log = store.create()
        for i in range(n_events):
            log.append("user_message", {"text": f"m{i}"})
        return store, log

    def test_branch_is_prefix_snapshot_under_concurrent_append(self, tmp_path):
        """A writer thread keeps appending while the main thread
        branches at a fixed safe boundary: the branch holds exactly the
        prefix (re-rooted on its own header), its chain validates, and
        the writer never hits a conflict from the branch."""
        store, log = self._store_session(tmp_path)
        cut = log.events[-1].id
        stop = threading.Event()
        errors = []

        def writer():
            i = 0
            while not stop.is_set():
                try:
                    log.append("user_message", {"text": f"late-{i}"})
                except Exception as e:  # pragma: no cover - failure path
                    errors.append(e)
                    return
                i += 1

        t = threading.Thread(target=writer)
        t.start()
        try:
            time.sleep(0.01)
            branch = store.branch(store.session_id(log), cut)
        finally:
            stop.set()
            t.join()
        assert errors == []
        # Branch = header + the prefix, nothing from the live writer.
        texts = [e.data.get("text") for e in branch.events
                 if e.type == "user_message"]
        assert texts == [f"m{i}" for i in range(6)]
        meta = branch.events[0].data
        assert meta["branched_from"] == store.session_id(log)
        assert meta["branch_point"] == cut
        # Both lineages reload cleanly after the dust settles.
        reloaded = store.load(store.session_id(branch))
        assert [e.id for e in reloaded.events] == list(range(len(reloaded.events)))
        orig = store.load(store.session_id(log))
        assert any(e.data.get("text", "").startswith("late-")
                   for e in orig.events if e.type == "user_message")

    def test_branch_preserves_steering_delivery_state(self, tmp_path):
        """Delivered steering stays delivered in the branch (never
        requeued); steering queued but undelivered at the cut stays
        pending in the branch even after the ORIGINAL delivers it."""
        store = SessionStore(str(tmp_path))
        log = store.create()
        log.queue_steering("delivered-before-cut")
        log.deliver_pending_steering()
        log.queue_steering("pending-at-cut")
        cut = log.events[-1].id

        branch = store.branch(store.session_id(log), cut)
        assert [e.data["text"] for e in branch.pending_steering()] == [
            "pending-at-cut"
        ]
        # Original delivers after the branch point; the branch must not
        # observe that delivery.
        log.deliver_pending_steering()
        assert log.pending_steering() == []
        fresh = store.load(store.session_id(branch))
        assert [e.data["text"] for e in fresh.pending_steering()] == [
            "pending-at-cut"
        ]
        # And the branch can deliver independently, exactly once.
        assert fresh.deliver_pending_steering() == ["pending-at-cut"]
        assert fresh.pending_steering() == []

    def test_branch_refuses_open_tool_call_boundary(self, tmp_path):
        """A cut that leaves a tool_call unmatched is rejected and the
        source log is untouched (same byte size, still appendable)."""
        store = SessionStore(str(tmp_path))
        log = store.create()
        log.append("user_message", {"text": "go"})
        call = log.append("tool_call", {"tool": "read_file",
                                        "args": {"path": "x"}})
        size_before = os.path.getsize(log.path)
        with pytest.raises(SessionError, match="open"):
            store.branch(store.session_id(log), call.id)
        assert os.path.getsize(log.path) == size_before
        log.append("tool_result", {"call_id": call.id, "result": {"ok": 1}})
        # After the result, the same boundary becomes legal.
        branch = store.branch(store.session_id(log), log.events[-1].id)
        assert branch.open_tool_calls() == []

    def test_stale_handle_conflict_after_divergence(self, tmp_path):
        """Branch then diverge: appending through a handle loaded BEFORE
        the original advanced must raise SessionConflict and leave the
        on-disk log exactly as the newer writer left it."""
        store, log = self._store_session(tmp_path, n_events=3)
        sid = store.session_id(log)
        branch = store.branch(sid, log.events[-1].id)

        stale = store.load(sid)
        log.append("user_message", {"text": "advanced"})
        with pytest.raises(SessionConflict):
            stale.append("user_message", {"text": "stale write"})
        # Branch is a separate lineage: its appends are unaffected.
        branch.append("user_message", {"text": "branch write"})
        fresh = store.load(sid)
        texts = [e.data.get("text") for e in fresh.events
                 if e.type == "user_message"]
        assert texts[-1] == "advanced"
        assert "stale write" not in texts
        btexts = [e.data.get("text")
                  for e in store.load(store.session_id(branch)).events
                  if e.type == "user_message"]
        assert btexts[-1] == "branch write"

    def test_concurrent_branches_get_distinct_lineages(self, tmp_path):
        """Two threads branching the same session at the same cut must
        produce two distinct, independently valid session files."""
        store, log = self._store_session(tmp_path)
        cut = log.events[-1].id
        sid = store.session_id(log)
        out = {}
        barrier = threading.Barrier(2)

        def do_branch(name):
            barrier.wait(timeout=5)
            out[name] = store.branch(sid, cut)

        ts = [threading.Thread(target=do_branch, args=(n,))
              for n in ("a", "b")]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        ida = store.session_id(out["a"])
        idb = store.session_id(out["b"])
        assert ida != idb
        assert {ida, idb} <= set(store.list())
        for bid in (ida, idb):
            reloaded = store.load(bid)
            texts = [e.data.get("text") for e in reloaded.events
                     if e.type == "user_message"]
            assert texts == [f"m{i}" for i in range(6)]


class TestCompactionInterleavings:
    """Durable compaction racing the steering queue and session
    branching: the compacted view must be reproducible from the log
    alone, and steering must survive compaction un-duplicated."""

    def _long_session(self, tmp_path, n_turns=6):
        from tiny_llm_tpu.agent.context import ContextManager, ContextPolicy

        log = SessionLog(str(tmp_path / "s.jsonl"))
        log.append("user_message", {"text": "the original task " + "x" * 400})
        for i in range(n_turns):
            log.append("assistant_message", {"text": f"thinking {i} " + "y" * 400})
            log.append("user_message", {"text": f"feedback {i} " + "z" * 400})
        cm = ContextManager(
            encode=lambda t: max(1, len(t) // 4),
            policy=ContextPolicy(
                max_tokens=700, reserve_output=100, max_summary_tokens=200,
                max_tool_result_tokens=100, min_recent_turns=2,
            ),
            session_log=log,
        )
        return log, cm

    def test_steering_queued_before_compaction_survives_it(self, tmp_path):
        """Steering queued, THEN a compaction lands (another part of the
        turn pipeline), then delivery: the steering must still be
        pending after compaction, deliver exactly once, and appear in
        the message view AFTER the summary block."""
        log, cm = self._long_session(tmp_path)
        log.queue_steering("switch to the other branch")
        compacted = cm.prepare(log.messages())
        assert cm.compactions == 1
        assert compacted[0]["content"].startswith("[summary of earlier work]")
        # The queue is event-level state; compaction is view-level.
        assert [e.data["text"] for e in log.pending_steering()] == [
            "switch to the other branch"
        ]
        assert log.deliver_pending_steering() == ["switch to the other branch"]
        assert log.pending_steering() == []
        view = log.messages()
        steering = [i for i, m in enumerate(view)
                    if m["content"].startswith("[steering]")]
        summary = [i for i, m in enumerate(view)
                   if m["content"].startswith("[summary of earlier work]")]
        assert len(steering) == 1 and len(summary) == 1
        assert summary[0] < steering[0]

    def test_compacted_view_reproducible_after_reload_and_branch(
        self, tmp_path
    ):
        """The durable compaction event must reproduce the exact
        compacted view from the log alone — including through
        SessionStore.branch into a new lineage."""
        store = SessionStore(str(tmp_path))
        log = store.create()
        log.append("user_message", {"text": "task " + "x" * 300})
        for i in range(5):
            log.append("assistant_message", {"text": f"t{i} " + "y" * 300})
            log.append("user_message", {"text": f"u{i} " + "z" * 300})
        from tiny_llm_tpu.agent.context import ContextManager, ContextPolicy

        cm = ContextManager(
            encode=lambda t: max(1, len(t) // 4),
            policy=ContextPolicy(
                max_tokens=500, reserve_output=80, max_summary_tokens=150,
                max_tool_result_tokens=80, min_recent_turns=2,
            ),
            session_log=log,
        )
        cm.prepare(log.messages())
        assert cm.compactions == 1
        view = log.messages()

        reloaded = store.load(store.session_id(log))
        assert reloaded.messages() == view

        branch = store.branch(store.session_id(log), log.events[-1].id)
        assert branch.messages() == view
        # Divergence after the branch point does not retro-change the view.
        log.append("user_message", {"text": "post-branch"})
        fresh = store.load(store.session_id(branch))
        assert fresh.messages() == view

    def test_summarizer_crash_mid_compaction_falls_back_durably(
        self, tmp_path
    ):
        """A model summarizer that raises mid-compaction must fall back
        to the deterministic summary AND leave a durable failed
        summary_attempt event naming the error."""
        from tiny_llm_tpu.agent.context import ContextManager, ContextPolicy

        log, _ = self._long_session(tmp_path)

        def exploding(messages):
            raise RuntimeError("summarizer OOM")

        cm = ContextManager(
            encode=lambda t: max(1, len(t) // 4),
            policy=ContextPolicy(
                max_tokens=700, reserve_output=100, max_summary_tokens=200,
                max_tool_result_tokens=100, min_recent_turns=2,
            ),
            summarize=exploding,
            session_log=log,
        )
        compacted = cm.prepare(log.messages())
        assert compacted[0]["content"].startswith("[summary of earlier work]")
        attempts = [e for e in log.events if e.type == "summary_attempt"]
        assert [a.data["ok"] for a in attempts] == [False]
        assert "summarizer OOM" in attempts[0].data["error"]
        # The durable compaction carries the FALLBACK summary.
        [comp] = [e for e in log.events if e.type == "compaction"]
        assert comp.data["summary"]


class FaultOnNthCall:
    """Model proxy: delegates everything, raises once on call #n."""

    def __init__(self, model, fault_at: int):
        self._model = model
        self._fault_at = fault_at
        self.calls = 0

    def __getattr__(self, name):
        return getattr(self._model, name)

    def __call__(self, *args, **kwargs):
        self.calls += 1
        if self.calls == self._fault_at:
            raise RuntimeError("injected device fault")
        return self._model(*args, **kwargs)


class TestGenerationFaultInterleavings:
    """GenerationSession under mid-stream faults: the reset-retry path
    must produce byte-identical text to a cold session AND leave the
    cache consistent enough that the NEXT turn warm-reuses."""

    @pytest.fixture(scope="class")
    def gen_model(self):
        from tiny_llm_tpu.models import (
            Qwen3Model,
            random_params,
            tiny_test_config,
        )

        cfg = tiny_test_config(num_hidden_layers=2)
        return Qwen3Model(random_params(cfg, key=0), cfg, max_seq_len=256)

    def _msgs(self, *contents):
        out = [{"role": "user", "content": contents[0]}]
        for i, c in enumerate(contents[1:]):
            out.append(
                {"role": "assistant" if i % 2 == 0 else "user", "content": c}
            )
        return out

    def test_fault_mid_decode_retry_matches_cold_and_reuses_after(
        self, gen_model
    ):
        from tiny_llm_tpu.agent import GenerationSession

        from .utils import FakeTokenizer

        tok = FakeTokenizer()
        convo = self._msgs("hello fault world")
        reference, _ = GenerationSession(gen_model, tok, max_tokens=6)(convo)

        # Call #1 creates the session's first turn; fault partway through
        # ITS decode loop (prefill chunks + a few decode steps in).
        faulty = FaultOnNthCall(gen_model, fault_at=3)
        sess = GenerationSession(faulty, tok, max_tokens=6)
        out, stats = sess(convo)
        assert out == reference
        assert stats.cold_start  # the retry arm ran
        assert faulty.calls > 3  # fault actually fired mid-stream

        # The retried cache must be coherent: the next turn warm-reuses
        # and still matches a cold session on the extended conversation.
        convo2 = self._msgs("hello fault world", out, "continue please")
        out2, stats2 = sess(convo2)
        assert stats2.reused_tokens > 0 and not stats2.cold_start
        ref2, _ = GenerationSession(gen_model, tok, max_tokens=6)(convo2)
        assert out2 == ref2

    def test_fault_during_prefill_chunk_retry_matches_cold(self, gen_model):
        from tiny_llm_tpu.agent import GenerationSession

        from .utils import FakeTokenizer

        tok = FakeTokenizer()
        convo = self._msgs("a rather longer prompt that spans chunks")
        reference, _ = GenerationSession(
            gen_model, tok, max_tokens=4, prefill_chunk=4
        )(convo)
        faulty = FaultOnNthCall(gen_model, fault_at=2)  # second prefill chunk
        sess = GenerationSession(faulty, tok, max_tokens=4, prefill_chunk=4)
        out, stats = sess(convo)
        assert out == reference
        assert stats.cold_start

    def test_paged_prefix_reuse_matches_dense_and_frees_pages(self):
        """Prefix reuse over a PAGED cache: divergent-prefix rewind at
        page granularity must equal the dense session's text, and reset
        must return every page to the pool."""
        from tiny_llm_tpu.agent import GenerationSession
        from tiny_llm_tpu.models import (
            Qwen3Model,
            random_params,
            tiny_test_config,
        )

        from .utils import FakeTokenizer

        cfg = tiny_test_config(num_hidden_layers=2)
        params = random_params(cfg, key=0)
        dense = Qwen3Model(params, cfg, max_seq_len=256)
        paged = Qwen3Model(params, cfg, max_seq_len=256)
        paged.enable_paged_attention(num_pages=40, page_size=16)
        baseline_live = paged.page_pool.live_pages

        tok = FakeTokenizer()
        dsess = GenerationSession(dense, tok, max_tokens=5)
        psess = GenerationSession(paged, tok, max_tokens=5)
        for convo in (
            self._msgs("first topic alpha"),
            self._msgs("first topic beta entirely different tail"),
        ):
            dout, dstats = dsess(convo)
            pout, pstats = psess(convo)
            assert pout == dout
        assert pstats.rewound_tokens > 0  # the divergent turn rewound
        assert paged.page_pool.live_pages > baseline_live
        psess.reset()
        assert paged.page_pool.live_pages == baseline_live


class UndoFixture:
    """Workspace with three committed journaled changes past a
    checkpoint: a.txt/b.txt edited, c.txt created."""

    def __init__(self, tmp_path):
        self.root = tmp_path / "ws"
        self.root.mkdir()
        (self.root / "a.txt").write_text("a-v1")
        (self.root / "b.txt").write_text("b-v1")
        self.log = SessionLog(str(tmp_path / "s.jsonl"))
        self.j = MutationJournal(self.log, str(self.root))
        self.ckpt = self.j.create_checkpoint("before")
        for name, text in (("a.txt", "a-v2"), ("b.txt", "b-v2"),
                           ("c.txt", "created")):
            p = self.root / name
            intent = self.j.record_intent(str(p), text.encode())
            p.write_text(text)
            self.j.commit(intent)
        self.plan = self.j.plan_undo(self.ckpt)

    def crash_after_applying(self, path, text_before):
        """Simulate a crash mid-undo: WAL says the undo started and one
        change began; the file was already restored but never finished."""
        fp = self.plan.fingerprint()
        r = [x for x in self.plan.restores if x.path == path][0]
        self.log.append("undo_started", {
            "checkpoint_id": self.plan.checkpoint_id, "fingerprint": fp,
            "paths": [x.path for x in self.plan.restores], "resumed": False,
        })
        self.log.append("undo_change_started", {
            "change_id": os.urandom(16).hex(), "fingerprint": fp,
            "path": path, "operation": "restore",
            "expected_current": r.expected_current_digest,
            "result_digest": r.before_digest,
        })
        (self.root / path).write_text(text_before)


class TestUndoReentry:
    def test_crash_during_reconciliation_then_second_resume(self, tmp_path):
        """The reconciliation pass itself crashes after durably closing
        ONE recovered change; a second resume must pick up the durable
        resolution without raising 'resolved twice' and finish the whole
        plan."""
        fx = UndoFixture(tmp_path)
        fx.crash_after_applying("a.txt", "a-v1")

        real_append = fx.log.append
        state = {"recovered": 0}

        def crashing_append(type_, data=None):
            ev = real_append(type_, data)
            if type_ == "undo_change_recovered":
                state["recovered"] += 1
                raise RuntimeError("simulated crash after durable append")
            return ev

        fx.log.append = crashing_append
        with pytest.raises(RuntimeError):
            fx.j.apply_undo(fx.plan)
        fx.log.append = real_append
        assert state["recovered"] == 1
        # The durable resolution exists; a second resume must accept it.
        result = fx.j.apply_undo(fx.plan)
        assert result["conflicts"] == []
        assert (fx.root / "a.txt").read_text() == "a-v1"
        assert (fx.root / "b.txt").read_text() == "b-v1"
        assert not (fx.root / "c.txt").exists()
        recovered = [e for e in fx.log.events
                     if e.type == "undo_change_recovered"]
        assert len(recovered) == 1  # not re-resolved on the second pass

    def test_journaled_drift_between_resume_attempts_is_conflict(
        self, tmp_path
    ):
        """A NEW journaled+committed write landing between the crash and
        the resume makes that file a per-change conflict of the resumed
        undo (journaled work is still 'outside THIS undo'), while the
        untouched files restore."""
        fx = UndoFixture(tmp_path)
        fx.crash_after_applying("a.txt", "a-v1")
        # Fresh agent work on b.txt through the journal, fully committed.
        p = fx.root / "b.txt"
        intent = fx.j.record_intent(str(p), b"b-v3")
        p.write_text("b-v3")
        fx.j.commit(intent)

        result = fx.j.apply_undo(fx.plan)
        assert result["conflicts"] == ["b.txt"]
        assert (fx.root / "b.txt").read_text() == "b-v3"  # never clobbered
        assert (fx.root / "a.txt").read_text() == "a-v1"
        assert not (fx.root / "c.txt").exists()

    def test_foreign_events_interleaved_into_undo_wal(self, tmp_path):
        """Steering and user messages appended between the undo WAL
        events (another thread talking to the session) must not confuse
        reconciliation: scanning is type- and fingerprint-keyed."""
        fx = UndoFixture(tmp_path)
        fx.crash_after_applying("a.txt", "a-v1")
        fx.log.queue_steering("status?")
        fx.log.append("user_message", {"text": "how is the undo going"})
        fx.log.deliver_pending_steering()

        result = fx.j.apply_undo(fx.plan)
        assert result["conflicts"] == []
        assert (fx.root / "a.txt").read_text() == "a-v1"
        assert (fx.root / "b.txt").read_text() == "b-v1"
        assert not (fx.root / "c.txt").exists()
        # The foreign conversation survived untouched, exactly once each.
        assert [e.data["text"] for e in fx.log.events
                if e.type == "steering_queued"] == ["status?"]
        assert len([e for e in fx.log.events
                    if e.type == "steering_delivered"]) == 1

    def test_concurrent_steering_during_live_apply(self, tmp_path):
        """A thread hammering steering into the session log WHILE
        apply_undo writes its WAL: both event streams land (no
        interleaving corruption), the undo completes, and a crash-free
        apply leaves zero unresolved starts."""
        fx = UndoFixture(tmp_path)
        stop = threading.Event()
        errs = []

        def chatter():
            i = 0
            while not stop.is_set():
                try:
                    fx.log.queue_steering(f"s{i}")
                except Exception as e:  # pragma: no cover
                    errs.append(e)
                    return
                i += 1

        t = threading.Thread(target=chatter)
        t.start()
        try:
            result = fx.j.apply_undo(fx.plan)
        finally:
            stop.set()
            t.join()
        assert errs == []
        assert result["conflicts"] == []
        assert (fx.root / "a.txt").read_text() == "a-v1"
        # WAL integrity: every started change has exactly one finish.
        starts = [e for e in fx.log.events
                  if e.type == "undo_change_started"]
        finishes = [e for e in fx.log.events
                    if e.type == "undo_change_finished"]
        assert len(starts) == 3
        assert sorted(e.data["change_id"] for e in starts) == sorted(
            e.data["change_id"] for e in finishes
        )
        # Chain ids are still strictly sequential on disk.
        reloaded = SessionLog.load(fx.log.path)
        assert [e.id for e in reloaded.events] == list(
            range(len(reloaded.events))
        )
