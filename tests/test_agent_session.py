"""Session log + store + mutation journal tests (reference week-4 day-3/5
suites): durability, crash recovery via truncated JSONL, WAL semantics,
checkpoint/undo."""

import json
import os

import pytest

from tiny_llm_tpu.agent import (
    MutationJournal,
    SessionLog,
    SessionStore,
    memory_session,
)
from tiny_llm_tpu.agent.session import SessionConflict, SessionError


@pytest.fixture
def log(tmp_path):
    return SessionLog(str(tmp_path / "s.jsonl"))


class TestSessionLog:
    def test_append_chain(self, log):
        a = log.append("user_message", {"text": "hi"})
        b = log.append("assistant_message", {"text": "yo"})
        assert a.id == 0 and b.id == 1 and b.parent == 0

    def test_persists_and_reloads(self, log):
        log.append("user_message", {"text": "hi"})
        log.append("assistant_message", {"text": "yo"})
        again = SessionLog.load(log.path)
        assert [e.type for e in again.events] == ["user_message", "assistant_message"]
        assert again.messages() == [
            {"role": "user", "content": "hi"},
            {"role": "assistant", "content": "yo"},
        ]

    def test_torn_tail_truncated_on_load(self, log):
        log.append("user_message", {"text": "hi"})
        with open(log.path, "a") as f:
            f.write('{"id": 1, "ts": 1.0, "type": "assist')  # torn write
        again = SessionLog.load(log.path)
        assert len(again.events) == 1
        # The truncated file accepts new appends cleanly.
        again.append("assistant_message", {"text": "recovered"})
        final = SessionLog.load(log.path)
        assert [e.type for e in final.events] == ["user_message", "assistant_message"]

    def test_broken_chain_rejected(self, log):
        log.append("user_message", {"text": "hi"})
        with open(log.path, "a") as f:
            f.write(json.dumps({"id": 5, "ts": 1.0, "type": "x",
                                "parent": 0, "data": {}}) + "\n")
        with pytest.raises(SessionError):
            SessionLog.load(log.path)

    def test_concurrent_writer_detected(self, log):
        log.append("user_message", {"text": "hi"})
        other = SessionLog.load(log.path)
        other.append("assistant_message", {"text": "sneak"})
        with pytest.raises(SessionConflict):
            log.append("assistant_message", {"text": "mine"})

    def test_tool_result_requires_open_call(self, log):
        with pytest.raises(SessionError):
            log.append("tool_result", {"call_id": 99, "result": {}})
        call = log.append("tool_call", {"tool": "read_file", "args": {}})
        log.append("tool_result", {"call_id": call.id, "result": {"ok": 1}})
        # A second close of the same call is rejected.
        with pytest.raises(SessionError):
            log.append("tool_result", {"call_id": call.id, "result": {}})

    def test_recover_unmatched_tool_calls(self, log):
        log.append("tool_call", {"tool": "read_file", "args": {"path": "x"}})
        added = log.recover_unmatched_tool_calls()
        assert len(added) == 1
        assert added[0].data["recovered"] is True
        assert not log.open_tool_calls()

    def test_steering_queue_and_delivery(self, log):
        log.queue_steering("focus on tests")
        log.queue_steering("also update docs")
        assert len(log.pending_steering()) == 2
        texts = log.deliver_pending_steering()
        assert texts == ["focus on tests", "also update docs"]
        assert not log.pending_steering()
        # Delivered steering shows up in the conversation.
        assert any("[steering]" in m["content"] for m in log.messages())

    def test_memory_session_has_no_file(self):
        log = memory_session()
        log.append("user_message", {"text": "x"})
        assert log.path is None and len(log.events) == 1


class TestSessionStore:
    def test_create_load_latest(self, tmp_path):
        store = SessionStore(str(tmp_path))
        a = store.create({"tag": "first"})
        b = store.create({"tag": "second"})
        assert store.list() == sorted(store.list())
        latest = store.latest()
        assert latest.events[0].data.get("tag") == "second"
        loaded = store.load(store.session_id(a))
        assert loaded.events[0].data["tag"] == "first"

    def test_branch_copies_valid_prefix(self, tmp_path):
        store = SessionStore(str(tmp_path))
        src = store.create()
        src.append("user_message", {"text": "task"})
        call = src.append("tool_call", {"tool": "read_file", "args": {}})
        src.append("tool_result", {"call_id": call.id, "result": {"ok": 1}})
        src.append("assistant_message", {"text": "done"})
        branch = store.branch(store.session_id(src), call.id + 1)
        types = [e.type for e in branch.events]
        assert types[0] == "session_created"
        assert "tool_result" in types and "assistant_message" not in types

    def test_branch_rejects_open_tool_call_boundary(self, tmp_path):
        store = SessionStore(str(tmp_path))
        src = store.create()
        src.append("user_message", {"text": "task"})
        call = src.append("tool_call", {"tool": "read_file", "args": {}})
        with pytest.raises(SessionError):
            store.branch(store.session_id(src), call.id)

    def test_bad_session_id_rejected(self, tmp_path):
        store = SessionStore(str(tmp_path))
        with pytest.raises(SessionError):
            store.load("../evil")


class TestMutationJournal:
    def test_wal_intent_before_commit(self, tmp_path):
        log = memory_session()
        j = MutationJournal(log, str(tmp_path))
        target = tmp_path / "f.txt"
        target.write_text("old")
        # journal must be able to restore "old": intent snapshots it.
        intent = j.record_intent(str(target), b"new")
        assert intent.data["before_content"] == {"text": "old"}
        target.write_text("new")
        j.commit(intent)
        types = [e.type for e in log.events]
        assert types == ["mutation_intent", "mutation_committed"]

    def test_commit_verifies_fingerprint(self, tmp_path):
        log = memory_session()
        j = MutationJournal(log, str(tmp_path))
        target = tmp_path / "f.txt"
        target.write_text("old")
        intent = j.record_intent(str(target), b"new")
        target.write_text("something else")
        from tiny_llm_tpu.agent.recovery import RecoveryError

        with pytest.raises(RecoveryError):
            j.commit(intent)

    def test_recover_pending_classification(self, tmp_path):
        log = memory_session()
        j = MutationJournal(log, str(tmp_path))
        for name, final in [("a", "new"), ("b", "old"), ("c", "mangled")]:
            f = tmp_path / name
            f.write_text("old")
            j.record_intent(str(f), b"new")
            f.write_text(final)  # simulate crash at various points
        results = {r["path"]: r["status"] for r in j.recover_pending()}
        assert results == {"a": "committed", "b": "not_applied", "c": "conflict"}

    def test_checkpoint_undo_roundtrip(self, tmp_path):
        log = memory_session()
        j = MutationJournal(log, str(tmp_path))
        f = tmp_path / "code.py"
        f.write_text("v1")
        cp = j.create_checkpoint("before-change")
        # Two journaled writes after the checkpoint.
        for content in ("v2", "v3"):
            intent = j.record_intent(str(f), content.encode())
            f.write_text(content)
            j.commit(intent)
        g = tmp_path / "new.txt"
        intent = j.record_intent(str(g), b"created")
        g.write_text("created")
        j.commit(intent)

        plan = j.plan_undo(cp)
        assert {r.path for r in plan.restores} == {"code.py", "new.txt"}
        res = j.apply_undo(plan)
        assert res["status"] == "ok"
        assert f.read_text() == "v1"
        assert not g.exists()

    def test_undo_refuses_on_drift(self, tmp_path):
        log = memory_session()
        j = MutationJournal(log, str(tmp_path))
        f = tmp_path / "x.txt"
        f.write_text("v1")
        cp = j.create_checkpoint("cp")
        intent = j.record_intent(str(f), b"v2")
        f.write_text("v2")
        j.commit(intent)
        plan = j.plan_undo(cp)
        f.write_text("drifted outside the journal")
        from tiny_llm_tpu.agent.recovery import RecoveryError

        with pytest.raises(RecoveryError):
            j.apply_undo(plan)

    def test_plan_warns_on_commands_and_external_edits(self, tmp_path):
        log = memory_session()
        j = MutationJournal(log, str(tmp_path))
        f = tmp_path / "x.txt"
        f.write_text("v1")
        cp = j.create_checkpoint("cp")
        intent = j.record_intent(str(f), b"v2")
        f.write_text("v2")
        j.commit(intent)
        log.append("command_started", {"argv": ["make"]})
        f.write_text("external")
        plan = j.plan_undo(cp)
        assert any("command ran" in w for w in plan.warnings)
        assert any("outside the journal" in w for w in plan.warnings)


class TestIncompleteTurnRecovery:
    """reference session.py:497-553 — crash gaps after a durable
    assistant message are closed with synthetic error results."""

    def test_dangling_assistant_message_is_closed(self, log):
        log.append("user_message", {"text": "task"})
        log.append("assistant_message", {"text": '{"action": "tool", ...}'})
        added = log.recover_incomplete_turns()
        assert len(added) == 1
        ev = added[0]
        assert ev.type == "tool_result" and ev.data["recovered"]
        assert ev.data["assistant_event_id"] == 1
        # Idempotent: a second recovery pass adds nothing.
        assert log.recover_incomplete_turns() == []

    def test_completed_turns_not_flagged(self, log):
        log.append("user_message", {"text": "task"})
        a = log.append("assistant_message", {"text": "act"})
        call = log.append("tool_call", {"tool": "read_file", "args": {}})
        log.append("tool_result", {"call_id": call.id, "result": {}})
        log.append("assistant_message", {"text": "done"})
        log.append("run_finished", {"status": "final", "message": "done"})
        assert log.recover_incomplete_turns() == []

    def test_gap_before_new_run(self, log):
        log.append("user_message", {"text": "t1"})
        log.append("assistant_message", {"text": "a1"})
        log.append("run_started", {"task": "t2"})  # crash happened before t2
        added = log.recover_incomplete_turns()
        assert len(added) == 1 and added[0].data["assistant_event_id"] == 1

    def test_protocol_error_counts_as_progress(self, log):
        log.append("user_message", {"text": "t"})
        log.append("assistant_message", {"text": "not json"})
        log.append("protocol_error", {"error": "bad", "count": 1})
        assert log.recover_incomplete_turns() == []

    def test_unmatched_tool_call_also_closed(self, log):
        log.append("user_message", {"text": "t"})
        log.append("assistant_message", {"text": "act"})
        log.append("tool_call", {"tool": "run_command", "args": {}})
        added = log.recover_incomplete_turns()
        assert len(added) == 1
        assert added[0].data["call_id"] == 2


class TestProjectInstructions:
    def test_snapshot_and_messages(self, log, tmp_path):
        (tmp_path / "AGENTS.md").write_text("Always run the tests.")
        ev = log.snapshot_project_instructions(str(tmp_path))
        assert ev.type == "project_instructions"
        assert ev.data["sha256"]
        log.append("user_message", {"text": "task"})
        msgs = log.messages()
        assert "Always run the tests." in msgs[0]["content"]
        assert msgs[1]["content"] == "task"
        # Later edits to the file do NOT change the snapshot.
        (tmp_path / "AGENTS.md").write_text("changed")
        assert "Always run the tests." in log.messages()[0]["content"]

    def test_snapshot_survives_compaction(self, log, tmp_path):
        (tmp_path / "AGENTS.md").write_text("KEEP ME")
        log.snapshot_project_instructions(str(tmp_path))
        log.append("user_message", {"text": "task"})
        log.append("compaction", {"summary": "s", "kept_messages": []})
        assert "KEEP ME" in log.messages()[0]["content"]

    def test_missing_file_is_noop(self, log, tmp_path):
        assert log.snapshot_project_instructions(str(tmp_path)) is None

    def test_idempotent_per_session(self, log, tmp_path):
        (tmp_path / "AGENTS.md").write_text("x")
        assert log.snapshot_project_instructions(str(tmp_path)) is not None
        assert log.snapshot_project_instructions(str(tmp_path)) is None

    def test_symlink_rejected(self, log, tmp_path):
        (tmp_path / "real.md").write_text("x")
        os.symlink(tmp_path / "real.md", tmp_path / "AGENTS.md")
        with pytest.raises(SessionError):
            log.snapshot_project_instructions(str(tmp_path))

    def test_oversized_rejected(self, log, tmp_path):
        (tmp_path / "AGENTS.md").write_text("x" * (64 * 1024 + 1))
        with pytest.raises(SessionError):
            log.snapshot_project_instructions(str(tmp_path))


class TestResumableUndo:
    """reference recovery.py:853-1030 — undo is itself WAL'd; a crash
    mid-undo resumes without re-applying completed restores, and
    unexpected content is quarantined, never destroyed."""

    def _setup(self, tmp_path):
        from tiny_llm_tpu.agent import MutationJournal

        root = tmp_path / "ws"
        root.mkdir()
        (root / "a.txt").write_text("a-original")
        (root / "b.txt").write_text("b-original")
        log = SessionLog(str(tmp_path / "s.jsonl"))
        j = MutationJournal(log, str(root))
        ckpt = j.create_checkpoint("before")
        for name, text in (("a.txt", "a-new"), ("b.txt", "b-new")):
            p = root / name
            intent = j.record_intent(str(p), text.encode())
            p.write_text(text)
            j.commit(intent)
        return root, log, j, ckpt

    @staticmethod
    def _change_started_event(plan, path):
        """The event the journal itself writes just before applying a
        change — used here to simulate a crash mid-undo."""
        r = [x for x in plan.restores if x.path == path][0]
        return {
            "change_id": os.urandom(16).hex(),
            "fingerprint": plan.fingerprint(),
            "path": path,
            "operation": "restore" if r.before_exists else "remove",
            "expected_current": r.expected_current_digest,
            "result_digest": r.before_digest if r.before_exists else None,
        }

    def test_resume_skips_completed_restores(self, tmp_path):
        root, log, j, ckpt = self._setup(tmp_path)
        plan = j.plan_undo(ckpt)
        # Simulate a crash: the undo started, a.txt was fully restored
        # (journaled), b.txt was not touched.
        log.append("undo_started", {"checkpoint_id": plan.checkpoint_id,
                                    "fingerprint": plan.fingerprint()})
        started = self._change_started_event(plan, "a.txt")
        log.append("undo_change_started", started)
        (root / "a.txt").write_text("a-original")
        log.append("undo_change_finished",
                   {"change_id": started["change_id"],
                    "fingerprint": plan.fingerprint(),
                    "path": "a.txt", "operation": "restore"})

        result = j.apply_undo(plan)
        assert result["status"] == "resumed"
        assert result["skipped"] == 1 and result["applied"] == 1
        assert (root / "a.txt").read_text() == "a-original"
        assert (root / "b.txt").read_text() == "b-original"

    def test_resume_detects_applied_but_unjournaled(self, tmp_path):
        root, log, j, ckpt = self._setup(tmp_path)
        plan = j.plan_undo(ckpt)
        # Crash AFTER the file write but BEFORE undo_change_finished.
        log.append("undo_started", {"checkpoint_id": plan.checkpoint_id,
                                    "fingerprint": plan.fingerprint()})
        log.append("undo_change_started",
                   self._change_started_event(plan, "a.txt"))
        (root / "a.txt").write_text("a-original")

        result = j.apply_undo(plan)
        assert result["status"] == "resumed"
        assert result["skipped"] == 1 and result["applied"] == 1
        types = [e.type for e in log.events]
        assert "undo_change_recovered" in types
        rec = [e for e in log.events if e.type == "undo_change_recovered"][0]
        assert rec.data["status"] == "applied"

    def test_fresh_apply_still_refuses_drift(self, tmp_path):
        root, log, j, ckpt = self._setup(tmp_path)
        plan = j.plan_undo(ckpt)
        (root / "a.txt").write_text("drifted")
        from tiny_llm_tpu.agent.recovery import RecoveryError

        with pytest.raises(RecoveryError):
            j.apply_undo(plan)

    def test_removal_quarantines_unexpected_content(self, tmp_path):
        from tiny_llm_tpu.agent import MutationJournal

        root = tmp_path / "ws"
        root.mkdir()
        log = SessionLog(str(tmp_path / "s.jsonl"))
        j = MutationJournal(log, str(root))
        ckpt = j.create_checkpoint("before")
        # A file CREATED after the checkpoint: undo removes it.
        p = root / "new.txt"
        intent = j.record_intent(str(p), b"created")
        p.write_text("created")
        j.commit(intent)
        plan = j.plan_undo(ckpt)
        # Race: the file changes between preflight... simulate by patching
        # _current_digest ordering — simplest: drive _remove_exact directly.
        p.write_text("surprise edit")
        import hashlib

        j._remove_exact(str(p), "new.txt",
                        hashlib.sha256(b"created").hexdigest())
        assert not p.exists()
        qdir = root / ".tiny-llm-tpu" / "quarantine"
        files = list(qdir.iterdir())
        assert len(files) == 1 and files[0].read_text() == "surprise edit"
        assert any(e.type == "undo_quarantined" for e in log.events)
