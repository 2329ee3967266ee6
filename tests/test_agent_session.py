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
