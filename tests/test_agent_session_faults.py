"""Adversarial session-log tests: torn tails at every byte offset,
duplicated and reordered lines, concurrent writers, injected append
failures, and crash-interrupted store operations.

Models the reference's JSONL durability suites (session.py flock +
head-revalidation + truncate-on-failure; tests_refsol week-4 crash
simulations).  Every test fails when the corresponding recovery in
tiny_llm_tpu/agent/session.py is removed.
"""

import json
import os
import threading

import pytest

from tiny_llm_tpu.agent import SessionLog, SessionStore
from tiny_llm_tpu.agent.session import SessionConflict, SessionError


def make_log(tmp_path, n_events=4):
    path = str(tmp_path / "s.jsonl")
    log = SessionLog(path)
    log.append("user_message", {"text": "task"})
    for i in range(n_events - 1):
        log.append("assistant_message", {"text": f"step {i}"})
    return path, log


class TestTornTail:
    def test_truncation_at_every_byte_of_last_record(self, tmp_path):
        """Simulate power loss at each byte of the final record: load
        must always recover the intact prefix and physically truncate
        the torn bytes."""
        path, log = make_log(tmp_path)
        full = open(path, "rb").read()
        lines = full.splitlines(keepends=True)
        prefix = b"".join(lines[:-1])
        last = lines[-1]
        # cut == len(last)-1 removes only the newline, leaving a complete
        # JSON record — that one legitimately survives; every shorter cut
        # tears the record.
        for cut in range(1, len(last) - 1):
            torn = prefix + last[:cut]
            p = str(tmp_path / f"torn-{cut}.jsonl")
            with open(p, "wb") as f:
                f.write(torn)
            loaded = SessionLog.load(p)
            assert len(loaded.events) == len(lines) - 1
            assert os.path.getsize(p) == len(prefix)

    def test_append_after_torn_tail_recovery(self, tmp_path):
        path, log = make_log(tmp_path)
        with open(path, "r+b") as f:
            size = os.path.getsize(path)
            f.truncate(size - 7)
        loaded = SessionLog.load(path)
        ev = loaded.append("user_message", {"text": "resumed"})
        again = SessionLog.load(path)
        assert again.events[-1].data["text"] == "resumed"
        assert again.events[-1].id == ev.id

    def test_garbage_tail_is_truncated(self, tmp_path):
        path, log = make_log(tmp_path)
        n = len(log.events)
        with open(path, "ab") as f:
            f.write(b"\x00\xff garbage not json\n")
        loaded = SessionLog.load(path)
        assert len(loaded.events) == n

    def test_torn_tail_mid_multibyte_utf8(self, tmp_path):
        path = str(tmp_path / "s.jsonl")
        log = SessionLog(path)
        log.append("user_message", {"text": "ascii"})
        log.append("user_message", {"text": "emoji \U0001f680 payload"})
        raw = open(path, "rb").read()
        # Cut inside the 4-byte emoji sequence of the LAST record.
        cut = raw.rindex(b"\xf0\x9f\x9a\x80") + 2
        with open(path, "r+b") as f:
            f.truncate(cut)
        loaded = SessionLog.load(path)
        assert len(loaded.events) == 1
        assert loaded.events[0].data["text"] == "ascii"


class TestCorruptedChain:
    def test_duplicated_line_rejected(self, tmp_path):
        """A duplicated record breaks the id chain — that is tampering
        or a filesystem bug, not a torn tail, and must be an error."""
        path, log = make_log(tmp_path)
        lines = open(path, "rb").read().splitlines(keepends=True)
        with open(path, "wb") as f:
            f.write(b"".join(lines) + lines[-1])
        with pytest.raises(SessionError, match="chain"):
            SessionLog.load(path)

    def test_missing_middle_record_rejected(self, tmp_path):
        path, log = make_log(tmp_path)
        lines = open(path, "rb").read().splitlines(keepends=True)
        with open(path, "wb") as f:
            f.write(b"".join(lines[:1] + lines[2:]))
        with pytest.raises(SessionError, match="chain"):
            SessionLog.load(path)

    def test_reordered_records_rejected(self, tmp_path):
        path, log = make_log(tmp_path)
        lines = open(path, "rb").read().splitlines(keepends=True)
        with open(path, "wb") as f:
            f.write(b"".join([lines[0], lines[2], lines[1], lines[3]]))
        with pytest.raises(SessionError, match="chain"):
            SessionLog.load(path)

    def test_id_edited_in_place_rejected(self, tmp_path):
        path, log = make_log(tmp_path)
        lines = open(path, "rb").read().splitlines(keepends=True)
        rec = json.loads(lines[2])
        rec["id"] = 99
        lines[2] = (json.dumps(rec) + "\n").encode()
        with open(path, "wb") as f:
            f.write(b"".join(lines))
        with pytest.raises(SessionError, match="chain"):
            SessionLog.load(path)


class TestConcurrentWriters:
    def test_second_writer_detected_not_interleaved(self, tmp_path):
        """Two handles on one session file: after A appends, B's stale
        head must be rejected (never silently interleaved)."""
        path, a = make_log(tmp_path)
        b = SessionLog.load(path)
        a.append("user_message", {"text": "from A"})
        with pytest.raises(SessionConflict):
            b.append("user_message", {"text": "from B"})
        # The file holds only A's history.
        final = SessionLog.load(path)
        assert [e.data.get("text") for e in final.events][-1] == "from A"

    def test_external_append_detected(self, tmp_path):
        path, log = make_log(tmp_path)
        with open(path, "ab") as f:
            f.write(b'{"id": 999}\n')
        with pytest.raises(SessionConflict):
            log.append("user_message", {"text": "x"})

    def test_threaded_appends_on_one_handle_produce_valid_chain(self, tmp_path):
        """Concurrent appends through ONE handle must serialize into a
        loadable, gap-free chain (whatever the interleaving)."""
        path = str(tmp_path / "s.jsonl")
        log = SessionLog(path)
        log.append("user_message", {"text": "start"})
        errors = []
        lock = threading.Lock()

        def writer(tag):
            for i in range(20):
                try:
                    with lock:
                        log.append("assistant_message",
                                   {"text": f"{tag}-{i}"})
                except Exception as e:  # pragma: no cover
                    errors.append(e)

        threads = [threading.Thread(target=writer, args=(t,)) for t in "abcd"]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert errors == []
        loaded = SessionLog.load(path)
        assert len(loaded.events) == 1 + 80
        ids = [e.id for e in loaded.events]
        assert ids == list(range(len(ids)))


class TestAppendFailureInjection:
    def test_short_write_leaves_memory_consistent(self, tmp_path, monkeypatch):
        """If os.write raises mid-append, the in-memory event list must
        NOT contain the event, and the next append must succeed with the
        same id (no gap)."""
        path, log = make_log(tmp_path, n_events=2)
        n_before = len(log.events)
        real_write = os.write
        blow = {"armed": True}

        def failing_write(fd, data):
            if blow["armed"] and b"doomed" in data:
                raise OSError(28, "No space left on device")
            return real_write(fd, data)

        monkeypatch.setattr(os, "write", failing_write)
        with pytest.raises(OSError):
            log.append("user_message", {"text": "doomed"})
        blow["armed"] = False
        assert len(log.events) == n_before
        ev = log.append("user_message", {"text": "healthy"})
        assert ev.id == n_before
        loaded = SessionLog.load(path)
        assert [e.data.get("text") for e in loaded.events][-1] == "healthy"

    def test_partial_write_then_crash_recovers_on_load(self, tmp_path, monkeypatch):
        """A write that lands only some bytes before the crash is a torn
        tail for the next process: load truncates it and the chain
        continues."""
        path, log = make_log(tmp_path, n_events=2)
        real_write = os.write

        def partial_write(fd, data):
            if b"doomed" in data:
                real_write(fd, data[: len(data) // 2])
                raise OSError(5, "I/O error after partial write")
            return real_write(fd, data)

        monkeypatch.setattr(os, "write", partial_write)
        with pytest.raises(OSError):
            log.append("user_message", {"text": "doomed"})
        monkeypatch.undo()
        loaded = SessionLog.load(path)
        assert len(loaded.events) == 2
        ev = loaded.append("user_message", {"text": "after crash"})
        assert ev.id == 2

    def test_same_handle_survives_partial_write(self, tmp_path, monkeypatch):
        """The SAME handle must keep appending after a partial write —
        only the append-time rollback (truncate to the validated head)
        makes that possible; without it the leaked half-record makes
        every later append see a foreign head (SessionConflict)."""
        path, log = make_log(tmp_path, n_events=2)
        real_write = os.write

        def partial_write(fd, data):
            if b"doomed" in data:
                real_write(fd, data[: len(data) // 2])
                raise OSError(5, "I/O error after partial write")
            return real_write(fd, data)

        monkeypatch.setattr(os, "write", partial_write)
        with pytest.raises(OSError):
            log.append("user_message", {"text": "doomed"})
        monkeypatch.undo()
        ev = log.append("user_message", {"text": "healthy"})
        assert ev.id == 2
        loaded = SessionLog.load(path)
        assert [e.data.get("text") for e in loaded.events][-1] == "healthy"


class TestToolResultInvariants:
    def test_tool_result_must_close_open_call(self, tmp_path):
        path = str(tmp_path / "s.jsonl")
        log = SessionLog(path)
        with pytest.raises(SessionError, match="open tool_call"):
            log.append("tool_result", {"call_id": 7, "result": {}})

    def test_double_close_rejected(self, tmp_path):
        path = str(tmp_path / "s.jsonl")
        log = SessionLog(path)
        call = log.append("tool_call", {"tool": "read_file", "args": {}})
        log.append("tool_result", {"call_id": call.id, "result": {}})
        with pytest.raises(SessionError, match="open tool_call"):
            log.append("tool_result", {"call_id": call.id, "result": {}})

    def test_steering_delivery_must_match_queue(self, tmp_path):
        path = str(tmp_path / "s.jsonl")
        log = SessionLog(path)
        with pytest.raises(SessionError, match="queued"):
            log.append("steering_delivered", {"steering_id": 3, "text": "x"})
        q = log.queue_steering("go left")
        log.append("steering_delivered", {"steering_id": q.id, "text": "go left"})
        with pytest.raises(SessionError, match="queued"):
            log.append("steering_delivered", {"steering_id": q.id, "text": "again"})


class TestStoreCrashRecovery:
    def test_interrupted_create_leaves_no_visible_session(self, tmp_path, monkeypatch):
        """Crash between temp-write and rename: list() must not show the
        half-created session."""
        store = SessionStore(str(tmp_path))
        real_rename = os.rename

        def failing_rename(src, dst, **kw):
            if ".tmp-" in str(src):
                raise OSError(5, "I/O error")
            return real_rename(src, dst, **kw)

        monkeypatch.setattr(os, "rename", failing_rename)
        with pytest.raises(OSError):
            store.create()
        monkeypatch.undo()
        assert store.list() == []
        # The store still works afterwards.
        log = store.create()
        assert len(store.list()) == 1

    def test_branch_rejects_open_tool_call_boundary(self, tmp_path):
        store = SessionStore(str(tmp_path))
        log = store.create()
        log.append("user_message", {"text": "t"})
        call = log.append("tool_call", {"tool": "read_file", "args": {}})
        sid = store.session_id(log)
        with pytest.raises(SessionError, match="open"):
            store.branch(sid, call.id)
        log.append("tool_result", {"call_id": call.id, "result": {}})
        branched = store.branch(sid, call.id + 1)
        types = [e.type for e in branched.events]
        assert "tool_call" in types and "tool_result" in types

    def test_branch_of_torn_source_uses_recovered_prefix(self, tmp_path):
        store = SessionStore(str(tmp_path))
        log = store.create()
        log.append("user_message", {"text": "t"})
        log.append("assistant_message", {"text": "a"})
        sid = store.session_id(log)
        with open(log.path, "ab") as f:
            f.write(b'{"broken')
        branched = store.branch(sid, 2)
        assert [e.type for e in branched.events][-1] == "assistant_message"

    def test_latest_resumes_newest_lineage(self, tmp_path):
        store = SessionStore(str(tmp_path))
        first = store.create()
        second = store.create()
        second.append("user_message", {"text": "newest"})
        resumed = store.latest()
        assert resumed.events[-1].data.get("text") == "newest"


# ---------------------------------------------------------------------------
# Load-time cross-link validation: a log whose id/parent CHAIN is intact
# can still carry semantically impossible links (duplicate deliveries,
# results closing nothing). Append-time validation never produced such a
# log, so its presence is corruption or tampering — load fails closed.
# Reference analog: day-6 load_rejects_out_of_order_and_duplicate_
# {steering,assistant}_links (tests_refsol/test_week_4_day_6.py).
# Mutation-verified: removing SessionLog._validate_links from load()
# passes every rejection test below (the chain check alone cannot see
# these).
# ---------------------------------------------------------------------------


def _write_chain(path, rows):
    """Write a chain-valid JSONL from (type, data) rows."""
    lines = []
    for i, (typ, data) in enumerate(rows):
        lines.append(json.dumps({
            "id": i, "ts": 1000.0 + i, "type": typ,
            "parent": i - 1 if i else None, "data": data,
        }))
    path.write_text("\n".join(lines) + "\n")
    return str(path)


class TestLoadLinkValidation:
    def test_duplicate_steering_delivery_rejected(self, tmp_path):
        p = _write_chain(tmp_path / "s.jsonl", [
            ("user", {"text": "hi"}),
            ("steering_queued", {"text": "go left"}),
            ("steering_delivered", {"steering_id": 1}),
            ("steering_delivered", {"steering_id": 1}),
        ])
        with pytest.raises(SessionError, match="steering_delivered"):
            SessionLog.load(p)

    def test_delivery_before_queue_rejected(self, tmp_path):
        p = _write_chain(tmp_path / "s.jsonl", [
            ("user", {"text": "hi"}),
            ("steering_delivered", {"steering_id": 2}),
            ("steering_queued", {"text": "go left"}),
        ])
        with pytest.raises(SessionError, match="steering_delivered"):
            SessionLog.load(p)

    def test_result_closing_closed_call_rejected(self, tmp_path):
        p = _write_chain(tmp_path / "s.jsonl", [
            ("user", {"text": "hi"}),
            ("tool_call", {"name": "read", "args": {}}),
            ("tool_result", {"call_id": 1, "output": "a"}),
            ("tool_result", {"call_id": 1, "output": "b"}),
        ])
        with pytest.raises(SessionError, match="tool_result"):
            SessionLog.load(p)

    def test_result_with_unknown_call_rejected(self, tmp_path):
        p = _write_chain(tmp_path / "s.jsonl", [
            ("user", {"text": "hi"}),
            ("tool_result", {"call_id": 99, "output": "ghost"}),
        ])
        with pytest.raises(SessionError, match="tool_result"):
            SessionLog.load(p)

    def test_valid_links_load_and_continue(self, tmp_path):
        """The same event types in a legal order load fine, and the
        loaded handle appends (proof the validation is not too eager)."""
        p = _write_chain(tmp_path / "s.jsonl", [
            ("user", {"text": "hi"}),
            ("steering_queued", {"text": "go left"}),
            ("tool_call", {"name": "read", "args": {}}),
            ("tool_result", {"call_id": 2, "output": "a"}),
            ("steering_delivered", {"steering_id": 1}),
        ])
        log = SessionLog.load(p)
        assert len(log.events) == 5
        log.append("assistant", {"text": "done"})
        assert SessionLog.load(p).events[-1].type == "assistant"

    def test_recovered_gap_result_still_loads(self, tmp_path):
        """The synthetic gap-closing tool_result (recovered=True, no
        call_id) is legal output of recover_incomplete_turns and must
        keep loading."""
        p = _write_chain(tmp_path / "s.jsonl", [
            ("user", {"text": "hi"}),
            ("assistant", {"text": "let me check"}),
            ("tool_result", {"recovered": True, "output": "interrupted"}),
        ])
        assert len(SessionLog.load(p).events) == 3
