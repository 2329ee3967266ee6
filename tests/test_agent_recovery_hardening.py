"""Adversarial undo/recovery tests: a full crash matrix over the
per-change undo WAL, event-stream tampering detection, external
modification conflicts, and quarantine preservation.

Models the reference's resumable-undo reconciliation
(recovery.py:853-1030).  The simulated crashes replay exactly the event
prefixes the journal itself writes; every test fails when the
reconciliation, the per-change fingerprint validation, or the
quarantine path is removed.
"""

import hashlib
import os

import pytest

from tiny_llm_tpu.agent import MutationJournal, SessionLog, memory_session
from tiny_llm_tpu.agent.recovery import RecoveryError


def sha(text: str) -> str:
    return hashlib.sha256(text.encode()).hexdigest()


class Fixture:
    """A workspace with three journaled changes past a checkpoint:
    a.txt and b.txt edited, c.txt created."""

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

    def restore_of(self, path):
        return [r for r in self.plan.restores if r.path == path][0]

    def started_event(self, path):
        r = self.restore_of(path)
        return {
            "change_id": os.urandom(16).hex(),
            "fingerprint": self.plan.fingerprint(),
            "path": path,
            "operation": "restore" if r.before_exists else "remove",
            "expected_current": r.expected_current_digest,
            "result_digest": r.before_digest if r.before_exists else None,
        }

    def crash_open_undo(self):
        self.log.append("undo_started",
                        {"checkpoint_id": self.plan.checkpoint_id,
                         "fingerprint": self.plan.fingerprint()})


class TestCrashMatrix:
    """One test per crash point in the per-change undo protocol."""

    def test_crash_after_undo_started_only(self, tmp_path):
        f = Fixture(tmp_path)
        f.crash_open_undo()
        result = f.j.apply_undo(f.plan)
        assert result["status"] == "resumed"
        assert result["applied"] == 3 and result["conflicts"] == []
        assert (f.root / "a.txt").read_text() == "a-v1"
        assert (f.root / "b.txt").read_text() == "b-v1"
        assert not (f.root / "c.txt").exists()

    def test_crash_after_change_started_before_write(self, tmp_path):
        f = Fixture(tmp_path)
        f.crash_open_undo()
        f.log.append("undo_change_started", f.started_event("a.txt"))
        result = f.j.apply_undo(f.plan)
        assert result["status"] == "resumed"
        # a.txt was classified not_applied and redone.
        assert result["applied"] == 3
        assert (f.root / "a.txt").read_text() == "a-v1"
        rec = [e for e in f.log.events if e.type == "undo_change_recovered"]
        assert rec and rec[0].data["status"] == "not_applied"

    def test_crash_after_write_before_finished(self, tmp_path):
        f = Fixture(tmp_path)
        f.crash_open_undo()
        f.log.append("undo_change_started", f.started_event("a.txt"))
        (f.root / "a.txt").write_text("a-v1")  # the restore landed
        result = f.j.apply_undo(f.plan)
        assert result["status"] == "resumed"
        assert result["applied"] == 2 and result["skipped"] == 1
        rec = [e for e in f.log.events if e.type == "undo_change_recovered"]
        assert rec[0].data["status"] == "applied"
        assert (f.root / "b.txt").read_text() == "b-v1"
        assert not (f.root / "c.txt").exists()

    def test_crash_after_change_finished(self, tmp_path):
        f = Fixture(tmp_path)
        f.crash_open_undo()
        started = f.started_event("a.txt")
        f.log.append("undo_change_started", started)
        (f.root / "a.txt").write_text("a-v1")
        f.log.append("undo_change_finished",
                     {"change_id": started["change_id"],
                      "fingerprint": f.plan.fingerprint(),
                      "path": "a.txt", "operation": "restore"})
        result = f.j.apply_undo(f.plan)
        assert result["status"] == "resumed"
        assert result["applied"] == 2 and result["skipped"] == 1
        # a.txt was NOT re-restored (no second undo_change_started for it
        # beyond the crash simulation).
        starts = [e for e in f.log.events
                  if e.type == "undo_change_started"
                  and e.data.get("path") == "a.txt"]
        assert len(starts) == 1

    def test_crash_mid_remove_of_created_file(self, tmp_path):
        f = Fixture(tmp_path)
        f.crash_open_undo()
        started = f.started_event("c.txt")
        assert started["operation"] == "remove"
        f.log.append("undo_change_started", started)
        os.unlink(f.root / "c.txt")  # removal landed, finished never written
        result = f.j.apply_undo(f.plan)
        assert result["status"] == "resumed"
        assert result["skipped"] == 1 and result["applied"] == 2
        rec = [e for e in f.log.events if e.type == "undo_change_recovered"]
        assert rec[0].data["status"] == "applied"

    def test_double_crash_double_resume(self, tmp_path):
        """Crash, resume partially (simulated by another crash), resume
        again: convergent, no double-application."""
        f = Fixture(tmp_path)
        f.crash_open_undo()
        s1 = f.started_event("a.txt")
        f.log.append("undo_change_started", s1)
        (f.root / "a.txt").write_text("a-v1")
        # First resume crashes right after reconciling a.txt:
        # simulate by writing the recovered event the reconciler writes.
        f.log.append("undo_change_recovered",
                     {"change_id": s1["change_id"],
                      "fingerprint": f.plan.fingerprint(),
                      "path": "a.txt", "operation": "restore",
                      "status": "applied"})
        result = f.j.apply_undo(f.plan)
        assert result["status"] == "resumed"
        assert result["applied"] == 2 and result["skipped"] == 1
        assert (f.root / "a.txt").read_text() == "a-v1"
        assert (f.root / "b.txt").read_text() == "b-v1"
        assert not (f.root / "c.txt").exists()


class TestConflicts:
    def test_external_edit_during_interrupted_undo_is_per_change_conflict(
        self, tmp_path
    ):
        """A file changed by SOMETHING ELSE while the undo was down: that
        change becomes a conflict, the rest of the plan still applies."""
        f = Fixture(tmp_path)
        f.crash_open_undo()
        f.log.append("undo_change_started", f.started_event("a.txt"))
        (f.root / "a.txt").write_text("external interference")
        result = f.j.apply_undo(f.plan)
        assert result["status"] == "resumed"
        assert result["conflicts"] == ["a.txt"]
        assert result["applied"] == 2
        # The interfering content was NOT clobbered.
        assert (f.root / "a.txt").read_text() == "external interference"
        assert (f.root / "b.txt").read_text() == "b-v1"

    def test_applied_change_later_drifted_is_conflict(self, tmp_path):
        f = Fixture(tmp_path)
        f.crash_open_undo()
        started = f.started_event("b.txt")
        f.log.append("undo_change_started", started)
        (f.root / "b.txt").write_text("b-v1")
        f.log.append("undo_change_finished",
                     {"change_id": started["change_id"],
                      "fingerprint": f.plan.fingerprint(),
                      "path": "b.txt", "operation": "restore"})
        (f.root / "b.txt").write_text("drifted after the undo applied")
        result = f.j.apply_undo(f.plan)
        assert "b.txt" in result["conflicts"]
        assert (f.root / "b.txt").read_text() == "drifted after the undo applied"

    def test_fresh_apply_refuses_wholesale_on_drift(self, tmp_path):
        f = Fixture(tmp_path)
        (f.root / "a.txt").write_text("drifted")
        with pytest.raises(RecoveryError, match="changed since"):
            f.j.apply_undo(f.plan)
        # Nothing was touched.
        assert (f.root / "b.txt").read_text() == "b-v2"
        assert (f.root / "c.txt").read_text() == "created"

    def test_remove_quarantines_unexpected_content(self, tmp_path):
        f = Fixture(tmp_path)
        f.crash_open_undo()
        # c.txt gets replaced by unexpected content mid-crash; the resume
        # marks it conflict and preserves the bytes.
        (f.root / "c.txt").write_text("precious new work")
        result = f.j.apply_undo(f.plan)
        assert "c.txt" in result["conflicts"]
        assert (f.root / "c.txt").read_text() == "precious new work"


class TestEventStreamValidation:
    """Tampered or internally inconsistent undo WALs must be detected,
    never trusted."""

    def test_start_for_path_not_in_plan(self, tmp_path):
        f = Fixture(tmp_path)
        f.crash_open_undo()
        ev = f.started_event("a.txt")
        ev["path"] = "zzz.txt"
        f.log.append("undo_change_started", ev)
        with pytest.raises(RecoveryError, match="not in the plan"):
            f.j.apply_undo(f.plan)

    def test_start_with_wrong_expected_digest(self, tmp_path):
        f = Fixture(tmp_path)
        f.crash_open_undo()
        ev = f.started_event("a.txt")
        ev["expected_current"] = sha("forged")
        f.log.append("undo_change_started", ev)
        with pytest.raises(RecoveryError, match="does not match"):
            f.j.apply_undo(f.plan)

    def test_duplicate_change_id_rejected(self, tmp_path):
        f = Fixture(tmp_path)
        f.crash_open_undo()
        ev = f.started_event("a.txt")
        f.log.append("undo_change_started", ev)
        f.log.append("undo_change_started", ev)
        with pytest.raises(RecoveryError, match="invalid"):
            f.j.apply_undo(f.plan)

    def test_finish_without_start_rejected(self, tmp_path):
        f = Fixture(tmp_path)
        f.crash_open_undo()
        f.log.append("undo_change_finished",
                     {"change_id": os.urandom(16).hex(),
                      "fingerprint": f.plan.fingerprint(),
                      "path": "a.txt", "operation": "restore"})
        with pytest.raises(RecoveryError, match="without a start"):
            f.j.apply_undo(f.plan)

    def test_double_resolution_rejected(self, tmp_path):
        f = Fixture(tmp_path)
        f.crash_open_undo()
        started = f.started_event("a.txt")
        f.log.append("undo_change_started", started)
        fin = {"change_id": started["change_id"],
               "fingerprint": f.plan.fingerprint(),
               "path": "a.txt", "operation": "restore"}
        f.log.append("undo_change_finished", fin)
        f.log.append("undo_change_finished", fin)
        with pytest.raises(RecoveryError, match="twice"):
            f.j.apply_undo(f.plan)

    def test_other_plans_events_ignored(self, tmp_path):
        """Events with a different plan fingerprint (an older undo of a
        different checkpoint) must not confuse this plan's resume."""
        f = Fixture(tmp_path)
        f.crash_open_undo()
        f.log.append("undo_change_started",
                     {"change_id": os.urandom(16).hex(),
                      "fingerprint": sha("some other plan"),
                      "path": "a.txt", "operation": "restore",
                      "expected_current": sha("x"),
                      "result_digest": sha("y")})
        result = f.j.apply_undo(f.plan)
        assert result["applied"] == 3 and result["conflicts"] == []


class TestWalOrderingUnderFaults:
    def test_intent_fsync_failure_prevents_file_write(self, tmp_path, monkeypatch):
        """If the intent event cannot be made durable, record_intent must
        raise BEFORE the caller mutates the file."""
        root = tmp_path / "ws"
        root.mkdir()
        (root / "f.txt").write_text("v1")
        log = SessionLog(str(tmp_path / "s.jsonl"))
        j = MutationJournal(log, str(root))
        real_fsync = os.fsync

        def failing_fsync(fd):
            raise OSError(5, "I/O error")

        monkeypatch.setattr(os, "fsync", failing_fsync)
        with pytest.raises(OSError):
            j.record_intent(str(root / "f.txt"), b"v2")
        monkeypatch.undo()
        # The event did not survive in memory or on disk.
        loaded = SessionLog.load(str(tmp_path / "s.jsonl"))
        assert all(e.type != "mutation_intent" for e in loaded.events)

    def test_commit_detects_wrong_content(self, tmp_path):
        root = tmp_path / "ws"
        root.mkdir()
        f = root / "f.txt"
        f.write_text("v1")
        log = memory_session()
        j = MutationJournal(log, str(root))
        intent = j.record_intent(str(f), b"v2")
        f.write_text("not v2")
        with pytest.raises(RecoveryError, match="fingerprint"):
            j.commit(intent)

    def test_recover_pending_never_mutates_files(self, tmp_path):
        root = tmp_path / "ws"
        root.mkdir()
        f = root / "f.txt"
        f.write_text("v1")
        log = memory_session()
        j = MutationJournal(log, str(root))
        j.record_intent(str(f), b"v2")
        f.write_text("half-writ")  # crashed mid-write
        before = f.read_text()
        results = j.recover_pending()
        assert results[0]["status"] == "conflict"
        assert f.read_text() == before
