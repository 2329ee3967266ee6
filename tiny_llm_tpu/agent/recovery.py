"""Write-ahead mutation journal + checkpoint/undo.

Parity: /root/reference/src/tiny_llm_ref/agent/recovery.py (2055 LoC) —
the invariants preserved:

* WAL ordering: the intent event (with the before-image) is fsync'd into
  the session log BEFORE the file write happens; commit is recorded after
  verifying the after-fingerprint.
* recover_pending classifies interrupted intents (committed / not_applied
  / conflict) purely by hashing, never touching files.
* Undo restores the before-images of committed writes since a named
  checkpoint, refuses when current state no longer matches the plan's
  fingerprints, and journals its own restores (undo is itself redoable).
"""

from __future__ import annotations

import base64
import dataclasses
import hashlib
import os
from typing import Any

MAX_BEFORE_IMAGE = 64 * 1024


class RecoveryError(Exception):
    pass


def _digest(data: bytes) -> str:
    return hashlib.sha256(data).hexdigest()


def _encode_content(data: bytes) -> dict:
    try:
        return {"text": data.decode("utf-8")}
    except UnicodeDecodeError:
        return {"b64": base64.b64encode(data).decode("ascii")}


def _decode_content(obj: dict) -> bytes:
    if "text" in obj:
        return obj["text"].encode("utf-8")
    return base64.b64decode(obj["b64"])


@dataclasses.dataclass(frozen=True)
class Checkpoint:
    event_id: int
    name: str


@dataclasses.dataclass(frozen=True)
class PlannedRestore:
    path: str  # workspace-relative
    before_exists: bool
    before_content: dict | None  # encoded; None if too large to restore
    before_digest: str | None
    expected_current_digest: str | None  # None = file absent now


@dataclasses.dataclass(frozen=True)
class UndoPlan:
    checkpoint_id: int
    restores: tuple[PlannedRestore, ...]
    warnings: tuple[str, ...]

    def fingerprint(self) -> str:
        h = hashlib.sha256()
        for r in self.restores:
            h.update(
                f"{r.path}|{r.before_digest}|{r.expected_current_digest}".encode()
            )
        return h.hexdigest()


class MutationJournal:
    def __init__(self, session_log, root: str):
        self.session = session_log
        self.root = os.path.realpath(root)

    def _rel(self, path: str) -> str:
        return os.path.relpath(os.path.realpath(
            os.path.join(self.root, path) if not os.path.isabs(path) else path
        ), self.root)

    # -- WAL -----------------------------------------------------------------
    def record_intent(self, path: str, after_bytes: bytes):
        """Durably record the before-image BEFORE the caller writes."""
        rel = self._rel(path)
        full = os.path.join(self.root, rel)
        if os.path.exists(full):
            with open(full, "rb") as f:
                before = f.read()
            data: dict[str, Any] = {
                "path": rel,
                "before_exists": True,
                "before_digest": _digest(before),
                "mode": os.stat(full).st_mode & 0o777,
            }
            if len(before) <= MAX_BEFORE_IMAGE:
                data["before_content"] = _encode_content(before)
        else:
            data = {"path": rel, "before_exists": False, "before_digest": None}
        data["after_digest"] = _digest(after_bytes)
        return self.session.append("mutation_intent", data)

    def commit(self, intent_event) -> None:
        """Verify the write landed, then durably mark it committed."""
        rel = intent_event.data["path"]
        full = os.path.join(self.root, rel)
        with open(full, "rb") as f:
            current = _digest(f.read())
        if current != intent_event.data["after_digest"]:
            raise RecoveryError(
                f"commit fingerprint mismatch for {rel!r}: file does not "
                "hold the intended content"
            )
        self.session.append("mutation_committed", {"intent_id": intent_event.id})

    # -- recovery ------------------------------------------------------------
    def _committed_ids(self) -> set[int]:
        return {
            e.data["intent_id"]
            for e in self.session.events
            if e.type == "mutation_committed"
        }

    def pending_intents(self) -> list:
        committed = self._committed_ids()
        return [
            e for e in self.session.events
            if e.type == "mutation_intent" and e.id not in committed
        ]

    def recover_pending(self) -> list[dict]:
        """Classify interrupted intents without touching any file
        (reference recovery.py:267-306)."""
        results = []
        for intent in self.pending_intents():
            rel = intent.data["path"]
            full = os.path.join(self.root, rel)
            if os.path.exists(full):
                with open(full, "rb") as f:
                    cur = _digest(f.read())
            else:
                cur = None
            if cur == intent.data["after_digest"]:
                status = "committed"
            elif cur == intent.data["before_digest"] or (
                cur is None and not intent.data["before_exists"]
            ):
                status = "not_applied"
            else:
                status = "conflict"
            self.session.append(
                "mutation_recovered", {"intent_id": intent.id, "status": status}
            )
            results.append({"intent_id": intent.id, "path": rel, "status": status})
        return results

    # -- checkpoints / undo --------------------------------------------------
    def create_checkpoint(self, name: str) -> Checkpoint:
        ev = self.session.append("checkpoint", {"name": name})
        return Checkpoint(event_id=ev.id, name=name)

    def checkpoints(self) -> list[Checkpoint]:
        return [
            Checkpoint(event_id=e.id, name=e.data["name"])
            for e in self.session.events
            if e.type == "checkpoint"
        ]

    def plan_undo(self, checkpoint: Checkpoint) -> UndoPlan:
        """Collapse committed post-checkpoint writes per path into the
        oldest before-image (reference recovery.py:347-424)."""
        committed = self._committed_ids()
        warnings: list[str] = []
        first_intent: dict[str, Any] = {}
        last_after: dict[str, str] = {}
        for e in self.session.events:
            if e.id <= checkpoint.event_id:
                continue
            if e.type == "command_started":
                warnings.append(
                    f"command ran after checkpoint: {e.data.get('argv')}"
                )
            if e.type == "mutation_intent" and e.id in committed:
                rel = e.data["path"]
                if rel not in first_intent:
                    first_intent[rel] = e.data
                last_after[rel] = e.data["after_digest"]
        restores = []
        for rel, data in first_intent.items():
            full = os.path.join(self.root, rel)
            if os.path.exists(full):
                with open(full, "rb") as f:
                    cur = _digest(f.read())
            else:
                cur = None
            if cur != last_after[rel]:
                warnings.append(
                    f"{rel!r} was modified outside the journal since its "
                    "last committed write"
                )
            if data["before_exists"] and "before_content" not in data:
                warnings.append(
                    f"{rel!r} before-image exceeded {MAX_BEFORE_IMAGE} bytes; "
                    "cannot restore it"
                )
                continue
            restores.append(
                PlannedRestore(
                    path=rel,
                    before_exists=data["before_exists"],
                    before_content=data.get("before_content"),
                    before_digest=data["before_digest"],
                    expected_current_digest=cur,
                )
            )
        return UndoPlan(
            checkpoint_id=checkpoint.event_id,
            restores=tuple(restores),
            warnings=tuple(warnings),
        )

    # -- applying / resuming undo ---------------------------------------------
    def _interrupted_undo(self, plan: UndoPlan) -> set[str] | None:
        """If the log shows an undo of THIS plan that started but never
        finished (crash mid-undo), return the set of paths whose change
        already completed; else None (reference recovery.py:853-1030 —
        undo is itself WAL'd and resumable)."""
        started_at = None
        for e in self.session.events:
            if (e.type == "undo_started"
                    and e.data.get("fingerprint") == plan.fingerprint()):
                started_at = e.id
            elif e.type == "undo_finished" and started_at is not None:
                started_at = None  # that attempt completed
        if started_at is None:
            return None
        return {
            e.data["path"]
            for e in self.session.events
            if e.type == "undo_change_finished" and e.id > started_at
        }

    def _current_digest(self, full: str) -> str | None:
        if not os.path.exists(full):
            return None
        with open(full, "rb") as f:
            return _digest(f.read())

    def _quarantine(self, full: str, rel: str) -> str:
        """Preserve unexpected content instead of destroying it
        (reference _remove_exact, recovery.py:1708-2055): the file moves
        into a quarantine dir and the caller's removal proceeds."""
        qdir = os.path.join(self.root, ".tiny-llm-tpu", "quarantine")
        os.makedirs(qdir, mode=0o700, exist_ok=True)
        dest = os.path.join(
            qdir, f"{rel.replace(os.sep, '_')}.{os.getpid()}.{len(os.listdir(qdir))}"
        )
        os.replace(full, dest)
        return dest

    def _remove_exact(self, full: str, rel: str, expected: str | None) -> None:
        """Remove `full` only if it still holds the expected content;
        unexpected content is quarantined, never destroyed."""
        cur = self._current_digest(full)
        if cur is None:
            return
        if expected is not None and cur != expected:
            dest = self._quarantine(full, rel)
            self.session.append(
                "undo_quarantined", {"path": rel, "moved_to": dest}
            )
            return
        os.unlink(full)

    def _restore_exact(self, full: str, content: bytes) -> None:
        tmp = full + f".undo-{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(content)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, full)

    def apply_undo(self, plan: UndoPlan, confirm=None) -> dict:
        """Apply a plan: preflight fingerprints, per-change WAL events,
        atomic restores. Refuses wholesale if any file drifted since the
        plan was computed — EXCEPT when resuming an interrupted undo of
        the same plan, where already-restored files legitimately hold
        their before-image already."""
        if confirm is not None and not confirm(plan):
            return {"applied": 0, "status": "rejected"}
        done_paths = self._interrupted_undo(plan)
        resuming = done_paths is not None
        done_paths = done_paths or set()

        # Preflight: every file must match the plan — or, when resuming,
        # already hold its restored before-image.
        for r in plan.restores:
            full = os.path.join(self.root, r.path)
            cur = self._current_digest(full)
            ok = cur == r.expected_current_digest
            if resuming and not ok:
                restored = r.before_digest if r.before_exists else None
                ok = cur == restored
            if not ok:
                raise RecoveryError(
                    f"{r.path!r} changed since the undo plan was computed"
                )

        if not resuming:
            self.session.append(
                "undo_started",
                {"checkpoint_id": plan.checkpoint_id,
                 "fingerprint": plan.fingerprint()},
            )
        applied = 0
        skipped = 0
        for r in plan.restores:
            full = os.path.join(self.root, r.path)
            restored_digest = r.before_digest if r.before_exists else None
            if r.path in done_paths or (
                resuming and self._current_digest(full) == restored_digest
            ):
                # Completed (or applied-but-unjournaled) before the crash.
                if r.path not in done_paths:
                    self.session.append(
                        "undo_change_recovered", {"path": r.path}
                    )
                skipped += 1
                continue
            self.session.append("undo_change_started", {"path": r.path})
            if r.before_exists:
                content = _decode_content(r.before_content)
                intent = self.record_intent(full, content)
                self._restore_exact(full, content)
                self.commit(intent)
            else:
                self._remove_exact(full, r.path, r.expected_current_digest)
            self.session.append("undo_change_finished", {"path": r.path})
            applied += 1
        self.session.append(
            "undo_finished", {"checkpoint_id": plan.checkpoint_id, "applied": applied}
        )
        return {
            "applied": applied,
            "skipped": skipped,
            "status": "resumed" if resuming else "ok",
            "warnings": list(plan.warnings),
        }
