"""Sandboxed workspace tools.

Parity: /root/reference/src/tiny_llm_ref/agent/workspace.py (1094 LoC) —
root-pinned path resolution, bounded list/read, read-before-write digests,
atomic writes with backup/restore, exact-unique-match edits, exact-argv
command allowlist with process-group kill and bounded output, and a
confirm-gated execute dispatcher wired to the session log and the
mutation journal. The hardening invariants preserved here:

* paths: relative only, no '..', no symlink components, resolved target
  must stay under the pinned root (checked by dev/ino of the root).
* writes: require a prior read of the existing file AND a digest match at
  write time (TOCTOU window detection); atomic temp+rename with a backup
  of the previous content restored on any failure.
* commands: no shell, exact argv-prefix allowlist, scrubbed environment,
  own process group killed on timeout, stdout+stderr capped.
"""

from __future__ import annotations

import dataclasses
import hashlib
import os
import signal
import subprocess
import time
from typing import Any, Callable

from .control import CancellationToken
from .protocol import AgentError, ToolAction

PROTECTED_NAMES = frozenset(
    {".git", ".env", ".ssh", ".tiny-llm-tpu", ".gnupg", ".aws"}
)


class WorkspaceError(Exception):
    """Tool failure; message is returned to the model as the tool result."""


@dataclasses.dataclass(frozen=True)
class ToolPolicy:
    root: str
    allow_writes: bool = False
    allowed_commands: tuple[tuple[str, ...], ...] = ()
    max_file_bytes: int = 256 * 1024
    max_entries: int = 500
    max_output_bytes: int = 32 * 1024
    command_timeout_s: float = 30.0
    protected_names: frozenset[str] = PROTECTED_NAMES

    def __post_init__(self):
        root = os.path.realpath(self.root)
        if not os.path.isdir(root):
            raise ValueError(f"workspace root {self.root!r} is not a directory")
        object.__setattr__(self, "root", root)
        for cmd in self.allowed_commands:
            if not cmd or not all(isinstance(a, str) for a in cmd):
                raise ValueError(f"bad allowlist entry {cmd!r}")
        if self.max_file_bytes <= 0 or self.max_output_bytes <= 0:
            raise ValueError("size limits must be positive")


def _digest(data: bytes) -> str:
    return hashlib.sha256(data).hexdigest()


class Workspace:
    def __init__(
        self,
        policy: ToolPolicy,
        session_log=None,
        journal=None,
        confirm: Callable[[ToolAction], bool] | None = None,
        cancellation: CancellationToken | None = None,
    ):
        self.policy = policy
        self.session = session_log
        self.journal = journal
        # Default-deny for side effects, like the reference's execute
        # dispatch (workspace.py:655-707).
        self.confirm = confirm if confirm is not None else (lambda action: False)
        self.cancellation = cancellation or CancellationToken()
        self._read_digests: dict[str, str] = {}
        st = os.stat(policy.root)
        self._root_id = (st.st_dev, st.st_ino)

    # -- path resolution -----------------------------------------------------
    def resolve_path(self, rel: str, for_write: bool = False) -> str:
        if not isinstance(rel, str) or rel == "":
            raise WorkspaceError("path must be a non-empty relative path")
        if os.path.isabs(rel):
            raise WorkspaceError(f"absolute paths are rejected: {rel!r}")
        parts = [p for p in rel.replace("\\", "/").split("/") if p not in ("", ".")]
        if any(p == ".." for p in parts):
            raise WorkspaceError(f"'..' components are rejected: {rel!r}")
        if parts and parts[0] in self.policy.protected_names:
            raise WorkspaceError(f"path {rel!r} is protected")
        # Root identity pin: the root must still be the directory the
        # policy was built for (workspace.py:74-121).
        st = os.stat(self.policy.root)
        if (st.st_dev, st.st_ino) != self._root_id:
            raise WorkspaceError("workspace root changed identity; refusing")
        cur = self.policy.root
        for i, p in enumerate(parts):
            cur = os.path.join(cur, p)
            if os.path.islink(cur):
                raise WorkspaceError(f"symlink component rejected: {rel!r}")
            is_last = i == len(parts) - 1
            if not os.path.exists(cur):
                if for_write and is_last:
                    break
                raise WorkspaceError(f"path does not exist: {rel!r}")
        return cur

    # -- read-only tools -----------------------------------------------------
    def list_files(self, rel: str) -> list[str]:
        target = self.resolve_path(rel or ".")
        if not os.path.isdir(target):
            raise WorkspaceError(f"not a directory: {rel!r}")
        out = []
        for name in sorted(os.listdir(target)):
            if name in self.policy.protected_names:
                continue
            full = os.path.join(target, name)
            out.append(name + ("/" if os.path.isdir(full) else ""))
            if len(out) >= self.policy.max_entries:
                out.append(f"... (truncated at {self.policy.max_entries} entries)")
                break
        return out

    def read_file(self, rel: str) -> str:
        target = self.resolve_path(rel)
        if not os.path.isfile(target):
            raise WorkspaceError(f"not a regular file: {rel!r}")
        size = os.path.getsize(target)
        if size > self.policy.max_file_bytes:
            raise WorkspaceError(
                f"file is {size} bytes; limit {self.policy.max_file_bytes}"
            )
        with open(target, "rb") as f:
            data = f.read(self.policy.max_file_bytes + 1)
        # Stability check: the file must not be mutating under the read.
        if os.path.getsize(target) != size:
            raise WorkspaceError(f"file changed while reading: {rel!r}")
        self._read_digests[target] = _digest(data)
        try:
            return data.decode("utf-8")
        except UnicodeDecodeError:
            raise WorkspaceError(f"file is not valid UTF-8: {rel!r}") from None

    # -- mutations -----------------------------------------------------------
    def _check_write_allowed(self, rel: str) -> None:
        if not self.policy.allow_writes:
            raise WorkspaceError("writes are disabled by policy")

    def _precondition_digest(self, target: str, rel: str) -> str | None:
        """Read-before-write + TOCTOU check. Returns the current digest of
        an existing file (which must match what we last read), or None for
        a new file."""
        if not os.path.exists(target):
            return None
        if not os.path.isfile(target) or os.path.islink(target):
            raise WorkspaceError(f"refusing to overwrite non-regular file: {rel!r}")
        with open(target, "rb") as f:
            current = _digest(f.read())
        observed = self._read_digests.get(target)
        if observed is None:
            raise WorkspaceError(f"read {rel!r} before writing it")
        if observed != current:
            raise WorkspaceError(
                f"{rel!r} changed since it was read; re-read before writing"
            )
        return current

    def _atomic_write(self, target: str, data: bytes, rel: str) -> None:
        """Write via exclusive temp + backup + rename; restore the backup
        on any failure edge (workspace.py:876-1094, simplified to the same
        guarantee: the destination always holds either the old or the new
        complete content)."""
        d = os.path.dirname(target)
        tmp = os.path.join(d, f".{os.path.basename(target)}.tmp-{os.getpid()}")
        backup = None
        try:
            fd = os.open(tmp, os.O_WRONLY | os.O_CREAT | os.O_EXCL, 0o644)
            try:
                os.write(fd, data)
                os.fsync(fd)
            finally:
                os.close(fd)
            if os.path.exists(target):
                backup = os.path.join(
                    d, f".{os.path.basename(target)}.bak-{os.getpid()}"
                )
                os.link(target, backup)
            os.replace(tmp, target)
            dfd = os.open(d, os.O_RDONLY)
            try:
                os.fsync(dfd)
            finally:
                os.close(dfd)
            if backup is not None:
                os.unlink(backup)
        except BaseException:
            if backup is not None and os.path.exists(backup):
                try:
                    os.replace(backup, target)
                except OSError:
                    pass  # backup remains for manual recovery
            if os.path.exists(tmp):
                try:
                    os.unlink(tmp)
                except OSError:
                    pass
            raise

    def write_file(self, rel: str, content: str) -> dict:
        self._check_write_allowed(rel)
        target = self.resolve_path(rel, for_write=True)
        data = content.encode("utf-8")
        if len(data) > self.policy.max_file_bytes:
            raise WorkspaceError("content exceeds max_file_bytes")
        self._precondition_digest(target, rel)
        intent = None
        if self.journal is not None:
            intent = self.journal.record_intent(target, data)
        self._atomic_write(target, data, rel)
        self._read_digests[target] = _digest(data)
        if self.journal is not None:
            self.journal.commit(intent)
        return {"written": rel, "bytes": len(data)}

    def edit_file(self, rel: str, old: str, new: str) -> dict:
        self._check_write_allowed(rel)
        target = self.resolve_path(rel)
        current_text = self.read_file(rel)
        n = current_text.count(old)
        if n == 0:
            raise WorkspaceError("old text not found")
        if n > 1:
            raise WorkspaceError(f"old text occurs {n} times; must be unique")
        return self.write_file(rel, current_text.replace(old, new, 1))

    # -- commands ------------------------------------------------------------
    def _command_allowed(self, argv: list[str]) -> bool:
        return any(
            tuple(argv[: len(prefix)]) == prefix
            for prefix in self.policy.allowed_commands
        )

    def run_command(self, argv: list[str]) -> dict:
        if not self._command_allowed(argv):
            raise WorkspaceError(
                f"command {argv!r} is not in the allowlist"
            )
        if self.session is not None:
            self.session.append("command_started", {"argv": argv})
        env = {"PATH": os.environ.get("PATH", "/usr/bin:/bin"),
               "HOME": self.policy.root, "LANG": "C.UTF-8"}
        t0 = time.monotonic()
        try:
            proc = subprocess.Popen(
                argv,
                cwd=self.policy.root,
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                stdin=subprocess.DEVNULL,
                start_new_session=True,
            )
        except OSError as e:
            if self.session is not None:
                self.session.append(
                    "command_finished", {"argv": argv, "error": str(e)}
                )
            raise WorkspaceError(f"failed to start command: {e}") from None
        try:
            out, _ = proc.communicate(timeout=self.policy.command_timeout_s)
            timed_out = False
        except subprocess.TimeoutExpired:
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
            out, _ = proc.communicate()
            timed_out = True
        dt = time.monotonic() - t0
        truncated = len(out) > self.policy.max_output_bytes
        text = out[: self.policy.max_output_bytes].decode("utf-8", "replace")
        result = {
            "argv": argv,
            "returncode": proc.returncode,
            "output": text,
            "truncated": truncated,
            "timed_out": timed_out,
            "seconds": round(dt, 3),
        }
        if self.session is not None:
            self.session.append(
                "command_finished",
                {"argv": argv, "returncode": proc.returncode,
                 "timed_out": timed_out, "seconds": round(dt, 3)},
            )
        if timed_out:
            raise WorkspaceError(
                f"command timed out after {self.policy.command_timeout_s}s; killed"
            )
        return result

    # -- dispatch ------------------------------------------------------------
    def execute(self, action: ToolAction) -> dict:
        """Run one tool action: cancellation check, human confirmation for
        side effects, durable tool_call/tool_result events."""
        self.cancellation.raise_if_cancelled(f"tool:{action.tool}")
        call_ev = None
        if self.session is not None:
            call_ev = self.session.append(
                "tool_call", {"tool": action.tool, "args": action.args}
            )

        def record(result: dict) -> dict:
            if self.session is not None and call_ev is not None:
                self.session.append(
                    "tool_result", {"call_id": call_ev.id, "result": result}
                )
            return result

        try:
            if action.has_side_effects and not self.confirm(action):
                return record({"error": "action rejected by user"})
            if action.tool == "list_files":
                return record({"entries": self.list_files(action.args["path"])})
            if action.tool == "read_file":
                return record({"content": self.read_file(action.args["path"])})
            if action.tool == "write_file":
                return record(
                    self.write_file(action.args["path"], action.args["content"])
                )
            if action.tool == "edit_file":
                return record(
                    self.edit_file(
                        action.args["path"], action.args["old"], action.args["new"]
                    )
                )
            if action.tool == "run_command":
                return record(self.run_command(list(action.args["argv"])))
            raise AgentError(f"unhandled tool {action.tool!r}")
        except WorkspaceError as e:
            return record({"error": str(e)})
