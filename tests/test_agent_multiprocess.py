"""Multi-process session-store contention (round-5, VERDICT r4 #8).

The in-process interleaving suites cover threads sharing one SessionLog;
these tests cover the CROSS-PROCESS contract with real child processes:
flock + size-revalidation on append (a stale writer must get
SessionConflict, never corrupt the chain), retry-by-reload convergence
under N concurrent writers, load()'s shared-lock discipline against a
mid-append writer (reference analog: the flock + persisted-head
revalidation design, ref:src/tiny_llm_ref/agent/session.py:323-393 —
whose suites are thread/fault-injection only; real second processes are
this framework's addition).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import pytest

from tiny_llm_tpu.agent.session import (
    SessionConflict,
    SessionLog,
    SessionStore,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_child(code: str, timeout=60) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=timeout, env={**os.environ, "PYTHONPATH": REPO},
    )


def start_child(code: str) -> subprocess.Popen:
    return subprocess.Popen(
        [sys.executable, "-c", code], stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True,
        env={**os.environ, "PYTHONPATH": REPO},
    )


def test_cross_process_append_conflict(tmp_path):
    """A second process advancing the log must turn this process's next
    append into SessionConflict — and a reload must observe the other
    writer's event and let appends resume."""
    path = str(tmp_path / "s.jsonl")
    log = SessionLog(path)
    log.append("note", {"writer": "parent", "i": 0})

    child = run_child(
        f"""
from tiny_llm_tpu.agent.session import SessionLog
log = SessionLog.load({path!r})
log.append("note", {{"writer": "child", "i": 0}})
print("child-appended", len(log.events))
"""
    )
    assert child.returncode == 0, child.stderr
    assert "child-appended 2" in child.stdout

    with pytest.raises(SessionConflict, match="another writer"):
        log.append("note", {"writer": "parent", "i": 1})
    # The failed append must not have published locally or on disk.
    assert len(log.events) == 1
    reloaded = SessionLog.load(path)
    assert [e.data.get("writer") for e in reloaded.events] == ["parent", "child"]
    reloaded.append("note", {"writer": "parent", "i": 1})
    assert len(SessionLog.load(path).events) == 3


def test_multiprocess_retry_by_reload_converges(tmp_path):
    """4 writer processes x 8 events each, each retrying conflicts by
    reloading: the final log must be a valid chain holding every
    (writer, i) payload exactly once."""
    path = str(tmp_path / "s.jsonl")
    SessionLog(path).append("note", {"writer": "root", "i": 0})

    def writer_code(w):
        return f"""
from tiny_llm_tpu.agent.session import SessionLog, SessionConflict
import time
for i in range(8):
    for attempt in range(400):
        log = SessionLog.load({path!r})
        try:
            log.append("note", {{"writer": {w}, "i": i}})
            break
        except SessionConflict:
            time.sleep(0.002)
    else:
        raise SystemExit("starved")
print("done")
"""

    procs = [start_child(writer_code(w)) for w in range(4)]
    for p in procs:
        out, err = p.communicate(timeout=120)
        assert p.returncode == 0, err
        assert "done" in out

    final = SessionLog.load(path)  # chain + link validation happens here
    payloads = [(e.data.get("writer"), e.data.get("i")) for e in final.events]
    assert len(payloads) == 1 + 4 * 8
    assert len(set(payloads)) == len(payloads)  # no duplicates
    for w in range(4):
        assert [(w, i) for i in range(8)] == [p for p in payloads if p[0] == w]


def test_load_blocks_on_mid_append_writer(tmp_path):
    """THE truncation hazard (fixed round-5): a writer holding the append
    lock with a half-written line on disk must not have that line
    'recovered' away by a concurrent load. The child acquires LOCK_EX,
    writes HALF an event line, sleeps, completes it + fsync, releases.
    load() must block on the shared lock and return the COMPLETE chain,
    leaving the file untouched."""
    path = str(tmp_path / "s.jsonl")
    log = SessionLog(path)
    ev0 = log.append("note", {"writer": "parent", "i": 0})
    marker = str(tmp_path / "locked")

    line = json.dumps(
        {"id": 1, "ts": ev0.ts + 1, "type": "note",
         "parent": 0, "data": {"writer": "child", "i": 0}}
    ) + "\n"
    half = len(line) // 2
    child = start_child(
        f"""
import fcntl, os, time
fd = os.open({path!r}, os.O_WRONLY | os.O_APPEND)
fcntl.flock(fd, fcntl.LOCK_EX)
os.write(fd, {line[:half]!r}.encode())
open({marker!r}, "w").close()
time.sleep(1.2)
os.write(fd, {line[half:]!r}.encode())
os.fsync(fd)
fcntl.flock(fd, fcntl.LOCK_UN)
os.close(fd)
print("committed")
"""
    )
    deadline = time.monotonic() + 30
    while not os.path.exists(marker):
        assert time.monotonic() < deadline, "child never acquired the lock"
        time.sleep(0.01)

    t0 = time.monotonic()
    loaded = SessionLog.load(path)  # must block until the child releases
    waited = time.monotonic() - t0
    out, err = child.communicate(timeout=30)
    assert child.returncode == 0, err
    assert waited > 0.5, f"load did not wait for the writer ({waited:.3f}s)"
    assert [e.data.get("writer") for e in loaded.events] == ["parent", "child"]
    # Nothing was truncated: the committed bytes are intact on disk.
    assert SessionLog.load(path).events[-1].data == {"writer": "child", "i": 0}


def test_concurrent_store_create_distinct_sessions(tmp_path):
    """Two processes creating sessions in one store concurrently must
    yield two distinct, loadable session lineages."""
    root = str(tmp_path)
    code = f"""
from tiny_llm_tpu.agent.session import SessionStore
store = SessionStore({root!r})
log = store.create()
log.append("note", {{"pid": __import__("os").getpid()}})
print(store.session_id(log))
"""
    p1, p2 = start_child(code), start_child(code)
    out1, err1 = p1.communicate(timeout=60)
    out2, err2 = p2.communicate(timeout=60)
    assert p1.returncode == 0 and p2.returncode == 0, (err1, err2)
    id1, id2 = out1.strip(), out2.strip()
    assert id1 != id2
    store = SessionStore(root)
    assert set(store.list()) >= {id1, id2}
    for sid in (id1, id2):
        evs = store.load(sid).events
        assert evs[-1].type == "note"
