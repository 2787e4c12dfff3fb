"""Advisory TPU lock (edrl_tpu/utils/tpu_lock.py).

The lock exists so measurement scripts (bench.py) never time a chip that a
study queue is holding — the round-3 official bench was contaminated by
exactly that race (VERDICT r3 weak #1).
"""

import json
import os
import subprocess
import sys
import time

from edrl_tpu.utils import tpu_lock


def test_acquire_release_roundtrip(tmp_path):
    path = str(tmp_path / "lock")
    assert tpu_lock.try_acquire("t1", path)
    rec = tpu_lock.holder(path)
    assert rec["pid"] == os.getpid() and rec["tag"] == "t1"
    # Second acquire from the same (live) holder fails — the lock is held.
    assert not tpu_lock.try_acquire("t2", path)
    tpu_lock.release(path)
    assert tpu_lock.holder(path) is None
    assert tpu_lock.try_acquire("t3", path)
    tpu_lock.release(path)


def test_stale_lock_reclaimed(tmp_path):
    path = str(tmp_path / "lock")
    # A dead PID: spawn a process that exits immediately, use its PID.
    proc = subprocess.run([sys.executable, "-c", "import os;print(os.getpid())"],
                          capture_output=True, text=True)
    dead_pid = int(proc.stdout.strip())
    with open(path, "w") as f:
        json.dump({"pid": dead_pid, "tag": "dead-study", "time": 0}, f)
    assert tpu_lock.holder(path) is None  # stale detected + cleared
    assert not os.path.exists(path)
    assert tpu_lock.try_acquire("fresh", path)
    tpu_lock.release(path)


def test_corrupt_lock_reclaimed_after_grace(tmp_path):
    """A corrupt lock is reclaimed only after a grace period — a freshly
    written one might be a concurrent (non-atomic) writer mid-write, and
    unlinking it instantly let two processes both 'hold' the advisory lock
    (ADVICE r4 #2 TOCTOU)."""
    import time

    path = str(tmp_path / "lock")
    with open(path, "w") as f:
        f.write("not json{")
    # Within the grace window: unreadable -> no holder, but NOT unlinked,
    # so acquisition still fails.
    assert tpu_lock.holder(path) is None
    assert not tpu_lock.try_acquire("fresh", path)
    # Past the grace window: reclaimed and acquirable.
    old = time.time() - 30.0
    os.utime(path, (old, old))
    assert tpu_lock.holder(path) is None
    assert tpu_lock.try_acquire("fresh", path)
    # The acquired lock is immediately readable (atomic payload via link).
    assert tpu_lock.holder(path)["tag"] == "fresh"
    tpu_lock.release(path)


def test_release_is_holder_scoped(tmp_path):
    path = str(tmp_path / "lock")
    with open(path, "w") as f:
        json.dump({"pid": os.getpid() , "tag": "mine", "time": 0}, f)
    # Write a different live holder: use PID 1 (init, always alive).
    with open(path, "w") as f:
        json.dump({"pid": 1, "tag": "other", "time": 0}, f)
    tpu_lock.release(path)  # must NOT remove someone else's lock
    assert os.path.exists(path)
    os.unlink(path)


def test_wait_until_free_times_out_then_frees(tmp_path):
    path = str(tmp_path / "lock")
    with open(path, "w") as f:
        json.dump({"pid": 1, "tag": "other", "time": 0}, f)
    t0 = time.monotonic()
    assert not tpu_lock.wait_until_free(timeout_s=0.2, poll_s=0.05, path=path)
    assert time.monotonic() - t0 < 5.0
    os.unlink(path)
    assert tpu_lock.wait_until_free(timeout_s=0.2, poll_s=0.05, path=path)


def test_hold_context_manager(tmp_path):
    path = str(tmp_path / "lock")
    with tpu_lock.hold("ctx", path=path) as got:
        assert got
        assert tpu_lock.holder(path)["tag"] == "ctx"
    assert tpu_lock.holder(path) is None


def test_reclaim_removes_stale_record(tmp_path):
    path = str(tmp_path / "lock")
    with open(path, "w") as f:
        json.dump({"pid": 2**30, "tag": "dead", "time": 0}, f)
    tpu_lock._reclaim(path)
    assert not os.path.exists(path)


def test_reclaim_restores_live_record(tmp_path):
    """If a live holder acquired between the caller's read and the
    reclamation, the rename-verify-restore path puts the live lock back
    instead of deleting it (the two-holders race from the r5 review)."""
    path = str(tmp_path / "lock")
    with open(path, "w") as f:
        json.dump({"pid": os.getpid(), "tag": "live", "time": 0}, f)
    tpu_lock._reclaim(path)
    assert os.path.exists(path)
    assert tpu_lock.holder(path)["tag"] == "live"
