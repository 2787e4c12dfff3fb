"""Advisory single-process TPU lock.

Only one process can use the tunneled TPU at a time (CLAUDE.md); a
benchmark captured while a study queue holds the chip under-reports the
framework (the round-3 official bench was contaminated exactly this way:
111.7 pairs/s recorded while a 75-epoch ablation queue plus a CPU pytest
ran concurrently — the idle-chip number was 155.1).

Protocol: long-running TPU jobs (ablation studies, training CLIs when on
TPU) take the lock for their lifetime; ``bench.py`` (and any measurement
script) WAITS for the lock to free before timing, then takes it itself.
The lock is advisory — nothing breaks if a process ignores it — but every
in-repo TPU entry point participates.

Implementation: ``O_CREAT | O_EXCL`` on ``/tmp/edrl_tpu.lock`` with the
holder's PID + a human-readable tag inside.  A lock whose PID is dead is
stale and silently reclaimed (host reboots wipe /tmp anyway, but a killed
study must not wedge the next bench).
"""

from __future__ import annotations

import contextlib
import errno
import json
import os
import sys
import time

LOCK_PATH = "/tmp/edrl_tpu.lock"


def _read_holder(path: str = LOCK_PATH):
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


def _reclaim(path: str) -> None:
    """Atomically remove a stale/corrupt lock file, restoring it if a live
    holder raced in between the caller's read and this reclamation.

    Unlinking by path is unsafe: between the caller reading a dead-PID
    record and the unlink, another process can legitimately reclaim AND
    re-acquire — the blind unlink then deletes the NEW holder's lock and
    two processes end up holding it (code-review r5).  Rename to a
    per-process name first (atomic; only one reclaimer can win), verify
    what was actually captured, and restore it via link if it turned out
    to be a live lock.
    """
    tmp = f"{path}.reclaim.{os.getpid()}"
    try:
        os.rename(path, tmp)
    except OSError:
        return  # someone else reclaimed/released it first
    try:
        cur = _read_holder(tmp)
        if cur is not None and _pid_alive(int(cur.get("pid", -1))):
            # We captured a live lock (acquired between read and rename):
            # put it back.  link fails only if yet another acquire landed
            # meanwhile — then the newest holder stands and the displaced
            # one re-acquires on its next hold() cycle (advisory lock).
            with contextlib.suppress(OSError):
                os.link(tmp, path)
    finally:
        with contextlib.suppress(OSError):
            os.unlink(tmp)


def holder(path: str = LOCK_PATH):
    """Live holder record (``{"pid": ..., "tag": ...}``) or None.

    A lock file whose PID is no longer alive is treated as absent (and
    removed so the next acquire doesn't race on it).
    """
    rec = _read_holder(path)
    if rec is None:
        # Unreadable/corrupt lock: reclaim only after a grace period.
        # Acquisition is atomic (payload linked into place fully written,
        # see try_acquire), so a corrupt file can only be foreign debris —
        # but give any non-atomic writer a few seconds before removing it
        # (ADVICE r4 #2: the old empty-at-create window let two processes
        # both "hold" the lock).
        with contextlib.suppress(OSError):
            if (
                os.path.exists(path)
                and time.time() - os.path.getmtime(path) > 5.0
            ):
                _reclaim(path)
        return None
    if not _pid_alive(int(rec.get("pid", -1))):
        _reclaim(path)
        return None
    return rec


def try_acquire(tag: str = "", path: str = LOCK_PATH) -> bool:
    """Take the lock if free (stale locks are reclaimed).  Non-blocking.

    Atomic WITH payload: the holder record is fully written to a temp file
    first and then ``os.link``ed into place — link fails with EEXIST if the
    lock exists, and a concurrent ``holder()`` can never observe an empty
    half-created lock file (the TOCTOU ADVICE r4 #2 flagged).
    """
    holder(path)  # clears a stale file first
    tmp = f"{path}.{os.getpid()}.tmp"
    try:
        with open(tmp, "w") as f:
            json.dump(
                {"pid": os.getpid(), "tag": tag, "time": time.time()}, f
            )
        try:
            os.link(tmp, path)
        except OSError as e:
            if e.errno == errno.EEXIST:
                return False
            raise
        return True
    finally:
        with contextlib.suppress(OSError):
            os.unlink(tmp)


def release(path: str = LOCK_PATH) -> None:
    """Drop the lock if THIS process holds it (safe to call unconditionally)."""
    rec = _read_holder(path)
    if rec is not None and int(rec.get("pid", -1)) == os.getpid():
        with contextlib.suppress(OSError):
            os.unlink(path)


def wait_until_free(
    timeout_s: float = 1800.0, poll_s: float = 15.0, path: str = LOCK_PATH
) -> bool:
    """Block until no live process holds the lock.

    Returns True if the lock freed within ``timeout_s`` (or was never
    held); False on timeout — callers should proceed anyway but mark
    their measurement as contended.
    """
    deadline = time.monotonic() + timeout_s
    warned = False
    while True:
        rec = holder(path)
        if rec is None:
            return True
        if time.monotonic() >= deadline:
            return False
        if not warned:
            print(
                f"[tpu_lock] TPU busy (pid {rec.get('pid')}: {rec.get('tag')!r}); "
                f"waiting up to {timeout_s:.0f}s for it to finish",
                file=sys.stderr,
                flush=True,
            )
            warned = True
        time.sleep(poll_s)


@contextlib.contextmanager
def hold(tag: str = "", wait_s: float = 0.0, path: str = LOCK_PATH):
    """Context manager: acquire (optionally waiting) -> yield -> release.

    ``wait_s > 0`` waits for a live holder to exit before acquiring; on
    timeout the body still runs (advisory lock — measurement scripts mark
    the result contended instead of failing).  Yields True if the lock was
    actually acquired uncontended.
    """
    got = try_acquire(tag, path)
    if not got and wait_s > 0:
        wait_until_free(wait_s, path=path)
        got = try_acquire(tag, path)
    try:
        yield got
    finally:
        if got:
            release(path)
