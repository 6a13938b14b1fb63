"""Chip-workload interlock (VERDICT r3 weak #7 / ADVICE r3 #4).

The TPU tunnel exposes ONE shared chip; any two concurrent workloads inflate
each other's measurements 5-50x (CLAUDE.md measurement hygiene).  Every chip
workload — benchmarks, probes, campaign training stages, bench.py — acquires
this host-wide flock before first device use, so an interactive probe and an
unattended agenda physically cannot overlap.

Usage (at the top of a chip script, after imports but before device work):

    from benchmarks.chip_lock import acquire_chip_lock
    acquire_chip_lock()          # blocks until the chip is free

The lock is held by the process for its lifetime (fd kept open); it releases
automatically on exit/kill, so a crashed stage never wedges the chip.
"""

from __future__ import annotations

import fcntl
import os
import sys
import time

LOCK_PATH = "/tmp/slide_tpu_chip.lock"

_lock_fd = None     # module-global keeps the fd (and the lock) alive


def acquire_chip_lock(timeout: float | None = None, label: str | None = None):
    """Block until the chip lock is held by this process.

    timeout: give up after this many seconds and return False (the caller
      decides whether to proceed under possible contention — bench.py does,
      with a warning in its detail block — or abort).  None = wait forever.
    Returns True once the lock is held, False on timeout.
    Re-entrant per process: a second call in the same process is a no-op.
    """
    global _lock_fd
    if _lock_fd is not None:
        return True
    label = label or os.path.basename(sys.argv[0] or "chip-job")
    fd = os.open(LOCK_PATH, os.O_CREAT | os.O_RDWR, 0o666)
    t0 = time.time()
    warned = False
    while True:
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
            break
        except BlockingIOError:
            if timeout is not None and time.time() - t0 > timeout:
                os.close(fd)
                print(f"[chip_lock] {label}: gave up after {timeout:.0f}s — "
                      f"another chip workload still holds {LOCK_PATH}",
                      file=sys.stderr)
                return False
            if not warned:
                try:
                    holder = open(LOCK_PATH).read().strip()
                except OSError:
                    holder = "?"
                print(f"[chip_lock] {label}: waiting for the chip "
                      f"(held by: {holder})", file=sys.stderr)
                warned = True
            time.sleep(5)
    os.ftruncate(fd, 0)
    os.write(fd, f"{label} pid={os.getpid()} since={time.ctime()}\n".encode())
    _lock_fd = fd
    if warned:
        print(f"[chip_lock] {label}: acquired after {time.time()-t0:.0f}s",
              file=sys.stderr)
    return True


def release_chip_lock():
    """Explicit release (normally unnecessary — process exit releases)."""
    global _lock_fd
    if _lock_fd is not None:
        fcntl.flock(_lock_fd, fcntl.LOCK_UN)
        os.close(_lock_fd)
        _lock_fd = None
