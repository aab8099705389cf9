"""Chip-exclusivity handoff: a harness job (bench.py / chip_check.py) must be
able to reclaim the TPU from a recorded background sweep by exact PID —
never by pattern (utils/runtime.{write_pidfile,reclaim_chip})."""

import subprocess
import sys

from gnn_pretraining_tpu.utils import runtime


def test_reclaim_chip_kills_recorded_pid(tmp_path):
    pidfile = tmp_path / "sweep.pid"
    proc = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(60)"])
    try:
        pidfile.write_text(str(proc.pid))
        assert runtime.reclaim_chip(pidfile, wait_s=10.0)
        assert proc.wait(timeout=15) != 0
        assert not pidfile.exists()
    finally:
        if proc.poll() is None:
            proc.kill()


def test_reclaim_chip_no_pidfile(tmp_path):
    assert not runtime.reclaim_chip(tmp_path / "absent.pid")


def test_reclaim_chip_garbage_pidfile(tmp_path):
    pidfile = tmp_path / "sweep.pid"
    pidfile.write_text("not-a-pid")
    assert not runtime.reclaim_chip(pidfile)
    assert not pidfile.exists()


def test_reclaim_chip_stale_pid(tmp_path):
    pidfile = tmp_path / "sweep.pid"
    # Spawn-and-reap so the PID is definitely dead.
    proc = subprocess.Popen([sys.executable, "-c", "pass"])
    proc.wait()
    pidfile.write_text(str(proc.pid))
    assert not runtime.reclaim_chip(pidfile)
    assert not pidfile.exists()


def test_write_pidfile_records_self(tmp_path):
    import os

    pidfile = tmp_path / "self.pid"
    runtime.write_pidfile(pidfile)
    pid, start = pidfile.read_text().split()
    assert int(pid) == os.getpid()
    assert int(start) == runtime._proc_stat(os.getpid())[1]
    pidfile.unlink()


def test_reclaim_chip_recycled_pid_not_signaled(tmp_path):
    """A pidfile whose recorded start time mismatches the live process (PID
    recycled after a SIGKILLed sweep skipped atexit cleanup) must be treated
    as stale: unlinked, never signaled."""
    import os

    pidfile = tmp_path / "sweep.pid"
    proc = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(60)"])
    try:
        real_start = runtime._proc_stat(proc.pid)[1]
        pidfile.write_text(f"{proc.pid} {real_start + 12345}")
        assert not runtime.reclaim_chip(pidfile, wait_s=5.0)
        assert not pidfile.exists()
        assert proc.poll() is None  # untouched
    finally:
        proc.kill()
        proc.wait()


def test_reclaim_chip_legacy_non_python_pid_not_signaled(tmp_path):
    """Legacy single-int pidfiles fall back to a cmdline identity check: a
    non-python process is never signaled."""
    pidfile = tmp_path / "sweep.pid"
    proc = subprocess.Popen(["sleep", "60"])
    try:
        pidfile.write_text(str(proc.pid))
        assert not runtime.reclaim_chip(pidfile, wait_s=5.0)
        assert not pidfile.exists()
        assert proc.poll() is None
    finally:
        proc.kill()
        proc.wait()


def test_reclaim_chip_zombie_counts_as_exited(tmp_path):
    """An unreaped (zombie) sweep has already released the chip: reclaim must
    return promptly instead of burning wait_s then SIGKILLing it."""
    import time

    pidfile = tmp_path / "sweep.pid"
    proc = subprocess.Popen([sys.executable, "-c", "pass"])
    deadline = time.monotonic() + 10
    while runtime._proc_stat(proc.pid)[0] != "Z":
        assert time.monotonic() < deadline, "child never became a zombie"
        time.sleep(0.05)
    try:
        pidfile.write_text(f"{proc.pid} {runtime._proc_stat(proc.pid)[1]}")
        t0 = time.monotonic()
        assert runtime.reclaim_chip(pidfile, wait_s=30.0)
        assert time.monotonic() - t0 < 5.0
        assert not pidfile.exists()
    finally:
        proc.wait()
