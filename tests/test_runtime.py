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
    assert int(pidfile.read_text()) == os.getpid()
    pidfile.unlink()
