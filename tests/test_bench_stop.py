"""bench.py stop_sweep_processes: the pre-benchmark sweep teardown.

The driver runs bench.py at round end while the checkpointed RD sweep may
hold the TPU; bench must kill the WHOLE tree — supervisor, run loop, and
its encode-worker child — by recorded PID (never by pattern-kill), with an
identity check so a stale pidfile aliasing a recycled PID is left alone.
These tests drive the real function against throwaway subprocess trees.
"""

import os
import subprocess
import sys
import time

import bench


def _spawn(tag: str, with_child: bool = False):
    """A sleeper whose cmdline carries `tag`; optionally spawns a child
    sleeper (mimicking the run loop's encode worker)."""
    if with_child:
        code = (
            "import subprocess, sys, time\n"
            f"c = subprocess.Popen([sys.executable, '-c', 'import time; time.sleep(120)', '{tag}_child'])\n"
            "time.sleep(120)\n"
        )
    else:
        code = "import time; time.sleep(120)"
    return subprocess.Popen([sys.executable, "-c", code, tag])


def _alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
        return True
    except ProcessLookupError:
        return False


def test_kills_pidfile_tree_and_spares_others(tmp_path):
    victim = _spawn("fake_rd_sweep_tag", with_child=True)
    bystander = _spawn("innocent_tag")
    child_pids = []
    for _ in range(60):  # interpreter startup can be slow on a loaded box
        child_pids = [
            int(p)
            for p in open(f"/proc/{victim.pid}/task/{victim.pid}/children")
            .read().split()
        ]
        if child_pids:
            break
        time.sleep(0.5)
    assert child_pids, "victim never spawned its worker child"
    pf = tmp_path / "run.pid"
    pf.write_text(str(victim.pid))
    try:
        killed = bench.stop_sweep_processes(
            pidfiles=[str(pf)], cmdline_tags=("fake_rd_sweep_tag",)
        )
        assert victim.pid in killed
        assert all(c in killed for c in child_pids)
        victim.wait(timeout=5)
        for c in child_pids:
            assert not _alive(c)
        assert _alive(bystander.pid)
    finally:
        for p in (victim, bystander):
            if p.poll() is None:
                p.kill()
                p.wait()


def test_identity_check_spares_recycled_pid(tmp_path):
    """A pidfile naming a live process whose cmdline does NOT match the
    sweep tags must not be killed (stale pidfile, recycled PID)."""
    bystander = _spawn("innocent_tag")
    pf = tmp_path / "run.pid"
    pf.write_text(str(bystander.pid))
    try:
        killed = bench.stop_sweep_processes(
            pidfiles=[str(pf)], cmdline_tags=("fake_rd_sweep_tag",)
        )
        assert killed == []
        assert _alive(bystander.pid)
    finally:
        if bystander.poll() is None:
            bystander.kill()
            bystander.wait()


def test_missing_and_garbage_pidfiles(tmp_path):
    garbage = tmp_path / "run.pid"
    garbage.write_text("not-a-pid")
    assert bench.stop_sweep_processes(
        pidfiles=[str(tmp_path / "absent.pid"), str(garbage)],
        cmdline_tags=("fake_rd_sweep_tag",),
    ) == []
