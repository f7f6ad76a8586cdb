"""Hermetic tests for the tunnel-stall watchdog (scripts/run_supervisor.py).

The watchdog exists because the axon TPU tunnel can die mid-run and leave a
training child wedged in a remote call forever (PERF.md round 3, "the
tunnel-wedge incident"). These tests drive `supervise()` with tiny synthetic
children — no JAX, no tunnel — and assert the kill/probe/relaunch contract.
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from run_supervisor import BUDGET_RC, supervise  # noqa: E402

PY = sys.executable


def test_healthy_child_completes_without_restart(tmp_path):
    log = tmp_path / "log.txt"
    rc, restarts = supervise(
        [PY, "-c", "print('working'); print('done')"],
        log, dict(os.environ), tmp_path,
        stall_timeout=30.0, max_restarts=2, probe_first=False,
        probe=lambda: True, poll_s=0.2,
    )
    assert rc == 0
    assert restarts == 0
    assert "done" in log.read_text()


def test_wedged_child_is_killed_and_relaunched(tmp_path):
    """A child that logs once then hangs forever must be killed after the
    stall timeout and relaunched; the relaunch (seeing its marker file from
    attempt 1) exits cleanly — modelling resume-from-checkpoint."""
    marker = tmp_path / "attempt1.marker"
    child = (
        "import sys, time, pathlib\n"
        f"m = pathlib.Path({str(marker)!r})\n"
        "print('started', flush=True)\n"
        "if m.exists():\n"
        "    print('resumed ok', flush=True)\n"
        "    sys.exit(0)\n"
        "m.touch()\n"
        "time.sleep(3600)  # wedge: no further log growth\n"
    )
    probes = []

    def probe():
        probes.append(time.time())
        return True

    t0 = time.time()
    rc, restarts = supervise(
        [PY, "-c", child],
        tmp_path / "log.txt", dict(os.environ), tmp_path,
        # NB the child inherits sitecustomize's jax import — several seconds
        # of startup with zero log growth — so the stall timeout must exceed
        # interpreter startup, not just the scripted sleep.
        stall_timeout=15.0, max_restarts=3, probe_first=False,
        probe=probe, poll_s=0.2,
    )
    assert rc == 0
    assert restarts == 1
    assert probes, "tunnel must be probed before a relaunch"
    assert time.time() - t0 < 120.0, "kill-and-relaunch took implausibly long"
    log = (tmp_path / "log.txt").read_text()
    assert log.count("started") == 2
    assert "resumed ok" in log


def test_deadline_stops_running_child_with_budget_rc(tmp_path):
    """A child still running when the wall-clock budget expires is killed and
    supervise returns BUDGET_RC (partial, resumable) — not a failure rc."""
    child = (
        "import time\n"
        "print('started', flush=True)\n"
        "for i in range(600):\n"
        "    time.sleep(1)\n"
        "    print('tick', i, flush=True)  # log keeps growing: never a stall\n"
    )
    t0 = time.time()
    rc, restarts = supervise(
        [PY, "-c", child],
        tmp_path / "log.txt", dict(os.environ), tmp_path,
        stall_timeout=300.0, max_restarts=2, probe_first=False,
        probe=lambda: True, poll_s=0.2,
        deadline=time.time() + 8.0,  # > interpreter startup (sitecustomize jax)
    )
    assert rc == BUDGET_RC
    assert restarts == 0
    assert time.time() - t0 < 60.0
    assert "started" in (tmp_path / "log.txt").read_text()


def test_deadline_respected_while_probing_dead_tunnel(tmp_path):
    rc, restarts = supervise(
        [PY, "-c", "print('never runs')"],
        tmp_path / "log.txt", dict(os.environ), tmp_path,
        stall_timeout=30.0, max_restarts=2, probe_first=True,
        probe=lambda: False, probe_retry_s=0.2, poll_s=0.2,
        deadline=time.time() + 1.0,
    )
    assert rc == BUDGET_RC
    assert not (tmp_path / "log.txt").exists() or "never runs" not in (tmp_path / "log.txt").read_text()


def test_gives_up_after_max_restarts(tmp_path):
    rc, restarts = supervise(
        [PY, "-c", "print('x'); raise SystemExit(7)"],
        tmp_path / "log.txt", dict(os.environ), tmp_path,
        stall_timeout=30.0, max_restarts=2, probe_first=False,
        probe=lambda: True, poll_s=0.2,
    )
    assert rc == 7
    assert restarts == 3  # 1 initial failure + 2 allowed restarts, then give up
