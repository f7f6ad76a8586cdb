"""Stall watchdog for long CLI runs through the axon TPU tunnel.

The tunnel can die mid-run, leaving the child wedged in a remote call forever
(observed: a 50k-step run hard-stalled at step 840 for 50+ minutes — idle
tunnel thread, busy-polling host threads; a fresh-process probe also hung).
`supervise()` watches the child's log for growth, kills a wedged child, waits
for the tunnel to answer a probe, and relaunches. Pair it with
`--training.checkpoint latest` so the relaunch resumes instead of restarting.
"""
from __future__ import annotations

import subprocess
import sys
import time
from pathlib import Path

# Returned by supervise() when the wall-clock budget (deadline) expires: the
# run is partial but resumable, not failed. 124 matches coreutils timeout(1).
BUDGET_RC = 124


def tunnel_alive(timeout: float = 240.0) -> bool:
    """Probe the TPU through the tunnel with a tiny matmul in a fresh process."""
    probe = (
        "import jax, numpy as np\n"
        "x = jax.numpy.ones((128, 128))\n"
        "print(float(np.asarray((x @ x).sum())))\n"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", probe],
            timeout=timeout,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.PIPE,
        )
        if r.returncode != 0:
            # A tunnel-down probe usually hangs (TimeoutExpired below); a
            # nonzero exit is more often a broken env/jax install — surface
            # the error instead of silently spinning on it forever.
            tail = (r.stderr or b"").decode(errors="replace").strip().splitlines()
            print(f"# WATCHDOG: probe exited rc={r.returncode}: "
                  f"{tail[-1] if tail else '(no stderr)'}", flush=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _kill_tree(proc: subprocess.Popen) -> None:
    proc.terminate()
    try:
        proc.wait(timeout=20)
    except subprocess.TimeoutExpired:
        proc.kill()
        proc.wait(timeout=20)


def supervise(
    cmd,
    log: Path,
    env,
    cwd,
    stall_timeout: float = 1500.0,
    max_restarts: int = 12,
    probe_first: bool = True,
    probe=tunnel_alive,
    probe_retry_s: float = 180.0,
    poll_s: float = 30.0,
    deadline: float | None = None,
):
    """Run `cmd` to completion, restarting it when the tunnel wedges it.

    Progress signal: the child's log grows (the trainer logs every 500 steps
    ~= 2 min; the worst quiet stretch is a cold tunnel compile ~10 min, so
    `stall_timeout` must exceed that). On stall: kill, wait until
    `tunnel_alive()`, relaunch — the run resumes from its newest checkpoint
    when launched with `--training.checkpoint latest`.

    `deadline` (absolute epoch seconds): wall-clock budget. When it passes,
    the child is killed and (BUDGET_RC, restarts) is returned — the run is
    *partial*, not failed; with checkpoint-every-validation it remains
    resumable, and callers should summarize whatever validation blocks exist.
    Returns (rc, restarts)."""
    restarts = 0
    while probe_first and not probe():
        if deadline is not None and time.time() > deadline:
            print("# WATCHDOG: deadline passed while waiting for the tunnel", flush=True)
            return BUDGET_RC, restarts
        print(f"# WATCHDOG: tunnel dead before first launch; retrying in {probe_retry_s:.0f}s", flush=True)
        time.sleep(probe_retry_s)
    # The log-growth signal requires unbuffered child stdout: with plain
    # file-redirected print() the child flushes on ~8KB boundaries, which at
    # ~100-byte lines every 2 min is hours between flushes — a healthy child
    # would look wedged and be killed repeatedly.
    env = dict(env)
    env["PYTHONUNBUFFERED"] = "1"
    while True:
        with open(log, "a") as lf:
            proc = subprocess.Popen(cmd, stdout=lf, stderr=subprocess.STDOUT, text=True, cwd=cwd, env=env)
            last_size, last_growth = -1, time.time()
            while True:
                try:
                    rc = proc.wait(timeout=poll_s)
                    break
                except subprocess.TimeoutExpired:
                    pass
                if deadline is not None and time.time() > deadline:
                    print("# WATCHDOG: wall-clock budget exhausted — stopping child (partial, resumable)", flush=True)
                    _kill_tree(proc)
                    return BUDGET_RC, restarts
                size = log.stat().st_size
                if size != last_size:
                    last_size, last_growth = size, time.time()
                elif time.time() - last_growth > stall_timeout:
                    print(f"# WATCHDOG: no log growth for {stall_timeout:.0f}s — killing wedged child", flush=True)
                    _kill_tree(proc)
                    rc = None  # stalled, not a real exit
                    break
        if rc == 0:
            return 0, restarts
        restarts += 1
        if restarts > max_restarts:
            print(f"# WATCHDOG: giving up after {max_restarts} restarts", flush=True)
            return rc if rc is not None else -1, restarts
        reason = "stall" if rc is None else f"rc={rc}"
        print(f"# WATCHDOG: restart {restarts}/{max_restarts} ({reason}); probing tunnel ...", flush=True)
        while not probe():
            if deadline is not None and time.time() > deadline:
                print("# WATCHDOG: deadline passed while waiting for the tunnel", flush=True)
                # A real child crash (rc not in {0, None}) must stay visible —
                # BUDGET_RC would mislabel it "partial, resumable".
                return (rc if rc not in (0, None) else BUDGET_RC), restarts
            print(f"# WATCHDOG: tunnel still dead; retrying in {probe_retry_s:.0f}s", flush=True)
            time.sleep(probe_retry_s)
        print("# WATCHDOG: tunnel healthy — relaunching (resumes from latest checkpoint)", flush=True)
