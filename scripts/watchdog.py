"""Run a training subprocess under a stall watchdog.

The axon tunnel can wedge a fresh process forever (its first compile RPC
never returns — observed repeatedly when a new process starts while the
remote is tearing down the previous session).  A wedged leg burns no CPU
and writes no log, so plain `subprocess.run` + retry-on-nonzero never
fires.  This helper polls the leg's log file: no first byte within
`first_timeout` (compiles can legitimately take 10-20 min for big nets)
or no growth for `stall_timeout` after output began → kill, let the
tunnel heal, and report a stall so the caller retries.
"""

from __future__ import annotations

import os
import signal
import subprocess
import time

STALLED = -999


def run_watched(cmd, log_path: str, cwd=None, env=None,
                first_timeout: float = 1500.0,
                stall_timeout: float = 600.0,
                heal_delay: float = 120.0) -> int:
    """Run cmd; return its exit code, or STALLED if it was killed for
    making no log progress."""
    proc = subprocess.Popen(cmd, cwd=cwd, env=env,
                            start_new_session=True)
    try:  # let scripts/sweep_record.py refuse to record a live leg
        with open("/tmp/leg.pid", "w") as f:
            f.write(str(proc.pid))
    except OSError:
        pass
    t_start = time.time()
    last_size = -1
    last_change = t_start
    while True:
        rc = proc.poll()
        if rc is not None:
            return rc
        time.sleep(15)
        try:
            size = os.path.getsize(log_path)
        except OSError:
            size = -1
        now = time.time()
        if size != last_size:
            last_size = size
            last_change = now
            continue
        started = last_size > 0
        limit = stall_timeout if started else first_timeout
        if now - last_change > limit:
            print(f"watchdog: no log {'growth' if started else 'output'} "
                  f"for {int(now - last_change)}s; killing leg",
                  flush=True)
            try:
                os.killpg(proc.pid, signal.SIGTERM)
                time.sleep(5)
                os.killpg(proc.pid, signal.SIGKILL)
            except OSError:
                pass
            proc.wait()
            time.sleep(heal_delay)   # let the tunnel tear down/heal
            return STALLED
