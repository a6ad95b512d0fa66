#!/usr/bin/env python
"""Append an orphaned sweep leg's record to sweep.json.

The driver-surgery pattern (CLAUDE.md) kills the sweep parent while its
text-predict child keeps training; the child's result then never reaches
sweep.json, and a relaunched driver would rerun the arm from scratch.
This records it from the log exactly as quality_sweep.best_v_entropy
would have:

    python scripts/sweep_record.py h1599-distill-best41-a50 \
        --note "leg completed orphaned (driver surgery)"

Refuses to double-record a tag that already has a best_v_entropy, and
refuses to record a leg whose process is still alive (pass --pid to
check a specific one; by default it scans /tmp/leg.pid if present).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from quality_sweep import best_v_entropy  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("tag", help="sweep arm tag (log/net basename)")
    p.add_argument("--workdir", default="artifacts/sweep")
    p.add_argument("--note", default="leg completed orphaned "
                   "(driver surgery); recorded from the log")
    p.add_argument("--seconds", type=float, default=None,
                   help="wall-clock if known (the driver normally "
                   "records it; an orphan's is usually unknown)")
    p.add_argument("--pid", type=int, default=None,
                   help="refuse to record while this pid is alive "
                   "(default: the pid in /tmp/leg.pid, if any)")
    p.add_argument("--sweep-pid-file", default="/tmp/sweep.pid",
                   help="refuse to record while the driver pid written "
                   "here is alive (it owns sweep.json between legs)")
    p.add_argument("--force", action="store_true",
                   help="record even if the tag already has an entry "
                   "(appends; the driver's done-set takes any truthy "
                   "best_v_entropy, so duplicates are harmless but ugly)")
    opt = p.parse_args(argv)

    pid = opt.pid
    if pid is None and os.path.exists("/tmp/leg.pid"):
        try:
            pid = int(open("/tmp/leg.pid").read().strip())
        except ValueError:
            pid = None
    if pid is not None and pid_alive(pid):
        print(f"pid {pid} is still alive — the leg has not finished; "
              "refusing to record a partial result", file=sys.stderr)
        return 1
    # ADVICE r4: also refuse while the sweep DRIVER is alive — it writes
    # sweep.json after every leg and a concurrent append would be lost
    if os.path.exists(opt.sweep_pid_file):
        try:
            driver = int(open(opt.sweep_pid_file).read().strip())
        except ValueError:
            driver = None
        if driver is not None and pid_alive(driver):
            print(f"sweep driver pid {driver} is alive — it records its "
                  "own legs and re-reads the done-set at each boundary; "
                  "refusing to write concurrently", file=sys.stderr)
            return 1

    workdir = os.path.join(REPO, opt.workdir) \
        if not os.path.isabs(opt.workdir) else opt.workdir
    record_path = os.path.join(workdir, "sweep.json")
    log = os.path.join(workdir, f"{opt.tag}.log")
    best, best_gen = best_v_entropy(log)
    if best is None:
        print(f"no v_entropy lines in {log}", file=sys.stderr)
        return 1

    state = json.load(open(record_path))
    probes = state["probes"]
    if not opt.force and any(
            r["tag"] == opt.tag and r.get("best_v_entropy")
            for r in probes):
        print(f"tag {opt.tag} already recorded (use --force to append)",
              file=sys.stderr)
        return 1
    rec = {"tag": opt.tag, "rc": 0, "best_v_entropy": best,
           "best_at_gen": best_gen, "seconds": opt.seconds,
           "note": opt.note}
    probes.append(rec)
    import tempfile  # atomic replace: a crash mid-write must not eat sweep.json
    fd, tmp = tempfile.mkstemp(dir=workdir)
    with os.fdopen(fd, "w") as f:
        json.dump(state, f, indent=1)
    os.replace(tmp, record_path)
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    sys.exit(main())
