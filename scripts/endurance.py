#!/usr/bin/env python
"""Endurance run: train the flagship char-LM for millions of generations
across many checkpoint/resume legs, surviving axon tunnel drops.

The reference's habitat is the months-long unattended run (README.md:34-42);
its survival tools are periodic atomic checkpoints and deterministic reload
filenames (SURVEY §5.3/§5.4).  This driver adds the piece the tunnelled TPU
environment needs: the device can drop (FAILED_PRECONDITION on any array
read) after very long sessions, and a fresh process recovers — so each leg
is a subprocess, and any crash just starts the next leg from the last saved
net via --reload.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/endurance.py \
        --target 20000000 --workdir /tmp/endurance

Writes <workdir>/endurance.json with a leg-by-leg record.
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from watchdog import STALLED, run_watched


def last_generation(net_path: str) -> int:
    """Read net.generation straight out of the CDB checkpoint — the
    authoritative resume point (each leg truncates its own log file, so the
    log is not reliable across legs)."""
    import struct
    from recur_tpu.utils.cdb import Reader
    try:
        v = Reader.open(net_path).get("net.generation")
    except OSError:
        return 0
    return struct.unpack("<I", v)[0] if v else 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--target", type=int, default=20_000_000)
    p.add_argument("--leg-generations", type=int, default=4_000_000,
                   help="stop-after increment per leg")
    p.add_argument("--workdir", default="/tmp/endurance")
    p.add_argument("--text",
                   default="/root/reference/test-images/erewhon.txt")
    p.add_argument("--multi-tap", type=int, default=256)
    p.add_argument("--learn-rate", type=float, default=5e-6)
    p.add_argument("--max-retries", type=int, default=20)
    p.add_argument("--compile-cache", action="store_true",
                   help="set JAX_COMPILATION_CACHE_DIR for the legs "
                        "(helps on backends whose executables serialise)")
    p.add_argument("extra", nargs="*",
                   help="extra text-predict flags (after --), e.g. "
                        "-- --learn-rate-inertia 60")
    opt = p.parse_args(argv)

    os.makedirs(opt.workdir, exist_ok=True)
    sys.path.insert(0, REPO)
    record_path = os.path.join(opt.workdir, "endurance.json")
    net_path = os.path.join(opt.workdir, "endurance.net")
    legs = []
    retries = 0
    t_start = time.time()

    while True:
        gen = last_generation(net_path)
        if gen >= opt.target:
            break
        if retries > opt.max_retries:
            print(f"endurance: gave up after {retries} retries", flush=True)
            return 1
        stop = min(gen + opt.leg_generations, opt.target)
        cmd = [sys.executable, "-m", "recur_tpu.cli.text_predict",
               "--text", opt.text,
               "--filename", net_path, "--reload",
               "--multi-tap", str(opt.multi_tap),
               "--learn-rate", str(opt.learn_rate),
               "--history-dtype", "bfloat16",
               "--validate-chars", "10000",
               "--log-file", os.path.join(
                   opt.workdir, f"endurance-leg{len(legs)}.log"),
               "--basename", os.path.join(opt.workdir, "endurance"),
               "--stop-after", str(stop), "--quiet"] + opt.extra
        t0 = time.time()
        print(f"endurance leg {len(legs)}: gen {gen} -> {stop}", flush=True)
        # persistent XLA compile cache: every leg is a fresh process, so
        # without it each resume pays the full chunk compile again.
        # Opt-in (--compile-cache): measured on the axon backend the cache
        # stays empty (remote executables don't serialise), so it is not
        # forced on by default.
        env = dict(os.environ)
        if opt.compile_cache:
            env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(opt.workdir,
                                                            ".jax_cache")
        rc = run_watched(cmd, os.path.join(
            opt.workdir, f"endurance-leg{len(legs)}.log"), cwd=REPO, env=env)
        dt = time.time() - t0
        new_gen = last_generation(net_path)
        legs.append({"leg": len(legs), "rc": rc,
                     "start_gen": gen, "end_gen": new_gen,
                     "seconds": round(dt, 1)})
        with open(record_path, "w") as f:
            json.dump({"target": opt.target, "legs": legs,
                       "elapsed": round(time.time() - t_start, 1)}, f,
                      indent=1)
        if new_gen > gen:
            # forward progress resets the retry budget even if the leg
            # crashed — a run whose legs routinely die to tunnel drops but
            # keep advancing must never abort (that is the whole point)
            retries = 0
        if rc != 0:
            retries += 1
            print(f"endurance: leg died rc={rc} at gen {new_gen}; "
                  f"resuming (retry {retries})", flush=True)
            time.sleep(5)       # give the tunnel a moment
        elif new_gen <= gen:
            retries += 1        # no forward progress — avoid a hot loop
            time.sleep(5)

    print(json.dumps({"done": True, "generations": last_generation(net_path),
                      "legs": len(legs),
                      "elapsed": round(time.time() - t_start, 1)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
