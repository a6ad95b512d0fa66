#!/usr/bin/env python
"""Race the fused Pallas forward kernel against the plain XLA forward on
the serving shapes it exists for (VERDICT r3 weak #3 / next #6):

  * rnnca CA serving: 13,824 pixel streams, i=30, h=99+1, o=3 pad 4
    (gstrnnca.c:454-458's per-pixel fleet)
  * recur constructor: 341 nodes, i=105, h=199, o=144 (context-recurse.c)

Both paths run `reps` chained steps (hidden fed back) enqueued back-to-back
with ONE device->host sync, so the number measures the step itself, not the
~26 ms tunnel readback.  Prints one JSON line.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_pallas.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def race(tag, cfg, params, S, reps=200):
    import jax
    import jax.numpy as jnp
    from recur_tpu.ops.core import forward_step
    from recur_tpu.ops import pallas_kernels as pk

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((S, cfg.input_size), np.float32))
    h0 = jnp.zeros((S, cfg.h_size), jnp.float32)

    @jax.jit
    def xla_step(hidden):
        fwd = forward_step(cfg, params, hidden, x)
        return fwd.hidden

    def pallas_step(hidden):
        h, _ = pk.fused_rnn_forward(cfg, params, (hidden, x), "sigmoid")
        return h

    out = {}
    for name, step in (("xla", xla_step), ("pallas", pallas_step)):
        try:
            h = step(h0)
            float(h.sum())                      # compile + settle
            times = []
            for _ in range(3):
                h = h0
                t0 = time.perf_counter()
                for _ in range(reps):
                    h = step(h)
                float(h.sum())                  # one sync for the chain
                times.append((time.perf_counter() - t0) / reps)
            out[name + "_us_per_step"] = round(sorted(times)[1] * 1e6, 1)
        except Exception as e:
            out[name + "_error"] = f"{type(e).__name__}: {e}"[:200]
    if "xla_us_per_step" in out and "pallas_us_per_step" in out:
        out["pallas_speedup"] = round(
            out["xla_us_per_step"] / out["pallas_us_per_step"], 2)
    return {tag: out}


def main():
    from recur_tpu import nn
    from recur_tpu.nn import Flag
    from recur_tpu.ops import init as winit

    results = {}
    # rnnca CA serving shape
    ca = nn.new_net(30, 99, 3, flags=Flag.STANDARD, rng_seed=1)
    winit.randomise_weights(ca)
    results.update(race("rnnca_13824", ca.cfg, ca.params, 13824))
    # recur constructor shape (one level = up to 256 rows; use all 341)
    rc = nn.new_net(105, 199, 144, flags=Flag.STANDARD, rng_seed=1)
    winit.randomise_weights(rc)
    results.update(race("recur_341", rc.cfg, rc.params, 341))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
