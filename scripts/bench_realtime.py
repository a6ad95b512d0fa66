#!/usr/bin/env python
"""Measure the generative/streaming pillars against the reference's
real-time budgets (BASELINE.md):

  * rnnca: 20 fps at 144x96 (13,824 per-pixel net evals/frame) + 200
    trainers (gstrnnca.h:14-15)
  * recur: 25 fps, 341-net fractal construction per frame + 12 trainers
    (recur-context.h:65-99)
  * parrot: 16 kHz real-time simultaneous train + dream (gstparrot.h:23-27)

Prints one JSON line with each pillar's throughput and its multiple of the
real-time budget.  Run on the TPU:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_realtime.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def sync(x):
    """Device->host read: the only reliable sync through the axon tunnel."""
    return float(np.asarray(x).ravel()[0])


def bench_rnnca(reps: int = 30):
    from recur_tpu.video.rnnca import Rnnca
    ca = Rnnca(hidden_size=99, learn_rate=1e-5)
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, (3, ca.h, ca.w)).astype(np.uint8)
    prev = rng.integers(0, 255, (3, ca.h, ca.w)).astype(np.uint8)
    # generation (the per-pixel CA: one batched forward over 13,824 pixels)
    out = ca.step_ca()
    sync(out)                      # warm-up must not bleed into the timing
    t0 = time.perf_counter()
    for _ in range(reps):
        out = ca.step_ca()
    sync(out)
    gen_fps = reps / (time.perf_counter() - t0)
    # training (200 trainers per frame-pair)
    ca.train_frame_pair(prev, frame)
    sync(ca.params.ih)
    t0 = time.perf_counter()
    for _ in range(reps):
        ca.train_frame_pair(prev, frame)
    sync(ca.params.ih)
    train_fps = reps / (time.perf_counter() - t0)
    return gen_fps, train_fps


def bench_recur(reps: int = 30):
    from recur_tpu.video.recur_ctx import (RecurContext, WORKING_H,
                                           WORKING_W)
    ctx = RecurContext(learn_rate=1e-5)
    rng = np.random.default_rng(0)
    h, w = WORKING_H, WORKING_W
    frame = rng.integers(0, 255, (3, h, w)).astype(np.uint8)
    prev = rng.integers(0, 255, (3, h, w)).astype(np.uint8)
    out = ctx.confabulate()
    sync(ctx.params.ih)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = ctx.confabulate()
    sync(out)
    gen_fps = reps / (time.perf_counter() - t0)
    ctx.train_frame_pair(prev, frame)
    sync(ctx.params.ih)
    t0 = time.perf_counter()
    for _ in range(reps):
        ctx.train_frame_pair(prev, frame)
    sync(ctx.params.ih)
    train_fps = reps / (time.perf_counter() - t0)
    return gen_fps, train_fps


def bench_parrot(reps: int = 10, rate: int = 16000):
    from recur_tpu.audio.parrot import Parrot
    p = Parrot()
    rng = np.random.default_rng(0)
    # one-second blocks of noise; train AND dream simultaneously (the
    # element's playing+training mode).  Warm up TWICE: the second train()
    # call prepends the carried last MDCT frame, changing the chunk shape
    # and forcing one more compile.
    block = (rng.standard_normal(rate) * 3000).astype(np.float32)
    for _ in range(2):
        p.train(block)
        p.dream(rate)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        p.train(block)
        out = p.dream(rate)
        sync(out)
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    return 1.0 / dt            # seconds of audio per wall second


def main():
    def combined(gen_fps, train_fps):
        # the elements generate AND train every frame: the pipeline rate is
        # the harmonic combination, not the min
        return 1.0 / (1.0 / gen_fps + 1.0 / train_fps)

    results = {}
    ca_gen, ca_train = bench_rnnca()
    results["rnnca_generate_fps"] = round(ca_gen, 1)
    results["rnnca_train_fps"] = round(ca_train, 1)
    results["rnnca_vs_budget"] = round(combined(ca_gen, ca_train) / 20.0, 1)
    rc_gen, rc_train = bench_recur()
    results["recur_generate_fps"] = round(rc_gen, 1)
    results["recur_train_fps"] = round(rc_train, 1)
    results["recur_vs_budget"] = round(combined(rc_gen, rc_train) / 25.0, 1)
    try:
        xrt = bench_parrot()
        results["parrot_x_realtime"] = round(xrt, 1)
    except Exception as e:          # keep the other rows if parrot differs
        results["parrot_error"] = str(e)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
