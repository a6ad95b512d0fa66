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


BLOCK = 8       # frames per device call: the streaming block size — the
                # ~26 ms axon readback is paid once per block (CLAUDE.md
                # cost model), adding a ~BLOCK-frame pipeline latency


def bench_rnnca(reps: int = 12):
    """The rnnca element trains on the incoming frame pair AND generates
    one CA frame, every frame (gstrnnca.c:805-831).  Both run as
    BLOCK-frame device calls (train_frame_block / step_ca_block, identical
    math to the per-frame path — equality-tested); the element fps is the
    interleaved rate."""
    from recur_tpu.video.rnnca import Rnnca
    ca = Rnnca(hidden_size=99, learn_rate=1e-5)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (BLOCK + 1, 3, ca.h, ca.w)).astype(np.uint8)
    # warm-up compiles
    ca.train_frame_block(frames[:-1], frames[1:])
    out = ca.step_ca_block(BLOCK)
    sync(ca.params.ih)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = ca.step_ca_block(BLOCK)          # block-syncs internally
    gen_fps = reps * BLOCK / (time.perf_counter() - t0)
    t0 = time.perf_counter()
    for _ in range(reps):
        ca.train_frame_block(frames[:-1], frames[1:])
    sync(ca.params.ih)
    train_fps = reps * BLOCK / (time.perf_counter() - t0)
    # the real element: train + generate, interleaved
    t0 = time.perf_counter()
    for _ in range(reps):
        ca.train_frame_block(frames[:-1], frames[1:])
        out = ca.step_ca_block(BLOCK)
    sync(ca.params.ih)
    combined_fps = reps * BLOCK / (time.perf_counter() - t0)
    return gen_fps, train_fps, combined_fps


def bench_recur(reps: int = 12):
    """The recur element trains 12 patch trainers AND runs the 341-net
    fractal construction, every frame (recur-context.h:65-99).  Generation
    runs as confabulate_block (device-resident seed feedback); training
    stays per-frame (12 streams, host feature prep — already cheap)."""
    from recur_tpu.video.recur_ctx import (RecurContext, WORKING_H,
                                           WORKING_W)
    ctx = RecurContext(learn_rate=1e-5)
    rng = np.random.default_rng(0)
    h, w = WORKING_H, WORKING_W
    frame = rng.integers(0, 255, (3, h, w)).astype(np.uint8)
    prev = rng.integers(0, 255, (3, h, w)).astype(np.uint8)
    ctx.train_frame_pair(prev, frame)          # warm-up compiles
    out = ctx.confabulate_block(BLOCK)
    sync(ctx.params.ih)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = ctx.confabulate_block(BLOCK)     # block-syncs internally
    gen_fps = reps * BLOCK / (time.perf_counter() - t0)
    t0 = time.perf_counter()
    for _ in range(reps * BLOCK):
        ctx.train_frame_pair(prev, frame)
    sync(ctx.params.ih)
    train_fps = reps * BLOCK / (time.perf_counter() - t0)
    t0 = time.perf_counter()
    for _ in range(reps):
        for _ in range(BLOCK):
            ctx.train_frame_pair(prev, frame)
        out = ctx.confabulate_block(BLOCK)
    sync(ctx.params.ih)
    combined_fps = reps * BLOCK / (time.perf_counter() - t0)
    return gen_fps, train_fps, combined_fps


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
    results = {"block_frames": BLOCK}
    ca_gen, ca_train, ca_both = bench_rnnca()
    results["rnnca_generate_fps"] = round(ca_gen, 1)
    results["rnnca_train_fps"] = round(ca_train, 1)
    results["rnnca_element_fps"] = round(ca_both, 1)
    results["rnnca_vs_budget"] = round(ca_both / 20.0, 1)
    rc_gen, rc_train, rc_both = bench_recur()
    results["recur_generate_fps"] = round(rc_gen, 1)
    results["recur_train_fps"] = round(rc_train, 1)
    results["recur_element_fps"] = round(rc_both, 1)
    results["recur_vs_budget"] = round(rc_both / 25.0, 1)
    try:
        xrt = bench_parrot()
        results["parrot_x_realtime"] = round(xrt, 1)
    except Exception as e:          # keep the other rows if parrot differs
        results["parrot_error"] = str(e)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
