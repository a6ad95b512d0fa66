"""Benchmark: char-LM training throughput (the reference's central workload,
rnn_char_epoch at text-predict defaults: h=199, ~42-symbol alphabet, BPTT
depth 30, weighted momentum).

Metric: net-steps/sec = characters x parallel streams trained per second.
The reference trains one stream on one core; this engine batches S streams
into MXU matmuls (SURVEY.md §7) and scans a whole chunk per device call.

Baseline: bench_baseline.c — a fresh micro-implementation of the same
per-character hot loop (sparse zero-row-skipping matvec forward, depth-30
row-skipped BPTT, momentum update) compiled -O3 -march=native -ffast-math on
this host, i.e. the "SIMD C core" of BASELINE.md measured on the same box.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import glob
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))


def quality_records():
    """Best committed erewhon validation scores (bits/char, lower is
    better) from the sweep artifacts — static facts, no device work.
    The reference binary's own 40M-generation control bottomed at
    2.3185 (artifacts/ref_longrun; its README's "≈2" is training
    entropy, README.md:105-107)."""
    best_single, best_single_src = None, None
    for f in glob.glob(os.path.join(REPO, "artifacts/sweep/*.best.json")):
        # pyc-* nets score a DIFFERENT corpus (the round-5 replication);
        # mixing them in here would misreport e.g. the pyc h=399
        # student's 1.799 as an erewhon record
        if os.path.basename(f).startswith("pyc-"):
            continue
        try:
            v = json.load(open(f)).get("v_entropy")
        except Exception:
            continue
        if v is not None and (best_single is None or v < best_single):
            best_single, best_single_src = v, os.path.basename(f)
    best_mix, best_mix_src = None, None
    for f in glob.glob(os.path.join(REPO, "artifacts/sweep/ensemble*.json")):
        if os.path.basename(f).startswith("ensemble_pyc"):
            continue
        try:
            v = json.load(open(f)).get("ensemble_mixture")
        except Exception:
            continue
        if v is not None and (best_mix is None or v < best_mix):
            best_mix, best_mix_src = v, os.path.basename(f)
    if best_single is None and best_mix is None:
        return None
    second = None
    rep = os.path.join(REPO, "artifacts/ref_pycorpus/replication.json")
    if os.path.exists(rep):
        try:
            t = json.load(open(rep))
            o = t.get("ordering", {})
            second = {
                "corpus": "pycorpus (never-tuned, erewhon-frozen recipe)",
                "best_student": (min(o["students"].values())
                                 if o.get("students") else None),
                "reference_defaults_control":
                    o.get("reference_defaults_control"),
                "reference_generous_control":
                    o.get("reference_generous_control"),
                "ordering_holds": o.get("holds_vs_defaults_control"),
                "students_mixture":
                    (t.get("students_mixture") or {}).get("score"),
            }
        except Exception:
            second = None
    crosscheck = None
    xc = os.path.join(REPO, "artifacts/ref_crosscheck/crosscheck.json")
    if os.path.exists(xc):
        try:
            rows = json.load(open(xc))["rows"]
            deltas = [abs(r["delta"]) for r in rows if "delta" in r]
            crosscheck = {"nets_scored_by_reference_binary": len(rows),
                          "max_abs_delta_bits": max(deltas) if deltas
                          else None}
        except Exception:
            crosscheck = None
    return {
        "second_corpus": second,
        "best_single_net_v_entropy": best_single,
        "best_single_net_artifact": best_single_src,
        "best_ensemble_v_entropy": best_mix,
        "best_ensemble_artifact": best_mix_src,
        "reference_binary_best_v_entropy": 2.3185,
        "reference_binary_crosscheck": crosscheck,
        "unit": "bits/char on erewhon validation (10k chars, warm lap)",
    }


def realtime_records():
    """Latest committed generative-pillar measurement
    (scripts/bench_realtime.py on the real chip — static facts; the run
    itself costs ~25 min of compiles, so the driver bench reports the
    committed artifact rather than re-measuring)."""
    # realtime_*.json only (the pallas race artifacts live beside them),
    # newest by mtime — not alphabetically-last (ADVICE r4)
    cands = glob.glob(os.path.join(REPO, "artifacts/realtime/realtime_*.json"))
    for f in sorted(cands, key=os.path.getmtime, reverse=True):
        try:
            best = json.load(open(f))
            best["artifact"] = os.path.basename(f)
            return best
        except Exception:
            continue
    return None


def classify_hard_records():
    """Latest committed hard-classify evaluation (scripts/classify_hard.py
    — the task that can fail: same-band chirp-direction discrimination)."""
    f = os.path.join(REPO, "artifacts/classify_hard/results.json")
    try:
        return json.load(open(f))
    except Exception:
        return None
sys.path.insert(0, REPO)

C_BASELINE_FALLBACK = 26641.0  # chars/s measured on this image's CPU
C_CLASSIFY_FALLBACK = 12470.0  # windows/s measured on this image's CPU


def _c_bench(src_name: str, exe: str, seconds: float, fallback: float) -> float:
    src = os.path.join(REPO, src_name)
    try:
        if not os.path.exists(exe) or os.path.getmtime(exe) < os.path.getmtime(src):
            subprocess.run(
                ["gcc", "-O3", "-march=native", "-ffast-math", "-o", exe,
                 src, "-lm"], check=True, capture_output=True)
        out = subprocess.run([exe, str(seconds)], check=True,
                             capture_output=True, text=True, timeout=60)
        return float(out.stdout.strip())
    except Exception:
        return fallback


def c_baseline(seconds: float = 2.0) -> float:
    return _c_bench("bench_baseline.c", "/tmp/recur_bench_baseline",
                    seconds, C_BASELINE_FALLBACK)


def c_classify_baseline(seconds: float = 2.0) -> float:
    return _c_bench("bench_classify_baseline.c",
                    "/tmp/recur_bench_classify", seconds, C_CLASSIFY_FALLBACK)


def classify_compute_bench(unroll: int = 1) -> float:
    """Compute-only classify training throughput (channel-windows/s): the
    full per-window pipeline of the classify element — Hann window → FFT →
    40 log-frequency bins → h=199 forward → 2-class softmax error → depth-30
    BPTT → apply+condition — with the PCM frames resident on the device, so
    the number measures the classify step itself, not the ~50MB/s axon
    tunnel (BASELINE.md north star: ≥50x the SIMD C window step,
    bench_classify_baseline.c)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from recur_tpu.audio import classify as ac
    from recur_tpu import nn

    on_tpu = jax.default_backend() != "cpu"
    C, T = (1000, 128) if on_tpu else (16, 16)
    clf = ac.AudioClassifier("Mm", n_channels=C, window_size=256,
                             hidden_size=199, learn_rate=1e-4,
                             net_filename="/tmp/bench_classify.net")
    cfg = clf.net.cfg
    binner, groups = clf.binner, tuple(clf.groups)
    import dataclasses
    hyper = dataclasses.replace(clf.hyper, unroll=unroll)
    seen0 = jnp.zeros(cfg.o_size, jnp.float32)
    live = jnp.ones(T, bool)
    rng = np.random.default_rng(0)
    targets = jnp.asarray(rng.integers(0, 2, (T, C, 1)), jnp.int32)
    frames = jnp.asarray(rng.standard_normal((T, C, 256)), jnp.float32)

    def step(params, bptt, state, frames, key):
        feats = binner.log_freq_bins(frames)
        return ac.classify_train_windows(
            cfg, hyper, groups, params, bptt, state, feats, targets,
            seen0, jnp.float32(0.0), clf.error_weight, live, live, key,
            jnp.float32(0.95), jnp.float32(0.0))

    fn = jax.jit(step)
    params, bptt, state = clf.params, clf.bptt, clf.state
    key = jax.random.PRNGKey(0)
    # Pipelined dispatch: enqueue B chained blocks, sync once (device->host
    # read; block_until_ready can return early on the axon transport).  A
    # streaming deployment feeds blocks back-to-back the same way — the
    # ~26ms tunnel readback latency is not part of the steady-state rate.
    params, bptt, state, stats = fn(params, bptt, state, frames, key)
    float(stats.error)
    B = 8 if jax.default_backend() != "cpu" else 2
    times = []
    for i in range(4):
        t0 = time.perf_counter()
        for _ in range(B):
            params, bptt, state, stats = fn(params, bptt, state, frames, key)
        float(stats.error)
        times.append(time.perf_counter() - t0)
    dt = sorted(times[1:])[len(times[1:]) // 2] / B
    return T * C / dt


def caravel_bench(walk_unroll: int = 1, unroll: int = 1,
                  batch_size: int = 1, history_dtype: str = "float32",
                  top_dtype: str = "float32",
                  bptt_impl: str = "buffered") -> float:
    """Author-ID training throughput (chars/s) on the caravel shape the
    reference's charmodel.so was built for (py-recur-text.c:428-591;
    multi-text net i73-h99-o3650 = 50 heads x 73 symbols): train_batch over
    parallel documents with deferred log readback."""
    import time
    import numpy as np
    import jax
    from recur_tpu.compat.charmodel import Alphabet, Net

    on_tpu = jax.default_backend() != "cpu"
    S, T = (1024, 4097) if on_tpu else (4, 65)
    alphabet = Alphabet(alphabet_chars="".join(
        chr(0x21 + i) for i in range(73)))
    classes = [f"c{i}" for i in range(50)]
    net = Net(alphabet, classes, 99, log_file=None, pipeline_depth=2,
              presynaptic_noise=0.0, walk_unroll=walk_unroll, unroll=unroll,
              batch_size=batch_size, history_dtype=history_dtype,
              top_dtype=top_dtype, bptt_impl=bptt_impl)
    rng = np.random.default_rng(0)
    texts = [rng.integers(0, 73, T, dtype=np.int32) for _ in range(S)]
    doc_classes = [classes[i % 50] for i in range(S)]
    net.train_batch(texts, doc_classes)        # compile + warm
    net.drain_logs()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        net.train_batch(texts, doc_classes)
        net.drain_logs()
        times.append(time.perf_counter() - t0)
    return S * (T - 1) / sorted(times)[1]


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from recur_tpu import nn
    from recur_tpu import engine
    from recur_tpu.engine import TrainHyper
    from recur_tpu.nn import Flag
    from recur_tpu.ops import init as winit

    # two C runs, take the faster (the baseline varies ~10%)
    base = max(c_baseline(), c_baseline())

    net = nn.new_net(42, 199, 42,
                     flags=Flag.STANDARD | Flag.BPTT_ADAPTIVE_MIN_ERROR,
                     rng_seed=1, depth=30, learn_rate=1e-4)
    winit.randomise_weights(net)
    cfg = net.cfg

    best = 0.0
    best_cfg = None
    if jax.default_backend() != "cpu":
        # large stream counts and long scan chunks amortise per-op overhead;
        # bf16 history halves the HBM traffic of the backward walk (entropy
        # curves match f32).  Swept S x T: throughput peaks near S~3.5k for
        # the buffered form.  The formulation landscape (ops/core.py:
        # buffered big-einsum > factored one-hot > two-pass replay, the
        # latter ~2.2x slower) was raced in earlier rounds; the sweep now
        # keeps the two live contenders plus unroll variants.
        # (S, T, history dtype, impl, unroll, walk_unroll, batch)
        # batch > 1 = the reference's --batch-size cadence run as the
        # windowed batched-walk formulation (char_train_window_chunk)
        configs = ((3584, 4096, jnp.bfloat16, "buffered", 1, 1, 1),
                   (3584, 4096, jnp.bfloat16, "buffered", 4, 1, 1),
                   (3584, 4096, jnp.bfloat16, "buffered", 4, 6, 1),
                   (3584, 4096, jnp.bfloat16, "buffered", 8, 1, 32),
                   (3584, 4096, jnp.bfloat16, "factored", 1, 1, 1))
    else:
        configs = ((64, 256, jnp.float32, "buffered", 1, 1, 1),)
    def time_chunk(a_net, S, T, hdtype, impl, unroll=1, reps=8,
                   walk_unroll=1, batch=1):
        """Median steps/s over the tail reps, with a device->host read as
        the per-iteration sync (block_until_ready can return early on
        queued work through the axon transport)."""
        hyper = TrainHyper(condition=False, bptt_impl=impl, unroll=unroll,
                           walk_unroll=walk_unroll, batch_size=batch)
        chunk_fn = (engine.char_train_window_chunk if batch > 1
                    else engine.char_train_chunk)
        params = jax.device_put(jax.tree.map(jnp.copy, a_net.params))
        bptt = nn.new_bptt_state(a_net.cfg, S, 1e-4, 0.95)
        state = nn.new_state(a_net.cfg, S, history_dtype=hdtype,
                             factored=(impl == "factored"))
        tokens = jnp.asarray(np.random.default_rng(0).integers(
            0, a_net.cfg.input_size, size=(S, T + 1)))
        key = jax.random.PRNGKey(0)
        args = (jnp.float32(0.95), jnp.float32(0.0))
        times = []
        for i in range(reps):
            t0 = time.perf_counter()
            params, bptt, state, tot = chunk_fn(
                a_net.cfg, hyper, params, bptt, state, tokens, key, *args)
            float(tot.entropy)
            times.append(time.perf_counter() - t0)
        dt = sorted(times[2:])[len(times[2:]) // 2]
        return S * T / dt

    for S, T, hdtype, impl, unroll, wu, batch in configs:
        rate = time_chunk(net, S, T, hdtype, impl, unroll, walk_unroll=wu,
                          batch=batch)
        print(f"# S={S} T={T} {jnp.dtype(hdtype).name} {impl} u{unroll} "
              f"w{wu} b{batch}: {rate:,.0f} steps/s", file=sys.stderr)
        if rate > best:
            best = rate
            best_cfg = (S, T, str(jnp.dtype(hdtype)), impl, unroll, wu,
                        batch)

    # the reference's big-net point (recur-nn.c:26-31 brags about h=1999):
    # one config, S=512 streams x T=2048 chunks
    h1999 = None
    if jax.default_backend() != "cpu":
        big = nn.new_net(42, 1999, 42,
                         flags=Flag.STANDARD | Flag.BPTT_ADAPTIVE_MIN_ERROR,
                         rng_seed=1, depth=30, learn_rate=1e-4)
        winit.randomise_weights(big)
        h1999 = time_chunk(big, 512, 2048, jnp.bfloat16, "buffered", reps=5)
        print(f"# h=1999 S=512 T=2048: {h1999:,.0f} steps/s",
              file=sys.stderr)

    # classify north star (BASELINE.json): windows/s vs the C window step
    classify_base = max(c_classify_baseline(), c_classify_baseline())
    classify = classify_compute_bench()
    if jax.default_backend() != "cpu":
        c4 = classify_compute_bench(unroll=4)
        print(f"# classify unroll=4: {c4:,.0f} windows/s "
              f"(u1: {classify:,.0f})", file=sys.stderr)
        classify = max(classify, c4)
    caravel = caravel_bench()
    caravel_configs = {"batch1": round(caravel, 0)}
    if jax.default_backend() != "cpu":
        # the h=100 shape is per-op-overhead-bound at batch_size=1 (50
        # sequential micro-matmuls per char).  Race (a) walk-unroll on the
        # per-char path, (b) the reference's own --batch-size cadence
        # (py-recur-text.c batch_size kwarg) run as the windowed batched
        # walk (multihead_train_window_chunk) where the whole window's
        # backward batches [S*B] rows per depth step.
        for kw in ({"walk_unroll": 8},
                   # bf16 top-layer error tensors + bf16 ring: the walk is
                   # the caravel step's dominant cost (stage ablation,
                   # PERF.md round-3b) and both its matmuls and its HBM
                   # traffic halve in bf16
                   {"walk_unroll": 8, "top_dtype": "bfloat16"},
                   {"walk_unroll": 8, "top_dtype": "bfloat16",
                    "history_dtype": "bfloat16"},
                   # the reference's --batch-size cadence as the windowed
                   # batched walk, bf16 end-to-end (ties the per-char path
                   # on this tunnel; wins where per-op latency is lower)
                   {"batch_size": 16, "unroll": 4, "walk_unroll": 8,
                    "top_dtype": "bfloat16", "history_dtype": "bfloat16"},
                   # one-hot-factored ring (round-3c: the multihead input
                   # is a one-hot char, so the ring shrinks i=176 -> W=101
                   # rows + token ids = ~43% less of the walk's dominant
                   # HBM traffic, which the round-3b ablation showed is
                   # the caravel bind)
                   {"walk_unroll": 8, "top_dtype": "bfloat16",
                    "history_dtype": "bfloat16", "bptt_impl": "factored"},
                   {"walk_unroll": 8, "bptt_impl": "factored"},
                   # round-4: factored ring + windowed batched walk — the
                   # two walk-traffic cuts compose (the window buffer's
                   # depth-step re-reads shrink i=176 -> W=101 on top of
                   # the [S*B] batching)
                   {"batch_size": 16, "unroll": 4, "walk_unroll": 8,
                    "top_dtype": "bfloat16", "history_dtype": "bfloat16",
                    "bptt_impl": "factored"}):
            c = caravel_bench(**kw)
            tag = ",".join(f"{k}={v}" for k, v in kw.items())
            print(f"# caravel {tag}: {c:,.0f} chars/s "
                  f"(batch1: {caravel_configs['batch1']:,.0f})",
                  file=sys.stderr)
            caravel_configs[tag] = round(c, 0)
            caravel = max(caravel, c)

    full = {
        "metric": "char-LM BPTT training throughput (h=199, depth=30, "
                  "42-sym alphabet; streams x chars/sec)",
        "value": round(best, 0),
        "unit": "net-steps/s",
        "vs_baseline": round(best / base, 1),
        "extra": {
            "best_config": best_cfg,
            "h1999_net_steps_per_sec": round(h1999, 0) if h1999 else None,
            "classify_windows_per_sec": round(classify, 0),
            "classify_c_baseline_windows_per_sec": round(classify_base, 0),
            "classify_vs_baseline": round(classify / classify_base, 1),
            "caravel_train_chars_per_sec": round(caravel, 0),
            "caravel_configs": caravel_configs,
            "quality": quality_records(),
            "realtime_pillars": realtime_records(),
            "classify_hard": classify_hard_records(),
            "classify_note": "compute-only (device-resident PCM frames), "
                "pipelined steady-state: window+FFT+40 log bins+h=199 fwd+"
                "depth-30 BPTT+apply per window, 1000 channels; C baseline "
                "bench_classify_baseline.c",
        },
    }
    # Full detail goes to a committed artifact; stdout ends with ONE
    # COMPACT line so the driver's tail capture keeps the headline
    # numbers (VERDICT r4 weak #1: r03/r04 tails truncated the flagship
    # rows out of the big JSON).
    outdir = os.path.join(REPO, "artifacts/bench")
    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, "BENCH_full_latest.json"), "w") as f:
        json.dump(full, f, indent=1)
    q = quality_records() or {}
    rt = realtime_records() or {}
    print(json.dumps({
        "metric": full["metric"],
        "value": full["value"],
        "unit": full["unit"],
        "vs_baseline": full["vs_baseline"],
        "headline": {
            "flagship_net_steps_per_sec": round(best, 0),
            "h1999_net_steps_per_sec": round(h1999, 0) if h1999 else None,
            "classify_windows_per_sec": round(classify, 0),
            "classify_vs_c_baseline": round(classify / classify_base, 1),
            "caravel_train_chars_per_sec": round(caravel, 0),
            "best_single_net_v_entropy": q.get("best_single_net_v_entropy"),
            "best_ensemble_v_entropy": q.get("best_ensemble_v_entropy"),
            "reference_binary_best_v_entropy":
                q.get("reference_binary_best_v_entropy"),
            "second_corpus": q.get("second_corpus"),
            "rnnca_vs_budget": rt.get("rnnca_vs_budget"),
            "recur_vs_budget": rt.get("recur_vs_budget"),
            "parrot_x_realtime": rt.get("parrot_x_realtime"),
            "full_detail": "artifacts/bench/BENCH_full_latest.json",
        },
    }))


if __name__ == "__main__":
    main()
