"""Multi-device parallelism: the explicit shard_map+psum DP chunk must equal
the single-device engine, and the GSPMD-sharded chunk must run on a
data x model mesh (8 virtual CPU devices, tests/conftest.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recur_tpu import nn, engine
from recur_tpu.engine import TrainHyper
from recur_tpu.ops import init as winit
from recur_tpu.parallel.mesh import (
    make_mesh, shard_map_train_chunk, shard_train_args, sharded_train_chunk)

pytestmark = pytest.mark.skipif(jax.device_count() < 8,
                                reason="needs 8 virtual devices")


def setup(S=16):
    net = nn.new_net(9, 15, 9, rng_seed=3, depth=5, learn_rate=1e-3)
    winit.randomise_weights(net)
    cfg = net.cfg
    hyper = TrainHyper(condition=False)
    tokens = jnp.asarray(np.random.default_rng(0).integers(0, 9, (S, 17)))
    return net, cfg, hyper, tokens


def test_shard_map_dp_equals_single_device():
    net, cfg, hyper, tokens = setup()
    S = tokens.shape[0]
    mesh = make_mesh(n_data=8, n_model=1)
    fn = shard_map_train_chunk(mesh, cfg, hyper)
    args = (jax.random.PRNGKey(0), jnp.float32(0.9), jnp.float32(0.0))
    p8, b8, s8, ent8 = fn(net.params, nn.new_bptt_state(cfg, S, 1e-3, 0.9),
                          nn.new_state(cfg, S), tokens, *args)
    p1, b1, s1, tot = engine.char_train_chunk(
        cfg, hyper, net.params, nn.new_bptt_state(cfg, S, 1e-3, 0.9),
        nn.new_state(cfg, S), tokens, *args)
    np.testing.assert_allclose(np.asarray(p8.ih), np.asarray(p1.ih),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p8.ho), np.asarray(p1.ho),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(ent8), float(tot.entropy), rtol=1e-4)


def test_gspmd_multistep_equality():
    """>=16-step exact GSPMD data x model vs single-device equality.  The
    BPTT early-exit thresholds are a knife edge under split-K rounding, so
    use a shallow depth (the walk always completes) and adaptive-min-error
    off — then the trajectories must agree to float tolerance."""
    S, T = 16, 24
    net = nn.new_net(9, 15, 9, rng_seed=3, depth=3, learn_rate=1e-3,
                     flags=nn.Flag.STANDARD & ~nn.Flag.BPTT_ADAPTIVE_MIN_ERROR)
    winit.randomise_weights(net)
    cfg = net.cfg
    assert not cfg.adaptive_min_error
    hyper = TrainHyper(condition=False)
    tokens = jnp.asarray(np.random.default_rng(1).integers(0, 9, (S, T + 1)))
    args = (jax.random.PRNGKey(0), jnp.float32(0.9), jnp.float32(0.0))

    mesh = make_mesh(n_data=4, n_model=2)
    params, bptt, state = shard_train_args(
        mesh, cfg, jax.tree.map(jnp.copy, net.params),
        nn.new_bptt_state(cfg, S, 1e-3, 0.9), nn.new_state(cfg, S))
    tok_s = jax.device_put(tokens, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("data", None)))
    p, b, s, tot = sharded_train_chunk(mesh, cfg, hyper)(
        params, bptt, state, tok_s, *args)

    p1, b1, s1, tot1 = engine.char_train_chunk(
        cfg, hyper, jax.tree.map(jnp.copy, net.params),
        nn.new_bptt_state(cfg, S, 1e-3, 0.9), nn.new_state(cfg, S),
        tokens, *args)
    np.testing.assert_allclose(np.asarray(p.ih), np.asarray(p1.ih),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p.ho), np.asarray(p1.ho),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s.hidden), np.asarray(s1.hidden),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(tot.entropy), float(tot1.entropy),
                               rtol=1e-5)


def test_tp_actually_shards():
    """The 'model' axis must really partition the weights and the compiled
    program must communicate (all-reduce/reduce-scatter) — TP is not a
    replication no-op."""
    net, cfg, hyper, tokens = setup()
    S = tokens.shape[0]
    mesh = make_mesh(n_data=4, n_model=2)
    params, bptt, state = shard_train_args(
        mesh, cfg, net.params, nn.new_bptt_state(cfg, S, 1e-3, 0.9),
        nn.new_state(cfg, S))
    # storage really is partitioned: each device holds half the ih columns
    shard = params.ih.addressable_shards[0]
    assert shard.data.shape == (cfg.i_size, cfg.h_size // 2), shard.data.shape
    assert len({s.device for s in params.ih.addressable_shards}) == 8
    # and the compiled program contains cross-device collectives
    fn = sharded_train_chunk(mesh, cfg, hyper)
    tok_s = jax.device_put(tokens, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("data", None)))
    txt = fn.lower(params, bptt, state, tok_s, jax.random.PRNGKey(0),
                   jnp.float32(0.9), jnp.float32(0.0)).compile().as_text()
    assert ("all-reduce" in txt or "reduce-scatter" in txt
            or "all-gather" in txt), "no collectives in compiled module"


def test_gspmd_data_model_mesh_runs():
    net, cfg, hyper, tokens = setup()
    S = tokens.shape[0]
    mesh = make_mesh(n_data=4, n_model=2)
    params, bptt, state = shard_train_args(
        mesh, cfg, net.params, nn.new_bptt_state(cfg, S, 1e-3, 0.9),
        nn.new_state(cfg, S))
    fn = sharded_train_chunk(mesh, cfg, hyper)
    tokens = jax.device_put(
        tokens, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("data", None)))
    # full multi-step chunk runs and is finite
    p, b, s, tot = fn(params, bptt, state, tokens, jax.random.PRNGKey(0),
                      jnp.float32(0.9), jnp.float32(0.0))
    jax.block_until_ready(tot)
    assert np.isfinite(float(tot.entropy))
    # single-step equality is near-exact (GSPMD is a layout change); beyond
    # one step the BPTT early-exit thresholds are a knife edge that
    # amplifies split-K rounding into discretely different walks, so longer
    # horizons are not comparable bit-wise
    one = tokens[:, :2]
    params2, bptt2, state2 = shard_train_args(
        mesh, cfg, jax.tree.map(jnp.copy, net.params),
        nn.new_bptt_state(cfg, S, 1e-3, 0.9), nn.new_state(cfg, S))
    p, b, s, tot = fn(params2, bptt2, state2, jax.device_put(
        one, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("data", None))),
        jax.random.PRNGKey(0), jnp.float32(0.9), jnp.float32(0.0))
    p1, b1, s1, tot1 = engine.char_train_chunk(
        cfg, hyper, jax.tree.map(jnp.copy, net.params),
        nn.new_bptt_state(cfg, S, 1e-3, 0.9),
        nn.new_state(cfg, S), one, jax.random.PRNGKey(0),
        jnp.float32(0.9), jnp.float32(0.0))
    np.testing.assert_allclose(np.asarray(p.ih), np.asarray(p1.ih),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(float(tot.entropy), float(tot1.entropy),
                               rtol=1e-5)


def test_multihead_head_sharding():
    """Expert-parallel multihead: heads (output blocks) shard over 'model',
    streams over 'data'; must match the single-device chunk and really
    partition the ho matrix."""
    from recur_tpu.models.multihead import multihead_train_chunk
    from recur_tpu.parallel.mesh import (shard_multihead_args,
                                         sharded_multihead_chunk)

    alphabet_len = 8
    n_classes = 4
    S, T = 8, 12
    net = nn.new_net(alphabet_len, 15, alphabet_len * n_classes, rng_seed=2,
                     depth=3, learn_rate=1e-3,
                     flags=nn.Flag.STANDARD & ~nn.Flag.BPTT_ADAPTIVE_MIN_ERROR)
    winit.randomise_weights(net)
    cfg = net.cfg
    hyper = TrainHyper(condition=False)
    rng = np.random.default_rng(5)
    tokens = jnp.asarray(rng.integers(0, alphabet_len, (S, T + 1)))
    target_class = jnp.asarray(rng.integers(0, n_classes, S))
    args = (jnp.float32(0.0), jax.random.PRNGKey(1), jnp.float32(0.9),
            jnp.float32(0.0))

    mesh = make_mesh(n_data=4, n_model=2)
    params, bptt, state = shard_multihead_args(
        mesh, cfg, jax.tree.map(jnp.copy, net.params),
        nn.new_bptt_state(cfg, S, 1e-3, 0.9), nn.new_state(cfg, S))
    # the ho matrix is genuinely split over heads
    assert params.ho.addressable_shards[0].data.shape == \
        (cfg.h_size, cfg.o_size // 2)
    fn = sharded_multihead_chunk(mesh, cfg, hyper, alphabet_len)
    tok_s = jax.device_put(tokens, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("data", None)))
    tc_s = jax.device_put(target_class, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("data")))
    p, b, s, stats = fn(params, bptt, state, tok_s, tc_s, *args)

    p1, b1, s1, stats1 = multihead_train_chunk(
        cfg, hyper, alphabet_len, jax.tree.map(jnp.copy, net.params),
        nn.new_bptt_state(cfg, S, 1e-3, 0.9), nn.new_state(cfg, S),
        tokens, target_class, *args)
    np.testing.assert_allclose(np.asarray(p.ho), np.asarray(p1.ho),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p.ih), np.asarray(p1.ih),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(stats.entropy), float(stats1.entropy),
                               rtol=1e-4)


def test_gspmd_factored_impl():
    """The factored-ring BPTT also runs sharded (data x model) and matches
    the single-device factored chunk."""
    S, T = 16, 16
    net = nn.new_net(9, 15, 9, rng_seed=3, depth=3, learn_rate=1e-3,
                     flags=nn.Flag.STANDARD & ~nn.Flag.BPTT_ADAPTIVE_MIN_ERROR)
    winit.randomise_weights(net)
    cfg = net.cfg
    hyper = TrainHyper(condition=False, bptt_impl="factored")
    tokens = jnp.asarray(np.random.default_rng(2).integers(0, 9, (S, T + 1)))
    args = (jax.random.PRNGKey(0), jnp.float32(0.9), jnp.float32(0.0))

    mesh = make_mesh(n_data=4, n_model=2)
    params, bptt, state = shard_train_args(
        mesh, cfg, jax.tree.map(jnp.copy, net.params),
        nn.new_bptt_state(cfg, S, 1e-3, 0.9),
        nn.new_state(cfg, S, factored=True))
    tok_s = jax.device_put(tokens, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("data", None)))
    p, b, s, tot = sharded_train_chunk(mesh, cfg, hyper)(
        params, bptt, state, tok_s, *args)

    p1, b1, s1, tot1 = engine.char_train_chunk(
        cfg, hyper, jax.tree.map(jnp.copy, net.params),
        nn.new_bptt_state(cfg, S, 1e-3, 0.9),
        nn.new_state(cfg, S, factored=True), tokens, *args)
    np.testing.assert_allclose(np.asarray(p.ih), np.asarray(p1.ih),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(tot.entropy), float(tot1.entropy),
                               rtol=1e-5)


def test_gspmd_distill_chunk():
    """Ensemble distillation runs sharded (student data x model, teachers
    replicated, teacher hiddens over 'data') and matches the single-device
    distill chunk."""
    from recur_tpu.parallel import sharded_distill_chunk
    S, T = 16, 12
    net = nn.new_net(9, 15, 9, rng_seed=3, depth=3, learn_rate=1e-3,
                     flags=nn.Flag.STANDARD & ~nn.Flag.BPTT_ADAPTIVE_MIN_ERROR)
    winit.randomise_weights(net)
    teacher = nn.new_net(9, 11, 9, rng_seed=7, depth=3)
    winit.randomise_weights(teacher)
    cfg = net.cfg
    hyper = TrainHyper(condition=False)
    rng = np.random.default_rng(4)
    xs = jnp.asarray(rng.integers(0, 9, (S, T)), jnp.int32)
    ys = jnp.asarray(rng.integers(0, 9, (S, T)), jnp.int32)
    args = (jax.random.PRNGKey(0), jnp.float32(0.9), jnp.float32(0.0),
            jnp.float32(0.7), jnp.float32(1.0))

    mesh = make_mesh(n_data=4, n_model=2)
    params, bptt, state = shard_train_args(
        mesh, cfg, jax.tree.map(jnp.copy, net.params),
        nn.new_bptt_state(cfg, S, 1e-3, 0.9), nn.new_state(cfg, S))
    data2 = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("data", None))
    th = (jax.device_put(jnp.zeros((S, teacher.cfg.h_size), jnp.float32),
                         data2),)
    tp = (jax.device_put(
        teacher.params, jax.tree.map(
            lambda _: jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec()), teacher.params)),)
    xs_s = jax.device_put(xs, data2)
    ys_s = jax.device_put(ys, data2)
    p, b, s, th_out, tot = sharded_distill_chunk(
        mesh, cfg, hyper, (teacher.cfg,))(
        params, bptt, state, th, tp, xs_s, ys_s, *args)

    th1 = (jnp.zeros((S, teacher.cfg.h_size), jnp.float32),)
    p1, b1, s1, th1_out, tot1 = engine.char_distill_chunk_xy(
        cfg, hyper, (teacher.cfg,), jax.tree.map(jnp.copy, net.params),
        nn.new_bptt_state(cfg, S, 1e-3, 0.9), nn.new_state(cfg, S),
        th1, (teacher.params,), xs, ys, *args)
    np.testing.assert_allclose(np.asarray(p.ih), np.asarray(p1.ih),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(th_out[0]), np.asarray(th1_out[0]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(tot.entropy), float(tot1.entropy),
                               rtol=1e-5)


@pytest.mark.slow
def test_classify_channel_sharding():
    """End-to-end classify training on the mesh (channels over 'data',
    hidden over 'model') equals the single-device classifier exactly —
    the multi-chip form of gstclassify's per-channel subnet array."""
    import io
    from recur_tpu.audio.classify import AudioClassifier
    from tests.test_audio_classify import tone_pcm as tone

    def run(mesh):
        clf = AudioClassifier("ab", n_channels=8, window_size=64,
                              hidden_size=31, learn_rate=1e-4, rng_seed=7,
                              net_filename="/tmp/mesh_classify.net",
                              mesh=mesh)
        clf.BLOCK_WINDOWS = 16
        clf.log.f = io.StringIO()
        clf.set_target_string(
            " ".join(f"c{c}t0:{'ab'[c % 2]}" for c in range(8)))
        pcm = np.stack([tone(500 if c % 2 == 0 else 2500, 8000, seed=c)
                        for c in range(8)])
        clf.feed(pcm)
        clf.flush()
        # inference leg too (opine path sharding)
        clf.training = False
        msgs = clf.feed(pcm[:, :4000]) + clf.flush()
        return np.asarray(clf.params.ih), clf.log.f.getvalue(), msgs

    w_single, log_single, msgs_single = run(None)
    w_mesh, log_mesh, msgs_mesh = run(make_mesh(4, 2))
    # the sharded cross-channel gradient contraction reduces in a different
    # order (psum over 'data'), so agreement is to float rounding, not bit
    np.testing.assert_allclose(w_mesh, w_single, rtol=2e-4, atol=1e-6)

    def parse_log(s):
        return [(k, float(v)) for k, v in
                (ln.split(" ", 1) for ln in s.strip().splitlines())]
    for (ka, va), (kb, vb) in zip(parse_log(log_mesh), parse_log(log_single),
                                  strict=True):
        assert ka == kb
        assert abs(va - vb) <= 1e-3 * max(1.0, abs(vb)), (ka, va, vb)
    assert len(msgs_mesh) == len(msgs_single)
    for a, b in zip(msgs_mesh, msgs_single):
        assert a.keys() == b.keys()
        for k in a:
            va, vb = a[k], b[k]
            if isinstance(va, (float, np.floating)):
                assert abs(va - vb) < 1e-3, (k, va, vb)
            else:
                assert va == vb, (k, va, vb)


def test_multihead_windowed_batch_equals_sequential():
    """The windowed-walk batch path (multihead_train_window_chunk) must
    reproduce the per-char path at the same batch_size (adaptive min-error
    off: the windowed path composes the floor per window, which is the one
    documented deviation; leakage 0 for identical head masks)."""
    from recur_tpu.models.multihead import (multihead_train_chunk,
                                            multihead_train_window_chunk)

    alphabet_len, n_classes = 8, 4
    S, T, B = 4, 16, 4
    net = nn.new_net(alphabet_len, 15, alphabet_len * n_classes, rng_seed=2,
                     depth=5, learn_rate=1e-3,
                     flags=nn.Flag.STANDARD & ~nn.Flag.BPTT_ADAPTIVE_MIN_ERROR)
    winit.randomise_weights(net)
    cfg = net.cfg
    hyper = TrainHyper(condition=False, batch_size=B,
                       learning_style=nn.LearningMethod.ADAGRAD)
    rng = np.random.default_rng(7)
    tokens = jnp.asarray(rng.integers(0, alphabet_len, (S, T + 1)))
    target_class = jnp.asarray(rng.integers(0, n_classes, S))
    args = (jnp.float32(0.0), jax.random.PRNGKey(1), jnp.float32(0.9),
            jnp.float32(0.0))

    def fresh():
        return (jax.tree.map(jnp.copy, net.params),
                nn.new_bptt_state(cfg, S, 1e-3, 0.9), nn.new_state(cfg, S))

    p1, b1, s1, st1 = multihead_train_chunk(
        cfg, hyper, alphabet_len, *fresh(), tokens, target_class, *args)
    p2, b2, s2, st2 = multihead_train_window_chunk(
        cfg, hyper, alphabet_len, *fresh(), tokens, target_class, *args)

    np.testing.assert_allclose(np.asarray(p2.ih), np.asarray(p1.ih),
                               rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(p2.ho), np.asarray(p1.ho),
                               rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(s2.hidden), np.asarray(s1.hidden),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(float(st2.entropy), float(st1.entropy),
                               rtol=1e-5)
    assert int(b2.generation) == int(b1.generation) == T
    # the ring rebuild leaves the same rows (slot order may differ): compare
    # as sets via sorted rows
    r1 = np.sort(np.asarray(s1.history).reshape(S, -1), axis=1)
    r2 = np.sort(np.asarray(s2.history).reshape(S, -1), axis=1)
    np.testing.assert_allclose(r2, r1, rtol=2e-5, atol=1e-6)


def test_char_windowed_batch_equals_sequential():
    """engine.char_train_window_chunk must reproduce the sequential path at
    the same batch_size (adaptive min-error off, noise off)."""
    S, T, B = 4, 24, 4
    net = nn.new_net(9, 15, 9, rng_seed=3, depth=6, learn_rate=1e-3,
                     flags=nn.Flag.STANDARD & ~nn.Flag.BPTT_ADAPTIVE_MIN_ERROR)
    winit.randomise_weights(net)
    cfg = net.cfg
    hyper = TrainHyper(condition=False, batch_size=B)
    tokens = jnp.asarray(np.random.default_rng(4).integers(0, 9, (S, T + 1)))
    args = (jax.random.PRNGKey(0), jnp.float32(0.9), jnp.float32(0.0))

    def fresh():
        return (jax.tree.map(jnp.copy, net.params),
                nn.new_bptt_state(cfg, S, 1e-3, 0.9), nn.new_state(cfg, S))

    p1, b1, s1, t1 = engine.char_train_chunk(cfg, hyper, *fresh(), tokens,
                                             *args)
    p2, b2, s2, t2 = engine.char_train_window_chunk(cfg, hyper, *fresh(),
                                                    tokens, *args)
    np.testing.assert_allclose(np.asarray(p2.ih), np.asarray(p1.ih),
                               rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(p2.ho), np.asarray(p1.ho),
                               rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(s2.hidden), np.asarray(s1.hidden),
                               rtol=2e-5, atol=1e-6)
    for field in ("error", "entropy", "correct", "depth"):
        np.testing.assert_allclose(float(getattr(t2, field)),
                                   float(getattr(t1, field)), rtol=1e-4,
                                   err_msg=field)
    # carried state keeps training equivalently: run a second chunk each way
    p1, b1, s1, t1 = engine.char_train_chunk(cfg, hyper, p1, b1, s1, tokens,
                                             *args)
    p2, b2, s2, t2 = engine.char_train_window_chunk(cfg, hyper, p2, b2, s2,
                                                    tokens, *args)
    np.testing.assert_allclose(np.asarray(p2.ih), np.asarray(p1.ih),
                               rtol=5e-5, atol=1e-7)
    np.testing.assert_allclose(float(t2.entropy), float(t1.entropy),
                               rtol=1e-4)


def test_windowed_after_ragged_piece_carries_deltas():
    """A per-char piece that ends mid-apply-window (batch_size > 1) leaves
    accumulated deltas in BpttState; a windowed chunk that follows must
    fold them into its first apply, matching an all-sequential run."""
    S, B = 4, 4
    net = nn.new_net(9, 15, 9, rng_seed=5, depth=5, learn_rate=1e-3,
                     flags=nn.Flag.STANDARD & ~nn.Flag.BPTT_ADAPTIVE_MIN_ERROR)
    winit.randomise_weights(net)
    cfg = net.cfg
    hyper = TrainHyper(condition=False, batch_size=B)
    rng = np.random.default_rng(6)
    toks = rng.integers(0, 9, (S, 23))     # 22 transitions
    args = (jax.random.PRNGKey(0), jnp.float32(0.9), jnp.float32(0.0))

    def fresh():
        return (jax.tree.map(jnp.copy, net.params),
                nn.new_bptt_state(cfg, S, 1e-3, 0.9), nn.new_state(cfg, S))

    # control: one sequential run over chars 0..21
    p1, b1, s1, _ = engine.char_train_chunk(
        cfg, hyper, *fresh(), jnp.asarray(toks), *args)

    # mixed: ragged sequential piece of 6 chars (ends at gen 6, deltas for
    # chars 5-6 pending), then a windowed chunk over the remaining 16
    p2, b2, s2, _ = engine.char_train_chunk(
        cfg, hyper, *fresh(), jnp.asarray(toks[:, :7]),
        jax.random.PRNGKey(0), jnp.float32(0.9), jnp.float32(0.0))
    assert float(jnp.abs(b2.ih_delta).sum()) > 0   # pending accumulators
    p2, b2, s2, _ = engine.char_train_window_chunk(
        cfg, hyper, p2, b2, s2, jnp.asarray(toks[:, 6:]),
        jax.random.PRNGKey(1), jnp.float32(0.9), jnp.float32(0.0))
    # the pending deltas were consumed, not stranded
    assert float(jnp.abs(b2.ih_delta).sum()) == 0.0
    # and the generation bookkeeping stayed consistent
    assert int(b2.generation) == 22
    # exact parity with the control is not expected (the windowed path
    # applies on window boundaries from ITS chunk start — the documented
    # cadence deviation) but the trained nets must be close: the same
    # gradients were applied, grouped slightly differently
    np.testing.assert_allclose(np.asarray(p2.ih), np.asarray(p1.ih),
                               rtol=0.3, atol=2e-3)


@pytest.mark.slow
def test_multihead_top_dtype_bf16_close():
    """TrainHyper.top_dtype='bfloat16' keeps the [S, o_size] top-error
    tensors in bf16 (an opt-in HBM-bandwidth lever at multihead widths,
    PERF.md).  The math must track the f32 path within bf16 resolution on
    both the per-char and the windowed paths, and the default must remain
    the untouched f32 path."""
    from recur_tpu.models.multihead import (multihead_train_chunk,
                                            multihead_train_window_chunk)

    alphabet_len, n_classes = 8, 4
    S, T = 4, 16
    net = nn.new_net(alphabet_len, 15, alphabet_len * n_classes, rng_seed=8,
                     depth=5, learn_rate=1e-3,
                     flags=nn.Flag.STANDARD & ~nn.Flag.BPTT_ADAPTIVE_MIN_ERROR)
    winit.randomise_weights(net)
    cfg = net.cfg
    rng = np.random.default_rng(9)
    tokens = jnp.asarray(rng.integers(0, alphabet_len, (S, T + 1)))
    target_class = jnp.asarray(rng.integers(0, n_classes, S))
    args = (jnp.float32(0.0), jax.random.PRNGKey(1), jnp.float32(0.9),
            jnp.float32(0.0))

    def fresh():
        return (jax.tree.map(jnp.copy, net.params),
                nn.new_bptt_state(cfg, S, 1e-3, 0.9), nn.new_state(cfg, S))

    def run(**hkw):
        hyper = TrainHyper(condition=False,
                           learning_style=nn.LearningMethod.ADAGRAD, **hkw)
        if hkw.get("batch_size", 1) > 1:
            return multihead_train_window_chunk(
                cfg, hyper, alphabet_len, *fresh(), tokens, target_class,
                *args)
        return multihead_train_chunk(
            cfg, hyper, alphabet_len, *fresh(), tokens, target_class, *args)

    p32, _, _, st32 = run()
    pbf, _, _, stbf = run(top_dtype="bfloat16")
    # params move by ~learn_rate-scale updates; bf16 top error has ~3
    # decimal digits, so trained weights agree loosely but meaningfully
    np.testing.assert_allclose(np.asarray(pbf.ho), np.asarray(p32.ho),
                               rtol=0.1, atol=2e-3)
    np.testing.assert_allclose(np.asarray(pbf.ih), np.asarray(p32.ih),
                               rtol=0.1, atol=2e-3)
    assert abs(float(stbf.entropy) - float(st32.entropy)) < 0.05
    # the windowed path honours it too (compared against the windowed f32
    # control: the windowed delta-apply cadence is its own documented
    # deviation from the sequential path)
    w32 = run(batch_size=4)
    wbf = run(top_dtype="bfloat16", batch_size=4)
    np.testing.assert_allclose(np.asarray(wbf[0].ho), np.asarray(w32[0].ho),
                               rtol=0.1, atol=2e-3)
    # and the default f32 path is bit-identical to an explicit f32 request
    pdef, _, _, _ = run(top_dtype="float32")
    np.testing.assert_array_equal(np.asarray(pdef.ho), np.asarray(p32.ho))


def test_perchar_bf16_history_close():
    """With a bf16 history ring the PER-CHAR backward walk also runs
    natively in bf16 (ops/core.py calc_deltas): the per-depth-step ring
    slice, e_full and the buffered applied error stay narrow instead of
    upcasting to f32 — the same bandwidth lever the windowed walk got,
    applied to the flagship sequential path.  The math must track the f32
    per-char control within bf16 resolution; f32 rings keep the exact path
    (pinned by the oracle tests)."""
    from recur_tpu.models.multihead import multihead_train_chunk

    alphabet_len, n_classes = 8, 4
    S, T = 4, 16
    net = nn.new_net(alphabet_len, 15, alphabet_len * n_classes, rng_seed=8,
                     depth=5, learn_rate=1e-3,
                     flags=nn.Flag.STANDARD & ~nn.Flag.BPTT_ADAPTIVE_MIN_ERROR)
    winit.randomise_weights(net)
    cfg = net.cfg
    rng = np.random.default_rng(9)
    tokens = jnp.asarray(rng.integers(0, alphabet_len, (S, T + 1)))
    target_class = jnp.asarray(rng.integers(0, n_classes, S))
    args = (jnp.float32(0.0), jax.random.PRNGKey(1), jnp.float32(0.9),
            jnp.float32(0.0))
    hyper = TrainHyper(condition=False,
                       learning_style=nn.LearningMethod.ADAGRAD)

    def run(hdtype):
        return multihead_train_chunk(
            cfg, hyper, alphabet_len, jax.tree.map(jnp.copy, net.params),
            nn.new_bptt_state(cfg, S, 1e-3, 0.9),
            nn.new_state(cfg, S, history_dtype=hdtype),
            tokens, target_class, *args)

    p32, _, _, st32 = run(jnp.float32)
    pbf, _, _, stbf = run(jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(pbf.ih), np.asarray(p32.ih),
                               rtol=0.1, atol=2e-3)
    np.testing.assert_allclose(np.asarray(pbf.ho), np.asarray(p32.ho),
                               rtol=0.1, atol=2e-3)
    assert abs(float(stbf.entropy) - float(st32.entropy)) < 0.05


def test_windowed_bf16_history_close():
    """With a bf16 history ring the windowed backward walk runs natively in
    bf16 end-to-end (row slices, e_full, the error trajectory stay narrow —
    the f32 upcasts used to materialise full [S, B, i] copies per depth
    step, ops/core.py calc_deltas_window).  The math must track the f32
    windowed control within bf16 resolution, and an f32 ring must stay on
    the exact f32 path."""
    from recur_tpu.models.multihead import multihead_train_window_chunk

    alphabet_len, n_classes = 8, 4
    S, T = 4, 16
    net = nn.new_net(alphabet_len, 15, alphabet_len * n_classes, rng_seed=8,
                     depth=5, learn_rate=1e-3,
                     flags=nn.Flag.STANDARD & ~nn.Flag.BPTT_ADAPTIVE_MIN_ERROR)
    winit.randomise_weights(net)
    cfg = net.cfg
    rng = np.random.default_rng(9)
    tokens = jnp.asarray(rng.integers(0, alphabet_len, (S, T + 1)))
    target_class = jnp.asarray(rng.integers(0, n_classes, S))
    args = (jnp.float32(0.0), jax.random.PRNGKey(1), jnp.float32(0.9),
            jnp.float32(0.0))
    hyper = TrainHyper(condition=False, batch_size=4,
                       learning_style=nn.LearningMethod.ADAGRAD)

    def run(hdtype):
        return multihead_train_window_chunk(
            cfg, hyper, alphabet_len, jax.tree.map(jnp.copy, net.params),
            nn.new_bptt_state(cfg, S, 1e-3, 0.9),
            nn.new_state(cfg, S, history_dtype=hdtype),
            tokens, target_class, *args)

    p32, _, _, st32 = run(jnp.float32)
    pbf, _, _, stbf = run(jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(pbf.ih), np.asarray(p32.ih),
                               rtol=0.1, atol=2e-3)
    np.testing.assert_allclose(np.asarray(pbf.ho), np.asarray(p32.ho),
                               rtol=0.1, atol=2e-3)
    assert abs(float(stbf.entropy) - float(st32.entropy)) < 0.05
