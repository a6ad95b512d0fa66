"""Ensemble distillation (engine.char_distill_step / CharModel
distill_teachers): soft targets from frozen in-graph teachers.

alpha=0 must reproduce the plain training chunk bit-for-bit; alpha=1
trains the student toward the teachers' predictive mixture."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recur_tpu import engine, nn
from recur_tpu.engine import TrainHyper
from recur_tpu.models.alphabet import Alphabet, Metadata
from recur_tpu.models.charmodel import CharModel, Ventropy
from recur_tpu.ops import init as winit


def make_net(seed, h=17, chars=" abcdefg", activation=None):
    from recur_tpu.nn import Activation
    a = Alphabet.from_chars(chars)
    net = nn.new_net(len(a), h, len(a), rng_seed=seed, depth=6,
                     learn_rate=0.01, momentum=0.9,
                     activation=activation or Activation.RELU)
    winit.randomise_weights(net)
    net.metadata = Metadata.from_alphabet(a).construct()
    return a, net


def fresh_run_state(net, S):
    params = jax.tree.map(jnp.copy, net.params)
    bptt = nn.new_bptt_state(net.cfg, S, learn_rate=net.learn_rate,
                             momentum=net.momentum)
    state = nn.new_state(net.cfg, S)
    return params, bptt, state


class TestDistillChunk:
    def test_alpha_zero_is_plain_training(self):
        a, student = make_net(1)
        _, teacher = make_net(2)
        S, T = 3, 40
        rng = np.random.default_rng(0)
        xs = jnp.asarray(rng.integers(0, 8, (S, T)), jnp.int32)
        ys = jnp.asarray(rng.integers(0, 8, (S, T)), jnp.int32)
        key = jax.random.PRNGKey(7)
        hyper = TrainHyper(condition=False)
        mom = jnp.float32(0.9)
        noise = jnp.float32(0.0)

        p1, b1, s1 = fresh_run_state(student, S)
        p1, b1, s1, tot1 = engine.char_train_chunk_xy(
            student.cfg, hyper, p1, b1, s1, xs, ys, key, mom, noise)

        p2, b2, s2 = fresh_run_state(student, S)
        th = (jnp.zeros((S, teacher.cfg.h_size), jnp.float32),)
        p2, b2, s2, th, tot2 = engine.char_distill_chunk_xy(
            student.cfg, hyper, (teacher.cfg,), p2, b2, s2, th,
            (teacher.params,), xs, ys, key, mom, noise,
            jnp.float32(0.0), jnp.float32(1.0))

        for f in dataclasses.fields(p1):
            x, y = getattr(p1, f.name), getattr(p2, f.name)
            if x is None:
                assert y is None
                continue
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y), f.name)
        np.testing.assert_array_equal(np.asarray(tot1.entropy),
                                      np.asarray(tot2.entropy))

    @pytest.mark.slow
    def test_distillation_reaches_the_teacher(self):
        # teach the teacher a deterministic cycle, then distill a fresh
        # student from it with blended soft targets: the student must land
        # at or below the teacher's own score.  ReSQRT like every toy
        # trainer here - tiny plain-ReLU recurrences sit on the forward
        # gain knife edge (CLAUDE.md round-2 learnings) and hard-to-soft
        # target switches can push an h=17 net over it.
        from recur_tpu.nn import Activation
        a, teacher = make_net(3, activation=Activation.RESQRT)
        text = np.asarray(a.encode(b"abcdefg " * 60), np.int32)
        tmodel = CharModel(teacher, a, n_streams=2, save_net=False)
        tmodel.learn_rate = 0.3
        for _ in range(20):
            tmodel.epoch(text, quietness=3)
        teacher.params = tmodel.params
        t_xe = tmodel.cross_entropy(text)
        assert t_xe < 2.0   # the teacher actually knows the text

        _, student = make_net(4, activation=Activation.RESQRT)
        smodel = CharModel(student, a, n_streams=2, save_net=False,
                           distill_teachers=[teacher], distill_alpha=0.5)
        smodel.learn_rate = 0.1
        before = smodel.cross_entropy(text)
        for _ in range(30):
            smodel.epoch(text, quietness=3)
        after = smodel.cross_entropy(text)
        assert after < before - 0.5, (before, after)
        assert after < t_xe + 0.2, (after, t_xe)

    def test_teacher_hiddens_carry_across_chunks(self):
        a, student = make_net(5)
        _, teacher = make_net(6)
        smodel = CharModel(student, a, n_streams=2, save_net=False,
                           distill_teachers=[teacher])
        text = np.asarray(a.encode(b"gfedcba " * 40), np.int32)
        z = np.asarray(smodel._teacher_hiddens[0]).copy()
        smodel.epoch(text, quietness=3)
        assert not np.allclose(np.asarray(smodel._teacher_hiddens[0]), z)

    def test_temperature_softens_the_teacher_mixture(self):
        # q_mix = mean_k softmax(logits_k / temp) (char_distill_step): at
        # temp→inf the soft target is uniform, so an alpha=1 student is
        # pulled toward a flat distribution; at temp=1 it is pulled toward
        # the teacher, which knows the text.  Both must differ from each
        # other after one chunk (temp actually plumbs through), and after
        # training the temp=1 student must sit well below the high-temp one.
        from recur_tpu.nn import Activation
        a, teacher = make_net(3, activation=Activation.RESQRT)
        text = np.asarray(a.encode(b"abcdefg " * 60), np.int32)
        tmodel = CharModel(teacher, a, n_streams=2, save_net=False)
        tmodel.learn_rate = 0.3
        for _ in range(20):
            tmodel.epoch(text, quietness=3)
        teacher.params = tmodel.params

        results = {}
        for temp in (1.0, 1e4):
            _, student = make_net(4, activation=Activation.RESQRT)
            smodel = CharModel(student, a, n_streams=2, save_net=False,
                               distill_teachers=[teacher],
                               distill_alpha=1.0, distill_temp=temp)
            smodel.learn_rate = 0.1
            for _ in range(15):
                smodel.epoch(text, quietness=3)
            results[temp] = (np.asarray(smodel.params.ih),
                             smodel.cross_entropy(text))
        assert not np.allclose(results[1.0][0], results[1e4][0])
        # near-uniform targets keep the high-temp student near
        # log2(len(alphabet)); the temp=1 student approaches the teacher
        uniform = np.log2(len(a))
        assert results[1.0][1] < results[1e4][1] - 0.4, results
        assert results[1e4][1] > uniform - 0.8, results


class TestMultiheadFactored:
    def test_factored_matches_buffered(self):
        # the multihead (author-ID) input is a one-hot char, so the
        # one-hot-factored ring applies; same math as buffered to f32
        # tolerance (calc_deltas_factored docstring)
        from recur_tpu.models.multihead import multihead_train_chunk
        S, T, alen, n_classes = 6, 24, 9, 4
        net = nn.new_net(alen, 15, alen * n_classes, rng_seed=2, depth=5,
                         learn_rate=1e-3)
        winit.randomise_weights(net)
        cfg = net.cfg
        rng = np.random.default_rng(0)
        tokens = jnp.asarray(rng.integers(0, alen, (S, T + 1)), jnp.int32)
        tclass = jnp.asarray(rng.integers(0, n_classes, S), jnp.int32)
        args = (tokens, tclass, jnp.float32(0.1), jax.random.PRNGKey(3),
                jnp.float32(0.9), jnp.float32(0.0))

        outs = {}
        for impl in ("buffered", "factored"):
            hyper = TrainHyper(condition=False, bptt_impl=impl)
            p = jax.tree.map(jnp.copy, net.params)
            b = nn.new_bptt_state(cfg, S, 1e-3, 0.9)
            s = nn.new_state(cfg, S, factored=(impl == "factored"))
            p, b, s, stats = multihead_train_chunk(
                cfg, hyper, alen, p, b, s, *args)
            outs[impl] = (np.asarray(p.ih), np.asarray(p.ho),
                          float(stats.entropy))
        np.testing.assert_allclose(outs["buffered"][0], outs["factored"][0],
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(outs["buffered"][1], outs["factored"][1],
                                   rtol=1e-4, atol=1e-6)
        assert abs(outs["buffered"][2] - outs["factored"][2]) < 1e-3

    def test_factored_window_matches_dense_window(self):
        """The factored ring also drives the WINDOWED batched walk
        (calc_deltas_window_factored): same math as the dense windowed
        form to f32 tolerance, with the window buffer holding only
        [bias, hidden] + token ids."""
        from recur_tpu.models.multihead import multihead_train_window_chunk
        S, T, B, alen, n_classes = 5, 24, 6, 9, 4
        net = nn.new_net(alen, 15, alen * n_classes, rng_seed=2, depth=5,
                         learn_rate=1e-3)
        winit.randomise_weights(net)
        cfg = net.cfg
        rng = np.random.default_rng(1)
        tokens = jnp.asarray(rng.integers(0, alen, (S, T + 1)), jnp.int32)
        tclass = jnp.asarray(rng.integers(0, n_classes, S), jnp.int32)
        args = (tokens, tclass, jnp.float32(0.1), jax.random.PRNGKey(3),
                jnp.float32(0.9), jnp.float32(0.0))
        outs = {}
        for impl in ("buffered", "factored"):
            hyper = TrainHyper(condition=False, bptt_impl=impl,
                               batch_size=B)
            p = jax.tree.map(jnp.copy, net.params)
            b = nn.new_bptt_state(cfg, S, 1e-3, 0.9)
            s = nn.new_state(cfg, S, factored=(impl == "factored"))
            p, b, s, stats = multihead_train_window_chunk(
                cfg, hyper, alen, p, b, s, *args)
            outs[impl] = (np.asarray(p.ih), np.asarray(p.ho),
                          float(stats.entropy), s)
        np.testing.assert_allclose(outs["buffered"][0], outs["factored"][0],
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(outs["buffered"][1], outs["factored"][1],
                                   rtol=1e-4, atol=1e-6)
        assert abs(outs["buffered"][2] - outs["factored"][2]) < 1e-3
        # the rebuilt factored ring matches the dense ring's head section
        dense_ring = np.asarray(outs["buffered"][3].history)
        fact_ring = np.asarray(outs["factored"][3].history)
        W = fact_ring.shape[2]
        np.testing.assert_allclose(dense_ring[:, :, :W], fact_ring,
                                   rtol=1e-5, atol=1e-7)

    def test_compat_net_accepts_bptt_impl(self):
        from recur_tpu.compat.charmodel import Alphabet as CAlpha, Net as CNet
        a = CAlpha(alphabet_chars=" abcdefgh")
        net = CNet(a, ["x", "y"], 13, log_file=None, bptt_impl="factored",
                   presynaptic_noise=0.0, bptt_depth=5, rng_seed=4)
        texts = [a.encode_text(b"ababab " * 10),
                 a.encode_text(b"cdcdcd " * 10)]
        net.train_batch(texts, ["x", "y"])
        assert net._state.tokens is not None


class TestEnsembleConfab:
    def test_cli_samples_from_a_mixture(self, tmp_path, capsys):
        from recur_tpu.cli import text_confabulate
        a, n1 = make_net(1)
        _, n2 = make_net(2)
        f1, f2 = str(tmp_path / "a.net"), str(tmp_path / "b.net")
        nn.save_net(n1, f1)
        nn.save_net(n2, f2)
        rc = text_confabulate.main(
            ["-f", f1, "-f", f2, "-n", "40", "--rng-seed", "7"])
        assert rc == 0
        out1 = capsys.readouterr().out
        assert len(out1.strip()) >= 30
        rc = text_confabulate.main(
            ["-f", f1, "-f", f2, "-n", "40", "--rng-seed", "7"])
        assert rc == 0
        assert capsys.readouterr().out == out1   # seeded → deterministic
        # mismatched alphabets refuse
        b, n3 = make_net(3, chars=" abcdefgh")
        f3 = str(tmp_path / "c.net")
        nn.save_net(n3, f3)
        with pytest.raises(SystemExit):
            text_confabulate.main(["-f", f1, "-f", f3, "-n", "10"])


class TestDistillCtorGuards:
    def test_output_size_mismatch_raises(self):
        a, student = make_net(1)
        _, other = make_net(2, chars=" abcdefgh")
        with pytest.raises(ValueError, match="alphabet"):
            CharModel(student, a, n_streams=2, save_net=False,
                      distill_teachers=[other])

    def test_alpha_zero_batched_matches_plain_accumulation(self):
        # the shared step tail keeps diachronic batch accumulation: at
        # alpha=0 a batch_size=2 distill chunk equals the plain chunk
        import dataclasses as dc
        a, student = make_net(1)
        _, teacher = make_net(2)
        S, T = 3, 20
        rng = np.random.default_rng(1)
        xs = jnp.asarray(rng.integers(0, 8, (S, T)), jnp.int32)
        ys = jnp.asarray(rng.integers(0, 8, (S, T)), jnp.int32)
        key = jax.random.PRNGKey(7)
        hyper = TrainHyper(condition=False, batch_size=2)
        mom, noise = jnp.float32(0.9), jnp.float32(0.0)

        p1, b1, s1 = fresh_run_state(student, S)
        p1, b1, s1, tot1 = engine.char_train_chunk_xy(
            student.cfg, hyper, p1, b1, s1, xs, ys, key, mom, noise)

        p2, b2, s2 = fresh_run_state(student, S)
        th = (jnp.zeros((S, teacher.cfg.h_size), jnp.float32),)
        p2, b2, s2, th, tot2 = engine.char_distill_chunk_xy(
            student.cfg, hyper, (teacher.cfg,), p2, b2, s2, th,
            (teacher.params,), xs, ys, key, mom, noise,
            jnp.float32(0.0), jnp.float32(1.0))
        np.testing.assert_array_equal(np.asarray(p1.ih), np.asarray(p2.ih))
        np.testing.assert_array_equal(np.asarray(tot1.entropy),
                                      np.asarray(tot2.entropy))
