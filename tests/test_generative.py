"""Generative pillar tests: parrot (audio prediction/dream), rnnca (CA
video), recur (fractal constructor)."""

import numpy as np
import pytest

from recur_tpu.audio.parrot import Parrot
from recur_tpu.video.rnnca import Rnnca, parse_offset_pattern
from recur_tpu.video.recur_ctx import (
    RecurContext, unswizzle, N_CONSTRUCTORS, N_LEAVES, CONSTRUCT_H,
    CONSTRUCT_W)


class TestParrot:
    def test_train_reduces_error(self):
        p = Parrot(n_channels=1, hidden_size=49, window_size=64,
                   learn_rate=0.001, rng_seed=3)
        rng = np.random.default_rng(0)
        t = np.arange(64 * 400) / 16000.0
        pcm = (8000 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        mses = []
        for i in range(8):
            seg = pcm[i * 3200:(i + 1) * 3200]
            mse = p.train(seg[None, :])
            if not np.isnan(mse):
                mses.append(mse)
        assert len(mses) >= 6
        assert mses[-1] < mses[0], mses

    def test_dream_produces_audio(self):
        p = Parrot(n_channels=2, hidden_size=33, window_size=64, rng_seed=1)
        out = p.dream(1000)
        assert out.shape == (2, 1000)
        assert np.isfinite(out).all()
        assert np.abs(out).max() <= 32768
        # dreaming twice continues (stateful)
        out2 = p.dream(500)
        assert out2.shape == (2, 500)


class TestRnnca:
    def test_pattern_parser(self):
        ys, cs = parse_offset_pattern("Y00120111C0111")
        # '00' → just (0,0); '12' → 8 symmetries; '01' and '11' → 4 each
        assert (0, 0) in ys
        assert len(ys) == 1 + 8 + 4 + 4
        assert len(cs) == 4 + 4
        assert all(abs(x) <= 2 and abs(y) <= 2 for x, y in ys)

    def test_train_and_play(self):
        ca = Rnnca(hidden_size=31, n_trainers=50, width=36, height=24,
                   learn_rate=1e-4, rng_seed=6)
        rng = np.random.default_rng(1)
        frames = rng.integers(0, 256, (5, 3, 24, 36)).astype(np.uint8)
        # vertical gradient video: learnable structure
        grad = np.linspace(0, 255, 24)[None, :, None]
        frames = (frames * 0.2 + grad * 0.8).astype(np.uint8)
        for i in range(4):
            ca.train_frame_pair(frames[i], frames[i + 1])
        assert ca.generation == 4
        f = ca.step_ca()
        assert f.shape == (3, 24, 36)
        f2 = ca.step_ca()
        assert f2.shape == (3, 24, 36)
        ca.shuffle_trainer()

    def test_play_block_matches_single_steps(self):
        """step_ca_block(n) must produce the same frames as n step_ca calls
        (one device call + one readback instead of n — the real-time fix;
        the block re-quantises to u8 each step exactly like the per-frame
        path)."""
        mk = lambda: Rnnca(hidden_size=17, n_trainers=10, width=20,
                           height=12, rng_seed=5)
        a, b = mk(), mk()
        singles = np.stack([a.step_ca() for _ in range(6)])
        block = b.step_ca_block(6)
        np.testing.assert_array_equal(block, singles)
        np.testing.assert_array_equal(a.play_frame, b.play_frame)
        # and the hidden state carried identically
        np.testing.assert_allclose(np.asarray(a.play_hidden),
                                   np.asarray(b.play_hidden), atol=1e-6)

    def test_train_block_learns(self):
        """train_frame_block applies the same sequential per-pair updates
        (generation advances per frame; error falls on a learnable
        gradient video)."""
        ca = Rnnca(hidden_size=31, n_trainers=50, width=36, height=24,
                   learn_rate=1e-4, rng_seed=6)
        rng = np.random.default_rng(1)
        grad = np.linspace(0, 255, 24)[None, :, None]
        frames = (rng.integers(0, 256, (9, 3, 24, 36)) * 0.2
                  + grad * 0.8).astype(np.uint8)
        ca.train_frame_block(frames[:-1], frames[1:])
        assert ca.generation == 8
        p0 = np.asarray(ca.params.ih).copy()
        ca.train_frame_block(frames[:-1], frames[1:])
        assert ca.generation == 16
        assert np.isfinite(np.asarray(ca.params.ih)).all()
        assert not np.array_equal(p0, np.asarray(ca.params.ih))

    def test_stasis_restart(self):
        ca = Rnnca(hidden_size=15, n_trainers=10, width=16, height=12,
                   rng_seed=2)
        # force a frozen frame and run the detector many times
        ca.play_frame[:] = 77
        frozen = ca.play_frame.copy()
        for h in ca._stasis:
            h["hits"] = 1
            h["colour"] = (77 << 16) | (77 << 8) | 77
        for _ in range(60):
            ca._check_stasis()
        assert not np.array_equal(ca.play_frame, frozen), \
            "stasis detector never restarted the frame"


class TestRecurContext:
    def test_unswizzle(self):
        # context-recurse.c's layout comment:  0 1 4 5 / 2 3 6 7 / 8 9 ...
        assert unswizzle(0) == (0, 0)
        assert unswizzle(1) == (1, 0)
        assert unswizzle(2) == (0, 1)
        assert unswizzle(3) == (1, 1)
        assert unswizzle(4) == (2, 0)
        assert unswizzle(8) == (0, 2)

    def test_constants(self):
        assert N_CONSTRUCTORS == 341
        assert N_LEAVES == 256
        assert (CONSTRUCT_W, CONSTRUCT_H) == (128, 96)

    def test_train_and_construct(self):
        ctx = RecurContext(rng_seed=3, learn_rate=1e-4)
        assert len(ctx.trainers) == 12
        rng = np.random.default_rng(0)
        frames = rng.integers(0, 256, (3, 3, 72, 96)).astype(np.uint8)
        pcm = (rng.normal(0, 3000, 1024)).astype(np.float32)
        ctx.set_audio_window(pcm)
        ctx.train_frame_pair(frames[0], frames[1])
        ctx.train_frame_pair(frames[1], frames[2])
        assert ctx.generation == 2
        frame = ctx.confabulate()
        assert frame.shape == (3, 96, 128)
        frame2 = ctx.confabulate()
        assert frame2.shape == (3, 96, 128)
        # the constructor is stateful: frames differ
        assert not np.array_equal(frame, frame2)

    def test_confabulate_block_matches_single(self):
        """confabulate_block(n) ≡ n confabulate() calls: the in-graph seed
        feedback and gather-assembled unswizzle must reproduce the host
        path bit-for-bit (u8 quantisation at the same point)."""
        mk = lambda: RecurContext(rng_seed=7, learn_rate=1e-4)
        a, b = mk(), mk()
        singles = np.stack([a.confabulate() for _ in range(3)])
        block = b.confabulate_block(3)
        np.testing.assert_array_equal(block, singles)
        np.testing.assert_allclose(np.asarray(a.seed), np.asarray(b.seed),
                                   atol=1e-6)


def test_parrot_dream_not_clipped():
    """Dream output must be in sane s16 range, not 32768x-overdriven
    full-scale clipping (the reference scales BOTH windows by 1/32768 and
    restores 'doubly', gstparrot.c:287, 566-575)."""
    import numpy as np
    from recur_tpu.audio.parrot import Parrot

    par = Parrot(n_channels=1, hidden_size=15, rng_seed=2,
                 net_filename="/tmp/parrot_dream.net")
    rng = np.random.default_rng(0)
    pcm = (3000 * np.sin(np.arange(16000) * 0.05)).astype(np.float32)[None]
    par.train(pcm)
    out = par.dream(4096)
    # an untrained-ish net dreams quiet-to-moderate audio; the overdrive
    # bug produced ~100% full-scale samples
    frac_clipped = np.mean(np.abs(out) >= 32767)
    assert frac_clipped < 0.5, frac_clipped


def test_recur_trainer_windows_in_bounds_all_seeds():
    """Trainer input windows must stay inside the frame for any seed
    (scale>=2 placements used to run past the edge and crash the
    downscale reshape)."""
    from recur_tpu.video.recur_ctx import (RecurContext, GAIN, INPUT_W,
                                           INPUT_H, WORKING_H, WORKING_W)

    for seed in range(12):
        ctx = RecurContext(rng_seed=seed)
        for (x, y, scale) in ctx.trainers:
            assert x - scale >= 0 and y - scale >= 0, (seed, x, y, scale)
            assert x - scale + (INPUT_W + 2) * GAIN * scale <= WORKING_W, \
                (seed, x, y, scale)
            assert y - scale + (INPUT_H + 2) * GAIN * scale <= WORKING_H, \
                (seed, x, y, scale)


def test_recur_train_frame_pair_seed_zero():
    """Seed 0 used to crash train_frame_pair with an out-of-bounds patch."""
    import numpy as np
    from recur_tpu.video.recur_ctx import RecurContext, WORKING_H, WORKING_W

    ctx = RecurContext(rng_seed=0)
    rng = np.random.default_rng(1)
    a = rng.integers(0, 255, (3, WORKING_H, WORKING_W)).astype(np.uint8)
    b = rng.integers(0, 255, (3, WORKING_H, WORKING_W)).astype(np.uint8)
    ctx.train_frame_pair(a, b)          # must not raise
