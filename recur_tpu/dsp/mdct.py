"""MDCT analysis/resynthesis (the role of the vendored Xiph mdct.c +
window.h in gstparrot).

Rather than porting the Vorbis butterfly implementation, this is a dense
matmul MDCT — at parrot's sizes (512-sample windows → 256 coefficients) the
matrix is tiny and the MXU does frame-batched transforms in one shot.
Perfect reconstruction under 50%-overlap-add with a Princen-Bradley-
compatible window (the Vorbis window, window.h) is covered by tests, the
same property test/test_mdct.c checks.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from recur_tpu.dsp.windows import WindowType, window_mask


def mdct_matrix(n: int) -> np.ndarray:
    """Forward MDCT basis: X[k] = Σ_n x[n] cos(π/N (n + 0.5 + N/2)(k + 0.5)),
    N = n//2 coefficients from n samples."""
    N = n // 2
    ns = np.arange(n)[:, None]
    ks = np.arange(N)[None, :]
    return np.cos(np.pi / N * (ns + 0.5 + N / 2.0) * (ks + 0.5)).astype(
        np.float32)


def imdct_matrix(n: int) -> np.ndarray:
    """Inverse: y[n] = (2/N) Σ_k X[k] cos(π/N (n + 0.5 + N/2)(k + 0.5))."""
    N = n // 2
    return (mdct_matrix(n).T * (2.0 / N)).astype(np.float32)


class MDCT:
    """Windowed MDCT with 50% overlap: the parrot analysis/synthesis pair
    (gstparrot.c:497-553 trains on mdct_forward frames; :556-630 resynthesises
    via mdct_backward + window + overlap-add)."""

    def __init__(self, window_size: int,
                 window_type: WindowType | int = WindowType.VORBIS):
        assert window_size % 4 == 0
        self.window_size = window_size
        self.half = window_size // 2
        self.mask = jnp.asarray(window_mask(window_size, window_type))
        self.F = jnp.asarray(mdct_matrix(window_size))
        self.I = jnp.asarray(imdct_matrix(window_size))

    def forward(self, frames: jax.Array) -> jax.Array:
        """frames [..., window_size] (already hopped at half-window) →
        coefficients [..., window_size//2].  Applies the analysis window."""
        return (frames * self.mask) @ self.F

    def backward(self, coeffs: jax.Array) -> jax.Array:
        """coefficients [..., half] → windowed time frames
        [..., window_size] ready for 50% overlap-add."""
        return (coeffs @ self.I) * self.mask

    def overlap_add(self, frames: jax.Array) -> jax.Array:
        """Overlap-add a [T, window_size] stack at hop = half window →
        [T*half + half] samples."""
        frames = jnp.asarray(frames)
        T = frames.shape[0]
        out = jnp.zeros((T + 1) * self.half, frames.dtype)
        idx = jnp.arange(T) * self.half

        def body(i, out):
            return jax.lax.dynamic_update_slice(
                out, jax.lax.dynamic_slice(
                    out, (i * self.half,), (self.window_size,)) + frames[i],
                (i * self.half,))

        return jax.lax.fori_loop(0, T, body, out)


def frame_pcm(pcm: np.ndarray, window_size: int) -> np.ndarray:
    """Slice a PCM vector into 50%-overlapped frames [T, window_size]."""
    half = window_size // 2
    n = (len(pcm) - window_size) // half + 1
    if n <= 0:
        return np.zeros((0, window_size), pcm.dtype)
    idx = np.arange(n)[:, None] * half + np.arange(window_size)[None, :]
    return pcm[idx]
