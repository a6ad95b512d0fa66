"""Pallas TPU kernels for the batched inference hot path.

`fused_rnn_forward` fuses the whole rnn_opinion step — input-layer assembly,
the ih matmul, the activation, and the ho matmul (+ output nonlinearity) —
into ONE kernel, for the large-batch serving paths (the rnnca CA iterates
13,824 pixel streams per frame; the recur constructor 341 nodes).  Weights
and state stay in VMEM for the whole step.

Why only inference: the training step is dominated by the sequential
BPTT walk, and on this environment per-grid-step overhead makes sequential
Pallas grids slower than lax.scan (measured ~870µs/grid step through the
axon tunnel vs ~100µs/scan iteration — see CLAUDE.md).  This kernel uses a
single block (no grid), so it is one device op regardless.

Falls back to the XLA path when shapes don't fit VMEM or Pallas is
unavailable; `interpret=True` makes it testable on CPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from recur_tpu.nn import RnnConfig, RnnParams

_VMEM_BUDGET = 12 * 1024 * 1024   # leave headroom out of ~16MB


def _fits_vmem(cfg: RnnConfig, n_streams: int) -> bool:
    f = 4  # f32 bytes
    need = (cfg.ih_size + cfg.ho_size) * f \
        + n_streams * (cfg.h_size * 2 + cfg.i_size + cfg.o_size) * f
    return need < _VMEM_BUDGET


def _kernel(x_ref, hidden_ref, ih_ref, ho_ref, h_out_ref, o_out_ref,
            *, cfg: RnnConfig, out_kind: str):
    S = x_ref.shape[0]
    hidden = hidden_ref[:]
    x = x_ref[:]
    # input layer = [bias=1, hidden[1:], x, pad] — build via static column
    # masks (iota compares compile away on the VPU)
    col = jax.lax.broadcasted_iota(jnp.int32, (S, cfg.i_size), 1)
    row = jnp.zeros((S, cfg.i_size), jnp.float32)
    # hidden section occupies cols [0, h_size); bias col 0 = 1
    hpad = jnp.pad(hidden, ((0, 0), (0, cfg.i_size - cfg.h_size)))
    row = jnp.where(col < cfg.h_size, hpad, row)
    xpad = jnp.pad(x, ((0, 0), (cfg.input_offset,
                                cfg.i_size - cfg.input_offset - x.shape[1])))
    row = jnp.where((col >= cfg.input_offset)
                    & (col < cfg.input_offset + x.shape[1]), xpad, row)
    row = jnp.where(col == 0, 1.0, row)
    # emergency input soft-clip
    sums = jnp.sum(row, axis=1, keepdims=True)
    halfmax = cfg.i_size * 16.0
    xs = sums / halfmax
    fudge = 0.99 + xs * xs / 100.0
    clip = 2.0 * xs / (1.0 + xs * xs * fudge)
    row = row * jnp.where(sums > halfmax, clip, 1.0)

    h_pre = jnp.dot(row, ih_ref[:], preferred_element_type=jnp.float32)
    h = jnp.maximum(h_pre, 0.0)            # RELU (serving paths use RELU)
    hcol = jax.lax.broadcasted_iota(jnp.int32, (S, cfg.h_size), 1)
    h = jnp.where((hcol >= 1) & (hcol <= cfg.hidden_size), h, 0.0)
    h = jnp.where(hcol == 0, 1.0, h)
    out = jnp.dot(h, ho_ref[:], preferred_element_type=jnp.float32)
    if out_kind == "sigmoid":
        out = jax.nn.sigmoid(out)
    elif out_kind == "tanh":
        out = jnp.tanh(out)
    h_out_ref[:] = h
    o_out_ref[:] = out


@partial(jax.jit, static_argnums=(0, 3, 4))
def fused_rnn_forward(cfg: RnnConfig, params: RnnParams, state,
                      out_kind: str = "none", interpret: bool = False):
    """One fused forward step.  state = (hidden [S,h_size], x [S,input]).
    Returns (new_hidden, output).  RELU nets only (the serving paths)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    hidden, x = state
    S = hidden.shape[0]
    kern = partial(_kernel, cfg=cfg, out_kind=out_kind)
    h_out, o_out = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((S, cfg.h_size), jnp.float32),
                   jax.ShapeDtypeStruct((S, cfg.o_size), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(x, hidden, params.ih, params.ho)
    return h_out, o_out


def forward_available(cfg: RnnConfig, n_streams: int) -> bool:
    """Whether the fused kernel applies (RELU net, fits VMEM, on TPU)."""
    from recur_tpu.nn import Activation
    return (cfg.activation == Activation.RELU
            and not cfg.has_bottom
            and _fits_vmem(cfg, n_streams)
            and jax.default_backend() in ("tpu", "axon"))
