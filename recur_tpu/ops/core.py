"""NN core: batched forward pass and truncated BPTT with the reference's
stability semantics, restructured for the MXU.

Design (SURVEY.md §7): the reference's zero-row-skipping sparse matvec
(calculate_interlayer, recur-nn.c:18-65) is replaced by batching S parallel
streams into dense [S,i]x[i,h] matmuls.  Its fused per-row backward loop
(bptt_and_accumulate_error, recur-nn.c:303-450) splits into
  (1) a small sequential error-propagation scan over the BPTT depth
      (per-step state is only [S,h]), and
  (2) one large dense gradient matmul  einsum('sdi,sdh,s->ih')
      over the history ring and the applied-error trajectory (both kept in
      ring-slot order, so no reordering copies),
so nearly all FLOPs land on the MXU as big matmuls instead of a serial chain.

Measured design landscape (h=199 depth=30 bf16 ring, one v5e, best S):
buffered 12.8M net-steps/s > in-walk per-step gradient accumulation 10.9M
(single ring read, but 30 small matmuls schedule worse than one einsum)
> factored ring 10.6M > two-pass replay 5.8M (a second walk costs ~2.2x).
The buffered big-einsum formulation is the throughput champion; the others
exist for memory (factored, twopass) and are all f32-equivalent.

Semantics preserved exactly (they affect convergence):
  * emergency input soft-clip (maybe_scale_inputs, recur-nn.c:68-81)
  * top-error soft-clip at h_size*MAX_TOP_ERROR_FACTOR (recur-nn.c:719-721)
  * per-stream adaptive early exit of the backward walk and the
    error-explosion ih_scale (recur-nn.c:318-412) — expressed as masks
  * RESQRT derivative e /= 2(input+1); RECLIP20 skips inputs >= 20
  * ReLU derivative implicit in the nonzero mask of stored activations
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from recur_tpu.nn import (
    Activation,
    RnnConfig,
    RnnParams,
    RnnState,
    ABS_MIN_ERROR_FACTOR,
    ERROR_GAIN_CEILING,
    INPUT_MEAN_SOFT_TOP,
    MAX_ERROR_GAIN,
    MAX_MIN_ERROR_FACTOR,
    MAX_TOP_ERROR_FACTOR,
    MIN_ERROR_GAIN,
    RNN_HIDDEN_PENALTY,
)

# --------------------------------------------------------------------------
# scalar / small math (badmaths.h, recur-nn-helpers.h)
# --------------------------------------------------------------------------

def soft_clip(s, halfmax):
    """soft_clip (recur-nn-helpers.h:104-113): smooth scale-down factor."""
    x = s / halfmax
    fudge = 0.99 + x * x / 100.0
    return 2.0 * x / (1.0 + x * x * fudge)


def softclip_scale(s, halfmax, array):
    """softclip_scale (recur-nn-helpers.h:115-124), batched.

    s: [...], array: [..., n].  Returns (scaled_sum, scaled_array).
    """
    need = s > halfmax
    scale = jnp.where(need, soft_clip(s, halfmax), 1.0)
    return scale * s, array * scale[..., None]


def capped_log2(x):
    """capped_log2f (charmodel-helpers.h:11-14)."""
    return jnp.where(x < 1e-30, -100.0, jnp.log2(jnp.maximum(x, 1e-38)))


def softmax(x, axis=-1):
    """Reference softmax (badmaths.h:71-111) uses a Padé exp approximation and
    overflow shifting; on TPU exact exp is cheap, and jax's softmax already
    does the max-shift, so this is strictly more accurate."""
    return jax.nn.softmax(x, axis=axis)


def biased_softmax(x, bias, axis=-1):
    """biased_softmax (badmaths.h:143-156): sharpen by re-softmaxing
    softmax(x)*bias + x.  bias==0 → plain softmax."""
    p = softmax(x, axis=axis)
    return jnp.where(bias == 0.0, p, softmax(p * bias + x, axis=axis))


def softmax_best_guess_error(answer, target, axis=-1):
    """softmax_best_guess + error[target] += 1 (badmaths.h:113-141).

    answer: [..., n] logits; target: [...] int.
    Returns (o_error = onehot(target) - softmax(answer), winner, p_target).
    o_error is the value the reference leaves in the error array after the
    canonical `error[target] += 1.0f` — i.e. the negative XE gradient.
    """
    p = softmax(answer, axis=axis)
    winner = jnp.argmax(p, axis=axis)
    onehot = jax.nn.one_hot(target, answer.shape[-1], dtype=answer.dtype)
    o_error = onehot - p
    # one-hot contraction, NOT take_along_axis: TPU lowers the per-row
    # gather abysmally (~200us/char at caravel shapes, measured) while the
    # masked sum fuses into the surrounding elementwise work
    p_target = jnp.sum(p * onehot, axis=-1)
    return o_error, winner, p_target


# --------------------------------------------------------------------------
# forward pass (rnn_opinion, recur-nn.c:83-154), batched over streams
# --------------------------------------------------------------------------

class ForwardOut(NamedTuple):
    hidden: jax.Array        # [S, h_size] post-activation (with [.,0]=1)
    output: jax.Array        # [S, o_size] raw logits
    input_row: jax.Array     # [S, i_size] the (possibly soft-clipped) row
                             # that belongs in the history ring
    bottom_inputs: Optional[jax.Array]  # [S, bottom_i_size] or None


def _activation(cfg: RnnConfig, h):
    if cfg.activation == Activation.RESQRT:
        return jnp.where(h > 0.0, jnp.sqrt(jnp.maximum(h, 0.0) + 1.0) - 1.0, 0.0)
    if cfg.activation == Activation.RECLIP20:
        return jnp.clip(h - RNN_HIDDEN_PENALTY, 0.0, 20.0)
    return jnp.maximum(h - RNN_HIDDEN_PENALTY, 0.0)


def _hidden_mask(cfg: RnnConfig):
    """1.0 on live hidden slots 1..hidden_size, 0 on bias slot and padding."""
    idx = jnp.arange(cfg.h_size)
    return ((idx >= 1) & (idx <= cfg.hidden_size)).astype(jnp.float32)


def _presynaptic_noise(cfg: RnnConfig, key, shape, deviation):
    """MAYBE_ADD_ARRAY_NOISE: gaussian noise on pre-activation hiddens.
    The reference's cheap_gaussian_noise is an Irwin-Hall ~N(0,1) hard-limited
    to ±6σ; we clip a normal to the same support."""
    n = jax.random.normal(key, shape)
    return jnp.clip(n, -6.0, 6.0) * deviation


def forward_step(cfg: RnnConfig, params: RnnParams, hidden: jax.Array,
                 x: jax.Array, *, noise_key: Optional[jax.Array] = None,
                 presynaptic_noise: jax.Array | float = 0.0) -> ForwardOut:
    """One forward step for S parallel streams.

    hidden: [S, h_size] previous post-activation hidden (slot 0 == bias).
    x: [S, input_size] dense inputs (one-hot rows for char models, features
       for audio).  With a bottom layer, x is [S, bottom_input_size] and is
       passed through the extra feed-forward layer first
       (recur-nn.c:88-103).
    """
    S = hidden.shape[0]
    f32 = jnp.float32
    bottom_inputs = None
    if cfg.has_bottom:
        assert params.bottom is not None
        bi = jnp.zeros((S, cfg.bottom_i_size), f32)
        bi = bi.at[:, 0].set(1.0)
        bi = bi.at[:, 1:1 + cfg.bottom_input_size].set(x)
        bottom_inputs = bi
        bo = bi @ params.bottom            # [S, bottom_o_size]
        if noise_key is not None:
            k0, noise_key = jax.random.split(noise_key)
            noise = _presynaptic_noise(cfg, k0, (S, cfg.input_size - 1),
                                       presynaptic_noise)
            bo = bo.at[:, 1:cfg.input_size].add(noise)
        x = jnp.maximum(bo[:, :cfg.input_size], 0.0)

    # input layer = [bias=1, hidden(t-1)[1:], x, pad]  (recur-nn.c:104-112)
    # — one concatenate (hidden[1:hidden+1] and x are contiguous at
    # input_offset = hidden_size+1), cheaper than scatters
    pad = cfg.i_size - cfg.input_offset - cfg.input_size
    row = jnp.concatenate(
        [jnp.ones((S, 1), f32), hidden[:, 1:cfg.hidden_size + 1],
         x.astype(f32)] + ([jnp.zeros((S, pad), f32)] if pad else []),
        axis=1)

    # emergency input scale (maybe_scale_inputs, recur-nn.c:68-81)
    sums = jnp.sum(row, axis=1)
    softclip = cfg.i_size * INPUT_MEAN_SOFT_TOP
    scale = jnp.where(sums > softclip, soft_clip(sums, softclip), 1.0)
    row = row * scale[:, None]

    h_pre = row @ params.ih                # [S, h_size]
    if noise_key is not None:
        noise = _presynaptic_noise(cfg, noise_key, (S, cfg.h_size - 1),
                                   presynaptic_noise)
        h_pre = h_pre.at[:, 1:].add(noise)

    h = _activation(cfg, h_pre)
    h = h * _hidden_mask(cfg)              # zero pads (and bias slot)
    h = h.at[:, 0].set(1.0)                # bias (recur-nn.c:148)

    out = h @ params.ho                    # [S, o_size]
    return ForwardOut(hidden=h, output=out, input_row=row,
                      bottom_inputs=bottom_inputs)


def advance_history(state: RnnState, input_row: jax.Array) -> RnnState:
    """rnn_bptt_advance (recur-nn.c:696-704): rotate the ring and write the
    new input layer into it — writing inputs IS writing history."""
    depth = state.history.shape[1]
    head = (state.head + 1) % depth
    history = jax.lax.dynamic_update_slice_in_dim(
        state.history, input_row[:, None, :].astype(state.history.dtype),
        head, axis=1)
    return RnnState(hidden=state.hidden, history=history, head=head,
                    tokens=state.tokens)


# --------------------------------------------------------------------------
# truncated BPTT (rnn_bptt_calc_deltas + bptt_and_accumulate_error)
# --------------------------------------------------------------------------

class DeltaOut(NamedTuple):
    ih_delta: jax.Array                 # [i_size, h_size] summed over streams
    ho_delta: jax.Array                 # [h_size, o_size] summed over streams
    bottom_delta: Optional[jax.Array]
    min_error_factor: jax.Array         # [S] updated adaptive floor
    stats: dict                         # per-step logging values


def _row_mask(cfg: RnnConfig, inputs):
    """Which history rows take part in the backward step (recur-nn.c:338-341):
    nonzero, and for RECLIP20 only rows whose stored activation is < 20."""
    m = inputs != 0.0
    if cfg.activation == Activation.RECLIP20:
        m = m & (inputs < 20.0)
    return m


class _BpttSetup(NamedTuple):
    """Shared top-layer backprop + thresholds for the calc_deltas family."""
    h_err0: jax.Array            # [S, h_size] soft-clipped top error
    top_error_sum: jax.Array     # [S]
    top_scaled: jax.Array        # [S]
    ho_delta: jax.Array          # [h_size, o_size]
    max_error_sum: jax.Array     # [S]
    error_sum_ceiling: jax.Array  # [S]
    min_error_gain: jax.Array    # [S]
    min_error_sum: jax.Array     # [S]


def _bptt_setup(cfg: RnnConfig, params: RnnParams, hidden: jax.Array,
                o_error: jax.Array, min_error_factor: jax.Array,
                learn_rate: jax.Array) -> _BpttSetup:
    """Top layer (backprop_top_layer + softclip, recur-nn.c:713-729) and the
    per-stream BPTT thresholds (recur-nn.c:317-323)."""
    if o_error.dtype == jnp.float32:
        h_err0 = (o_error @ params.ho.T)       # [S, h_size]
        ho_delta = jnp.einsum("sh,so->ho", hidden, o_error,
                              preferred_element_type=jnp.float32)
    else:
        # reduced-precision top error (TrainHyper.top_dtype): both MXU
        # operands in the narrow dtype, f32 accumulation — halves the two
        # [S, o_size] reads that dominate at multihead output widths
        h_err0 = jnp.matmul(o_error, params.ho.T.astype(o_error.dtype),
                            preferred_element_type=jnp.float32)
        ho_delta = jnp.einsum("sh,so->ho", hidden.astype(o_error.dtype),
                              o_error, preferred_element_type=jnp.float32)
    live = (hidden != 0.0) & (jnp.arange(cfg.h_size) >= 1)
    h_err0 = jnp.where(live, h_err0, 0.0)
    top_error_sum = jnp.sum(jnp.abs(h_err0), axis=1)          # [S]
    top_scaled, h_err0 = softclip_scale(
        top_error_sum, cfg.h_size * MAX_TOP_ERROR_FACTOR, h_err0)
    min_error_gain = MIN_ERROR_GAIN * top_scaled
    return _BpttSetup(
        h_err0=h_err0, top_error_sum=top_error_sum, top_scaled=top_scaled,
        ho_delta=ho_delta,
        max_error_sum=MAX_ERROR_GAIN * top_scaled + 1.0,
        error_sum_ceiling=ERROR_GAIN_CEILING * top_scaled,
        min_error_gain=min_error_gain,
        min_error_sum=jnp.minimum(min_error_factor / learn_rate,
                                  min_error_gain))


def _bptt_epilogue(cfg: RnnConfig, su: _BpttSetup, min_error_factor,
                   last_err, active_fin, k_active, depth):
    """Emergency scaling & adaptive min error (recur-nn.c:393-413).
    Returns (clipped, ih_scale, t_final, new_min_error_factor)."""
    clipped = last_err > su.error_sum_ceiling
    ih_scale = jnp.where(clipped, soft_clip(last_err, su.max_error_sum), 1.0)
    t_final = jnp.where(~active_fin, depth - k_active + 1, 0)
    if cfg.adaptive_min_error:
        depth_error = (depth // 4 - t_final).astype(jnp.float32)
        cond = ((min_error_factor < MAX_MIN_ERROR_FACTOR)
                & ((su.min_error_gain != su.min_error_sum)
                   | (depth_error < 0)))
        grow = min_error_factor * (1.0 + depth_error * 1e-3)
        new_mef = jnp.where(~clipped & cond, grow, min_error_factor)
        new_mef = jnp.maximum(new_mef, ABS_MIN_ERROR_FACTOR)
    else:
        new_mef = min_error_factor
    return clipped, ih_scale, t_final, new_mef


def _bptt_stats(su: _BpttSetup, depth, t_final, ih_scale, last_err,
                cum_err) -> dict:
    return {
        "depth": (depth - t_final).astype(jnp.float32),
        "ih_scale": ih_scale,
        "top_error_raw": su.top_error_sum,
        "top_error_scaled": su.top_scaled,
        "error_sum": last_err,
        "cum_error": cum_err,
        "min_error_threshold": su.min_error_sum,
    }


def calc_deltas(cfg: RnnConfig, params: RnnParams, state: RnnState,
                bottom_inputs: Optional[jax.Array],
                o_error: jax.Array, min_error_factor: jax.Array,
                learn_rate: jax.Array, walk_unroll: int = 1) -> DeltaOut:
    """Batched rnn_bptt_calc_deltas (recur-nn.c:707-772).

    o_error: [S, o_size] top error (e.g. onehot-softmax), per stream.
    Returns weight-space deltas already summed over the stream axis — the
    synchronic mini-batch "all-reduce into one delta array"
    (recur-nn-init.c:236-241) becomes this reduction; across chips it becomes
    a psum (parallel/mesh.py).
    """
    S = o_error.shape[0]
    hidden = state.hidden                      # [S, h_size] current
    depth = cfg.depth
    hmask = _hidden_mask(cfg)
    su = _bptt_setup(cfg, params, hidden, o_error, min_error_factor,
                     learn_rate)
    h_err0 = su.h_err0
    min_error_sum, max_error_sum = su.min_error_sum, su.max_error_sum

    # The backward walk reads history rows newest-first from the ring
    # (recur-nn.c:329-332).  Rather than materialising a reordered [D,S,i]
    # copy (30MB+ of HBM traffic per step at production sizes), each scan
    # step slices its row from the ring in place and writes its applied
    # error into an [D,S,h] buffer AT THE SAME RING SLOT — the final
    # gradient einsum contracts over all (d,s), so slot order is free.
    hdtype = state.history.dtype
    eh_buf0 = jnp.zeros((S, depth, cfg.h_size), hdtype)
    # The walk runs in the ring dtype end-to-end (same rationale as the
    # windowed walk above): with a bf16 ring the per-step row slice, e_full
    # and the buffered applied error never materialise f32 copies.  Scalar
    # bookkeeping (err_sum, thresholds, cie) stays f32.  For an f32 ring
    # every cast below is a no-op and the path is bit-identical.
    edtype = hdtype
    ihT_e = params.ih.T.astype(edtype)
    hmask_e = hmask.astype(edtype)

    def step(carry, t):
        e_h, active, last_err, k_active, cum_err, cie, eh_buf = carry
        slot = (state.head - t) % depth
        inputs_t = jax.lax.dynamic_slice_in_dim(
            state.history, slot, 1, axis=1)[:, 0]        # [S, i_size] edtype
        # zero bias slot + pads (recur-nn.c:334-337)
        e_h = e_h * hmask_e
        m = _row_mask(cfg, inputs_t)                     # [S, i_size]
        e_full = jnp.matmul(e_h, ihT_e, preferred_element_type=edtype)
        if cfg.activation == Activation.RESQRT:
            e_full = e_full / (2.0 * (inputs_t + jnp.asarray(1.0, edtype)))
        e_full = jnp.where(m, e_full, jnp.asarray(0.0, edtype))
        ef32 = e_full.astype(jnp.float32)
        err_sum = jnp.sum(ef32 * ef32, axis=1)           # [S] f32
        act_f = active.astype(jnp.float32)
        # the error used for this step's delta, masked by active
        y_eh = jnp.where(active[:, None], e_h, jnp.asarray(0.0, edtype))
        eh_buf = jax.lax.dynamic_update_slice_in_dim(
            eh_buf, y_eh[:, None], slot, axis=1)
        # bottom-layer cumulative input error (recur-nn.c:377-382)
        if cie is not None:
            part = ef32[:, cfg.input_offset:cfg.input_offset + cfg.input_size]
            cie = cie + part * act_f[:, None]
        cum_err = cum_err + jnp.sqrt(err_sum) * act_f
        last_err = jnp.where(active, err_sum, last_err)
        k_active = k_active + active.astype(jnp.int32)
        trip = (err_sum <= min_error_sum) | (err_sum > max_error_sum)
        active = active & ~trip
        e_h_next = e_full[:, :cfg.h_size]
        return (e_h_next, active, last_err, k_active, cum_err, cie,
                eh_buf), None

    cie0 = (jnp.zeros((S, cfg.input_size), jnp.float32)
            if cfg.has_bottom else None)
    carry0 = (h_err0.astype(edtype), jnp.ones((S,), bool),
              jnp.zeros((S,), jnp.float32), jnp.zeros((S,), jnp.int32),
              jnp.zeros((S,), jnp.float32), cie0, eh_buf0)
    (e_h_fin, active_fin, last_err, k_active, cum_err, cie, eh_traj), _ = \
        jax.lax.scan(step, carry0, jnp.arange(depth),
                     unroll=min(walk_unroll, depth))
    # eh_traj: [S, depth, h_size] in RING-SLOT order (matches state.history)

    clipped, ih_scale, t_final, new_mef = _bptt_epilogue(
        cfg, su, min_error_factor, last_err, active_fin, k_active, depth)
    if cfg.has_bottom and cie is not None:
        cie = cie * jnp.where(clipped, ih_scale * ih_scale, 1.0)[:, None]

    # ---- the big gradient matmul: Σ_t Σ_s scale_s · input_t ⊗ e_h_t ----
    # For RELU/RESQRT the row mask is just `input != 0`, and where(x!=0,x,0)
    # is x — no masked copy needed.  RECLIP20 additionally drops rows >= 20.
    hist = state.history                                  # [S, D, i]
    if cfg.activation == Activation.RECLIP20:
        hist = jnp.where(_row_mask(cfg, hist), hist, 0.0)
    ih_delta = jnp.einsum("sdi,sdh,s->ih", hist, eh_traj, ih_scale,
                          preferred_element_type=jnp.float32)

    # ---- bottom layer delta (recur-nn.c:750-764) ----
    bottom_delta = None
    if cfg.has_bottom and bottom_inputs is not None and cie is not None:
        # bottom o_error is the cumulative input error on the RNN's inputs
        bo_err = jnp.zeros((S, cfg.bottom_o_size), jnp.float32)
        bo_err = bo_err.at[:, :cfg.input_size].set(cie)
        bottom_delta = jnp.einsum("si,so->io", bottom_inputs, bo_err,
                                  preferred_element_type=jnp.float32)

    return DeltaOut(ih_delta=ih_delta, ho_delta=su.ho_delta,
                    bottom_delta=bottom_delta, min_error_factor=new_mef,
                    stats=_bptt_stats(su, depth, t_final, ih_scale,
                                      last_err, cum_err))


def advance_history_factored(state: RnnState, input_row: jax.Array,
                             token: jax.Array) -> RnnState:
    """rnn_bptt_advance for the one-hot-factored ring: store only the
    [bias, hidden] section of the input row plus the token id.  The one-hot
    entry's value is the input soft-clip scale, which equals the stored
    bias, so the full row is exactly reconstructible."""
    depth = state.history.shape[1]
    width = state.history.shape[2]
    head = (state.head + 1) % depth
    history = jax.lax.dynamic_update_slice_in_dim(
        state.history,
        input_row[:, None, :width].astype(state.history.dtype), head, axis=1)
    tokens = jax.lax.dynamic_update_slice_in_dim(
        state.tokens, token[:, None].astype(jnp.int32), head, axis=1)
    return RnnState(hidden=state.hidden, history=history, head=head,
                    tokens=tokens)


def calc_deltas_factored(cfg: RnnConfig, params: RnnParams, state: RnnState,
                         o_error: jax.Array, min_error_factor: jax.Array,
                         learn_rate: jax.Array,
                         walk_unroll: int = 1) -> DeltaOut:
    """BPTT over the one-hot-factored ring (char models: the input section
    of every history row is one-hot).

    The ring holds only [S, depth, input_offset] ([bias, hidden] — the
    one-hot's value equals the stored bias) plus token ids, so the backward
    walk's matvec shrinks from h x i_size to h x input_offset and the
    vocab-column error is a tiny one-hot matmul.  Structure mirrors
    calc_deltas (single walk + error-trajectory buffer + final einsums —
    a second replay walk measures ~2.2x slower, and a per-row scatter-add
    for the vocab gradient serialises on TPU, so both gradient sections are
    one-hot/dense einsums over the buffer).  Same math as calc_deltas to
    f32 tolerance.  No bottom layer (a bottom layer makes the RNN inputs
    dense).
    """
    assert not cfg.has_bottom, "factored BPTT needs one-hot RNN inputs"
    assert state.tokens is not None, "state was not created factored=True"
    S = o_error.shape[0]
    depth = cfg.depth
    W = state.history.shape[2]                 # input_offset
    vocab = cfg.input_size
    vocab_iota = jnp.arange(vocab)
    hmask = _hidden_mask(cfg)
    su = _bptt_setup(cfg, params, state.hidden, o_error, min_error_factor,
                     learn_rate)
    h_err0 = su.h_err0
    min_error_sum, max_error_sum = su.min_error_sum, su.max_error_sum

    ih_head = params.ih[:W]                    # [W, h] bias+hidden rows
    ih_tail = params.ih[cfg.input_offset:
                        cfg.input_offset + cfg.input_size]  # [vocab, h]
    hdtype = state.history.dtype
    eh_buf0 = jnp.zeros((S, depth, cfg.h_size), hdtype)
    # narrow-native walk (see calc_deltas): with a bf16 ring everything in
    # the depth loop stays bf16; f32 rings keep the exact path.
    edtype = hdtype
    ih_headT_e = ih_head.T.astype(edtype)
    ih_tail_e = ih_tail.astype(edtype)
    hmask_e = hmask.astype(edtype)

    def step(carry, t):
        e_h, active, last_err, k_active, cum_err, eh_buf = carry
        slot = (state.head - t) % depth
        hid_t = jax.lax.dynamic_slice_in_dim(
            state.history, slot, 1, axis=1)[:, 0]        # [S, W] edtype
        tok_t = jax.lax.dynamic_slice_in_dim(
            state.tokens, slot, 1, axis=1)[:, 0]         # [S]
        scale_t = hid_t[:, 0]            # one-hot value == stored bias
        e_h = e_h * hmask_e
        # error on the [bias, hidden] section
        e_hid = jnp.matmul(e_h, ih_headT_e,
                           preferred_element_type=edtype)   # [S, W]
        # error on the single live one-hot column, via one-hot matmul
        # (a [vocab, h] row gather per step measures slower on TPU)
        t_oh = (tok_t[:, None] == vocab_iota).astype(edtype)
        e_tok = jnp.einsum("sh,sh->s", e_h,
                           jnp.matmul(t_oh, ih_tail_e,
                                      preferred_element_type=edtype),
                           preferred_element_type=edtype)
        if cfg.activation == Activation.RESQRT:
            e_hid = e_hid / (2.0 * (hid_t + jnp.asarray(1.0, edtype)))
            e_tok = e_tok / (2.0 * (scale_t + jnp.asarray(1.0, edtype)))
        m = _row_mask(cfg, hid_t)
        e_hid = jnp.where(m, e_hid, jnp.asarray(0.0, edtype))
        tok_live = scale_t != 0.0
        if cfg.activation == Activation.RECLIP20:
            tok_live = tok_live & (scale_t < 20.0)
        e_tok = jnp.where(tok_live, e_tok, jnp.asarray(0.0, edtype))
        ehid32 = e_hid.astype(jnp.float32)
        etok32 = e_tok.astype(jnp.float32)
        err_sum = (jnp.sum(ehid32 * ehid32, axis=1) + etok32 * etok32)
        act_f = active.astype(jnp.float32)
        y_eh = jnp.where(active[:, None], e_h, jnp.asarray(0.0, edtype))
        eh_buf = jax.lax.dynamic_update_slice_in_dim(
            eh_buf, y_eh[:, None], slot, axis=1)
        cum_err = cum_err + jnp.sqrt(err_sum) * act_f
        last_err = jnp.where(active, err_sum, last_err)
        k_active = k_active + active.astype(jnp.int32)
        trip = (err_sum <= min_error_sum) | (err_sum > max_error_sum)
        active = active & ~trip
        pad = cfg.h_size - W
        e_next = (jnp.pad(e_hid, ((0, 0), (0, pad))) if pad else e_hid)
        return (e_next, active, last_err, k_active, cum_err, eh_buf), None

    carry0 = (h_err0.astype(edtype), jnp.ones((S,), bool),
              jnp.zeros((S,), jnp.float32), jnp.zeros((S,), jnp.int32),
              jnp.zeros((S,), jnp.float32), eh_buf0)
    (e_fin, active_fin, last_err, k_active, cum_err, eh_traj), _ = \
        jax.lax.scan(step, carry0, jnp.arange(depth),
                     unroll=min(walk_unroll, depth))
    # eh_traj: [S, depth, h_size] in RING-SLOT order (matches state.history)

    clipped, ih_scale, t_final, new_mef = _bptt_epilogue(
        cfg, su, min_error_factor, last_err, active_fin, k_active, depth)

    # head section: Σ_{s,d} scale_s · [bias, hidden]_{s,d} ⊗ y_eh_{s,d}
    hist = state.history                                  # [S, D, W]
    scales = hist[:, :, 0]                                # one-hot values
    if cfg.activation == Activation.RECLIP20:
        hist = jnp.where(_row_mask(cfg, hist.astype(jnp.float32)),
                         hist, jnp.zeros((), hdtype))
        scales = jnp.where(scales.astype(jnp.float32) < 20.0, scales,
                           jnp.zeros((), hdtype))
    head_grad = jnp.einsum("sdw,sdh,s->wh", hist, eh_traj, ih_scale,
                           preferred_element_type=jnp.float32)
    # vocab section: Σ grouped by token id — scatter expressed as a one-hot
    # einsum so it lands on the MXU
    onehot = ((state.tokens[:, :, None] == vocab_iota)
              .astype(hdtype) * scales[:, :, None])       # [S, D, vocab]
    vocab_grad = jnp.einsum("sdv,sdh,s->vh", onehot, eh_traj, ih_scale,
                            preferred_element_type=jnp.float32)

    ih_delta = jnp.zeros((cfg.i_size, cfg.h_size), jnp.float32)
    ih_delta = ih_delta.at[:W].set(head_grad)
    ih_delta = ih_delta.at[cfg.input_offset:cfg.input_offset + vocab].set(
        vocab_grad)

    return DeltaOut(ih_delta=ih_delta, ho_delta=su.ho_delta,
                    bottom_delta=None, min_error_factor=new_mef,
                    stats=_bptt_stats(su, depth, t_final, ih_scale,
                                      last_err, cum_err))


def calc_deltas_twopass(cfg: RnnConfig, params: RnnParams, state: RnnState,
                        bottom_inputs: Optional[jax.Array],
                        o_error: jax.Array, min_error_factor: jax.Array,
                        learn_rate: jax.Array,
                        walk_unroll: int = 1) -> DeltaOut:
    """calc_deltas with the [S, depth, h] error-trajectory buffer replaced
    by a second backward walk.

    The buffered form writes every step's applied error into eh_buf and
    contracts it against the whole ring in one einsum — two full ring reads
    plus an eh_buf write+read of HBM traffic per training step.  Here pass 1
    only computes the walk outcomes (early-exit masks, last_err -> ih_scale),
    and pass 2 replays the identical walk, accumulating the scaled
    outer-product gradient [i, h] step by step.  ~55% of the HBM traffic for
    ~1.5x the matvec FLOPs — a win when the backward is bandwidth-bound
    (large S, bf16 ring).  Numerics: same values, different summation order
    (per-step accumulation vs one einsum), so results agree to f32
    tolerance, not bitwise.
    """
    S = o_error.shape[0]
    depth = cfg.depth
    hmask = _hidden_mask(cfg)
    su = _bptt_setup(cfg, params, state.hidden, o_error, min_error_factor,
                     learn_rate)
    h_err0 = su.h_err0
    min_error_sum, max_error_sum = su.min_error_sum, su.max_error_sum

    # narrow-native walk (see calc_deltas): with a bf16 ring both passes
    # stay bf16 in the depth loop; f32 rings keep the exact path.
    edtype = state.history.dtype
    ihT_e = params.ih.T.astype(edtype)
    hmask_e = hmask.astype(edtype)

    def walk(step_extra, carry_extra0):
        """The backward walk shared by both passes; step_extra(carry_extra,
        inputs_t, y_eh) accumulates whatever the pass needs."""
        def step(carry, t):
            e_h, active, last_err, k_active, cum_err, cie, extra = carry
            slot = (state.head - t) % depth
            inputs_t = jax.lax.dynamic_slice_in_dim(
                state.history, slot, 1, axis=1)[:, 0]    # [S, i] edtype
            e_h = e_h * hmask_e
            m = _row_mask(cfg, inputs_t)
            e_full = jnp.matmul(e_h, ihT_e, preferred_element_type=edtype)
            if cfg.activation == Activation.RESQRT:
                e_full = e_full / (2.0 * (inputs_t
                                          + jnp.asarray(1.0, edtype)))
            e_full = jnp.where(m, e_full, jnp.asarray(0.0, edtype))
            ef32 = e_full.astype(jnp.float32)
            err_sum = jnp.sum(ef32 * ef32, axis=1)
            act_f = active.astype(jnp.float32)
            y_eh = jnp.where(active[:, None], e_h, jnp.asarray(0.0, edtype))
            extra = step_extra(extra, inputs_t, y_eh)
            if cie is not None:
                part = ef32[:, cfg.input_offset:
                            cfg.input_offset + cfg.input_size]
                cie = cie + part * act_f[:, None]
            cum_err = cum_err + jnp.sqrt(err_sum) * act_f
            last_err = jnp.where(active, err_sum, last_err)
            k_active = k_active + active.astype(jnp.int32)
            trip = (err_sum <= min_error_sum) | (err_sum > max_error_sum)
            active = active & ~trip
            return (e_full[:, :cfg.h_size], active, last_err, k_active,
                    cum_err, cie, extra), None

        cie0 = (jnp.zeros((S, cfg.input_size), jnp.float32)
                if cfg.has_bottom else None)
        carry0 = (h_err0.astype(edtype), jnp.ones((S,), bool),
                  jnp.zeros((S,), jnp.float32), jnp.zeros((S,), jnp.int32),
                  jnp.zeros((S,), jnp.float32), cie0, carry_extra0)
        (e_fin, active_fin, last_err, k_active, cum_err, cie, extra), _ = \
            jax.lax.scan(step, carry0, jnp.arange(depth),
                     unroll=min(walk_unroll, depth))
        return active_fin, last_err, k_active, cum_err, cie, extra

    # pass 1: outcomes only
    active_fin, last_err, k_active, cum_err, cie, _ = walk(
        lambda extra, inputs_t, y_eh: extra, None)
    clipped, ih_scale, t_final, new_mef = _bptt_epilogue(
        cfg, su, min_error_factor, last_err, active_fin, k_active, depth)
    if cfg.has_bottom and cie is not None:
        cie = cie * jnp.where(clipped, ih_scale * ih_scale, 1.0)[:, None]

    # pass 2: replay, accumulating scale_s * inputs_t x y_eh into [i, h]
    def accumulate(acc, inputs_t, y_eh):
        if cfg.activation == Activation.RECLIP20:
            inputs_t = jnp.where(_row_mask(cfg, inputs_t), inputs_t, 0.0)
        return acc + jnp.einsum("si,sh->ih", inputs_t,
                                y_eh * ih_scale[:, None],
                                preferred_element_type=jnp.float32)

    acc0 = jnp.zeros((cfg.i_size, cfg.h_size), jnp.float32)
    *_, ih_delta = walk(accumulate, acc0)

    bottom_delta = None
    if cfg.has_bottom and bottom_inputs is not None and cie is not None:
        bo_err = jnp.zeros((S, cfg.bottom_o_size), jnp.float32)
        bo_err = bo_err.at[:, :cfg.input_size].set(cie)
        bottom_delta = jnp.einsum("si,so->io", bottom_inputs, bo_err,
                                  preferred_element_type=jnp.float32)

    return DeltaOut(ih_delta=ih_delta, ho_delta=su.ho_delta,
                    bottom_delta=bottom_delta, min_error_factor=new_mef,
                    stats=_bptt_stats(su, depth, t_final, ih_scale,
                                      last_err, cum_err))


def window_bptt_setup(cfg: RnnConfig, params: RnnParams, hidden: jax.Array,
                      o_error: jax.Array, min_error_factor: jax.Array,
                      learn_rate: jax.Array):
    """Per-char top-layer backprop for the windowed batch path: returns
    (setup-without-ho_delta, ho_delta).  Runs INSIDE the window's forward
    scan so the [S, o_size] top error is consumed immediately — buffering B
    chars of o_error (S x B x o_size) would be the dominant HBM traffic of
    the whole window at multihead output widths."""
    su = _bptt_setup(cfg, params, hidden, o_error, min_error_factor,
                     learn_rate)
    return su._replace(ho_delta=None), su.ho_delta


def calc_deltas_window(cfg: RnnConfig, params: RnnParams, rows: jax.Array,
                       su_w: _BpttSetup, min_error_factor: jax.Array,
                       learn_rate: jax.Array,
                       walk_unroll: int = 1) -> DeltaOut:
    """Batched truncated BPTT over a WINDOW of B consecutive chars — the
    diachronic `batch_size` semantics (rnn_bptt_calc_deltas accumulating,
    apply every batch_size steps: recur-nn.c:980-997,
    charmodel-multi-predict.c:249-262) reorganised TPU-first.

    Within an apply window the reference's weights are CONSTANT, so the B
    per-char depth-D backward walks are independent given the forward
    trajectory.  Instead of B sequential walks of tiny [S, h] matmuls
    (each ~5µs of kernel latency in a serial dependency chain — what binds
    the caravel h=100 workload), run ONE walk whose batch is [S*B]: depth
    step d slices the input rows of chars t-d for every t at once from a
    [S, D-1+B, i] window buffer.  The applied errors buffer into
    [D, S, B, h] (same per-char HBM traffic as the sequential buffered
    form) and the post-walk gradient contracts them against the row slices
    with the per-(stream,char) emergency scale folded in — D independent
    matmuls of contraction S*B that pipeline freely.

    Semantics vs the sequential batch path: identical math per char except
    the adaptive min_error_factor, which the reference nudges once per char
    *between* walks; here every char in the window uses the window-start
    value and the per-char growth factors compose multiplicatively at the
    end (drift bound: B tiny 1e-3-scale factors).  batch_size=1 callers
    keep the exact per-char path.

    rows: [S, D-1+B, i_size] input rows, row k = char (k - D + 1)'s input
          layer (any float dtype; bf16 halves the walk traffic).
    su_w: per-char top-layer setups (window_bptt_setup) stacked to
          h_err0 [S, B, h] and [S, B] thresholds; ho_delta is None (the
          caller accumulates it inside its forward scan).
    """
    assert not cfg.has_bottom, "windowed BPTT: bottom layer not supported"
    S, B = su_w.h_err0.shape[:2]
    depth = cfg.depth
    N = S * B
    hmask = _hidden_mask(cfg)
    mef_flat = jnp.broadcast_to(min_error_factor[:, None], (S, B)).reshape(N)
    e0 = su_w.h_err0
    min_es, max_es = su_w.min_error_sum, su_w.max_error_sum      # [S, B]
    su_flat = su_w._replace(
        h_err0=None,
        top_error_sum=su_w.top_error_sum.reshape(N),
        top_scaled=su_w.top_scaled.reshape(N),
        max_error_sum=max_es.reshape(N),
        error_sum_ceiling=su_w.error_sum_ceiling.reshape(N),
        min_error_gain=su_w.min_error_gain.reshape(N),
        min_error_sum=min_es.reshape(N))
    edtype = rows.dtype
    # The whole walk runs in the rows dtype: with a bf16 ring every [S, B, *]
    # tensor in the depth loop (row slices, e_full, the eh trajectory) stays
    # bf16 end-to-end — the f32 upcasts this used to do materialised full
    # [S, B, i] copies per depth step, which made the windowed walk
    # compute/bandwidth-bound and no faster than the per-char path (measured
    # round 3).  Scalar bookkeeping (err_sum, thresholds) stays f32.
    ihT_e = params.ih.T.astype(edtype)
    hmask_e = hmask.astype(edtype)

    def step(carry, d):
        e_h, active, last_err, k_active, cum_err = carry
        e_h = e_h * hmask_e
        inputs_d = jax.lax.dynamic_slice_in_dim(
            rows, (depth - 1) - d, B, axis=1)            # [S, B, i] edtype
        m = _row_mask(cfg, inputs_d)
        e_full = jnp.matmul(e_h.reshape(N, cfg.h_size), ihT_e,
                            preferred_element_type=edtype).reshape(
            S, B, cfg.i_size)
        if cfg.activation == Activation.RESQRT:
            e_full = e_full / (2.0 * (inputs_d + jnp.asarray(1.0, edtype)))
        e_full = jnp.where(m, e_full, jnp.asarray(0.0, edtype))
        ef32 = e_full.astype(jnp.float32)
        err_sum = jnp.sum(ef32 * ef32, axis=2)            # [S, B] f32
        y_eh = jnp.where(active[..., None], e_h, jnp.asarray(0.0, edtype))
        act_f = active.astype(jnp.float32)
        cum_err = cum_err + jnp.sqrt(err_sum) * act_f
        last_err = jnp.where(active, err_sum, last_err)
        k_active = k_active + active.astype(jnp.int32)
        trip = (err_sum <= min_es) | (err_sum > max_es)
        active = active & ~trip
        # the applied-error trajectory leaves as a scan OUTPUT (native
        # stacking) — a carried [D, S, B, h] buffer costs a zeros-init
        # write plus carry traffic every iteration
        return (e_full[..., :cfg.h_size], active, last_err, k_active,
                cum_err), y_eh

    z = jnp.zeros((S, B), jnp.float32)
    carry0 = (e0.astype(edtype), jnp.ones((S, B), bool), z,
              jnp.zeros((S, B), jnp.int32), z)
    (e_fin, active_fin, last_err, k_active, cum_err), eh_buf = \
        jax.lax.scan(step, carry0, jnp.arange(depth),
                     unroll=min(walk_unroll, depth))

    clipped, ih_scale, t_final, new_mef_flat = _bptt_epilogue(
        cfg, su_flat, mef_flat, last_err.reshape(N), active_fin.reshape(N),
        k_active.reshape(N), depth)
    scale = ih_scale.reshape(S, B)

    # the post-walk gradient: D independent matmuls (no serial dependency
    # beyond the accumulator), each contracting [S*B] rows
    scale_e = scale.astype(edtype)

    def gstep(acc, inp):
        eh_d, d = inp
        inputs_d = jax.lax.dynamic_slice_in_dim(
            rows, (depth - 1) - d, B, axis=1)             # [S, B, i] edtype
        if cfg.activation == Activation.RECLIP20:
            inputs_d = jnp.where(_row_mask(cfg, inputs_d), inputs_d,
                                 jnp.asarray(0.0, edtype))
        return acc + jnp.einsum(
            "sbi,sbh->ih", inputs_d, eh_d * scale_e[..., None],
            preferred_element_type=jnp.float32), None

    ih_delta, _ = jax.lax.scan(
        lambda acc, inp: gstep(acc, inp),
        jnp.zeros((cfg.i_size, cfg.h_size), jnp.float32),
        (eh_buf, jnp.arange(depth)), unroll=min(walk_unroll, depth))

    # compose the B per-char adaptive-floor nudges (each computed from the
    # window-start value) into one update
    factors = (new_mef_flat / mef_flat).reshape(S, B)
    new_mef = jnp.clip(min_error_factor * jnp.prod(factors, axis=1),
                       ABS_MIN_ERROR_FACTOR, MAX_MIN_ERROR_FACTOR)

    # char-summed forms (matching a per-char path's Σ over the window) plus
    # the last char's [S] emergency scale for the live BpttState field
    stats = {
        "depth": (depth - t_final.reshape(S, B)).astype(jnp.float32).sum(1),
        "ih_scale": scale[:, -1],
        "ih_scale_sum": scale.sum(1),
        "top_error_raw": su_w.top_error_sum.sum(1),
        "top_error_scaled": su_w.top_scaled.sum(1),
        "error_sum": last_err.sum(1),
        "cum_error": cum_err.sum(1),
        "min_error_threshold": min_es[:, -1],
    }
    return DeltaOut(ih_delta=ih_delta, ho_delta=None,
                    bottom_delta=None, min_error_factor=new_mef,
                    stats=stats)


def calc_deltas_window_factored(cfg: RnnConfig, params: RnnParams,
                                rows_head: jax.Array, toks: jax.Array,
                                su_w: _BpttSetup, min_error_factor: jax.Array,
                                learn_rate: jax.Array,
                                walk_unroll: int = 1) -> DeltaOut:
    """calc_deltas_window over the one-hot-factored ring: the window buffer
    holds only the [bias, hidden] section ([S, D-1+B, W]) plus token ids
    ([S, D-1+B]) — the walk's dominant HBM traffic (the row slices re-read
    every depth step) shrinks by i_size/W (~43% at the caravel shape,
    charmodel-multi-predict.c semantics) while the math stays identical to
    f32 tolerance (the one-hot entry's value equals the stored bias, as in
    calc_deltas_factored).

    rows_head: [S, D-1+B, W] (any float dtype); toks: [S, D-1+B] int32.
    """
    assert not cfg.has_bottom, "factored BPTT needs one-hot RNN inputs"
    S, B = su_w.h_err0.shape[:2]
    depth = cfg.depth
    N = S * B
    W = rows_head.shape[2]
    vocab = cfg.input_size
    vocab_iota = jnp.arange(vocab)
    hmask = _hidden_mask(cfg)
    mef_flat = jnp.broadcast_to(min_error_factor[:, None], (S, B)).reshape(N)
    e0 = su_w.h_err0
    min_es, max_es = su_w.min_error_sum, su_w.max_error_sum      # [S, B]
    su_flat = su_w._replace(
        h_err0=None,
        top_error_sum=su_w.top_error_sum.reshape(N),
        top_scaled=su_w.top_scaled.reshape(N),
        max_error_sum=max_es.reshape(N),
        error_sum_ceiling=su_w.error_sum_ceiling.reshape(N),
        min_error_gain=su_w.min_error_gain.reshape(N),
        min_error_sum=min_es.reshape(N))
    edtype = rows_head.dtype
    ih_headT_e = params.ih[:W].T.astype(edtype)                  # [h, W]
    ih_tail_e = params.ih[cfg.input_offset:
                          cfg.input_offset + vocab].astype(edtype)
    hmask_e = hmask.astype(edtype)

    def slices(d):
        hid_d = jax.lax.dynamic_slice_in_dim(
            rows_head, (depth - 1) - d, B, axis=1)       # [S, B, W]
        tok_d = jax.lax.dynamic_slice_in_dim(
            toks, (depth - 1) - d, B, axis=1)            # [S, B]
        return hid_d, tok_d

    def step(carry, d):
        e_h, active, last_err, k_active, cum_err = carry
        hid_d, tok_d = slices(d)
        scale_d = hid_d[..., 0]                          # one-hot value
        e_h = e_h * hmask_e
        e_hid = jnp.matmul(e_h.reshape(N, cfg.h_size), ih_headT_e,
                           preferred_element_type=edtype).reshape(S, B, W)
        t_oh = (tok_d[..., None] == vocab_iota).astype(edtype)
        e_tok = jnp.einsum(
            "sbh,sbh->sb", e_h,
            jnp.matmul(t_oh.reshape(N, vocab), ih_tail_e,
                       preferred_element_type=edtype).reshape(
                S, B, cfg.h_size),
            preferred_element_type=edtype)
        if cfg.activation == Activation.RESQRT:
            e_hid = e_hid / (2.0 * (hid_d + jnp.asarray(1.0, edtype)))
            e_tok = e_tok / (2.0 * (scale_d + jnp.asarray(1.0, edtype)))
        m = _row_mask(cfg, hid_d)
        e_hid = jnp.where(m, e_hid, jnp.asarray(0.0, edtype))
        tok_live = scale_d != 0.0
        if cfg.activation == Activation.RECLIP20:
            tok_live = tok_live & (scale_d.astype(jnp.float32) < 20.0)
        e_tok = jnp.where(tok_live, e_tok, jnp.asarray(0.0, edtype))
        ehid32 = e_hid.astype(jnp.float32)
        etok32 = e_tok.astype(jnp.float32)
        err_sum = jnp.sum(ehid32 * ehid32, axis=2) + etok32 * etok32
        y_eh = jnp.where(active[..., None], e_h, jnp.asarray(0.0, edtype))
        act_f = active.astype(jnp.float32)
        cum_err = cum_err + jnp.sqrt(err_sum) * act_f
        last_err = jnp.where(active, err_sum, last_err)
        k_active = k_active + active.astype(jnp.int32)
        trip = (err_sum <= min_es) | (err_sum > max_es)
        active = active & ~trip
        pad = cfg.h_size - W
        e_next = (jnp.pad(e_hid, ((0, 0), (0, 0), (0, pad))) if pad
                  else e_hid)
        return (e_next, active, last_err, k_active, cum_err), y_eh

    z = jnp.zeros((S, B), jnp.float32)
    carry0 = (e0.astype(edtype), jnp.ones((S, B), bool), z,
              jnp.zeros((S, B), jnp.int32), z)
    (e_fin, active_fin, last_err, k_active, cum_err), eh_buf = \
        jax.lax.scan(step, carry0, jnp.arange(depth),
                     unroll=min(walk_unroll, depth))

    clipped, ih_scale, t_final, new_mef_flat = _bptt_epilogue(
        cfg, su_flat, mef_flat, last_err.reshape(N), active_fin.reshape(N),
        k_active.reshape(N), depth)
    scale = ih_scale.reshape(S, B)
    scale_e = scale.astype(edtype)

    def gstep(acc, inp):
        head_acc, vocab_acc = acc
        eh_d, d = inp
        hid_d, tok_d = slices(d)
        scales_d = hid_d[..., 0]
        if cfg.activation == Activation.RECLIP20:
            hid_d = jnp.where(_row_mask(cfg, hid_d), hid_d,
                              jnp.asarray(0.0, edtype))
            scales_d = jnp.where(scales_d.astype(jnp.float32) < 20.0,
                                 scales_d, jnp.asarray(0.0, edtype))
        ehs = eh_d * scale_e[..., None]
        head_acc = head_acc + jnp.einsum(
            "sbw,sbh->wh", hid_d, ehs, preferred_element_type=jnp.float32)
        onehot = ((tok_d[..., None] == vocab_iota).astype(edtype)
                  * scales_d[..., None])                  # [S, B, vocab]
        vocab_acc = vocab_acc + jnp.einsum(
            "sbv,sbh->vh", onehot, ehs, preferred_element_type=jnp.float32)
        return (head_acc, vocab_acc), None

    (head_grad, vocab_grad), _ = jax.lax.scan(
        gstep,
        (jnp.zeros((W, cfg.h_size), jnp.float32),
         jnp.zeros((vocab, cfg.h_size), jnp.float32)),
        (eh_buf, jnp.arange(depth)), unroll=min(walk_unroll, depth))

    ih_delta = jnp.zeros((cfg.i_size, cfg.h_size), jnp.float32)
    ih_delta = ih_delta.at[:W].set(head_grad)
    ih_delta = ih_delta.at[cfg.input_offset:cfg.input_offset + vocab].set(
        vocab_grad)

    factors = (new_mef_flat / mef_flat).reshape(S, B)
    new_mef = jnp.clip(min_error_factor * jnp.prod(factors, axis=1),
                       ABS_MIN_ERROR_FACTOR, MAX_MIN_ERROR_FACTOR)
    stats = {
        "depth": (depth - t_final.reshape(S, B)).astype(jnp.float32).sum(1),
        "ih_scale": scale[:, -1],
        "ih_scale_sum": scale.sum(1),
        "top_error_raw": su_w.top_error_sum.sum(1),
        "top_error_scaled": su_w.top_scaled.sum(1),
        "error_sum": last_err.sum(1),
        "cum_error": cum_err.sum(1),
        "min_error_threshold": min_es[:, -1],
    }
    return DeltaOut(ih_delta=ih_delta, ho_delta=None,
                    bottom_delta=None, min_error_factor=new_mef,
                    stats=stats)


def dispatch_calc_deltas(bptt_impl: str, *, factored_ok: bool = False,
                         walk_unroll: int = 1):
    """Map TrainHyper.bptt_impl to a calc_deltas implementation with a
    uniform (cfg, params, state, bottom_inputs, o_error, min_error_factor,
    learn_rate) signature.

    The factored ring only exists for one-hot char inputs whose state was
    created with new_state(..., factored=True); paths that feed dense
    features (audio, video, rnnumpy) or haven't wired a factored state must
    reject it loudly rather than silently training with another formulation.
    """
    from functools import partial as _partial
    if bptt_impl == "buffered":
        return _partial(calc_deltas, walk_unroll=walk_unroll)
    if bptt_impl == "twopass":
        return _partial(calc_deltas_twopass, walk_unroll=walk_unroll)
    if bptt_impl == "factored":
        if not factored_ok:
            raise ValueError(
                "bptt_impl='factored' is only supported where the history "
                "ring is one-hot-factored (the char-LM training path); use "
                "'buffered' or 'twopass' here")

        def fn(cfg, params, state, bottom_inputs, o_error, min_error_factor,
               learn_rate):
            assert bottom_inputs is None, "factored BPTT has no bottom layer"
            return calc_deltas_factored(cfg, params, state, o_error,
                                        min_error_factor, learn_rate,
                                        walk_unroll=walk_unroll)
        return fn
    raise ValueError(f"unknown bptt_impl {bptt_impl!r}; expected 'buffered',"
                     " 'twopass' or 'factored'")


def forget_state(state: RnnState, bptt_too: bool = True) -> RnnState:
    """rnn_forget_history (recur-nn.c:8-16): zero the hidden state and,
    optionally, the whole BPTT history ring (the classify element's `forget`
    property)."""
    history = jnp.zeros_like(state.history) if bptt_too else state.history
    tokens = (jnp.zeros_like(state.tokens)
              if bptt_too and state.tokens is not None else state.tokens)
    return RnnState(hidden=jnp.zeros_like(state.hidden), history=history,
                    head=state.head, tokens=tokens)
