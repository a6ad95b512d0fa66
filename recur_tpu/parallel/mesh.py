"""Multi-chip scaling: shard the stream axis (DP) and the hidden dimension
(TP) over a TPU mesh.

The reference has no distributed backend at all (SURVEY.md §2.9): its
"parallelism" is N pointer-aliased clones adding into one delta array in one
thread.  Here that synchronic mini-batch IS the data-parallel axis:

  * streams (state.hidden/history, tokens, min_error_factor) shard over the
    'data' mesh axis; the delta reduction over streams becomes an XLA
    all-reduce over ICI,
  * the hidden dimension of the weight matrices (ih columns, ho rows, and
    the matching optimizer slots) shards over the 'model' axis — tensor
    parallelism for very large hidden sizes,
  * everything else is replicated.

We annotate shardings with jax.sharding / NamedSharding and let GSPMD insert
the collectives (psum for the contracted hidden dim, reduce-scatter/
all-gather for the delta einsums) — no hand-written comms.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from recur_tpu import engine
from recur_tpu.nn import (BpttState, Flag, RnnConfig, RnnParams,
                          RnnState)


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    if n_data * n_model > n:
        raise ValueError(
            f"mesh data={n_data} x model={n_model} needs "
            f"{n_data * n_model} devices but only {n} are visible "
            f"(backend={jax.default_backend()!r}); force a virtual CPU mesh "
            "with XLA_FLAGS=--xla_force_host_platform_device_count=N and "
            "jax.config.update('jax_platforms', 'cpu') before any device use")
    devs = np.asarray(devices[:n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, ("data", "model"))


def _param_specs(cfg: RnnConfig) -> RnnParams:
    """Shard the hidden dim: ih columns and ho rows over 'model'."""
    return RnnParams(ih=P(None, "model"), ho=P("model", None),
                     bottom=P(None, None) if cfg.has_bottom else None)


def _bptt_specs(cfg: RnnConfig) -> BpttState:
    mat_ih = P(None, "model")
    mat_ho = P("model", None)
    b = P(None, None) if cfg.has_bottom else None
    aux = bool(cfg.flags & Flag.AUX_ARRAYS)
    return BpttState(
        ih_momentum=mat_ih, ho_momentum=mat_ho,
        ih_aux=mat_ih if aux else None, ho_aux=mat_ho if aux else None,
        bottom_momentum=b, bottom_aux=b if aux else None,
        learn_rate=P(), ho_scale=P(), momentum=P(), momentum_weight=P(),
        min_error_factor=P("data"), ih_scale=P("data"), generation=P(),
        ih_delta=mat_ih, ho_delta=mat_ho, bottom_delta=b)


def _state_specs(cfg: RnnConfig, factored: bool = False) -> RnnState:
    return RnnState(hidden=P("data", None), history=P("data", None, None),
                    head=P(),
                    tokens=P("data", None) if factored else None)


def shard_train_args(mesh: Mesh, cfg: RnnConfig, params: RnnParams,
                     bptt: BpttState, state: RnnState):
    """Place existing host/device values onto the mesh with the training
    shardings (device_put with NamedShardings)."""
    def put(tree, specs):
        # None params (e.g. no bottom layer) are empty pytree nodes and are
        # skipped by tree.map automatically
        return jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            tree, specs)
    return (put(params, _param_specs(cfg)),
            put(bptt, _bptt_specs(cfg)),
            put(state, _state_specs(cfg, factored=state.tokens is not None)))


def sharded_train_chunk(mesh: Mesh, cfg: RnnConfig, hyper):
    """A jitted char_train_chunk with mesh shardings: streams over 'data',
    hidden dim over 'model'.  Returns fn(params, bptt, state, tokens, key,
    momentum, noise)."""
    factored = getattr(hyper, "bptt_impl", "buffered") == "factored"
    in_shardings = (
        jax.tree.map(lambda s: NamedSharding(mesh, s), _param_specs(cfg)),
        jax.tree.map(lambda s: NamedSharding(mesh, s), _bptt_specs(cfg)),
        jax.tree.map(lambda s: NamedSharding(mesh, s),
                     _state_specs(cfg, factored=factored)),
        NamedSharding(mesh, P("data", None)),   # tokens [S, T+1]
        NamedSharding(mesh, P()),               # key
        NamedSharding(mesh, P()),               # momentum
        NamedSharding(mesh, P()),               # noise
    )

    def fn(params, bptt, state, tokens, key, momentum, noise):
        return engine.char_train_chunk(cfg, hyper, params, bptt, state,
                                       tokens, key, momentum, noise)

    # pin outputs to the input shardings so chunk outputs feed straight back
    # in as the next chunk's carry (GSPMD would otherwise pick layouts like
    # hidden:[data,model] that mismatch in_shardings on the next call)
    out_shardings = (in_shardings[0], in_shardings[1], in_shardings[2],
                     NamedSharding(mesh, P()))
    # donate the carried training state: the inner char_train_chunk's
    # donate_argnums is dropped when it inlines into this outer trace, and
    # without it every chunk double-buffers params/optimizer/history
    jitted = jax.jit(fn, in_shardings=in_shardings,
                     out_shardings=out_shardings, donate_argnums=(0, 1, 2))

    def checked(params, bptt, state, *rest):
        # fail loudly before jit's opaque pytree/sharding mismatch
        if (state.tokens is not None) != factored:
            raise ValueError(
                f"TrainHyper.bptt_impl={hyper.bptt_impl!r} needs "
                f"nn.new_state(..., factored={factored}) "
                f"(state.tokens is {'set' if state.tokens is not None else 'None'})")
        return jitted(params, bptt, state, *rest)

    checked.lower = jitted.lower    # keep jit introspection available
    return checked


# ---------------------------------------------------------------------------
# multihead head sharding (expert parallelism over output blocks)
# ---------------------------------------------------------------------------

def sharded_distill_chunk(mesh: Mesh, cfg: RnnConfig, hyper, tcfgs):
    """engine.char_distill_chunk_xy jitted with mesh shardings: student
    streams over 'data', student hidden dim over 'model'; frozen teacher
    params replicated (they are read-only and small next to the student's
    optimizer state), teacher hiddens sharded over 'data' alongside the
    student streams they track.  Returns fn(params, bptt, state, t_hiddens,
    t_params, xs, ys, key, momentum, noise, alpha, temp)."""
    rep = NamedSharding(mesh, P())
    data2 = NamedSharding(mesh, P("data", None))
    pspec = jax.tree.map(lambda s: NamedSharding(mesh, s), _param_specs(cfg))
    bspec = jax.tree.map(lambda s: NamedSharding(mesh, s), _bptt_specs(cfg))
    sspec = jax.tree.map(lambda s: NamedSharding(mesh, s),
                         _state_specs(cfg, factored=(getattr(
                             hyper, "bptt_impl", "buffered") == "factored")))
    th_spec = tuple(data2 for _ in tcfgs)
    tp_spec = tuple(jax.tree.map(lambda _: rep, _param_specs(tcfg))
                    for tcfg in tcfgs)
    in_shardings = (pspec, bspec, sspec, th_spec, tp_spec,
                    data2, data2, rep, rep, rep, rep, rep)

    def fn(params, bptt, state, t_hiddens, t_params, xs, ys, key,
           momentum, noise, alpha, temp):
        return engine.char_distill_chunk_xy(
            cfg, hyper, tcfgs, params, bptt, state, t_hiddens, t_params,
            xs, ys, key, momentum, noise, alpha, temp)

    out_shardings = (pspec, bspec, sspec, th_spec, rep)
    jitted = jax.jit(fn, in_shardings=in_shardings,
                     out_shardings=out_shardings, donate_argnums=(0, 1, 2, 3))
    factored = getattr(hyper, "bptt_impl", "buffered") == "factored"

    def checked(params, bptt, state, *rest):
        # fail loudly before jit's opaque pytree/sharding mismatch
        if (state.tokens is not None) != factored:
            raise ValueError(
                f"TrainHyper.bptt_impl={hyper.bptt_impl!r} needs "
                f"nn.new_state(..., factored={factored}) "
                f"(state.tokens is "
                f"{'set' if state.tokens is not None else 'None'})")
        return jitted(params, bptt, state, *rest)

    checked.lower = jitted.lower
    return checked


def _mh_param_specs(cfg: RnnConfig) -> RnnParams:
    """Multihead nets put the size in the OUTPUT dim (n_classes x alphabet
    blocks — o=3650 for the caravel author-ID shape), so TP goes on the ho
    columns: each device owns a contiguous slice of heads.  This is the
    expert-parallel form of the reference's per-class output ranges
    (charmodel-multi-predict.c:34-55)."""
    return RnnParams(ih=P(None, "model"), ho=P(None, "model"),
                     bottom=P(None, None) if cfg.has_bottom else None)


def _mh_bptt_specs(cfg: RnnConfig) -> BpttState:
    mat_ih = P(None, "model")
    mat_ho = P(None, "model")
    b = P(None, None) if cfg.has_bottom else None
    aux = bool(cfg.flags & Flag.AUX_ARRAYS)
    return BpttState(
        ih_momentum=mat_ih, ho_momentum=mat_ho,
        ih_aux=mat_ih if aux else None, ho_aux=mat_ho if aux else None,
        bottom_momentum=b, bottom_aux=b if aux else None,
        learn_rate=P(), ho_scale=P(), momentum=P(), momentum_weight=P(),
        min_error_factor=P("data"), ih_scale=P("data"), generation=P(),
        ih_delta=mat_ih, ho_delta=mat_ho, bottom_delta=b)


def sharded_multihead_chunk(mesh: Mesh, cfg: RnnConfig, hyper,
                            alphabet_len: int):
    """multihead_train_chunk jitted with streams over 'data' and the output
    heads over 'model'.  Returns fn(params, bptt, state, tokens,
    target_class, leakage, key, momentum_target, presynaptic_noise)."""
    from recur_tpu.models.multihead import multihead_train_chunk

    pspec = jax.tree.map(lambda s: NamedSharding(mesh, s),
                         _mh_param_specs(cfg))
    bspec = jax.tree.map(lambda s: NamedSharding(mesh, s),
                         _mh_bptt_specs(cfg))
    sspec = jax.tree.map(lambda s: NamedSharding(mesh, s), _state_specs(cfg))
    data = NamedSharding(mesh, P("data"))
    data2 = NamedSharding(mesh, P("data", None))
    rep = NamedSharding(mesh, P())
    in_shardings = (pspec, bspec, sspec, data2, data, rep, rep, rep, rep)

    def fn(params, bptt, state, tokens, target_class, leakage, key,
           momentum_target, presynaptic_noise):
        return multihead_train_chunk(cfg, hyper, alphabet_len, params, bptt,
                                     state, tokens, target_class, leakage,
                                     key, momentum_target,
                                     presynaptic_noise)

    out_shardings = (pspec, bspec, sspec, rep)
    return jax.jit(fn, in_shardings=in_shardings,
                   out_shardings=out_shardings, donate_argnums=(0, 1, 2))


def shard_multihead_args(mesh: Mesh, cfg: RnnConfig, params: RnnParams,
                         bptt: BpttState, state: RnnState):
    def put(tree, specs):
        return jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            tree, specs)
    return (put(params, _mh_param_specs(cfg)),
            put(bptt, _mh_bptt_specs(cfg)),
            put(state, _state_specs(cfg)))


# ---------------------------------------------------------------------------
# classify sharding: audio channels over 'data', hidden dim over 'model'
# ---------------------------------------------------------------------------

def sharded_classify_train(mesh: Mesh, cfg: RnnConfig, hyper, groups):
    """classify_train_windows jitted over the mesh: the per-channel subnet
    state (the reference's ClassifyChannel array, gstclassify.h:88-98)
    shards over 'data', the hidden dim over 'model'.  The balanced-training
    seen-count carry and the window stats are cross-channel sums — GSPMD
    inserts the psums (the collective form of the shared delta array).
    Returns fn(params, bptt, state, features, targets, seen, bias,
    error_weight, live, real, key, momentum, noise)."""
    from recur_tpu.audio import classify as ac

    pspec = jax.tree.map(lambda s: NamedSharding(mesh, s), _param_specs(cfg))
    bspec = jax.tree.map(lambda s: NamedSharding(mesh, s), _bptt_specs(cfg))
    sspec = jax.tree.map(lambda s: NamedSharding(mesh, s), _state_specs(cfg))
    tcd = NamedSharding(mesh, P(None, "data", None))  # [T, C, ...]
    rep = NamedSharding(mesh, P())
    in_shardings = (pspec, bspec, sspec, tcd, tcd, rep, rep, rep, rep, rep,
                    rep, rep, rep)

    def fn(params, bptt, state, features, targets, seen, bias, error_weight,
           live, real, key, momentum, noise):
        return ac.classify_train_windows(
            cfg, hyper, groups, params, bptt, state, features, targets,
            seen, bias, error_weight, live, real, key, momentum, noise)

    out_shardings = (pspec, bspec, sspec,
                     jax.tree.map(lambda _: rep,
                                  ac.WindowStats(0, 0, 0, 0, 0)))
    return jax.jit(fn, in_shardings=in_shardings,
                   out_shardings=out_shardings, donate_argnums=(0, 1, 2))


def sharded_classify_opine(mesh: Mesh, cfg: RnnConfig, groups):
    """classify_opine_windows jitted with channels over 'data'.  Returns
    fn(params, hidden, features, real)."""
    from recur_tpu.audio import classify as ac

    pspec = jax.tree.map(lambda s: NamedSharding(mesh, s), _param_specs(cfg))
    hid = NamedSharding(mesh, P("data", None))
    tcd = NamedSharding(mesh, P(None, "data", None))
    rep = NamedSharding(mesh, P())

    def fn(params, hidden, features, real):
        return ac.classify_opine_windows(cfg, groups, params, hidden,
                                         features, real)

    out_shardings = (hid, NamedSharding(mesh, P(None, "data", None, None)),
                     tcd)
    return jax.jit(fn, in_shardings=(pspec, hid, tcd, rep),
                   out_shardings=out_shardings)


def shard_classify_args(mesh: Mesh, cfg: RnnConfig, params: RnnParams,
                        bptt: BpttState, state: RnnState):
    """Place a classifier's params/bptt/state onto the mesh."""
    def put(tree, specs):
        return jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            tree, specs)
    return (put(params, _param_specs(cfg)),
            put(bptt, _bptt_specs(cfg)),
            put(state, _state_specs(cfg)))


# ---------------------------------------------------------------------------
# explicit shard_map + psum data parallelism (SURVEY.md §2.9/§5.8)
# ---------------------------------------------------------------------------

def shard_map_train_chunk(mesh: Mesh, cfg: RnnConfig, hyper):
    """Pure data parallelism written explicitly with shard_map: every device
    holds the full replicated params and S/n_data local streams; the stream
    gradient sum becomes a psum over the 'data' axis before the (identical)
    weight update on each device — the collective form of the reference's
    shared delta array.

    The GSPMD path (sharded_train_chunk) is the production one; this is the
    hand-written equivalent, kept small and testable.
    """
    from jax import shard_map
    from recur_tpu.ops.core import (advance_history, calc_deltas,
                                    forward_step, capped_log2,
                                    softmax_best_guess_error)
    from recur_tpu.ops.optimizers import apply_learning
    import dataclasses as _dc

    def local_chunk(params, bptt, state, tokens, key, momentum, noise):
        xs = jnp.moveaxis(tokens[:, :-1], 1, 0)
        ys = jnp.moveaxis(tokens[:, 1:], 1, 0)
        keys = jax.random.split(key, xs.shape[0])

        def body(carry, inp):
            params, bptt, state = carry
            x_tok, y_tok, k = inp
            x = jax.nn.one_hot(x_tok, cfg.raw_input_size, dtype=jnp.float32)
            fwd = forward_step(cfg, params, state.hidden, x)
            state = advance_history(state, fwd.input_row)
            state = _dc.replace(state, hidden=fwd.hidden)
            o_error, _, p_t = softmax_best_guess_error(
                fwd.output[:, :cfg.output_size], y_tok)
            o_error = jnp.pad(
                o_error, ((0, 0), (0, cfg.o_size - cfg.output_size)))
            d = calc_deltas(cfg, params, state, fwd.bottom_inputs, o_error,
                            bptt.min_error_factor, bptt.learn_rate)
            # the cross-chip "shared delta array": psum over ICI
            ih_delta = jax.lax.psum(d.ih_delta, "data")
            ho_delta = jax.lax.psum(d.ho_delta, "data")
            params, bptt2 = apply_learning(cfg, params, bptt, ih_delta,
                                           ho_delta, None,
                                           hyper.learning_style, momentum,
                                           1.0)
            bptt2 = _dc.replace(bptt2, min_error_factor=d.min_error_factor,
                                ih_scale=d.stats["ih_scale"],
                                generation=bptt2.generation + 1)
            ent = jax.lax.psum(jnp.sum(-capped_log2(p_t)), "data")
            return (params, bptt2, state), ent

        (params, bptt, state), ents = jax.lax.scan(
            body, (params, bptt, state), (xs, ys, keys))
        return params, bptt, state, ents.sum()

    pspec = jax.tree.map(lambda _: P(), _param_specs(cfg))
    # matrices replicated; per-stream min_error_factor/ih_scale shard over
    # data
    bspec = _dc.replace(
        jax.tree.map(lambda _: P(), _bptt_specs(cfg)),
        min_error_factor=P("data"), ih_scale=P("data"))
    sspec = RnnState(hidden=P("data", None), history=P("data", None, None),
                     head=P())
    fn = shard_map(
        local_chunk, mesh=mesh,
        in_specs=(pspec, bspec, sspec, P("data", None), P(), P(), P()),
        out_specs=(pspec, bspec, sspec, P()),
        check_vma=False)
    # no donation here: this is the hand-written cross-check twin, and its
    # callers (tests, dryrun) reuse the same arrays to compare paths
    return jax.jit(fn)
