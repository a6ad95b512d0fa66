"""Multi-host (DCN) scaling: the single-host mesh extended over processes
with jax.distributed.

SURVEY.md §5.8 maps the reference's in-process shared-delta "communication"
to JAX collectives over ICI; this module adds the multi-host rung of that
ladder.  The design follows the standard JAX multi-process recipe:

  * every process runs the SAME program (same net config, same hyper, same
    chunk calls) — the controller-less SPMD model,
  * `jax.distributed.initialize` federates the processes; `jax.devices()`
    then returns the global device list, and parallel/mesh.py's make_mesh /
    sharded_train_chunk work unchanged on top of it (the 'data' axis simply
    spans DCN between hosts and ICI within them),
  * only array CREATION is multi-host-aware: a process can only materialise
    the shards that live on its local devices, so global training arrays
    are assembled with jax.make_array_from_callback (each process's
    callback serves just its addressable shard indices).

The reference has no analogue (it is a single-process C framework); this is
the TPU-native extension point for fleet-scale stream batching.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from recur_tpu.nn import BpttState, RnnConfig, RnnParams, RnnState
from recur_tpu.parallel.mesh import (_bptt_specs, _param_specs, _state_specs,
                                     make_mesh)


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None, **kwargs) -> None:
    """Join this process to a multi-process JAX job.  Must run before any
    device use.  With no arguments the standard JAX env vars / cluster
    auto-detection apply (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES,
    JAX_PROCESS_ID; or the TPU pod metadata on real multi-host slices)."""
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kwargs)


def make_global_mesh(n_data: Optional[int] = None, n_model: int = 1) -> Mesh:
    """A ('data', 'model') mesh over every process's devices.  Keep 'model'
    within a host (jax.devices() orders by process) so TP collectives ride
    ICI and only the DP gradient reduction crosses DCN."""
    return make_mesh(n_data=n_data, n_model=n_model, devices=jax.devices())


def make_global_array(mesh: Mesh, spec: P, full):
    """Build a global jax.Array on `mesh` from a host-local full-size copy.

    Every process passes the same full logical array (cheap at RNN sizes —
    the big arrays are per-stream state, linear in the GLOBAL stream count);
    each materialises only the shards its local devices own.
    """
    import numpy as np

    full = np.asarray(full)
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(full.shape, sharding,
                                        lambda idx: full[idx])


def global_train_args(mesh: Mesh, cfg: RnnConfig, params: RnnParams,
                      bptt: BpttState, state: RnnState):
    """Multi-host shard_train_args: assemble global training arrays from
    host-local copies (which must be identical across processes — build
    them from the same seed, exactly like every process builds the same
    program)."""
    def put(tree, specs):
        return jax.tree.map(lambda x, s: make_global_array(mesh, s, x),
                            tree, specs)
    return (put(params, _param_specs(cfg)),
            put(bptt, _bptt_specs(cfg)),
            put(state, _state_specs(cfg, factored=state.tokens is not None)))


def global_tokens(mesh: Mesh, tokens):
    """Place a [S_global, T+1] token block on the mesh (streams over
    'data')."""
    return make_global_array(mesh, P("data", None), tokens)
