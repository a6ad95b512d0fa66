"""One process of a multi-process CPU training job (driven by
test_distributed.py).  Every process runs this same program — the
controller-less SPMD model — and prints the final chunk entropy, which must
agree across processes and with a single-process run."""

import sys


def main() -> int:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    import jax
    from recur_tpu.parallel import distributed as dist

    dist.initialize(f"localhost:{port}", num_processes=nproc, process_id=pid)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from recur_tpu import nn
    from recur_tpu.engine import TrainHyper
    from recur_tpu.ops import init as winit
    from recur_tpu.parallel.mesh import sharded_train_chunk

    assert jax.device_count() == 8, jax.device_count()
    S, T = 8, 12
    net = nn.new_net(11, 31, 11, rng_seed=3, depth=8, learn_rate=1e-3)
    winit.randomise_weights(net)
    cfg = net.cfg

    mesh = dist.make_global_mesh(n_data=4, n_model=2)
    params, bptt, state = dist.global_train_args(
        mesh, cfg, net.params, nn.new_bptt_state(cfg, S, 1e-3, 0.9),
        nn.new_state(cfg, S))
    rng = np.random.default_rng(0)
    tokens = dist.global_tokens(
        mesh, rng.integers(0, cfg.input_size, size=(S, T + 1)))
    key = dist.make_global_array(
        mesh, P(), np.asarray(jax.random.PRNGKey(0)))
    mom = dist.make_global_array(mesh, P(), np.float32(0.9))
    noise = dist.make_global_array(mesh, P(), np.float32(0.0))

    fn = sharded_train_chunk(mesh, cfg, TrainHyper(condition=False))
    ent = None
    for _ in range(2):
        params, bptt, state, totals = fn(params, bptt, state, tokens, key,
                                         mom, noise)
        ent = float(totals.entropy)
    print(f"ENTROPY {ent!r}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
