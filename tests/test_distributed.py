"""Multi-host (multi-process) data x model training: two CPU processes with
4 virtual devices each must train identically to one process with 8 — the
DCN rung of SURVEY.md §5.8 (the reference is single-process; this is the
TPU-native scale-out extension)."""

import os
import socket
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from recur_tpu import nn
from recur_tpu.engine import TrainHyper
from recur_tpu.ops import init as winit
from recur_tpu.parallel import make_mesh, shard_train_args, \
    sharded_train_chunk

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _single_process_entropy() -> float:
    """The same program as tests/_dist_worker.py on this process's
    8-device mesh."""
    S, T = 8, 12
    net = nn.new_net(11, 31, 11, rng_seed=3, depth=8, learn_rate=1e-3)
    winit.randomise_weights(net)
    cfg = net.cfg
    mesh = make_mesh(n_data=4, n_model=2)
    params, bptt, state = shard_train_args(
        mesh, cfg, net.params, nn.new_bptt_state(cfg, S, 1e-3, 0.9),
        nn.new_state(cfg, S))
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, cfg.input_size, size=(S, T + 1)))
    fn = sharded_train_chunk(mesh, cfg, TrainHyper(condition=False))
    key = jax.random.PRNGKey(0)
    ent = None
    for _ in range(2):
        params, bptt, state, totals = fn(params, bptt, state, tokens, key,
                                         jnp.float32(0.9), jnp.float32(0.0))
        ent = float(totals.entropy)
    return ent


@pytest.mark.slow
def test_two_process_training_matches_single_process():
    golden = _single_process_entropy()

    port = _free_port()
    # clean env: no axon sitecustomize (its PJRT plugin would grab the
    # backend), CPU platform with 4 virtual devices per process
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    worker = os.path.join(REPO, "tests", "_dist_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), "2", str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for pid in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    ents = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("ENTROPY ")]
        assert lines, out
        ents.append(float(lines[-1].split()[1]))

    # both processes observe the same replicated result…
    assert ents[0] == ents[1], ents
    # …and it matches the single-process 8-device run (f32 reduction
    # orders may differ across process topologies)
    assert np.isclose(ents[0], golden, rtol=1e-4), (ents, golden)
