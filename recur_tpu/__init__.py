"""recur_tpu — a TPU-native streaming-RNN framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of douglasbagnall/recur
(a CPU streaming-RNN framework for char-level language modelling and real-time
multimedia learning).  Where the reference gets speed from a zero-row-skipping
sparse matvec on one core, recur_tpu gets it from batching hundreds of parallel
streams into MXU-shaped matmuls, scanning over time under jit, and sharding the
stream axis over a TPU mesh.

Layer map (mirrors reference SURVEY.md §1):
  utils/     — foundation: bit-exact Jenkins PRNG, CDB v10 net files, hashing,
               key-value training logs, PGM/PPM debug imaging  (L0)
  ops/       — NN core: forward, truncated BPTT, 7 optimizers, conditioning,
               weight init families  (L1)
  models/    — char-LM task layer: alphabet, predict/confab/XE, multi-head,
               classification  (L3)
  dsp/       — MFCC / MDCT / windows / rescaling feature extraction  (L2)
  audio/     — streaming audio classify/parrot harnesses (GStreamer analogue) (L4/L6)
  video/     — rnnca cellular automata + recur fractal generator  (L4)
  parallel/  — mesh/sharding helpers: DP over the stream axis via shard_map  (§2.9)
  cli/       — text-predict / text-confabulate / ... command line tools  (L5)
"""

__version__ = "0.1.0"

from recur_tpu.nn import (  # noqa: F401
    RnnConfig,
    RnnParams,
    RnnState,
    BpttState,
    new_net,
    load_net,
    save_net,
)
