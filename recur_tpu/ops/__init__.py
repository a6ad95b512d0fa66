from recur_tpu.ops.core import (  # noqa: F401
    soft_clip,
    softclip_scale,
    capped_log2,
    softmax,
    biased_softmax,
    softmax_best_guess_error,
    forward_step,
    advance_history,
    calc_deltas,
)
from recur_tpu.ops.optimizers import apply_learning, momentum_soft_start  # noqa: F401
from recur_tpu.ops.conditioning import condition_net, weight_noise  # noqa: F401
from recur_tpu.ops import init  # noqa: F401
