from recur_tpu.utils.rng import RecurRng, RECUR_RNG_RANDOM_SEED, RECUR_RNG_SUBSEED  # noqa: F401
from recur_tpu.utils.hashing import rnn_hash32  # noqa: F401
from recur_tpu.utils import cdb  # noqa: F401
