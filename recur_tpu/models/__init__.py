from recur_tpu.models.alphabet import Alphabet, Metadata  # noqa: F401
from recur_tpu.models.charmodel import CharModel, Ventropy, Schedule  # noqa: F401
