from recur_tpu.video.rnnca import Rnnca, parse_offset_pattern  # noqa: F401
from recur_tpu.video.recur_ctx import RecurContext  # noqa: F401
