from recur_tpu.dsp.windows import window_mask, WindowType  # noqa: F401
from recur_tpu.dsp.mfcc import AudioBinner  # noqa: F401
from recur_tpu.dsp.mdct import MDCT  # noqa: F401
from recur_tpu.dsp import rescale  # noqa: F401
