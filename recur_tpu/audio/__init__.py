from recur_tpu.audio.classify import AudioClassifier, ClassGroup, parse_classes_string, parse_target_string  # noqa: F401
from recur_tpu.audio import stats  # noqa: F401
