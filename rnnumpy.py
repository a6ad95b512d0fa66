"""Import shim: the reference builds a C extension importable as `rnnumpy`
(setup-rnnumpy.py); here the same name re-exports the TPU implementation."""

from recur_tpu.compat.rnnumpy import Net  # noqa: F401
