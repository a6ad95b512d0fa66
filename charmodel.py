"""Import shim: the reference builds a C extension importable as `charmodel`
(setup-charmodel.py); here the same name re-exports the TPU implementation."""

from recur_tpu.compat.charmodel import Alphabet, Net  # noqa: F401
