"""ctypes bindings for the native C++ runtime helpers, with automatic
build-on-first-use and graceful fallback (callers check `lib is None`)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "recur_native.cpp")
# dot-prefixed so pkgutil/import machinery never mistakes the
# shared library for a Python extension module
_SO = os.path.join(_DIR, ".librecur_native.so")

lib = None


class RngT(ctypes.Structure):
    _fields_ = [("a", ctypes.c_uint64), ("b", ctypes.c_uint64),
                ("c", ctypes.c_uint64), ("d", ctypes.c_uint64)]


def build(force: bool = False) -> bool:
    """Compile the shared library if missing/stale.  Returns success."""
    if (not force and os.path.exists(_SO)
            and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)):
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", _SO, _SRC],
            check=True, capture_output=True, text=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        print(f"recur_tpu.native: build failed ({e}); "
              "falling back to Python", file=sys.stderr)
        return False


def _load():
    global lib
    if not build():
        return
    try:
        lib = ctypes.CDLL(_SO)
    except OSError as e:
        print(f"recur_tpu.native: load failed ({e})", file=sys.stderr)
        return
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C")
    u64p = np.ctypeslib.ndpointer(np.uint64, flags="C")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C")
    s16p = np.ctypeslib.ndpointer(np.int16, flags="C")
    rp = ctypes.POINTER(RngT)
    lib.rng_init.argtypes = [rp, ctypes.c_uint64]
    lib.rng_fill_u64.argtypes = [rp, u64p, ctypes.c_int64]
    lib.rng_fill_gaussian.argtypes = [rp, f32p, ctypes.c_int64]
    lib.rng_fill_double01.argtypes = [rp, f64p, ctypes.c_int64]
    lib.init_flat.argtypes = [rp, f32p] + [ctypes.c_int] * 4 + \
        [ctypes.c_float, ctypes.c_int, ctypes.c_double]
    lib.frame_interleaved_s16.restype = ctypes.c_int64
    lib.frame_interleaved_s16.argtypes = [
        s16p, ctypes.c_int64, ctypes.c_int, ctypes.c_int, f32p, f32p]
    lib.encode_text.restype = ctypes.c_int64
    lib.encode_text.argtypes = [u8p, ctypes.c_int64, u8p, ctypes.c_int,
                                ctypes.c_uint8, u8p]
    lib.scale_weights_to_gain.argtypes = [
        rp, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int64,
        ctypes.c_float, ctypes.c_int]


_load()


def rng_state(rng) -> RngT:
    """Copy a recur_tpu RecurRng's state into the C struct."""
    return RngT(rng.a, rng.b, rng.c, rng.d)


def sync_rng(rng, st: RngT):
    """Copy the C struct state back into the Python RecurRng."""
    rng.a, rng.b, rng.c, rng.d = st.a, st.b, st.c, st.d


def init_flat(rng, array: np.ndarray, width: int, height: int, offset: int,
              variance: float, shape: int, perforation: float) -> bool:
    """Native randomise_array_flat; mutates array in place and advances rng.
    Returns False if the native lib is unavailable."""
    if lib is None:
        return False
    assert array.dtype == np.float32 and array.flags.c_contiguous
    st = rng_state(rng)
    lib.init_flat(ctypes.byref(st), array, width, height, array.shape[1],
                  offset, variance, int(shape), perforation)
    sync_rng(rng, st)
    return True


def scale_weights_to_gain(rng, ih: np.ndarray, h_size: int, hidden_size: int,
                          target_gain: float, generations: int) -> bool:
    """Native rnn_scale_initial_weights inner loop; mutates ih in place and
    advances rng.  Returns False if the native lib is unavailable."""
    if lib is None:
        return False
    assert ih.dtype == np.float32 and ih.flags.c_contiguous
    st = rng_state(rng)
    lib.scale_weights_to_gain(ctypes.byref(st), ih, h_size, hidden_size,
                              ih.size, target_gain, generations)
    sync_rng(rng, st)
    return True


def frame_interleaved(pcm: np.ndarray, n_channels: int, window: int,
                      tail: np.ndarray):
    """Interleaved s16 → [n_win, C, window] float frames (or None)."""
    if lib is None:
        return None
    pcm = np.ascontiguousarray(pcm, np.int16)
    half = window // 2
    n_win = (len(pcm) // n_channels) // half
    out = np.empty((n_win, n_channels, window), np.float32)
    got = lib.frame_interleaved_s16(pcm, len(pcm), n_channels, window,
                                    tail, out)
    return out[:got]


def encode_text(text: bytes, lut256: np.ndarray, collapse_space: bool,
                space: int):
    """Byte-alphabet text encoding (or None if no native lib)."""
    if lib is None:
        return None
    buf = np.frombuffer(text, np.uint8)
    out = np.empty(len(buf), np.uint8)
    n = lib.encode_text(buf, len(buf), lut256, int(collapse_space),
                        space, out)
    return out[:n].copy()
