#!/usr/bin/env python
"""Video corpus prep: any avio source -> small Y4M for the video learners.

The reference downsizes training footage with ffmpeg before feeding it to
rnnca/recur (scripts/reduce-video.sh, Makefile:263-277: archive.org test
videos -> 288x192@20fps).  This is the same step for the TPU harness's
players/trainers, which consume Y4M:

    python scripts/reduce_video.py ffmpeg:big.mp4 small.y4m \
        --width 288 --height 192 --fps 20
    python scripts/reduce_video.py pipe:cam.fifo small.y4m   # live FIFO
    python scripts/reduce_video.py v4l2:/dev/video0 clip.y4m --frames 200

Input goes through recur_tpu.utils.avio.video_frames (Y4M file, pipe:,
ffmpeg:, v4l2: specs all work; ffmpeg-backed specs need the binary);
rescaling is the framework's own area-average downscaler
(dsp/rescale.py, the rescale.c port) applied per plane, so the output is
bit-deterministic regardless of which decoder produced the frames.
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from recur_tpu.dsp.rescale import downscale_to_float
from recur_tpu.utils import avio
from recur_tpu.utils.video_io import write_y4m


def reduce_frames(spec, width, height, max_frames=0, every=1):
    """Yield [3, height, width] u8 YCbCr frames (write_y4m subsamples the
    chroma planes itself)."""
    n = 0
    for i, frame in enumerate(avio.video_frames(spec)):
        if i % every:
            continue
        planes = [np.clip(downscale_to_float(p.astype(np.float32),
                                             height, width) * 256.0,
                          0, 255).astype(np.uint8)
                  for p in frame]
        yield np.stack(planes)
        n += 1
        if max_frames and n >= max_frames:
            return


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("src", help="avio video spec (file, pipe:, ffmpeg:, "
                               "v4l2:)")
    p.add_argument("dest", help="output .y4m path")
    p.add_argument("--width", type=int, default=288)
    p.add_argument("--height", type=int, default=192)
    p.add_argument("--fps", type=int, default=20)
    p.add_argument("--frames", type=int, default=0,
                   help="stop after N output frames (0 = all)")
    p.add_argument("--every", type=int, default=1,
                   help="keep one frame in N (cheap frame-rate reduction)")
    opt = p.parse_args(argv)
    if opt.width % 2 or opt.height % 2:
        p.error("--width/--height must be even (4:2:0 chroma)")

    count = [0]

    def counted():
        for fr in reduce_frames(opt.src, opt.width, opt.height,
                                opt.frames, max(1, opt.every)):
            count[0] += 1
            yield fr

    write_y4m(opt.dest, counted(), opt.width, opt.height, fps=opt.fps)
    print(f"{opt.dest}: {count[0]} frames "
          f"{opt.width}x{opt.height}@{opt.fps}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
