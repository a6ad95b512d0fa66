"""rnnca-player: train the RNN cellular automaton on a video and/or generate
CA video to a Y4M file (the gtk rnnca-player, headless)."""

from __future__ import annotations

import argparse
import sys


from recur_tpu.dsp.rescale import u8_thumbnail
from recur_tpu.utils.avio import video_frames
from recur_tpu.utils.video_io import write_y4m
from recur_tpu.video.rnnca import Rnnca, RNNCA_HEIGHT, RNNCA_WIDTH


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="rnnca-player", description=__doc__)
    p.add_argument("--train-video", default=None,
                   help="video source: Y4M path, pipe:FIFO (Y4M stream), "
                        "or ffmpeg:SRC")
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--out", "-o", default="rnnca-out.y4m")
    p.add_argument("--frames", "-n", type=int, default=200)
    p.add_argument("--fps", type=int, default=20)
    p.add_argument("--hidden-size", "-H", type=int, default=99)
    p.add_argument("--offsets", default="Y00120111C0111")
    p.add_argument("--learn-rate", "-l", type=float, default=1e-5)
    p.add_argument("--edges", action="store_true", help="clamp, not wrap")
    p.add_argument("--net-filename", "-f", default="rnnca.net")
    p.add_argument("--display", action="store_true",
                   help="play the generated CA live in the terminal "
                        "(24-bit half-block rendering — the rnnca-player "
                        "window, headless)")
    p.add_argument("--display-width", type=int, default=0,
                   help="downscale the live display to this many columns")
    p.add_argument("--block", type=int, default=8,
                   help="CA frames per device call (step_ca_block): the "
                        "high-latency-link pipelining that makes 20 fps "
                        "(1 = the per-frame path).  Note the stasis check "
                        "runs once per block, so a stuck CA can emit up "
                        "to block-1 frozen frames before the restart "
                        "(the reference checks per frame)")
    p.add_argument("--train-block", type=int, default=8,
                   help="training frame pairs per device call (1 = "
                        "per-frame)")
    p.add_argument("--quiet", "-q", action="count", default=0)
    opt = p.parse_args(argv)

    ca = Rnnca(hidden_size=opt.hidden_size, pattern=opt.offsets,
               learn_rate=opt.learn_rate, edges=opt.edges,
               net_filename=opt.net_filename)
    if opt.train_video:
        import numpy as np
        for epoch in range(opt.epochs):
            prev = None
            pairs = []
            for frame in video_frames(opt.train_video):
                t = u8_thumbnail(frame, RNNCA_HEIGHT, RNNCA_WIDTH)
                if prev is not None:
                    pairs.append((prev, t))
                    if len(pairs) == opt.train_block:
                        ca.train_frame_block(
                            np.stack([a for a, _ in pairs]),
                            np.stack([b for _, b in pairs]))
                        pairs = []
                prev = t
            for a, b in pairs:                  # trailing partial block
                ca.train_frame_pair(a, b)
            if opt.quiet < 1:
                print(f"epoch {epoch}: generation {ca.generation}",
                      file=sys.stderr)
        ca.save()

    def gen_frames():
        done = 0
        while done < opt.frames:
            n = min(opt.block, opt.frames - done)
            block = (ca.step_ca_block(n) if n > 1
                     else ca.step_ca()[None])
            for frame in block:
                done += 1
                yield frame

    if opt.display:
        from recur_tpu.utils.termview import TermViewer

        def frames():
            with TermViewer(fps=opt.fps, max_width=opt.display_width) as tv:
                for i, frame in enumerate(gen_frames()):
                    tv.show(frame, caption=f"frame {i + 1}/{opt.frames}  "
                                           f"gen {ca.generation}")
                    yield frame
        frames = frames()
    else:
        frames = gen_frames()
    write_y4m(opt.out, frames, RNNCA_WIDTH, RNNCA_HEIGHT, opt.fps)
    if opt.quiet < 1:
        print(f"wrote {opt.frames} frames to {opt.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
