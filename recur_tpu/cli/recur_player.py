"""gtk-recur headless: train the recur fractal AV model on a Y4M video (+
optional WAV audio) and render generated frames to Y4M (gtk-recur.c +
gstrecur_* without GTK/GStreamer)."""

from __future__ import annotations

import argparse
import sys


from recur_tpu.dsp.rescale import u8_thumbnail
from recur_tpu.utils.avio import read_audio, video_frames
from recur_tpu.utils.video_io import write_y4m
from recur_tpu.video.recur_ctx import (
    AUDIO_RATE, CONSTRUCT_H, CONSTRUCT_W, RecurContext, WORKING_H, WORKING_W)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="recur-player", description=__doc__)
    p.add_argument("--train-video", default=None, help="Y4M input")
    p.add_argument("--train-audio", default=None, help="WAV input")
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--fps", type=int, default=25)
    p.add_argument("--out", "-o", default="recur-out.y4m")
    p.add_argument("--frames", "-n", type=int, default=250)
    p.add_argument("--learn-rate", "-l", type=float, default=1e-5)
    p.add_argument("--net-filename", "-f", default="recur.net")
    p.add_argument("--display", action="store_true",
                   help="play the generated frames live in the terminal "
                        "(24-bit half-block rendering — gtk-recur, headless)")
    p.add_argument("--display-width", type=int, default=0)
    p.add_argument("--block", type=int, default=8,
                   help="constructions per device call (confabulate_block):"
                        " the high-latency-link pipelining that makes 25 "
                        "fps (1 = the per-frame path)")
    p.add_argument("--quiet", "-q", action="count", default=0)
    opt = p.parse_args(argv)

    ctx = RecurContext(learn_rate=opt.learn_rate,
                       net_filename=opt.net_filename)
    audio = None
    if opt.train_audio:
        audio = read_audio(opt.train_audio, AUDIO_RATE)
    if opt.train_video:
        samples_per_frame = AUDIO_RATE // opt.fps
        for epoch in range(opt.epochs):
            prev = None
            for i, frame in enumerate(video_frames(opt.train_video)):
                if audio is not None:
                    a0 = i * samples_per_frame
                    ctx.set_audio_window(audio[a0:a0 + 512])
                t = u8_thumbnail(frame, WORKING_H, WORKING_W)
                if prev is not None:
                    ctx.train_frame_pair(prev, t)
                prev = t
            if opt.quiet < 1:
                print(f"epoch {epoch}: generation {ctx.generation}",
                      file=sys.stderr)
        ctx.save()
    def gen_frames():
        done = 0
        while done < opt.frames:
            n = min(opt.block, opt.frames - done)
            block = (ctx.confabulate_block(n) if n > 1
                     else ctx.confabulate()[None])
            for frame in block:
                done += 1
                yield frame

    if opt.display:
        from recur_tpu.utils.termview import TermViewer

        def frames():
            with TermViewer(fps=opt.fps, max_width=opt.display_width) as tv:
                for i, frame in enumerate(gen_frames()):
                    tv.show(frame, caption=f"frame {i + 1}/{opt.frames}  "
                                           f"gen {ctx.generation}")
                    yield frame
        frames = frames()
    else:
        frames = gen_frames()
    write_y4m(opt.out, frames, CONSTRUCT_W, CONSTRUCT_H, opt.fps)
    if opt.quiet < 1:
        print(f"wrote {opt.frames} frames to {opt.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
