"""parrot: train the MDCT audio-prediction net on a WAV and dream new audio
to a WAV (the gstparrot element, headless)."""

from __future__ import annotations

import argparse
import sys

import numpy as np

from recur_tpu.audio.parrot import PARROT_RATE, Parrot
from recur_tpu.audio.wavio import write_wav
from recur_tpu.utils import avio


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="parrot", description=__doc__)
    p.add_argument("--train-audio", default=None, help="WAV input")
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--out", "-o", default="parrot-dream.wav")
    p.add_argument("--dream-seconds", "-n", type=float, default=10.0)
    p.add_argument("--hidden-size", "-H", type=int, default=199)
    p.add_argument("--window-size", "-w", type=int, default=512)
    p.add_argument("--learn-rate", "-l", type=float, default=0.0001)
    p.add_argument("--net-filename", "-f", default="parrot.net")
    p.add_argument("--quiet", "-q", action="count", default=0)
    opt = p.parse_args(argv)

    par = Parrot(n_channels=1, hidden_size=opt.hidden_size,
                 window_size=opt.window_size, learn_rate=opt.learn_rate,
                 net_filename=opt.net_filename)
    if opt.train_audio:
        pcm = avio.read_audio(opt.train_audio, PARROT_RATE)
        chunk = PARROT_RATE  # 1s chunks
        for epoch in range(opt.epochs):
            mses = []
            for i in range(0, len(pcm) - chunk, chunk):
                mse = par.train(pcm[None, i:i + chunk])
                if not np.isnan(mse):
                    mses.append(mse)
            if opt.quiet < 1 and mses:
                print(f"epoch {epoch}: mse {np.mean(mses):.5f} "
                      f"gen {par.generation}", file=sys.stderr)
        par.save()
    dream = par.dream(int(opt.dream_seconds * PARROT_RATE))
    write_wav(opt.out, dream[0], PARROT_RATE)
    if opt.quiet < 1:
        print(f"wrote {opt.dream_seconds}s of dream audio to {opt.out}",
              file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
