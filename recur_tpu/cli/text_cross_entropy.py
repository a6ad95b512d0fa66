"""text-cross-entropy: score files against a char-LM net, optionally with a
per-character colour heat-map of surprise (text-cross-entropy.c)."""

from __future__ import annotations

import argparse
import sys

import numpy as np

import jax.numpy as jnp

from recur_tpu import nn, engine
from recur_tpu.models import charmodel
from recur_tpu.utils.colour import (
    C_ITALIC, C_NORMAL, spectrum_24, spectrum_256)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="text-cross-entropy",
                                description=__doc__)
    p.add_argument("--filename", "-f", required=True, action="append",
                   help="net file; repeat to score with an ensemble "
                        "(per-char mixture of the nets' predictive "
                        "distributions — all nets must share an alphabet)")
    p.add_argument("--ensemble-op", choices=("mixture", "geometric"),
                   default="mixture",
                   help="how to combine ensemble members: arithmetic mean "
                        "of probabilities (default) or renormalised "
                        "geometric mean (product of experts)")
    p.add_argument("files", nargs="+", help="text files to score")
    p.add_argument("--colour-scale", "-s", type=float, default=0.0,
                   help="colourise text showing cross entropy (0 = off); "
                        "higher values saturate at lower surprise")
    p.add_argument("--colour-decay", "-d", type=float, default=1.0,
                   help="set < 1 for exponential smoothing of the colour "
                        "(text-cross-entropy.c:101-103)")
    p.add_argument("--colour-24-bit", action="store_true",
                   help="use a 24-bit RGB spectrum (default 256-colour)")
    p.add_argument("--colour", "-c", action="store_true",
                   help="shorthand for --colour-scale 2 --colour-24-bit")
    p.add_argument("--italic-threshold", type=float, default=6.0,
                   help="italicise chars above this many bits "
                        "(colour mode only)")
    p.add_argument("--ignore-first", type=int, default=5,
                   help="skip this many characters before measuring")
    p.add_argument("--ignore-lines", "-I", type=int, default=0,
                   help="skip this many lines at the start of each file")
    p.add_argument("--min-length", "-m", type=int, default=0,
                   help="don't process texts shorter than this")
    p.add_argument("--prefix", default=None,
                   help="prime the net with this text before scoring")
    opt = p.parse_args(argv)
    if opt.colour and not opt.colour_scale:
        opt.colour_scale = 2.0
        opt.colour_24_bit = True

    nets = [nn.load_net(f) for f in opt.filename]
    net = nets[0]
    try:
        alphabet = charmodel.ensemble_alphabet(nets, opt.filename)
    except ValueError as e:
        p.error(str(e))
    prefix = (alphabet.encode(opt.prefix.encode()) if opt.prefix else None)
    for path in opt.files:
        with open(path, "rb") as f:
            raw = f.read()
        if opt.ignore_lines:
            parts = raw.split(b"\n", opt.ignore_lines)
            raw = parts[-1] if len(parts) > opt.ignore_lines else b""
        text = alphabet.encode(raw)
        if len(text) < max(3, opt.min_length, opt.ignore_first + 2):
            print(f"{path}: too short")
            continue
        import jax
        targets = np.asarray(text[1:], dtype=np.int64)
        if len(nets) == 1:
            hidden = jnp.zeros((1, net.cfg.h_size), jnp.float32)
            if prefix is not None and len(prefix):
                # rnn_char_prime (text-cross-entropy.c:145-148)
                hidden, _ = engine.char_forward_seq(
                    net.cfg, net.params, hidden,
                    jnp.asarray(prefix, jnp.int32)[None])
            hidden, outs = engine.char_forward_seq(
                net.cfg, net.params, hidden,
                jnp.asarray(text[:-1], jnp.int32)[None])
            logp2 = jax.nn.log_softmax(
                outs[:, :, :net.cfg.output_size], axis=-1) / jnp.log(2.0)
            logp2 = np.asarray(jnp.take_along_axis(
                logp2, jnp.asarray(text[1:], jnp.int32)[None, :, None],
                axis=2))[0, :, 0]
            surprise = -logp2
        else:
            # ensemble: per-char mixture (or product of experts) of each
            # member's predictive distribution; each member carries its own
            # hidden state.  Five ~8-minute seed runs of the headline
            # config score 1.94-1.95 bits/char on the erewhon validation
            # tail this way (PERF.md), below any single-net result.
            stacked = np.stack([
                charmodel.member_probs(member, text, prefix=prefix)
                for member in nets])
            q = charmodel.combine_probs(stacked, opt.ensemble_op)
            surprise = -np.log2(
                q[np.arange(len(targets)), targets] + 1e-30)
        mean = float(surprise[opt.ignore_first:].mean())
        print(f"{path}: {mean:.4f} bits/char")
        if opt.colour_scale:
            # rolling-decay colour per char (text-cross-entropy.c:91-117):
            # colour follows the smoothed surprise, italics the raw one
            spectrum = spectrum_24 if opt.colour_24_bit else spectrum_256
            out = []
            rolling = 1.0
            for i, s in enumerate(surprise):
                rolling = rolling * (1.0 - opt.colour_decay) + \
                    float(s) * opt.colour_decay
                ch = alphabet.decode([text[i + 1]])
                esc = spectrum(min(rolling * opt.colour_scale / 24.0, 1.0))
                if s > opt.italic_threshold:
                    out.append(f"{esc}{C_ITALIC}{ch}{C_NORMAL}")
                else:
                    out.append(f"{esc}{ch}{C_NORMAL}")
            print("".join(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
