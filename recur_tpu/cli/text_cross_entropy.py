"""text-cross-entropy: score files against a char-LM net, optionally with a
per-character colour heat-map of surprise (text-cross-entropy.c)."""

from __future__ import annotations

import argparse
import sys

import numpy as np

import jax.numpy as jnp

from recur_tpu import nn, engine
from recur_tpu.models.alphabet import Metadata
from recur_tpu.utils.colour import C_ITALIC, C_NORMAL, spectrum_24


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="text-cross-entropy",
                                description=__doc__)
    p.add_argument("--filename", "-f", required=True, help="net file")
    p.add_argument("files", nargs="+", help="text files to score")
    p.add_argument("--colour", "-c", action="store_true",
                   help="24-bit colour heat-map of per-char surprise")
    p.add_argument("--italic-threshold", type=float, default=6.0,
                   help="italicise chars above this many bits")
    p.add_argument("--ignore-first", type=int, default=5)
    opt = p.parse_args(argv)

    net = nn.load_net(opt.filename)
    alphabet = Metadata.parse(net.metadata).to_alphabet()
    for path in opt.files:
        with open(path, "rb") as f:
            text = alphabet.encode(f.read())
        if len(text) < 3:
            print(f"{path}: too short")
            continue
        import jax
        hidden = jnp.zeros((1, net.cfg.h_size), jnp.float32)
        hidden, outs = engine.char_forward_seq(
            net.cfg, net.params, hidden,
            jnp.asarray(text[:-1], jnp.int32)[None])
        logp2 = jax.nn.log_softmax(
            outs[:, :, :net.cfg.output_size], axis=-1) / jnp.log(2.0)
        logp2 = np.asarray(jnp.take_along_axis(
            logp2, jnp.asarray(text[1:], jnp.int32)[None, :, None],
            axis=2))[0, :, 0]
        surprise = -logp2
        mean = float(surprise[opt.ignore_first:].mean())
        print(f"{path}: {mean:.4f} bits/char")
        if opt.colour:
            out = []
            for i, s in enumerate(surprise):
                ch = alphabet.decode([text[i + 1]])
                esc = spectrum_24(min(s / 10.0, 1.0))
                if s > opt.italic_threshold:
                    out.append(f"{esc}{C_ITALIC}{ch}{C_NORMAL}")
                else:
                    out.append(f"{esc}{ch}{C_NORMAL}")
            print("".join(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
