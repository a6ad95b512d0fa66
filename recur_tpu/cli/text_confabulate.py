"""text-confabulate: load a net, prime it with a prefix, and sample text
(text-confabulate.c)."""

from __future__ import annotations

import argparse
import sys

from recur_tpu import nn
from recur_tpu.models.alphabet import Metadata
from recur_tpu.models.charmodel import CharModel


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="text-confabulate", description=__doc__)
    p.add_argument("--filename", "-f", required=True, help="net file")
    p.add_argument("--length", "-n", type=int, default=500)
    p.add_argument("--bias", "-b", type=float, default=0.0,
                   help=">=100 means deterministic argmax")
    p.add_argument("--prime", "--prefix", "-p", default="",
                   help="prefix text to prime the net with")
    p.add_argument("--show-prefix", action="store_true",
                   help="print the prefix before the confabulation")
    p.add_argument("--rng-seed", type=int, default=-1,
                   help="sampling seed (-1 for arbitrary)")
    p.add_argument("--wait-for", default=None,
                   help="start emitting only after this character")
    p.add_argument("--until", default=None, help="stop at this character")
    opt = p.parse_args(argv)

    net = nn.load_net(opt.filename)
    if not net.metadata:
        print("net has no metadata; can't reconstruct the alphabet",
              file=sys.stderr)
        return 1
    alphabet = Metadata.parse(net.metadata).to_alphabet()
    seed = opt.rng_seed if opt.rng_seed >= 0 else 0
    model = CharModel(net, alphabet, n_streams=1, save_net=False, seed=seed)
    if opt.prime:
        model.prime(alphabet.encode(opt.prime))
        if opt.show_prefix:
            print(opt.prime, end="")
    start = alphabet.get_codepoint(opt.wait_for) if opt.wait_for else -1
    stop = alphabet.get_codepoint(opt.until) if opt.until else -1
    text = model.confabulate(opt.length, bias=opt.bias, start_point=start,
                             stop_point=stop)
    print(text)
    return 0


if __name__ == "__main__":
    sys.exit(main())
