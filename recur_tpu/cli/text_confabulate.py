"""text-confabulate: load a net, prime it with a prefix, and sample text
(text-confabulate.c).  Repeated -f samples from the per-char mixture of
all nets' predictive distributions (beyond-reference ensemble confab,
matching text-cross-entropy's ensemble scoring)."""

from __future__ import annotations

import argparse
import sys

from recur_tpu import nn
from recur_tpu.models import charmodel
from recur_tpu.models.alphabet import Metadata
from recur_tpu.models.charmodel import CharModel


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="text-confabulate", description=__doc__)
    p.add_argument("--filename", "-f", required=True, action="append",
                   help="net file (repeat for an ensemble mixture)")
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
    p.add_argument("--ensemble-op", default="mixture",
                   choices=["mixture", "geometric"],
                   help="how to combine members' distributions (with "
                        "repeated -f)")
    opt = p.parse_args(argv)

    nets = [nn.load_net(f) for f in opt.filename]
    if not nets[0].metadata:
        print("net has no metadata; can't reconstruct the alphabet",
              file=sys.stderr)
        return 1
    try:
        alphabet = charmodel.ensemble_alphabet(nets, opt.filename)
    except ValueError as e:
        p.error(str(e))
    seed = opt.rng_seed if opt.rng_seed >= 0 else 0
    start = alphabet.get_codepoint(opt.wait_for) if opt.wait_for else -1
    stop = alphabet.get_codepoint(opt.until) if opt.until else -1

    if len(nets) > 1:
        prefix = alphabet.encode(opt.prime) if opt.prime else None
        if opt.prime and opt.show_prefix:
            print(opt.prime, end="")
        text = charmodel.ensemble_confabulate(
            nets, alphabet, opt.length, bias=opt.bias, prefix=prefix,
            seed=seed, start_point=start, stop_point=stop,
            ensemble_op=opt.ensemble_op)
        print(text)
        return 0

    net = nets[0]
    model = CharModel(net, alphabet, n_streams=1, save_net=False, seed=seed)
    if opt.prime:
        model.prime(alphabet.encode(opt.prime))
        if opt.show_prefix:
            print(opt.prime, end="")
    text = model.confabulate(opt.length, bias=opt.bias, start_point=start,
                             stop_point=stop)
    print(text)
    return 0


if __name__ == "__main__":
    sys.exit(main())
