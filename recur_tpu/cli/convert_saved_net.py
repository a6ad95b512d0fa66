"""convert-saved-net: load a net, clear the OWN_BPTT flag, re-save
(convert-saved-net.c — format migration)."""

from __future__ import annotations

import argparse
import dataclasses
import sys

from recur_tpu import nn
from recur_tpu.nn import Flag


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="convert-saved-net",
                                description=__doc__)
    p.add_argument("src")
    p.add_argument("dest")
    opt = p.parse_args(argv)
    net = nn.load_net(opt.src)
    net.cfg = dataclasses.replace(net.cfg, flags=net.cfg.flags
                                  & ~Flag.OWN_BPTT)
    nn.save_net(net, opt.dest)
    return 0


if __name__ == "__main__":
    sys.exit(main())
