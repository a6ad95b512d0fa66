#!/usr/bin/env python3
"""Shuffle a text corpus by paragraph (scripts/shuffler.py) — decorrelates
long-range structure for validation splits."""

import argparse
import random
import sys


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("infile")
    p.add_argument("outfile")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--separator", default="\n\n")
    args = p.parse_args()
    with open(args.infile) as f:
        paragraphs = f.read().split(args.separator)
    random.Random(args.seed).shuffle(paragraphs)
    with open(args.outfile, "w") as f:
        f.write(args.separator.join(paragraphs))
    print(f"shuffled {len(paragraphs)} paragraphs")
    return 0


if __name__ == "__main__":
    sys.exit(main())
