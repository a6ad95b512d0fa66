"""xml-lang-classify: extract per-language text blocks from TEI XML via
xml:lang attributes and train a language classifier (xml-lang-classify.c,
using stdlib ElementTree instead of libxml2)."""

from __future__ import annotations

import argparse
import sys
import xml.etree.ElementTree as ET

from recur_tpu import nn
from recur_tpu.models.alphabet import Alphabet, Metadata
from recur_tpu.models.classify_text import TextClassifier, alloc_classified_text
from recur_tpu.nn import Flag
from recur_tpu.ops import init as winit
from recur_tpu.utils.kvlog import KvLog

XML_LANG = "{http://www.w3.org/XML/1998/namespace}lang"


def extract_lang_blocks(path: str, min_len: int = 10) -> list[tuple[str, bytes]]:
    """Walk the XML tree collecting text under each xml:lang scope."""
    tree = ET.parse(path)
    blocks: list[tuple[str, bytes]] = []

    def walk(el, lang):
        lang = el.get(XML_LANG, lang)
        if el.text and lang and len(el.text.strip()) >= min_len:
            blocks.append((lang, el.text.strip().encode("utf-8")))
        for child in el:
            walk(child, lang)
            if child.tail and lang and len(child.tail.strip()) >= min_len:
                blocks.append((lang, child.tail.strip().encode("utf-8")))

    walk(tree.getroot(), None)
    return blocks


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="xml-lang-classify", description=__doc__)
    p.add_argument("files", nargs="+", help="TEI XML files")
    p.add_argument("--hidden-size", "-H", type=int, default=199)
    p.add_argument("--learn-rate", "-l", type=float, default=0.001)
    p.add_argument("--multi-tap", type=int, default=8)
    p.add_argument("--epochs", "-e", type=int, default=10)
    p.add_argument("--min-block-length", type=int, default=10)
    p.add_argument("--filename", "-f", default="xml-lang.net")
    p.add_argument("--log-file", default="xml-lang.log")
    p.add_argument("--quiet", "-q", action="count", default=0)
    opt = p.parse_args(argv)

    blocks: list[tuple[str, bytes]] = []
    for path in opt.files:
        blocks.extend(extract_lang_blocks(path, opt.min_block_length))
    if not blocks:
        print("no xml:lang text blocks found", file=sys.stderr)
        return 1
    corpus = b" ".join(t for _, t in blocks)
    alphabet = Alphabet.find(corpus, threshold=1e-5, utf8=True,
                             collapse_space=True)
    syms, cls, names = alloc_classified_text(blocks, alphabet)
    if opt.quiet < 1:
        print(f"languages: {names}; {len(syms)} chars", file=sys.stderr)
    net = nn.new_net(len(alphabet), opt.hidden_size, len(names),
                     flags=Flag.STANDARD | Flag.BPTT_ADAPTIVE_MIN_ERROR,
                     rng_seed=1, depth=30, learn_rate=opt.learn_rate)
    winit.randomise_weights(net)
    net.metadata = Metadata.from_alphabet(alphabet).construct()
    clf = TextClassifier(net, alphabet, names, n_streams=opt.multi_tap,
                         filename=opt.filename, log=KvLog(opt.log_file))
    for _ in range(opt.epochs):
        clf.epoch(syms, cls, quietness=opt.quiet)
    clf.save(opt.filename)
    return 0


if __name__ == "__main__":
    sys.exit(main())
