#!/bin/sh
# Build the REFERENCE text-predict on this host (no libcdb in the image:
# mini_cdb.c is a format-compatible shim; config.h/path.h hand-written).
# Used for like-for-like quality controls (artifacts/ref_longrun/).
set -e
REF=${REF:-/root/reference}
OUT=${OUT:-/tmp/refbuild}
HERE=$(cd "$(dirname "$0")" && pwd)   # resolve before the cd below
mkdir -p "$OUT" && cd "$OUT"
cp "$HERE"/cdb.h "$HERE"/mini_cdb.c \
   "$HERE"/config.h "$HERE"/path.h \
   "$HERE"/colour-spectrum.h .
CFLAGS="-O3 -march=native -ffast-math -std=gnu11 -fcommon -D_GNU_SOURCE -I. -I$REF -I$REF/ccan/opt -I$REF/ccan"
for f in recur-nn recur-nn-io recur-nn-init charmodel-predict charmodel-init text-predict; do
  gcc $CFLAGS -c "$REF/$f.c" -o "$f.o"
done
for f in opt parse helpers usage; do
  gcc $CFLAGS -c "$REF/ccan/opt/$f.c" -o "opt_$f.o"
done
gcc $CFLAGS -c mini_cdb.c -o mini_cdb.o
gcc -o text-predict *.o -lm
# text-cross-entropy: scores text with a loaded net — used to prove the
# reference's OWN loader+forward reads our student .best nets and
# reproduces their validation quality (format-compliance cross-check)
for f in text-cross-entropy colour; do
  gcc $CFLAGS -c "$REF/$f.c" -o "$f.o"
done
gcc -o text-cross-entropy text-cross-entropy.o colour.o charmodel-init.o \
    charmodel-predict.o recur-nn.o recur-nn-io.o recur-nn-init.o \
    mini_cdb.o opt_opt.o opt_parse.o opt_helpers.o opt_usage.o -lm
mkdir -p nets images
echo "built $OUT/text-predict and $OUT/text-cross-entropy"
