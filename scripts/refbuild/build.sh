#!/bin/sh
# Build the REFERENCE text-predict on this host (no libcdb in the image:
# mini_cdb.c is a format-compatible shim; config.h/path.h hand-written).
# Used for like-for-like quality controls (artifacts/ref_longrun/).
set -e
REF=${REF:-/root/reference}
OUT=${OUT:-/tmp/refbuild}
mkdir -p "$OUT" && cd "$OUT"
cp "$(dirname "$0")"/cdb.h "$(dirname "$0")"/mini_cdb.c \
   "$(dirname "$0")"/config.h "$(dirname "$0")"/path.h . 2>/dev/null || true
CFLAGS="-O3 -march=native -ffast-math -std=gnu11 -fcommon -D_GNU_SOURCE -I. -I$REF -I$REF/ccan/opt -I$REF/ccan"
for f in recur-nn recur-nn-io recur-nn-init charmodel-predict charmodel-init text-predict; do
  gcc $CFLAGS -c "$REF/$f.c" -o "$f.o"
done
for f in opt parse helpers usage; do
  gcc $CFLAGS -c "$REF/ccan/opt/$f.c" -o "opt_$f.o"
done
gcc $CFLAGS -c mini_cdb.c -o mini_cdb.o
gcc -o text-predict *.o -lm
mkdir -p nets images
echo "built $OUT/text-predict"
