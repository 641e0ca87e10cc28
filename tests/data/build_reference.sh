#!/bin/sh
# Compile the reference C++ binaries (read-only source in /root/reference)
# into /tmp/refbin for the differential harnesses:
#   tests/fuzz_reference_parity.py  (byte-parity fuzz, manual)
#   tests/data/make_golden.py       (golden file provenance)
# /tmp is wiped between sessions — re-run this first.
set -e
REF=${1:-/root/reference}
OUT=${2:-/tmp/refbin}
mkdir -p "$OUT"
for t in spaced_seed binary_test locator visual_align quality; do
    g++ -O2 -Wno-deprecated -o "$OUT/$t" "$REF/src/$t.cpp"
done
gcc -O2 -o "$OUT/stat_hash" "$REF/src/stat_hash.c"
echo "built: $(ls "$OUT")"
