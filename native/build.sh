#!/bin/sh
# Build the host-side boundary codec (libmifieldcalc_host.so).
# AVX2 mirrors the reference's hot-TU flags (src/mi_fieldcalc/
# CMakeLists.txt:55-59); fall back to plain -O3 on non-x86 hosts.
set -e
HERE=$(dirname "$0")
OUT=${OUT:-"$HERE/build"}
mkdir -p "$OUT"
if g++ -O3 -mavx2 -std=c++17 -fPIC -shared -pthread \
     "$HERE/fieldcodec.cc" -o "$OUT/libmifieldcalc_host.so" 2>/dev/null; then
  :
else
  g++ -O3 -std=c++17 -fPIC -shared -pthread \
      "$HERE/fieldcodec.cc" -o "$OUT/libmifieldcalc_host.so"
fi
echo "native: $OUT/libmifieldcalc_host.so"
