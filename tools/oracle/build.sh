#!/bin/sh
# Build the reference library (out-of-tree, never committed) and the
# extern-C shim used by gen_goldens.py.  Requires cmake+ninja+g++.
set -e
REF=${REF:-/root/reference}
BUILD=${BUILD:-/tmp/ref_build}
HERE=$(dirname "$0")

cmake -S "$REF" -B "$BUILD" -DCMAKE_BUILD_TYPE=Release -DENABLE_TESTS=OFF \
      -DENABLE_PYTHON=OFF -DENABLE_OPENMP=OFF -G Ninja
ninja -C "$BUILD"

g++ -O2 -fPIC -shared "$HERE/shim.cc" -I"$REF/src" \
    -L"$BUILD/src/mi_fieldcalc" -lmi-fieldcalc \
    -Wl,-rpath,"$BUILD/src/mi_fieldcalc" -o "$BUILD/liboracle.so"
echo "oracle: $BUILD/liboracle.so"
