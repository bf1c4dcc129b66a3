#!/bin/bash
# Build the C++ reference trainer against the local CBLAS shim, for baseline
# throughput measurement and metric-parity runs.  Sources stay in
# /root/reference (read-only); objects/binary land in scripts/ref_build/.
set -euo pipefail
here="$(cd "$(dirname "$0")" && pwd)"
ref=${REFERENCE_DIR:-/root/reference}
out="$here/ref_build"
mkdir -p "$out"

CXXFLAGS="-Wall -O3 -std=c++0x -march=native -fopenmp -I$here/cblas_shim"

g++ $CXXFLAGS -c -o "$out/cblas_shim.o" "$here/cblas_shim/cblas_shim.cpp"
g++ $CXXFLAGS -DOPENBLAS -c -o "$out/ffm.o" "$ref/ffm.cpp"
g++ $CXXFLAGS -o "$out/train" "$ref/train.cpp" "$out/ffm.o" "$out/cblas_shim.o" -lpthread
echo "built $out/train"
