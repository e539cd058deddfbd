#!/bin/sh
# Build the native host runtime (liblpcnet_runtime.so).
set -e
HERE=$(cd "$(dirname "$0")/.." && pwd)
SRC="$HERE/lpcnet_tpu/runtime/native/lpcnet_runtime.cc"
OUT="$HERE/lpcnet_tpu/runtime/native/liblpcnet_runtime.so"
g++ -O3 -march=native -shared -fPIC -o "$OUT" "$SRC"
echo "built $OUT"
