#!/bin/sh
# Build the native host runtime (liblpcnet_runtime.so).
set -e
HERE=$(cd "$(dirname "$0")/.." && pwd)
SRC="$HERE/lpcnet_tpu/runtime/native/lpcnet_runtime.cc"
OUT="$HERE/lpcnet_tpu/runtime/native/liblpcnet_runtime.so"
EXTRA=""
if [ "$1" = "--asan" ]; then
  # sanitizer build for debugging the native runtime
  EXTRA="-fsanitize=address,undefined -fno-omit-frame-pointer -g"
fi
g++ -O3 -march=native -shared -fPIC $EXTRA -o "$OUT" "$SRC"
echo "built $OUT"
