#!/bin/sh
# Build the parity fixture generator against the read-only reference tree.
# Reference sources are compiled in place; nothing is copied into the repo.
set -e
HERE=$(dirname "$0")
REF=${REF:-/root/reference}
BUILD=${BUILD:-$HERE/build}
mkdir -p "$BUILD"

# Real xiph codebooks auto-activate when dropped in (README "Real xiph
# artifacts"); otherwise deterministic synthetic stand-ins are generated.
XIPH_CB="$HERE/../../artifacts/xiph/ceps_codebooks.npz"
if [ -f "$XIPH_CB" ]; then
  python3 "$HERE/gen_codebooks.py" --from-npz "$XIPH_CB" \
    --c-out "$BUILD/ceps_codebooks.c" \
    --npz-out "$HERE/../../tests/fixtures/codebooks.npz"
else
  python3 "$HERE/gen_codebooks.py" \
    --c-out "$BUILD/ceps_codebooks.c" \
    --npz-out "$HERE/../../tests/fixtures/codebooks.npz"
fi

cc -O2 -fcommon -I"$HERE" -I"$REF/src" -I"$REF/include" \
  -o "$BUILD/harness" \
  "$HERE/harness.c" \
  "$BUILD/ceps_codebooks.c" \
  "$REF/src/freq.c" "$REF/src/kiss_fft.c" "$REF/src/pitch.c" \
  "$REF/src/burg.c" "$REF/src/common.c" "$REF/src/lpcnet_enc.c" \
  "$REF/src/lpcnet_dec.c" "$REF/src/lpcnet_tables.c" "$REF/src/kiss99.c" \
  -lm
echo "built $BUILD/harness"
