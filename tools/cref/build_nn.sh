#!/bin/sh
# Build the NEURAL parity fixture generator against the read-only reference
# tree (compiled in place, never copied). Unlike build.sh (DSP/codec-only),
# this links the full neural stack: nnet.c, lpcnet.c, lpcnet_plc.c,
# parse_lpcnet_weights.c and the DRED enc/dec. USE_WEIGHTS_FILE makes the
# reference load models from a DNNw blob (written by lpcnet_tpu.weights)
# instead of generated data arrays.
set -e
HERE=$(dirname "$0")
REF=${REF:-/root/reference}
BUILD=${BUILD:-$HERE/build}
mkdir -p "$BUILD"

# plain C kernels (no -march): the float vec.h path whose numerics the
# JAX 'cref' activation mode replicates
# -U__SSE__/-U__SSE2__ forces the scalar vec.h path (the SSE path routes
# through vec_avx.h approximations); DISABLE_DOT_PROD selects float weights.
cc -O2 -fcommon -DUSE_WEIGHTS_FILE -U__SSE__ -U__SSE2__ -U__AVX__ \
  -DDISABLE_DOT_PROD -I"$HERE" -I"$REF/src" -I"$REF/include" \
  -o "$BUILD/harness_nn" \
  "$HERE/harness_nn.c" \
  "$HERE/nnet_data.c" "$HERE/plc_data.c" "$HERE/dred_data.c" \
  "$REF/src/nnet.c" "$REF/src/lpcnet.c" "$REF/src/lpcnet_plc.c" \
  "$REF/src/parse_lpcnet_weights.c" \
  "$REF/src/dred_rdovae_enc.c" "$REF/src/dred_rdovae_dec.c" \
  "$REF/src/freq.c" "$REF/src/kiss_fft.c" "$REF/src/pitch.c" \
  "$REF/src/burg.c" "$REF/src/common.c" "$REF/src/lpcnet_enc.c" \
  "$REF/src/lpcnet_dec.c" \
  "$REF/src/lpcnet_tables.c" "$REF/src/kiss99.c" \
  "$BUILD/ceps_codebooks.c" \
  -lm
# no-lookahead build for the non-causal PLC modes
# (lpcnet_plc.c refuses FEATURES_DELAY != 0 there)
cc -O2 -fcommon -DUSE_WEIGHTS_FILE -U__SSE__ -U__SSE2__ -U__AVX__ \
  -DDISABLE_DOT_PROD -DFEATURES_DELAY=0 -I"$HERE" -I"$REF/src" -I"$REF/include" \
  -o "$BUILD/harness_nn_nc" \
  "$HERE/harness_nn.c" \
  "$HERE/nnet_data.c" "$HERE/plc_data.c" "$HERE/dred_data.c" \
  "$REF/src/nnet.c" "$REF/src/lpcnet.c" "$REF/src/lpcnet_plc.c" \
  "$REF/src/parse_lpcnet_weights.c" \
  "$REF/src/dred_rdovae_enc.c" "$REF/src/dred_rdovae_dec.c" \
  "$REF/src/freq.c" "$REF/src/kiss_fft.c" "$REF/src/pitch.c" \
  "$REF/src/burg.c" "$REF/src/common.c" "$REF/src/lpcnet_enc.c" \
  "$REF/src/lpcnet_dec.c" \
  "$REF/src/lpcnet_tables.c" "$REF/src/kiss99.c" \
  "$BUILD/ceps_codebooks.c" \
  -lm
# int8 DOT_PROD builds: the reference's DEPLOYED inference numerics
# (scalar sgemv_accum8x4 from src/vec.h:206-339 with USE_SU_BIAS, the same
# unsigned-x + subias integer math vec_avx.h:40-41 uses on AVX2). Gates the
# quantized blob export (subias, int8 weights) and the JAX q8 kernels
# against C rather than against the repo's own integer reference.
cc -O2 -fcommon -DUSE_WEIGHTS_FILE -U__SSE__ -U__SSE2__ -U__AVX__ \
  -DUSE_SU_BIAS -I"$HERE" -I"$REF/src" -I"$REF/include" \
  -o "$BUILD/harness_nn_q8" \
  "$HERE/harness_nn.c" \
  "$HERE/nnet_data.c" "$HERE/plc_data.c" "$HERE/dred_data.c" \
  "$REF/src/nnet.c" "$REF/src/lpcnet.c" "$REF/src/lpcnet_plc.c" \
  "$REF/src/parse_lpcnet_weights.c" \
  "$REF/src/dred_rdovae_enc.c" "$REF/src/dred_rdovae_dec.c" \
  "$REF/src/freq.c" "$REF/src/kiss_fft.c" "$REF/src/pitch.c" \
  "$REF/src/burg.c" "$REF/src/common.c" "$REF/src/lpcnet_enc.c" \
  "$REF/src/lpcnet_dec.c" \
  "$REF/src/lpcnet_tables.c" "$REF/src/kiss99.c" \
  "$BUILD/ceps_codebooks.c" \
  -lm
cc -O2 -fcommon -DUSE_WEIGHTS_FILE -U__SSE__ -U__SSE2__ -U__AVX__ \
  -DUSE_SU_BIAS -DFEATURES_DELAY=0 -I"$HERE" -I"$REF/src" -I"$REF/include" \
  -o "$BUILD/harness_nn_q8_nc" \
  "$HERE/harness_nn.c" \
  "$HERE/nnet_data.c" "$HERE/plc_data.c" "$HERE/dred_data.c" \
  "$REF/src/nnet.c" "$REF/src/lpcnet.c" "$REF/src/lpcnet_plc.c" \
  "$REF/src/parse_lpcnet_weights.c" \
  "$REF/src/dred_rdovae_enc.c" "$REF/src/dred_rdovae_dec.c" \
  "$REF/src/freq.c" "$REF/src/kiss_fft.c" "$REF/src/pitch.c" \
  "$REF/src/burg.c" "$REF/src/common.c" "$REF/src/lpcnet_enc.c" \
  "$REF/src/lpcnet_dec.c" \
  "$REF/src/lpcnet_tables.c" "$REF/src/kiss99.c" \
  "$BUILD/ceps_codebooks.c" \
  -lm

# .fec byte-format reader harness (training_tf2/fec_packets.c compiled in place)
cc -O2 -I"$REF/training_tf2" -o "$BUILD/harness_fec" \
  "$HERE/harness_fec.c" "$REF/training_tf2/fec_packets.c"

echo "built $BUILD/harness_nn + _nc + _q8 + _q8_nc + $BUILD/harness_fec"
