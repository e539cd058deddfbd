"""PLC feature-prediction network.

Architecture (training_tf2/lpcnet_plc.py:65-101, src/lpcnet_plc.c:135-145):
input = [burg_cepstrum(36) | features(20) | lost_flag(1)] -> Dense(128, tanh)
-> GRU(256) -> GRU(256) -> Dense(20, linear); the predicted correlation
feature is boosted by +0.1 (capped at .5).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..dsp.constants import NB_BANDS, NB_FEATURES
from ..nn import init as nn_init
from ..nn import layers as nn

PLC_INPUT_SIZE = 2 * NB_BANDS + NB_FEATURES + 1   # 57


@dataclasses.dataclass(frozen=True)
class PLCConfig:
    dense1_size: int = 128
    gru1_size: int = 256
    gru2_size: int = 256
    nb_features: int = NB_FEATURES
    cond_size: int = PLC_INPUT_SIZE


def init_params(key, cfg: PLCConfig | None = None) -> Dict[str, Any]:
    cfg = cfg or PLCConfig()
    ks = jax.random.split(key, 4)
    return {
        "plc_dense1": nn_init.dense_params(ks[0], PLC_INPUT_SIZE, cfg.dense1_size),
        "plc_gru1": nn_init.gru_params(ks[1], cfg.dense1_size, cfg.gru1_size),
        "plc_gru2": nn_init.gru_params(ks[2], cfg.gru1_size, cfg.gru2_size),
        "plc_out": nn_init.dense_params(ks[3], cfg.gru2_size, NB_FEATURES),
    }


class PLCNetState(NamedTuple):
    gru1: jnp.ndarray   # [B, 256]
    gru2: jnp.ndarray   # [B, 256]


def init_state(batch: int, cfg: PLCConfig | None = None) -> PLCNetState:
    cfg = cfg or PLCConfig()
    return PLCNetState(jnp.zeros((batch, cfg.gru1_size), jnp.float32),
                       jnp.zeros((batch, cfg.gru2_size), jnp.float32))


def compute_plc_pred(params, state: PLCNetState, plc_input,
                     precision=nn.HIGHEST
                     ) -> Tuple[PLCNetState, jnp.ndarray]:
    """One step of feature prediction (src/lpcnet_plc.c:135-145).

    Args: plc_input [B, 57]. Returns (new_state, features [B, 20]).
    `precision` selects the matmul mode (HIGHEST = f32-exact C numerics;
    DEFAULT = bf16 MXU passes, ~1e-3 feature error, for serving batches).
    """
    d = nn.dense(params["plc_dense1"], plc_input, "tanh",
                 precision=precision)
    h1 = nn.gru_step(params["plc_gru1"], state.gru1, d, precision=precision)
    h2 = nn.gru_step(params["plc_gru2"], state.gru2, h1, precision=precision)
    out = nn.dense(params["plc_out"], h2, precision=precision)
    out = out.at[..., NB_FEATURES - 1].set(
        jnp.minimum(0.5, out[..., NB_FEATURES - 1] + 0.1))
    return PLCNetState(h1, h2), out


def predict_sequence(params, state: PLCNetState, plc_inputs):
    """Training-mode sequence form: [B, T, 57] -> [B, T, 20] predictions.

    Matches the Keras graph (training_tf2/lpcnet_plc.py:65-101) which does
    NOT apply the +0.1 correlation boost (inference-only tweak).
    """
    d = nn.dense(params["plc_dense1"], plc_inputs, "tanh")
    h1_seq, h1 = nn.gru_seq(params["plc_gru1"], d, h0=state.gru1)
    h2_seq, h2 = nn.gru_seq(params["plc_gru2"], h1_seq, h0=state.gru2)
    out = nn.dense(params["plc_out"], h2_seq)
    return PLCNetState(h1, h2), out
