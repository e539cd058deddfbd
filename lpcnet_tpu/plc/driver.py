"""PLC file driver mirroring lpcnet_demo -plc / -plc_file
(src/lpcnet_demo.c:220-249): 20 ms packets (2 frames), one loss flag per
packet from a pattern file or Bernoulli(percent)."""

from __future__ import annotations

import numpy as np

from ..api import load_model
from ..dsp.constants import FRAME_SIZE
from ..models import plc as PM
from .plc import (
    LPCNET_PLC_CAUSAL,
    LPCNET_PLC_DC_FILTER,
    LPCNET_PLC_NONCAUSAL,
    PLC,
)

_OPTION_MAP = {
    "causal": LPCNET_PLC_CAUSAL,
    "causal_dc": LPCNET_PLC_CAUSAL | LPCNET_PLC_DC_FILTER,
    "noncausal": LPCNET_PLC_NONCAUSAL,
    "noncausal_dc": LPCNET_PLC_NONCAUSAL | LPCNET_PLC_DC_FILTER,
}


def make_plc(options: str, model_path=None, batch: int = 1,
             plc_model_path=None, seed: int = 0) -> PLC:
    import jax

    from ..models import lpcnet as M
    if options not in _OPTION_MAP:
        raise SystemExit(
            f"unknown plc mode '{options}'; choose from {sorted(_OPTION_MAP)}")
    flags = _OPTION_MAP[options]
    noncausal = bool(flags & 0x1)
    if model_path is None:
        cfg = M.LPCNetConfig(lookahead=0) if noncausal else M.LPCNetConfig()
        params = M.init_params(jax.random.PRNGKey(seed), cfg)
        fused = M.fuse_inference_params(params, cfg)
    else:
        fused, cfg = load_model(model_path)
        if noncausal and cfg.lookahead != 0:
            raise ValueError("non-causal PLC requires a lookahead-0 model")
    if plc_model_path is None:
        plc_params = PM.init_params(jax.random.PRNGKey(seed + 1))
    elif plc_model_path.endswith(".npz"):
        from ..weights.checkpoint import load_checkpoint
        plc_params, _ = load_checkpoint(plc_model_path)
    else:
        from ..weights.aux_arrays import load_plc_blob
        with open(plc_model_path, "rb") as f:
            plc_params = load_plc_blob(f.read())
    return PLC(fused, cfg, plc_params, options=flags, batch=batch)


def run_plc_stream(plc: PLC, pcm: np.ndarray, losses: np.ndarray) -> np.ndarray:
    """pcm [N*160] single stream; losses: one 0/1 flag per 20 ms (2 frames).

    Returns concealed output [N*160] (plus 5 ms tail for non-causal modes,
    matching the demo's skip/extra handling)."""
    n_frames = len(pcm) // FRAME_SIZE
    skip = 80 if plc.non_causal else 0
    out = []
    loss = 0
    for k in range(n_frames):
        frame = pcm[k * FRAME_SIZE:(k + 1) * FRAME_SIZE].astype(np.float32)[None]
        if k % 2 == 0:
            loss = int(losses[k // 2]) if (k // 2) < len(losses) else 0
        if loss:
            res = plc.conceal()
        else:
            res = plc.update(frame)
        res = res[0]
        out.append(res[skip:])
        skip = 0
    if plc.non_causal:
        out.append(plc.conceal()[0][:80])
    return np.concatenate(out)


def run_plc_fec_stream(plc: PLC, pcm: np.ndarray, losses: np.ndarray,
                       fec_packets) -> np.ndarray:
    """PLC with FEC redundancy: before concealing packet k, queue that
    packet's redundancy features (lpcnet_plc_fec_add semantics,
    src/lpcnet_plc.c:111-132) so _get_fec_or_pred uses real features
    instead of predictions.

    fec_packets: list (per 20 ms packet) of [2, >=20] feature arrays, e.g.
    DRED-decoded redundancy from dred.coder / a .fec file
    (dred.fec_file.read_fec_packets). The queue is time-indexed (the read
    position advances one entry per received frame, src/lpcnet_plc.c:218-223)
    so every packet's features are queued as they become available; which
    later packet would carry them over the wire is the transport's concern,
    as in the reference.
    """
    n_frames = len(pcm) // FRAME_SIZE
    out = []
    loss = 0
    for k in range(n_frames):
        frame = pcm[k * FRAME_SIZE:(k + 1) * FRAME_SIZE].astype(np.float32)[None]
        if k % 2 == 0:
            pkt = k // 2
            loss = int(losses[pkt]) if pkt < len(losses) else 0
            if fec_packets is not None and pkt < len(fec_packets):
                for row in np.asarray(fec_packets[pkt], np.float32):
                    plc.fec_add(row[None])
        res = plc.conceal() if loss else plc.update(frame)
        out.append(res[0])
    return np.concatenate(out)


def run_plc_file(options: str, percent_or_file: str, in_path: str,
                 out_path: str, model_path=None, plc_model_path=None):
    pcm = np.fromfile(in_path, dtype=np.int16)
    n_packets = len(pcm) // (2 * FRAME_SIZE) + 1
    try:
        percent = float(percent_or_file)
        rng = np.random.RandomState(0)
        losses = (rng.rand(n_packets) < percent / 100.0).astype(np.int32)
    except ValueError:
        losses = np.loadtxt(percent_or_file, dtype=np.int32).reshape(-1)
    if plc_model_path is None:
        # mirror the reference demo's built-in plc_data default
        import os as _os
        demo = _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), "data", "demo_plc_model.npz")
        if _os.path.exists(demo):
            plc_model_path = demo
    plc = make_plc(options, model_path=model_path,
                   plc_model_path=plc_model_path)
    out = run_plc_stream(plc, pcm, losses)
    out.astype(np.int16).tofile(out_path)
    print(f"plc: {len(pcm)//320} packets, {int(losses[:len(pcm)//320].sum())} lost")
