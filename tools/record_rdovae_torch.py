#!/usr/bin/env python3
"""Record a torch-RDO-VAE interchange fixture from the REFERENCE model.

Builds the reference's torch RDOVAE (torch/rdovae/rdovae/rdovae.py) with
random weights, runs its CoreEncoder / CoreDecoder / StatisticalModel on
random inputs, and saves the state dict + inputs + outputs to
tests/fixtures/rdovae_torch.npz. tests/test_rdovae_import.py then gates
weights/rdovae_import.py's conversion against these goldens (same recording
pattern as tools/cref/gen_nn_fixtures.py for the C sources).

Run from the repo root with /root/reference present:
    python tools/record_rdovae_torch.py
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = os.environ.get("LPCNET_REFERENCE", "/root/reference")


def main():
    sys.path.insert(0, os.path.join(REF, "torch", "rdovae", "rdovae"))
    import torch
    from rdovae import RDOVAE  # the reference module, for golden recording

    torch.manual_seed(0)
    # small-but-default-shaped model; quant_levels=16 matches the DRED C
    # tables' level count used elsewhere in this repo
    model = RDOVAE(20, 80, 16, 256, 256, state_dim=24)
    with torch.no_grad():
        # the reference zeros the quant embedding at init; randomize it so
        # the statistical-model fixture is non-trivial
        model.statistical_model.quant_embedding.weight[:] = (
            0.1 * torch.randn_like(model.statistical_model.quant_embedding.weight))

    rng = np.random.RandomState(1)
    b, t = 3, 16                       # t features -> t/2 latent steps
    features = rng.randn(b, t, 20).astype(np.float32) * 0.5
    z_in = rng.randn(b, t // 4, 80).astype(np.float32)
    init_state = np.tanh(rng.randn(b, 1, 24).astype(np.float32))
    q_ids = rng.randint(0, 16, (b, t // 2)).astype(np.int64)

    enc = model.core_encoder.module
    dec = model.core_decoder.module
    with torch.no_grad():
        z, states = enc(torch.from_numpy(features))
        dec_out = dec(torch.from_numpy(z_in), torch.from_numpy(init_state))
        stats = model.statistical_model(torch.from_numpy(q_ids))

    out = {
        "features": features, "z_in": z_in,
        "init_state": init_state[:, 0], "q_ids": q_ids.astype(np.int32),
        "enc_z": z.numpy(), "enc_states": states.numpy(),
        "dec_out": dec_out.numpy(),
        "stats_quant_scale": stats["quant_scale"].numpy(),
        "stats_r_hard": stats["r_hard"].numpy(),
        "stats_theta_hard": stats["theta_hard"].numpy(),
        "stats_dead_zone": stats["dead_zone"].numpy(),
    }
    for k, v in model.state_dict().items():
        out["sd." + k] = v.numpy()
    path = os.path.join(REPO, "tests", "fixtures", "rdovae_torch.npz")
    np.savez_compressed(path, **out)
    print("wrote", path, f"({len(out)} arrays)")


if __name__ == "__main__":
    main()
