"""End-to-end numeric parity against the actual reference implementation.

Imports the reference PyTorch model from /root/reference (read-only oracle —
never copied), initializes it with random weights, converts the state_dict
into this framework via ``import_torch_state_dict``, and compares the full
disparity output. This is the strongest correctness check we have: it covers
stems, cells, resizes, cost volume, matching net, skips, and the disparity
head in one number.
"""

import sys
import types

import numpy as np
import pytest

from conftest import REFERENCE, requires_reference

MAXDISP = 48
H, W = 48, 96


def _reference_args():
    return types.SimpleNamespace(
        maxdisp=MAXDISP,
        fea_num_layers=6,
        fea_filter_multiplier=8,
        fea_block_multiplier=4,
        fea_step=3,
        mat_num_layers=12,
        mat_filter_multiplier=8,
        mat_block_multiplier=4,
        mat_step=3,
        net_arch_fea=str(REFERENCE / "run/sceneflow/best/architecture/feature_network_path.npy"),
        cell_arch_fea=str(REFERENCE / "run/sceneflow/best/architecture/feature_genotype.npy"),
        net_arch_mat=str(REFERENCE / "run/sceneflow/best/architecture/matching_network_path.npy"),
        cell_arch_mat=str(REFERENCE / "run/sceneflow/best/architecture/matching_genotype.npy"),
        cuda=False,
    )


@pytest.fixture(scope="module")
def oracle():
    """Run the reference model on CPU and capture (input, output, state_dict)."""
    import torch

    sys.path.insert(0, str(REFERENCE))
    from retrain.LEAStereo import LEAStereo as RefLEAStereo

    torch.manual_seed(0)
    model = RefLEAStereo(_reference_args(), device="cpu")

    rng = np.random.RandomState(42)
    left = rng.randn(1, 3, H, W).astype(np.float32)
    right = rng.randn(1, 3, H, W).astype(np.float32)

    # Random-init BN running stats (mean 0 / var 1) make the matching costs
    # explode to ~1e8, collapsing softmin into an argmin whose ties amplify
    # fp noise. Adopt batch statistics as running stats (momentum=1 + one
    # train-mode pass) so magnitudes look like a trained network.
    for m in model.modules():
        if isinstance(m, torch.nn.modules.batchnorm._BatchNorm):
            m.momentum = 1.0
    model.train()
    with torch.no_grad():
        model(torch.from_numpy(left), torch.from_numpy(right))
    model.eval()
    with torch.no_grad():
        disp = model(torch.from_numpy(left), torch.from_numpy(right)).numpy()
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return left, right, disp, state


@requires_reference
def test_full_model_parity(oracle):
    left, right, want, state = oracle

    import jax
    import jax.numpy as jnp

    from leastereo_tpu.models import LEAStereoConfig, best_sceneflow_model
    from leastereo_tpu.utils.torch_convert import import_torch_state_dict

    cfg = LEAStereoConfig(maxdisp=MAXDISP, compute_dtype="float32")
    model = best_sceneflow_model(cfg)
    jl = jnp.asarray(left.transpose(0, 2, 3, 1))
    jr = jnp.asarray(right.transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), jl, jl)
    variables = import_torch_state_dict(variables, state)

    got = np.asarray(model.apply(variables, jl, jr))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
