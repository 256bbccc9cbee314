"""Numeric oracle for the searchable supernet vs the actual reference.

Imports the reference search-stage model (``models/build_model.py:AutoStereo``,
read-only oracle — never copied), loads its random-init weights into our
``AutoStereoSupernet`` via a name mapping, and compares the full train-mode
forward. This validates the trellis (beta rows, branch weighting, cell DAG,
4-level fusion) against the reference single-device path
(``build_model_2d.py:169-418``, ``build_model_3d.py:129-364``).

The one documented reference bug on this path — layer 1 reads
``betas[1][1][2]`` for the level-6 same-level branch where the trellis
pattern calls for ``[1][1][1]`` (``build_model_2d.py:213``,
``build_model_3d.py:213``; SURVEY.md "Known reference bugs") — is
neutralized by pinning ``betas[1,1,1] == betas[1,1,2]`` in the oracle's
parameters, so both indexings read the same normalized value and every other
weight stays random. The comparison runs in train mode (BN batch statistics)
— the mode the bilevel search actually runs in — which also sidesteps
running-stat accumulation-order differences.
"""

import sys
import types

import numpy as np
import pytest

from conftest import REFERENCE, requires_reference, requires_torch

# Small-but-structurally-complete config: 4 layers hits every trellis branch
# (layer 0/1/2/>=3 patterns, all four levels, the layer-1 bug site) on both
# the 2D and 3D supernets.
FEA_LAYERS, MAT_LAYERS = 4, 4
FILTER, BLOCK, STEPS = 2, 4, 3
MAXDISP = 48
H, W = 48, 96


def _cell_counts(num_layers):
    return [2 if l == 0 else 3 if l == 1 else 4 for l in range(num_layers)]


def _flat_cell_index(num_layers, layer, level):
    """Reference appends cells per layer in increasing-level order
    (build_model_2d.py:85-174)."""
    return sum(_cell_counts(num_layers)[:layer]) + level


def _torch_key(path):
    """Map one flax variable path (module part) to the reference tensor name."""
    net, *mods = path
    num_layers = FEA_LAYERS if net == "feature" else MAT_LAYERS
    out = [net]
    for p in mods:
        if p.startswith("cell_"):
            layer, level = map(int, p[5:].split("_"))
            out.append(f"cells.{_flat_cell_index(num_layers, layer, level)}")
        elif p.startswith("op_") and p.endswith("_conv"):
            # op_{e}_conv -> _ops.{e}._ops.1 (PRIMITIVES index 1 = conv_3x3;
            # index 0 = parameterless skip_connect).
            out.append(f"_ops.{p[3:-5]}._ops.1")
        else:
            out.append(p)
    return ".".join(out)


@pytest.fixture(scope="module")
def oracle():
    import torch

    sys.path.insert(0, str(REFERENCE))
    from models.build_model import AutoStereo as RefAutoStereo

    torch.manual_seed(7)
    model = RefAutoStereo(
        "cpu",
        maxdisp=MAXDISP,
        Fea_Layers=FEA_LAYERS,
        Fea_Filter=FILTER,
        Fea_Block=BLOCK,
        Fea_Step=STEPS,
        Mat_Layers=MAT_LAYERS,
        Mat_Filter=FILTER,
        Mat_Block=BLOCK,
        Mat_Step=STEPS,
    )
    with torch.no_grad():
        # Keep arch weights random but non-degenerate, then neutralize the
        # layer-1 beta-index bug site (see module docstring).
        for sub in (model.feature, model.matching):
            sub.alphas.mul_(300.0)  # 1e-3-scale init -> meaningfully mixed ops
            sub.betas.mul_(300.0)
            sub.betas[1, 1, 1] = sub.betas[1, 1, 2]

    rng = np.random.RandomState(3)
    left = rng.randn(1, 3, H, W).astype(np.float32)
    right = rng.randn(1, 3, H, W).astype(np.float32)

    model.train()
    # The reference forward hardcodes ``.cuda()`` on its normalized_betas
    # scratch tensor (build_model_2d.py:194); neutralize for the CPU oracle.
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        with torch.no_grad():
            disp = model(torch.from_numpy(left), torch.from_numpy(right)).numpy()
    finally:
        torch.Tensor.cuda = orig_cuda
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return left, right, disp, state


@requires_reference
@requires_torch
def test_supernet_forward_matches_reference(oracle):
    left, right, want, state = oracle

    import flax
    import jax
    import jax.numpy as jnp

    from leastereo_tpu.search.supernet import AutoStereoSupernet, SupernetConfig
    from leastereo_tpu.utils.torch_convert import _convert

    model = AutoStereoSupernet(
        maxdisp=MAXDISP,
        fea=SupernetConfig(FEA_LAYERS, FILTER, BLOCK, STEPS),
        mat=SupernetConfig(MAT_LAYERS, FILTER, BLOCK, STEPS),
        dtype=jnp.float32,
    )
    l = jnp.asarray(left.transpose(0, 2, 3, 1))
    r = jnp.asarray(right.transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), l, r, train=True)

    flat = flax.traverse_util.flatten_dict(variables)
    consumed = set()
    out = {}
    for path, value in flat.items():
        collection, *mods, leaf = path
        if collection != "params":
            out[path] = value  # BN running stats: unused in train mode
            continue
        if leaf in ("alphas", "betas"):
            name = f"{mods[0]}.{leaf}" if mods else leaf
        else:
            prefix = _torch_key(tuple(mods[:-1]))
            if mods[-1] == "conv":
                name = f"{prefix}.conv.weight"
            else:
                name = f"{prefix}.bn." + ("weight" if leaf == "scale" else "bias")
        assert name in state, f"oracle state_dict has no {name!r} for {path}"
        consumed.add(name)
        out[path] = jnp.asarray(_convert(name, state[name], value.shape))
    variables = flax.traverse_util.unflatten_dict(out)

    # Every reference *weight* tensor must have landed somewhere (running
    # stats and the num_batches_tracked counters are train-mode no-ops).
    unused = {
        k
        for k in state
        if k not in consumed
        and "running_" not in k
        and "num_batches_tracked" not in k
        # Reference ConvBR allocates self.bn even with bn=False; last_3's BN
        # params are dead weights (operations_2d.py:36-46).
        and ".last_3.bn." not in k
    }
    assert not unused, f"reference tensors not mapped: {sorted(unused)[:8]}"

    got, _ = jax.jit(
        lambda v, a, b: model.apply(v, a, b, train=True, mutable=["batch_stats"])
    )(variables, l, r)
    got = np.asarray(got)

    assert got.shape == want.shape, (got.shape, want.shape)
    err = np.abs(got - want)
    assert float(err.max()) < 2e-2, f"max |Δdisp| = {err.max():.4f} px"
    assert float(err.mean()) < 2e-3, f"mean |Δdisp| = {err.mean():.5f} px"
