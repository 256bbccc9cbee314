"""Parity tests for interpolation ops against the torch oracle.

The reference model's numerics hinge on exact PyTorch F.interpolate
semantics (align_corners True/False, bilinear/trilinear) and the odd-dim
scale_dimension rule (SURVEY.md §7, hard part #4).
"""

import numpy as np
import pytest

from conftest import requires_torch
from leastereo_tpu.ops import resize2d, resize3d, scale_dimension

pytestmark = pytest.mark.quick  # sub-2-minute ops/data tier


def _rand(*shape):
    rng = np.random.RandomState(sum(shape))
    return rng.randn(*shape).astype(np.float32)


@requires_torch
@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize(
    "in_hw,out_hw",
    [
        ((32, 48), (64, 96)),
        ((64, 96), (32, 48)),
        ((17, 23), (33, 45)),  # odd dims
        ((16, 24), (48, 72)),  # 3x (disparity head)
        ((31, 47), (16, 24)),
    ],
)
def test_resize2d_matches_torch(align, in_hw, out_hw):
    import torch
    import torch.nn.functional as F

    x = _rand(2, *in_hw, 5)  # NHWC
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))  # NCHW
    want = (
        F.interpolate(xt, out_hw, mode="bilinear", align_corners=align)
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    got = np.asarray(resize2d(x, out_hw, align_corners=align))
    # torch computes source coords in fp32; we use fp64 (strictly more
    # accurate) -> allow a few e-5 of divergence.
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@requires_torch
@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize(
    "in_dhw,out_dhw",
    [
        ((8, 12, 16), (16, 24, 32)),
        ((16, 24, 32), (8, 12, 16)),
        ((7, 11, 13), (13, 21, 25)),  # odd dims
        ((16, 12, 16), (48, 36, 48)),  # 3x trilinear (disparity head)
    ],
)
def test_resize3d_matches_torch(align, in_dhw, out_dhw):
    import torch
    import torch.nn.functional as F

    x = _rand(1, *in_dhw, 3)  # NDHWC
    xt = torch.from_numpy(x.transpose(0, 4, 1, 2, 3))  # NCDHW
    want = (
        F.interpolate(xt, out_dhw, mode="trilinear", align_corners=align)
        .numpy()
        .transpose(0, 2, 3, 4, 1)
    )
    got = np.asarray(resize3d(x, out_dhw, align_corners=align))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_scale_dimension_reference_rule():
    # reference retrain/new_model_2d.py:38-39
    assert scale_dimension(64, 0.5) == 32
    assert scale_dimension(65, 0.5) == 33
    assert scale_dimension(33, 2) == 65
    assert scale_dimension(32, 2) == 64
    assert scale_dimension(1, 0.5) == 1


