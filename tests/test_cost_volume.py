"""Cost-volume and soft-argmin parity tests (torch-free golden reference)."""

import numpy as np
import pytest

from conftest import requires_torch
from leastereo_tpu.ops import build_cost_volume, soft_argmin


def _naive_cost_volume(left, right, num_disp):
    """Direct transliteration of reference retrain/LEAStereo.py:36-48 in numpy
    (NCHW there; we compare in NDHWC)."""
    b, h, w, c = left.shape
    vol = np.zeros((b, num_disp, h, w, 2 * c), np.float32)
    for d in range(num_disp):
        if d > 0:
            vol[:, d, :, d:, :c] = left[:, :, d:]
            vol[:, d, :, d:, c:] = right[:, :, :-d]
        else:
            vol[:, d, :, :, :c] = left
            vol[:, d, :, :, c:] = right
    return vol


def test_cost_volume_matches_reference_semantics():
    rng = np.random.RandomState(0)
    left = rng.randn(2, 6, 20, 4).astype(np.float32)
    right = rng.randn(2, 6, 20, 4).astype(np.float32)
    want = _naive_cost_volume(left, right, 8)
    got = np.asarray(build_cost_volume(left, right, 8))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@requires_torch
def test_soft_argmin_matches_torch_disp_head():
    """Parity with reference Disp.forward (models/build_model_2d.py:52-57):
    trilinear align_corners=False upsample -> softmin -> expectation."""
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(1)
    maxdisp = 24
    d, h, w = maxdisp // 3, 6, 9
    cost = rng.randn(2, d, h, w, 1).astype(np.float32)

    xt = torch.from_numpy(cost[..., 0][:, None])  # (B,1,D,h,w)
    xt = F.interpolate(xt, [maxdisp, h * 3, w * 3], mode="trilinear", align_corners=False)
    xt = xt.squeeze(1)
    p = torch.nn.Softmin(dim=1)(xt)
    disp = torch.arange(0, maxdisp, dtype=torch.float32).reshape(1, maxdisp, 1, 1)
    want = torch.sum(p * disp, 1).numpy()

    got = np.asarray(soft_argmin(cost, maxdisp))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
