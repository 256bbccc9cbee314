"""Cost-volume and soft-argmin parity tests (torch-free golden reference)."""

import numpy as np
import pytest

from conftest import requires_torch
from leastereo_tpu.ops import build_cost_volume, soft_argmin

pytestmark = pytest.mark.quick  # sub-2-minute ops/data tier


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


def test_soft_argmin_fast_characterization():
    """Serving-mode error bound vs parity mode on trained-like cost volumes.

    ``soft_argmin_fast`` reorders softmin before the 3x upsample with the
    analytic ``3*E + 1`` disparity-axis fold (the +1 is the align_corners=
    False phase offset; without it the mode carries a systematic ~1 px bias).
    On sharp unimodal cost valleys — the shape a trained matching net
    produces — the modes agree to well under half a pixel.
    """
    from leastereo_tpu.ops import soft_argmin_fast

    rng = np.random.RandomState(0)
    maxdisp, d, h, w = 192, 64, 40, 60
    yy, xx = np.mgrid[0:h, 0:w]
    mu3 = (20 + 25 * np.sin(yy / 7.0) * np.cos(xx / 9.0) + 10 * (xx / w)) / 3.0
    dgrid = np.arange(d).reshape(d, 1, 1)
    for sharpness, bound in ((0.5, 0.15), (1.5, 0.3), (4.0, 0.8)):
        cost = sharpness * np.abs(dgrid - mu3[None]) + 0.05 * rng.randn(d, h, w)
        cost = cost[None, ..., None].astype(np.float32)
        p = np.asarray(soft_argmin(cost, maxdisp))
        f = np.asarray(soft_argmin_fast(cost, maxdisp))
        err = np.abs(p - f)
        assert err.mean() < bound / 2, (sharpness, err.mean())
        assert err.max() < bound, (sharpness, err.max())
