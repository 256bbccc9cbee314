"""Offline augmentation + tools tests (pure numpy, fast)."""

import numpy as np
import pytest

from leastereo_tpu.data.augment import (
    forward_warp_right,
    hflip_sample,
    new_tagil_pipeline,
    random_crop_sample,
    satellite_pipeline,
    scale_sample,
    shift_sample,
    vflip_sample,
    warp_right_from_right,
)
from leastereo_tpu.data.tools import aggregate_metrics

pytestmark = pytest.mark.quick  # sub-2-minute ops/data tier


def _sample(h=20, w=30, rng=None):
    rng = rng or np.random.RandomState(0)
    return {
        "name": "s0",
        "left": rng.rand(h, w).astype(np.float32) * 255,
        "right": rng.rand(h, w).astype(np.float32) * 255,
        "displ": (rng.rand(h, w) * 10 + 5).astype(np.float32),
        "dispr": (rng.rand(h, w) * 10 + 5).astype(np.float32),
        "disp0l": (rng.rand(h, w) * 10 + 5).astype(np.float32),
        "disp0r": (rng.rand(h, w) * 10 + 5).astype(np.float32),
    }


def test_hflip_swaps_views_and_disps():
    s = _sample()
    f = hflip_sample(s)
    np.testing.assert_array_equal(f["left"], s["right"][:, ::-1])
    np.testing.assert_array_equal(f["displ"], s["dispr"][:, ::-1])
    # involution
    np.testing.assert_array_equal(hflip_sample(f)["left"], s["left"])


def test_vflip_involution():
    s = _sample()
    np.testing.assert_array_equal(vflip_sample(vflip_sample(s))["left"], s["left"])


@pytest.mark.parametrize("shift", [4, -4])
def test_shift_adjusts_disparity(shift):
    s = _sample()
    out = shift_sample(s, shift)
    assert out["left"].shape[1] == 30 - abs(shift)
    # disparity offset by shift
    if shift > 0:
        np.testing.assert_allclose(out["displ"], s["displ"][:, :-shift] + shift)
        np.testing.assert_array_equal(out["right"], s["right"][:, shift:])
    else:
        np.testing.assert_allclose(out["displ"], s["displ"][:, -shift:] + shift)
        np.testing.assert_array_equal(out["right"], s["right"][:, :shift])


def test_scale_rescales_disparity_values():
    s = _sample()
    out = scale_sample(s, 2.0)
    assert out["left"].shape == (40, 60)
    # disparity values doubled (nearest + x2, rounded)
    assert abs(out["displ"].mean() - 2 * s["displ"].mean()) < 1.0


def test_random_crop_synchronized():
    s = _sample()
    rng = np.random.default_rng(0)
    c = random_crop_sample(s, (8, 12), rng)
    assert c["left"].shape == (8, 12) and c["displ"].shape == (8, 12)


def test_forward_warp_identity_at_zero_disparity():
    rng = np.random.RandomState(1)
    img = rng.rand(6, 10).astype(np.float32)
    out = forward_warp_right(img, np.zeros((6, 10)))
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_forward_warp_constant_shift():
    img = np.tile(np.arange(10, dtype=np.float32)[None], (4, 1))
    out = forward_warp_right(img, np.full((4, 10), 2.0))
    # column x receives source x+2; rightmost 2 columns unhit -> 0
    np.testing.assert_allclose(out[:, :8], img[:, 2:])
    np.testing.assert_allclose(out[:, 8:], 0)


def test_warp_right_from_right_drops_right_disp():
    s = _sample()
    out = warp_right_from_right(s, 1.2)
    assert np.isnan(out["dispr"]).all()
    assert np.isfinite(out["displ"]).all()
    np.testing.assert_allclose(out["disp0l"], np.round(s["disp0l"] * 1.2))


def test_new_tagil_pipeline_yields_crops():
    rng = np.random.default_rng(0)
    outs = list(new_tagil_pipeline([_sample(60, 90)], rng, crop_hw=(16, 24), n_crops=3))
    assert len(outs) == 3
    for o in outs:
        assert o["left"].shape == (16, 24)


def test_satellite_pipeline_amplifies():
    rng = np.random.default_rng(0)
    s = {
        "name": "x",
        "left": np.random.RandomState(0).randint(0, 255, (40, 60, 3)).astype(np.uint8),
        "right": np.random.RandomState(1).randint(0, 255, (40, 60, 3)).astype(np.uint8),
        "displ": np.random.RandomState(2).randint(0, 50, (40, 60)).astype(np.uint8),
        "dispr": np.random.RandomState(3).randint(0, 50, (40, 60)).astype(np.uint8),
    }
    outs = list(satellite_pipeline([s], rng, crop_hw=(16, 24), n_iter=4))
    assert len(outs) == 4
    assert all(o["left"].shape == (16, 24, 3) for o in outs)
    assert all(o["left"].dtype == np.uint8 for o in outs)


def test_aggregate_metrics(tmp_path):
    for i, epe in enumerate([1.0, 3.0]):
        (tmp_path / f"s{i}_metrics.txt").write_text(f"epe: {epe}\nbad3: {0.1 * (i + 1)}\n")
    avg = aggregate_metrics(str(tmp_path))
    assert avg["epe"] == 2.0
    assert abs(avg["bad3"] - 0.15) < 1e-9


def test_convert_new_tagil(tmp_path):
    """Flatten <area>/<tile>/epi trees; incomplete samples skipped
    (reference dataloaders/new_tagil_convert.py)."""
    import os

    from leastereo_tpu.data.tools import NEW_TAGIL_REQUIRED, convert_new_tagil

    src = tmp_path / "raw"
    for area, tile, complete in (("a1", "t1", True), ("a1", "t2", False), ("a2", "t9", True)):
        epi = src / area / tile / "epi"
        epi.mkdir(parents=True)
        files = sorted(NEW_TAGIL_REQUIRED) if complete else ["img_L.tif"]
        for fn in files:
            (epi / fn).write_bytes(b"x")
    out = tmp_path / "flat"
    assert convert_new_tagil(str(src), str(out)) == 2
    assert sorted(os.listdir(out)) == ["a1_t1", "a2_t9"]
    assert set(os.listdir(out / "a1_t1")) == set(NEW_TAGIL_REQUIRED)


def test_harvest_midd_eval_logs(tmp_path):
    """Harvest midd_eval logs into a summary file
    (reference utils/new_tagil_valids.py)."""
    from leastereo_tpu.data.tools import harvest_midd_eval_logs

    src = tmp_path / "raw"
    good = src / "a1" / "t1"
    good.mkdir(parents=True)
    (good / "60_midd_eval.log").write_text(
        "run\nvis% d_err% o_err% t_err% mean_err\n93.0 1.1 2.2 3.3 4.4\n"
    )
    bad = src / "a1" / "t2"
    bad.mkdir(parents=True)
    (bad / "60_midd_eval.log").write_text("run\nunexpected header\n1 2 3 4 5\n")
    (src / "a2" / "t3").mkdir(parents=True)  # no log at all

    out_file = tmp_path / "metrics.txt"
    res = harvest_midd_eval_logs(str(src), str(out_file))
    assert res == {"a1_t1": (1.1, 2.2, 3.3, 4.4)}
    assert out_file.read_text() == "a1_t1 1.1 2.2 3.3 4.4\n"


def test_render_new_tagil_previews(tmp_path):
    """8-bit preview renders (reference dataloaders/new_tagil_render.py):
    images rescaled to [0, 250], disparity to [30, 250] with NaN -> 0."""
    from PIL import Image

    from leastereo_tpu.data.tools import render_new_tagil_previews

    src = tmp_path / "ds" / "sample_000"
    src.mkdir(parents=True)
    rng = np.random.RandomState(0)
    img = (rng.rand(8, 8) * 4000).astype(np.uint16)
    Image.fromarray(img).save(src / "img_L.tif")
    Image.fromarray(img.T.copy()).save(src / "img_R.tif")
    disp = rng.rand(8, 8).astype(np.float32) * 50
    disp[0, 0] = np.nan
    Image.fromarray(disp).save(src / "disp_L_lidar0.tif")

    out = tmp_path / "renders"
    n = render_new_tagil_previews(str(tmp_path / "ds"), str(out))
    assert n == 3
    rl = np.asarray(Image.open(out / "sample_000_render_img_L.png"))
    assert rl.dtype == np.uint8 and rl.min() == 0 and rl.max() == 250
    rd = np.asarray(Image.open(out / "sample_000_render_disp_L_lidar0.png"))
    assert rd[0, 0] == 0  # NaN rendered black
    assert rd.max() == 250 and rd[rd > 0].min() >= 30

    # List filtering: an empty list renders nothing.
    lst = tmp_path / "keep.list"
    lst.write_text("other_sample\n")
    assert render_new_tagil_previews(str(tmp_path / "ds"), str(out), str(lst)) == 0


def test_metric_logger_tensorboard(tmp_path):
    """--tensorboard writes standard TB event files next to the JSONL."""
    pytest.importorskip("tensorboardX")
    from leastereo_tpu.cli.common import MetricLogger

    log = MetricLogger(str(tmp_path), tensorboard=True)
    log.log(0, loss=1.5, epe=2.0)
    log.log(1, loss=1.2, epe=1.8)
    log.close()
    assert (tmp_path / "metrics.jsonl").exists()
    events = [p for p in tmp_path.iterdir() if "tfevents" in p.name]
    assert events and events[0].stat().st_size > 0
