"""Data-layer tests: PFM IO, transform parity with the reference numpy code,
synthetic-fixture dataset loading, and the batching pipeline."""

import importlib.util
import os
import sys

import numpy as np
import pytest

from conftest import REFERENCE, has_reference

from leastereo_tpu.data import test_transform as eval_transform
from leastereo_tpu.data import (

    PAD_DISP_SENTINEL,
    StereoListDataset,
    batch_iterator,
    build_satellite_lists,
    build_sceneflow_lists,
    make_loader,
    read_pfm,
    standardize_stack,
    train_transform,
    write_pfm,
)


# ---------------------------------------------------------------- PFM ------


pytestmark = pytest.mark.quick  # sub-2-minute ops/data tier

def test_pfm_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    img = rng.randn(13, 17).astype(np.float32)
    p = tmp_path / "x.pfm"
    write_pfm(p, img)
    np.testing.assert_array_equal(read_pfm(p), img)


@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
def test_pfm_matches_reference_reader():
    ref = (
        REFERENCE
        / "dataset/sceneflow_part/disparity/35mm_forward_fast/left/0001.pfm"
    )
    got = read_pfm(ref)

    spec = importlib.util.spec_from_file_location(
        "ref_common", REFERENCE / "dataloaders/datasets/common.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    want, h, w = mod.read_pfm(str(ref))
    assert got.shape == (h, w)
    np.testing.assert_array_equal(got, want)


# ----------------------------------------------------------- transforms ----


def _ref_common():
    spec = importlib.util.spec_from_file_location(
        "ref_common2", REFERENCE / "dataloaders/datasets/common.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _random_stack(rng, h, w):
    stack = np.zeros((8, h, w), np.float32)
    stack[:6] = rng.randn(6, h, w)
    stack[6] = rng.rand(h, w) * 100
    stack[7] = rng.rand(h, w) * 100
    return stack


def test_standardize_stack_parity():
    if not has_reference():
        pytest.skip("reference not mounted")
    mod = _ref_common()
    rng = np.random.RandomState(0)
    left = rng.randint(0, 255, (20, 30, 3)).astype(np.float32)
    right = rng.randint(0, 255, (20, 30, 3)).astype(np.float32)
    want = np.zeros((8, 20, 30), np.float32)
    mod.set_rgb_layers(want, left, right)
    got = standardize_stack(left, right)
    np.testing.assert_allclose(got[:6], want[:6], rtol=1e-5, atol=1e-5)


def test_test_transform_pad_sentinel():
    rng = np.random.RandomState(1)
    stack = _random_stack(rng, 10, 12)
    left, right, disp = eval_transform(stack, 16, 20)
    assert left.shape == (16, 20, 3) and disp.shape == (16, 20)
    # Padded region carries the sentinel; content is bottom-right aligned.
    assert (disp[:6, :] == PAD_DISP_SENTINEL).all()
    assert (disp[:, :8] == PAD_DISP_SENTINEL).all()
    np.testing.assert_array_equal(disp[6:, 8:], stack[6])
    np.testing.assert_array_equal(left[6:, 8:], stack[0:3].transpose(1, 2, 0))


@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
def test_test_transform_parity_centercrop():
    mod = _ref_common()
    rng = np.random.RandomState(2)
    stack = _random_stack(rng, 50, 60)
    for use_left in (True, False):
        l1, r1, t1 = eval_transform(stack.copy(), 32, 40, use_left=use_left)
        l2, r2, t2 = mod.test_transform(stack.copy(), 32, 40, use_left=use_left)
        np.testing.assert_array_equal(l1, l2.transpose(1, 2, 0))
        np.testing.assert_array_equal(r1, r2.transpose(1, 2, 0))
        np.testing.assert_array_equal(t1, t2[0])


def test_train_transform_shift_math():
    """The x-jitter crops left/target at start_x+shift_x, right at start_x,
    and corrects the disparity by -shift_x (reference common.py:60-70)."""
    h, w, ch, cw, shift = 40, 60, 24, 32, 5
    # Disparity plane encodes the column index so we can read off the shift.
    stack = np.zeros((8, h, w), np.float32)
    stack[6] = np.arange(w)[None, :]
    stack[0] = np.arange(w)[None, :]  # left R channel encodes column too
    stack[3] = np.arange(w)[None, :]
    rng = np.random.default_rng(123)
    left, right, disp = train_transform(stack, ch, cw, rng, shift=shift)
    # left column ids minus right column ids give shift_x everywhere
    shift_x = int(left[0, 0, 0] - right[0, 0, 0])
    assert -shift <= shift_x <= shift
    # disparity was decremented by shift_x: stored col id - shift_x
    np.testing.assert_array_equal(disp[0], left[0, :, 0] - shift_x)


def test_train_transform_right_branch_uses_right_disp():
    h, w = 20, 30
    stack = _random_stack(np.random.RandomState(3), h, w)
    rng = np.random.default_rng(0)
    left, right, disp = train_transform(stack, h, w, rng, use_left=False)
    # whole-frame crop: swapped views, right disparity channel
    np.testing.assert_array_equal(left, stack[3:6].transpose(1, 2, 0))
    np.testing.assert_array_equal(right, stack[0:3].transpose(1, 2, 0))
    np.testing.assert_array_equal(disp, stack[7])


def test_train_transform_determinism():
    stack = _random_stack(np.random.RandomState(4), 40, 50)
    a = train_transform(stack, 24, 24, np.random.default_rng(7), shift=3)
    b = train_transform(stack, 24, 24, np.random.default_rng(7), shift=3)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


# ------------------------------------------------- synthetic fixtures ------


def _make_sceneflow_tree(root, scenes=("TRAIN/A/0001",), names=("0001", "0002")):
    from PIL import Image

    rng = np.random.RandomState(0)
    rels = []
    for scene in scenes:
        for sub in ("left", "right"):
            os.makedirs(root / "frames_finalpass" / scene / sub, exist_ok=True)
            os.makedirs(root / "disparity" / scene / sub, exist_ok=True)
        for name in names:
            for sub in ("left", "right"):
                img = rng.randint(0, 255, (24, 36, 3)).astype(np.uint8)
                Image.fromarray(img).save(
                    root / "frames_finalpass" / scene / sub / f"{name}.png"
                )
                write_pfm(
                    root / "disparity" / scene / sub / f"{name}.pfm",
                    rng.rand(24, 36).astype(np.float32) * 30,
                )
            rels.append(f"frames_finalpass/{scene}/left/{name}.png")
    return rels


def test_sceneflow_dataset_end_to_end(tmp_path):
    rels = _make_sceneflow_tree(tmp_path)
    list_file = tmp_path / "train.list"
    list_file.write_text("".join(r + "\n" for r in rels))
    ds = StereoListDataset(
        "sceneflow", str(list_file), root=str(tmp_path), crop_size=(16, 24), shift=2
    )
    assert len(ds) == 2
    s = ds[0]
    assert s.left.shape == (16, 24, 3)
    assert s.disparity.shape == (16, 24)
    assert np.isfinite(s.left).all()

    # Eval mode pads when undersized
    ds_eval = StereoListDataset(
        "sceneflow", str(list_file), root=str(tmp_path), crop_size=(32, 48), training=False
    )
    assert (ds_eval[0].disparity[:8, :] == PAD_DISP_SENTINEL).all()


def test_satellite_loader(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(0)
    d = tmp_path / "sample0"
    d.mkdir()
    for n in ("satiml.png", "satimr.png"):
        Image.fromarray(rng.randint(0, 255, (16, 20, 3)).astype(np.uint8)).save(d / n)
    # disparity png: gray = disparity value, colored = occlusion
    disp = np.zeros((16, 20, 3), np.uint8)
    disp[..., :] = 7  # gray 7 everywhere
    disp[0, 0] = (1, 2, 3)  # occluded pixel
    for n in ("disparityl.png", "disparityr.png"):
        Image.fromarray(disp).save(d / n)

    from leastereo_tpu.data.loaders import load_satellite

    stack = load_satellite(str(tmp_path), "sample0")
    assert stack.shape == (8, 16, 20)
    assert stack[6, 0, 0] == 0  # occlusion -> 0
    assert stack[6, 1, 1] == 7


def test_whu_loader_conventions(tmp_path):
    from PIL import Image

    d = tmp_path / "S_0001"
    d.mkdir()
    h, w = 12, 100
    rng = np.random.RandomState(0)
    for n in ("left.tiff", "right.tiff"):
        Image.fromarray(rng.randint(0, 255, (h, w)).astype(np.uint8)).save(d / n)
    disp = (rng.rand(h, w) * 10).astype(np.float32)
    Image.fromarray(disp, mode="F").save(d / "disp_L.tiff")

    from leastereo_tpu.data.loaders import load_whu

    stack = load_whu(str(tmp_path), "S_0001")
    assert stack.shape == (8, h, w - 64)
    # GT lives in the right-disp channel: -disp + 64, cropped right edge
    np.testing.assert_allclose(stack[7], -disp[:, :-64] + 64, rtol=1e-6)
    assert (stack[6] == 2 * (w - 64)).all()


# ------------------------------------------------------------ pipeline -----


def test_batch_iterator_and_loader(tmp_path):
    rels = _make_sceneflow_tree(
        tmp_path, scenes=("TRAIN/A/0001", "TRAIN/B/0002"), names=("0001", "0002")
    )
    list_file = tmp_path / "train.list"
    list_file.write_text("".join(r + "\n" for r in rels))
    ds = StereoListDataset(
        "sceneflow", str(list_file), root=str(tmp_path), crop_size=(16, 24)
    )
    batches = list(batch_iterator(ds, 2, shuffle=True, epoch=0, seed=0))
    assert len(batches) == 2
    assert batches[0]["left"].shape == (2, 16, 24, 3)
    assert batches[0]["disparity"].shape == (2, 16, 24)

    # same seed+epoch -> identical order; different epoch -> different order
    again = list(batch_iterator(ds, 2, shuffle=True, epoch=0, seed=0))
    np.testing.assert_array_equal(batches[0]["left"], again[0]["left"])

    loader = make_loader(ds, 2, seed=0)
    assert loader.steps_per_epoch == 2
    dev_batches = list(loader(0))
    assert len(dev_batches) == 2
    assert dev_batches[0]["left"].shape == (2, 16, 24, 3)


# ------------------------------------------------------------ builders -----


def test_build_sceneflow_lists(tmp_path):
    root = tmp_path / "sf"
    for split in ("TRAIN", "TEST"):
        for sub in "ABC":
            _make_sceneflow_tree(root, scenes=(f"{split}/{sub}/0001",), names=("0001", "0002", "0003"))
    lists = tmp_path / "lists"
    build_sceneflow_lists(str(root), str(lists), seed=0)
    train = (lists / "train.list").read_text().splitlines()
    sa = (lists / "search_arch.list").read_text().splitlines()
    sw = (lists / "search_weights.list").read_text().splitlines()
    val = (lists / "val.list").read_text().splitlines()
    test = (lists / "test.list").read_text().splitlines()
    assert len(sa) == len(sw) == 3 and len(train) == 3
    assert not (set(sa) & set(sw)) and not (set(sa) & set(train))
    assert len(val) + len(test) == 9
    assert all(e.startswith("frames_finalpass/TEST") for e in val + test)


def test_build_satellite_lists(tmp_path):
    root = tmp_path / "sat"
    for i in range(10):
        (root / f"s{i:02d}").mkdir(parents=True)
    lists = tmp_path / "lists"
    build_satellite_lists(str(root), str(lists), seed=0)
    sizes = {
        n: len((lists / f"{n}.list").read_text().splitlines())
        for n in ("search_arch", "search_weights", "train", "val", "test")
    }
    assert sizes == {"search_arch": 3, "search_weights": 3, "train": 2, "val": 1, "test": 1}


def test_kitti15_loader(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(0)
    for d in ("image_2", "image_3", "disp_occ_0"):
        (tmp_path / d).mkdir()
    name = "000000_10.png"
    for d in ("image_2", "image_3"):
        Image.fromarray(rng.randint(0, 255, (20, 40, 3)).astype(np.uint8)).save(tmp_path / d / name)
    disp16 = (rng.rand(20, 40) * 50 * 256).astype(np.uint16)
    disp16[0, 0] = 0  # invalid pixel
    Image.fromarray(disp16).save(tmp_path / "disp_occ_0" / name)

    from leastereo_tpu.data.loaders import load_kitti2015

    stack = load_kitti2015(str(tmp_path), f"image_2/{name}")
    assert stack.shape == (8, 20, 40)
    np.testing.assert_allclose(stack[6], disp16.astype(np.float32) / 256.0)
    assert stack[6][0, 0] == 0  # invalid stays 0 -> excluded by validity mask


def test_middlebury_loader(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(0)
    scene = tmp_path / "Adirondack"
    scene.mkdir()
    for n in ("im0.png", "im1.png"):
        Image.fromarray(rng.randint(0, 255, (16, 24, 3)).astype(np.uint8)).save(scene / n)
    disp = (rng.rand(16, 24) * 100).astype(np.float32)
    disp[0, 0] = np.inf  # invalid
    write_pfm(scene / "disp0GT.pfm", disp)

    from leastereo_tpu.data.loaders import load_middlebury

    stack = load_middlebury(str(tmp_path), "Adirondack")
    assert stack[6][0, 0] == 2 * 24  # inf -> occlusion sentinel
    np.testing.assert_allclose(stack[6][1:], disp[1:], rtol=1e-6)


def test_disparity_entropy_shape():
    import jax.numpy as jnp

    from leastereo_tpu.ops import disparity_entropy

    rng = np.random.RandomState(0)
    cost = jnp.asarray(rng.randn(1, 8, 6, 10, 1), jnp.float32)
    e = disparity_entropy(cost, 24)
    assert e.shape == (1, 18, 30)
    assert np.isfinite(np.asarray(e)).all()


def test_native_loader_matches_python(tmp_path):
    """Native C++ PNG+PFM loader vs the Python path on a real synthetic tree."""
    from leastereo_tpu.data.native import native_available

    if not native_available():
        pytest.skip("native library not built (scripts/build_native.sh)")
    rels = _make_sceneflow_tree(tmp_path)
    from leastereo_tpu.data.loaders import (
        _finish,
        _load_png_pfm_pair,
        _open_image,
    )
    from leastereo_tpu.data.native import load_stereo_sample_native

    scene = "TRAIN/A/0001"
    paths = [
        str(tmp_path / "frames_finalpass" / scene / "left" / "0001.png"),
        str(tmp_path / "frames_finalpass" / scene / "right" / "0001.png"),
        str(tmp_path / "disparity" / scene / "left" / "0001.pfm"),
        str(tmp_path / "disparity" / scene / "right" / "0001.pfm"),
    ]
    native = load_stereo_sample_native(*paths)
    want = _finish(
        standardize_stack(_open_image(paths[0]), _open_image(paths[1])),
        read_pfm(paths[2]),
        read_pfm(paths[3]),
    )
    assert native.shape == want.shape
    np.testing.assert_allclose(native, want, rtol=1e-4, atol=1e-4)


def test_kitti_demo_dataset_roundtrip(tmp_path):
    """The KITTI-2015-layout demo bundle is consumed by load_kitti2015 and
    exercises the sparse-GT masked-loss path: GT density is lidar-like
    (bottom-heavy, scan gaps) and valid pixels match the dense render to
    uint16/256 quantisation."""
    from leastereo_tpu.data.demo import generate_kitti_demo_dataset, render_stereo_scene
    from leastereo_tpu.data.loaders import load_kitti2015
    from leastereo_tpu.train.losses import validity_mask

    entries = generate_kitti_demo_dataset(str(tmp_path), num_pairs=2, height=96, width=160, seed=7)
    assert entries == ["image_2/000000_10.png", "image_2/000001_10.png"]

    stack = load_kitti2015(str(tmp_path), entries[0])
    assert stack.shape == (8, 96, 160)
    sparse = stack[6]
    valid = np.asarray(validity_mask(sparse, maxdisp=192))
    density = valid.mean()
    assert 0.05 < density < 0.5, density  # sparse, not dense, not empty
    # Bottom third denser than top third (lidar ramp).
    assert valid[64:].mean() > 2 * valid[:32].mean()
    # Valid pixels agree with the dense render to wire-format quantisation.
    _, _, dense, _ = render_stereo_scene(7000, 96, 160, 64)
    np.testing.assert_allclose(sparse[valid], dense[valid], atol=1 / 256.0)
    # Invalid pixels are exactly zero (excluded by the mask, not garbage).
    assert np.all(sparse[~valid] == 0)


def test_dataset_registries_consistent():
    """The CLI --dataset choices, the loader registry, and the default-root
    table stay in sync (a kitti15_part-style addition must touch all three)."""
    from leastereo_tpu.cli.config import DATASETS
    from leastereo_tpu.data.dataset import _DEFAULT_ROOTS
    from leastereo_tpu.data.loaders import LOADERS

    assert set(DATASETS) == set(LOADERS)
    # Every CLI-selectable dataset has a default root except those that always
    # need an explicit --data_root (only the legacy SceneFlow layout today).
    assert set(_DEFAULT_ROOTS) == set(LOADERS) - {"sceneflow_legacy"}
