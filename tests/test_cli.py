"""End-to-end CLI driver smoke tests on synthetic fixtures (CPU mesh).

Each test runs a real driver ``main()`` exactly as the shell would, with a
tiny model (custom arch .npy) so CPU compiles stay fast.
"""

import json
import os

import numpy as np
import pytest

from test_data import _make_sceneflow_tree

CROP_H, CROP_W = 24, 48
MAXDISP = 24


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    """Synthetic sceneflow tree + listset + tiny decoded architecture."""
    root = tmp_path_factory.mktemp("ws")
    data_root = root / "data"
    rels = _make_sceneflow_tree(
        data_root,
        scenes=("TRAIN/A/0001", "TRAIN/B/0001"),
        names=("0001", "0002"),
    )
    lists = root / "lists" / "demo"
    lists.mkdir(parents=True)
    for name in ("train", "search_weights", "search_arch"):
        (lists / f"{name}.list").write_text("".join(r + "\n" for r in rels))
    for name in ("val", "test"):
        (lists / f"{name}.list").write_text("".join(r + "\n" for r in rels[:2]))

    # Tiny but legal decoded architecture: 2-layer feature, 3-layer matching.
    arch = root / "arch"
    arch.mkdir()
    np.save(arch / "fea_path.npy", np.array([1, 0]))
    np.save(arch / "fea_geno.npy", np.array([[0, 1], [1, 0], [3, 1], [2, 1], [8, 1], [5, 0]]))
    np.save(arch / "mat_path.npy", np.array([1, 1, 0]))
    np.save(arch / "mat_geno.npy", np.array([[1, 1], [0, 0], [3, 1], [4, 0], [8, 1], [6, 0]]))
    return root, data_root, rels


def _model_args(root):
    arch = root / "arch"
    return [
        "--maxdisp", str(MAXDISP),
        "--dtype", "float32",
        "--fea_filter_multiplier", "4",
        "--mat_filter_multiplier", "4",
        "--net_arch_fea", str(arch / "fea_path.npy"),
        "--cell_arch_fea", str(arch / "fea_geno.npy"),
        "--net_arch_mat", str(arch / "mat_path.npy"),
        "--cell_arch_mat", str(arch / "mat_geno.npy"),
    ]


def _data_args(root):
    return [
        "--dataset", "sceneflow",
        "--data_root", str(root / "data"),
        "--listset", "demo",
        "--lists_dir", str(root / "lists"),
        "--crop_height", str(CROP_H),
        "--crop_width", str(CROP_W),
        "--workers", "2",
    ]


@pytest.fixture(scope="module")
def trained_run(workspace):
    from leastereo_tpu.cli.train import main

    root, _, _ = workspace
    run_root = root / "run_train"
    rc = main(
        _model_args(root) + _data_args(root) + [
            "--batch_size", "4",
            "--test_batch_size", "2",
            "--mesh_data", "2",
            "--epochs", "2",
            "--experiment", "smoke",
            "--run_root", str(run_root),
            "--ckpt_period", "1",
        ]
    )
    assert rc == 0
    return run_root


def test_train_driver_end_to_end(workspace, trained_run):
    run_root = trained_run
    exp = run_root / "sceneflow-train" / "smoke"
    assert (exp / "parameters.json").exists()
    lines = [json.loads(l) for l in (exp / "logs" / "metrics.jsonl").read_text().splitlines()]
    assert any("val_epe" in l for l in lines)
    assert (exp / "checkpoints" / "final").is_dir()
    assert (exp / "checkpoints" / "best").is_dir()


def test_train_driver_freeze_and_resume(workspace, trained_run):
    from leastereo_tpu.cli.train import freeze_labels, main

    root, _, _ = workspace
    # resume from the trained run's final checkpoint with feature frozen
    prev = trained_run / "sceneflow-train" / "smoke" / "checkpoints" / "final"
    run_root = root / "run_train2"
    rc = main(
        _model_args(root) + _data_args(root) + [
            "--batch_size", "2",
            "--test_batch_size", "1",
            "--mesh_data", "1",
            "--epochs", "1",
            "--experiment", "resume_smoke",
            "--run_root", str(run_root),
            "--resume", str(prev),
            "--freeze_feature", "1",
            "--freeze_matching", "2",
            "--lr_scheduler", "poly",
            "--warmup_epochs", "1",
            "--val_other",
            f"tagil_like:sceneflow:{root / 'lists' / 'demo' / 'val.list'}:{root / 'data'}:1.5",
        ]
    )
    assert rc == 0
    lines = [
        json.loads(l)
        for l in (run_root / "sceneflow-train" / "resume_smoke" / "logs" / "metrics.jsonl")
        .read_text()
        .splitlines()
    ]
    assert any("val_tagil_like_epe" in l for l in lines)

    # label partition sanity
    params = {
        "feature": {"stem0": {"conv": {"kernel": np.zeros(1)}}},
        "matching": {
            "stem0": {"conv": {"kernel": np.zeros(1)}},
            "cell_1": {"x": np.zeros(1)},
            "cell_2": {"x": np.zeros(1)},
            "skip_conv_4": {"x": np.zeros(1)},
        },
    }
    labels = freeze_labels(params, True, 2)
    assert labels["feature"]["stem0"]["conv"]["kernel"] == "frozen"
    assert labels["matching"]["cell_1"]["x"] == "frozen"
    assert labels["matching"]["cell_2"]["x"] == "train"
    assert labels["matching"]["skip_conv_4"]["x"] == "train"


def test_predict_and_evaluate_drivers(workspace):
    from leastereo_tpu.cli.evaluate import main as eval_main
    from leastereo_tpu.cli.predict import main as pred_main

    root, _, rels = workspace
    out = root / "pred_out"
    rc = pred_main(_model_args(root) + _data_args(root) + ["--output_dir", str(out), "--split", "test"])
    assert rc == 0
    pngs = [f for f in os.listdir(out) if f.endswith(".png")]
    assert len(pngs) == 2

    out2 = root / "eval_out"
    rc = eval_main(
        _model_args(root) + _data_args(root) + ["--output_dir", str(out2), "--split", "test", "--round_disp"]
    )
    assert rc == 0
    files = os.listdir(out2)
    assert any(f.endswith("_metrics.txt") for f in files)
    assert any(f.endswith("_err.png") for f in files)
    mfile = next(f for f in files if f.endswith("_metrics.txt"))
    text = (out2 / mfile).read_text()
    assert "epe:" in text and "bad3:" in text


def test_evaluate_full_frame(workspace):
    """--full_frame evaluates frames LARGER than the crop whole: the
    prediction covers every pixel instead of the reference's center crop
    (evaluation.py:288), and run_frame pads up to the next model-valid shape."""
    from leastereo_tpu.cli.evaluate import main as eval_main
    from leastereo_tpu.cli.predict import pad_to_valid

    assert pad_to_valid(25, 49) == (36, 60)
    assert pad_to_valid(24, 48) == (24, 48)

    root, _, rels = workspace
    out = root / "eval_full"
    # Fixture frames are 24x36; with crop 12x24 they exceed the crop in both
    # dims. Full-frame metrics must cover the whole 24x36 frame (pad_to_valid
    # keeps it at 24x36, already model-valid).
    rc = eval_main(
        _model_args(root) + _data_args(root) + [
            "--crop_height", "12", "--crop_width", "24",
            "--output_dir", str(out), "--split", "test", "--full_frame",
        ]
    )
    assert rc == 0
    npys = [f for f in os.listdir(out) if f.endswith("_pred.npy")]
    pred = np.load(out / npys[0])
    assert pred.shape == (24, 36)


def test_search_and_decode_drivers(workspace):
    from leastereo_tpu.cli.decode import main as decode_main
    from leastereo_tpu.cli.search import main as search_main

    root, _, _ = workspace
    run_root = root / "run_search"
    rc = search_main(
        _data_args(root) + [
            "--maxdisp", str(MAXDISP),
            "--dtype", "float32",
            "--fea_num_layers", "3",
            "--mat_num_layers", "3",
            "--fea_filter_multiplier", "2",
            "--mat_filter_multiplier", "2",
            "--fea_block_multiplier", "2",
            "--mat_block_multiplier", "2",
            "--fea_step", "2",
            "--mat_step", "2",
            "--batch_size", "2",
            "--mesh_data", "1",
            "--epochs", "2",
            "--alpha_epoch", "1",
            "--experiment", "smoke",
            "--run_root", str(run_root),
        ]
    )
    assert rc == 0
    ckpt = run_root / "sceneflow-search" / "smoke" / "checkpoints" / "best"
    assert ckpt.is_dir()

    rc = decode_main([
        "--checkpoint", str(ckpt),
        "--fea_step", "2",
        "--mat_step", "2",
    ])
    assert rc == 0
    arch_dir = ckpt / "architecture"
    for f in ("feature_network_path.npy", "feature_genotype.npy", "matching_network_path.npy", "matching_genotype.npy"):
        assert (arch_dir / f).exists()
    path = np.load(arch_dir / "feature_network_path.npy")
    assert len(path) == 3 and path[0] in (0, 1)


def test_convert_driver_roundtrip(workspace, tmp_path):
    """``cli.convert`` turns a reference-layout ``.pth`` (dict with
    ``state_dict``, ``module.``-prefixed keys, torch OIHW/OIDHW tensors —
    reference ``utils/early_stopping.py:44-52`` / ``predict.py:55-65``) into
    an orbax checkpoint that ``restore_checkpoint`` loads verbatim."""
    import flax
    import jax
    import torch

    from leastereo_tpu.cli.common import build_model
    from leastereo_tpu.cli.config import add_model_args
    from leastereo_tpu.cli.convert import main as convert_main
    from leastereo_tpu.utils import restore_checkpoint
    from leastereo_tpu.utils.torch_convert import _leaf_name, _torch_name

    root, _, _ = workspace
    import argparse

    p = argparse.ArgumentParser()
    add_model_args(p)
    args = p.parse_args(_model_args(root))
    model = build_model(args)
    sample = np.zeros((1, 48, 96, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(7), sample, sample)

    # Emit the torch-side twin of this variable tree (inverse layout map).
    state_dict = {}
    for path, value in flax.traverse_util.flatten_dict(variables).items():
        collection, *mods, leaf = path
        name = _torch_name(tuple(mods[:-1])) + "." + _leaf_name(collection, mods[-1], leaf)
        a = np.asarray(value, np.float32)
        if name.endswith("conv.weight"):
            a = a.transpose(3, 2, 0, 1) if a.ndim == 4 else a.transpose(4, 3, 0, 1, 2)
        state_dict["module." + name] = torch.from_numpy(a)
    pth = tmp_path / "best_epoch_1.pth"
    torch.save({"epoch": 1, "state_dict": state_dict}, pth)

    out = tmp_path / "imported"
    rc = convert_main(
        _model_args(root) + ["--torch_checkpoint", str(pth), "--out", str(out)]
    )
    assert rc == 0

    template = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    got = restore_checkpoint(str(out), template)
    for path, want in flax.traverse_util.flatten_dict(template).items():
        np.testing.assert_array_equal(
            np.asarray(flax.traverse_util.flatten_dict(got)[path]), np.asarray(want)
        )
