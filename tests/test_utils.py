"""Utils tests: orbax checkpointing, tolerant merge, early stopping,
experiment saver, turbo colormap, FLOPs accounting."""

import numpy as np
import pytest

from leastereo_tpu.utils import (

    EarlyStopping,
    ExperimentSaver,
    colorize_disparity,
    cost_analysis,
    count_params,
    latest_step,
    param_size_mb,
    restore_checkpoint,
    save_checkpoint,
    tolerant_merge,
    turbo_colormap,
)


pytestmark = pytest.mark.quick  # sub-2-minute ops/data tier

def test_checkpoint_roundtrip(tmp_path):
    tree = {
        "params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
        "step": np.int32(7),
    }
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, 7, tree)
    assert latest_step(d) == 7
    template = {
        "params": {"w": np.zeros((2, 3), np.float32)},
        "step": np.int32(0),
    }
    restored = restore_checkpoint(d, template)
    np.testing.assert_array_equal(restored["params"]["w"], tree["params"]["w"])
    assert int(restored["step"]) == 7


def test_checkpoint_best_and_periodic_policy(tmp_path):
    d = str(tmp_path / "ckpt")
    for step in (1, 2, 3):
        save_checkpoint(d, step, {"x": np.float32(step)}, max_to_keep=2)
    assert latest_step(d) == 3
    restored = restore_checkpoint(d, {"x": np.float32(0)}, step=3)
    assert float(restored["x"]) == 3.0


def test_tolerant_merge():
    target = {"a": np.zeros(3), "b": {"c": np.zeros((2, 2)), "d": np.zeros(4)}}
    source = {"a": np.ones(3), "b": {"c": np.ones((5, 5)), "e": np.ones(1)}}
    merged = tolerant_merge(target, source)
    np.testing.assert_array_equal(merged["a"], np.ones(3))  # adopted
    np.testing.assert_array_equal(merged["b"]["c"], np.zeros((2, 2)))  # shape mismatch
    np.testing.assert_array_equal(merged["b"]["d"], np.zeros(4))  # missing in source


def test_early_stopping_policy():
    saved = []
    es = EarlyStopping(patience=2, delta=0.01, period=2, save_fn=lambda kind, ep: saved.append((kind, ep)))
    assert not es(1.0, epoch=1)  # first -> best
    assert not es(0.95, epoch=2)  # improved -> best (+ periodic at 2)
    assert not es(0.949, epoch=3)  # within delta -> counter 1
    assert es(0.949, epoch=4) is True  # counter 2 -> stop (periodic at 4 too)
    kinds = [k for k, _ in saved]
    assert kinds.count("best") == 2
    assert ("periodic", 2) in saved and ("periodic", 4) in saved
    assert es.best_epoch == 2


def test_experiment_saver(tmp_path):
    s = ExperimentSaver(str(tmp_path), "sceneflow", "train", "exp1")
    s.save_parameters({"lr": 1e-3, "crop": (192, 384)})
    assert (tmp_path / "sceneflow-train" / "exp1" / "parameters.json").exists()
    with pytest.raises(FileExistsError):
        ExperimentSaver(str(tmp_path), "sceneflow", "train", "exp1")
    # resume allowed
    ExperimentSaver(str(tmp_path), "sceneflow", "train", "exp1", resume=True)


def test_turbo_colormap():
    t = turbo_colormap(256)
    assert t.shape == (256, 3)
    assert (t >= 0).all() and (t <= 1).all()
    # Turbo runs blue -> green -> red across its range.
    assert t[64, 2] > t[64, 0]  # quarter point: blue-dominant
    assert t[128, 1] > t[128, 2]  # middle: green-dominant
    assert t[-1, 0] > t[-1, 2]  # end: red-dominant
    img = colorize_disparity(np.linspace(0, 10, 12).reshape(3, 4))
    assert img.shape == (3, 4, 3) and img.dtype == np.uint8


def test_param_and_flops_accounting():
    import jax.numpy as jnp

    params = {"w": np.zeros((128, 64), np.float32), "b": np.zeros(64, np.float32)}
    assert count_params(params) == 128 * 64 + 64
    assert abs(param_size_mb(params) - (128 * 64 + 64) / 1e6) < 1e-9

    def f(x):
        return x @ jnp.zeros((64, 32), jnp.float32)

    analysis = cost_analysis(f, jnp.zeros((8, 64), jnp.float32))
    assert analysis.get("flops", 0) >= 2 * 8 * 64 * 32 * 0.9


def test_lr_schedules_reference_parity():
    """make_lr_schedule matches reference utils/lr_scheduler.py:14-75 formulas
    (cos/poly/step incl. the min_lr-before-warmup operation order)."""
    import math

    from leastereo_tpu.train import make_lr_schedule

    base, epochs, spe = 0.1, 10, 7
    n = epochs * spe

    cos = make_lr_schedule("cos", base, epochs, spe)
    poly = make_lr_schedule("poly", base, epochs, spe)
    step = make_lr_schedule("step", base, epochs, spe, lr_step=3)
    multi = make_lr_schedule("multistep", base, epochs, spe, milestones=(2, 5), gamma=0.5)
    warm = make_lr_schedule("cos", base, epochs, spe, warmup_epochs=2, min_lr=0.04)

    for t in (0, 1, 7, 13, 35, 69):
        epoch = t // spe
        assert np.isclose(float(cos(t)), 0.5 * base * (1 + math.cos(math.pi * t / n)), atol=1e-7)
        assert np.isclose(float(poly(t)), base * (1 - t / n) ** 0.9, atol=1e-7)
        assert np.isclose(float(step(t)), base * 0.1 ** (epoch // 3), atol=1e-7)
        assert np.isclose(float(multi(t)), base * 0.5 ** sum(1 for m in (2, 5) if t >= m * spe), atol=1e-7)
        # reference order: floor first, then linear warmup ramp scales it
        lr = max(0.5 * base * (1 + math.cos(math.pi * t / n)), 0.04)
        if t < 2 * spe:
            lr = lr * t / (2 * spe)
        assert np.isclose(float(warm(t)), lr, atol=1e-7)

    with pytest.raises(ValueError):
        make_lr_schedule("step", base, epochs, spe)  # lr_step required
