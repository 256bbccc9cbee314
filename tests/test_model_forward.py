"""Smoke + shape tests for the decoded LEAStereo model (fp32, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leastereo_tpu.models import LEAStereoConfig, best_sceneflow_model


@pytest.fixture(scope="module")
def small_model():
    cfg = LEAStereoConfig(maxdisp=48, compute_dtype="float32")
    model = best_sceneflow_model(cfg)
    rng = jax.random.PRNGKey(0)
    left = jnp.zeros((1, 48, 96, 3), jnp.float32)
    variables = model.init(rng, left, left)
    return model, variables


def test_forward_shapes(small_model):
    model, variables = small_model
    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.randn(1, 48, 96, 3), jnp.float32)
    right = jnp.asarray(rng.randn(1, 48, 96, 3), jnp.float32)
    disp = model.apply(variables, left, right)
    assert disp.shape == (1, 48, 96)
    d = np.asarray(disp)
    assert np.isfinite(d).all()
    assert (d >= 0).all() and (d <= 48).all()  # expectation of softmin over [0, maxdisp)


def test_forward_jit_and_grad(small_model):
    model, variables = small_model
    rng = np.random.RandomState(1)
    left = jnp.asarray(rng.randn(1, 48, 96, 3), jnp.float32)
    right = jnp.asarray(rng.randn(1, 48, 96, 3), jnp.float32)
    target = jnp.asarray(rng.rand(1, 48, 96) * 40, jnp.float32)

    @jax.jit
    def loss_fn(params):
        out, updates = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            left,
            right,
            train=True,
            mutable=["batch_stats"],
        )
        return jnp.mean(jnp.abs(out - target))

    g = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # gradient reaches the earliest stem conv
    g0 = np.asarray(g["feature"]["stem0"]["conv"]["kernel"])
    assert np.abs(g0).max() > 0


def test_param_count_matches_reference_scale(small_model):
    """Paper reports ~1.81M params for the full model (BASELINE.md)."""
    _, variables = small_model
    n = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(variables["params"]))
    assert 1.5e6 < n < 2.1e6, f"param count {n}"


def test_forward_with_entropy(small_model):
    """--confidence wiring: return_entropy yields (disp, entropy) with the
    entropy map at full resolution (reference DispEntropy,
    models/build_model_2d.py:11-24)."""
    model, variables = small_model
    cfg_e = LEAStereoConfig(maxdisp=48, compute_dtype="float32", return_entropy=True)
    model_e = best_sceneflow_model(cfg_e)
    rng = np.random.RandomState(2)
    left = jnp.asarray(rng.randn(1, 48, 96, 3), jnp.float32)
    right = jnp.asarray(rng.randn(1, 48, 96, 3), jnp.float32)
    disp_ref = np.asarray(model.apply(variables, left, right))
    disp, ent = model_e.apply(variables, left, right)
    assert np.allclose(np.asarray(disp), disp_ref)
    assert ent.shape == (1, 48, 96)
    e = np.asarray(ent)
    assert np.isfinite(e).all() and (e >= 0).all()
