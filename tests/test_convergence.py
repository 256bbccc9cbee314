"""Training convergence smoke: overfit a tiny model on one fixed batch.

First evidence toward the accuracy target (BASELINE.json SceneFlow EPE):
the full train step (model fwd/bwd, masked smooth-L1, BN updates, Adam)
must be able to drive EPE well below 1 px on a memorizable problem. A
broken gradient path, loss mask, BN wiring, or soft-argmin head would stall
this long before real training would work (reference training loop
``train.py:115-150`` semantics).
"""

import jax
import jax.numpy as jnp
import numpy as np

from leastereo_tpu.models import LEAStereo, LEAStereoConfig
from leastereo_tpu.models.genotypes import Architecture
from leastereo_tpu.train.step import TrainState, make_optimizer, make_train_step

MAXDISP = 24
H, W = 24, 48


def _tiny_model():
    cfg = LEAStereoConfig(
        maxdisp=MAXDISP,
        fea_filter_multiplier=4,
        mat_filter_multiplier=4,
        compute_dtype="float32",
    )
    feature = Architecture(
        network_path=(1, 0),
        cell_genotype=((0, 1), (1, 0), (3, 1), (2, 1), (8, 1), (5, 0)),
    )
    matching = Architecture(
        network_path=(1, 1, 0),
        cell_genotype=((1, 1), (0, 0), (3, 1), (4, 0), (8, 1), (6, 0)),
    )
    return LEAStereo(feature_arch=feature, matching_arch=matching, config=cfg)


def test_overfit_single_batch():
    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.rand(1, H, W, 3) * 2 - 1, jnp.float32)
    right = jnp.asarray(rng.rand(1, H, W, 3) * 2 - 1, jnp.float32)
    # Smooth in-range target: plane + sinusoid, d in ~[4, 20].
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    target = 12.0 + 6.0 * np.sin(2 * np.pi * xx / W) + 2.0 * (yy / H - 0.5)
    batch = {
        "left": left,
        "right": right,
        "disparity": jnp.asarray(target[None], jnp.float32),
    }

    model = _tiny_model()
    variables = model.init(jax.random.PRNGKey(1), left, right)
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        tx=make_optimizer("adam", lr=3e-3),
    )
    step = make_train_step(MAXDISP)

    first_epe = None
    for i in range(400):
        state, metrics = step(state, batch)
        if first_epe is None:
            first_epe = float(metrics["epe"])
        if i >= 50 and float(metrics["epe"]) < 0.5:
            break
    final_epe = float(metrics["epe"])
    assert np.isfinite(final_epe)
    assert final_epe < 0.5, f"EPE stuck at {final_epe:.3f} px (start {first_epe:.3f})"
    assert final_epe < first_epe * 0.2, "no meaningful convergence"
