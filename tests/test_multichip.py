"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np

import jax


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_dryrun_multichip():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_disparity_sharded_inference_matches_unsharded():
    """The CP analog (BASELINE config 4, reference predict_md.sh maxdisp-408
    Middlebury): shard the cost volume's disparity axis over 4 devices and
    check the predicted disparity equals the unsharded forward. Downscaled
    Middlebury-proportioned frame; exercises the same --mesh_disp path the
    predict/evaluate CLIs use via build_model."""
    import jax.numpy as jnp

    from leastereo_tpu.models import LEAStereoConfig, best_sceneflow_model
    from leastereo_tpu.parallel import make_mesh

    maxdisp, h, w = 48, 48, 72  # D=16 at feature res, sharded 4-way
    rng = np.random.RandomState(1)
    left = jnp.asarray(rng.randn(1, h, w, 3), jnp.float32)
    right = jnp.asarray(rng.randn(1, h, w, 3), jnp.float32)

    base = best_sceneflow_model(LEAStereoConfig(maxdisp=maxdisp, compute_dtype="float32"))
    variables = base.init(jax.random.PRNGKey(0), left, right)
    want = np.asarray(jax.jit(lambda l, r: base.apply(variables, l, r))(left, right))

    sharded_model = best_sceneflow_model(
        LEAStereoConfig(
            maxdisp=maxdisp, compute_dtype="float32", cost_volume_pspec=("data", "disp")
        )
    )
    mesh = make_mesh(data=1, disp=4)
    with jax.sharding.set_mesh(mesh):
        got = np.asarray(
            jax.jit(lambda l, r: sharded_model.apply(variables, l, r))(left, right)
        )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_disparity_sharded_middlebury_depth():
    """Same equality at the Middlebury disparity depth (maxdisp 408 -> D=136,
    an awkward 8*17 depth where only g in {2,4,8} divide — reference
    predict_md.sh:2-3 / train_md.sh:6). Spatially downscaled; the point is
    the odd-depth packed layout + disp-axis sharding (136/4 = 34 per shard)."""
    import jax.numpy as jnp

    from leastereo_tpu.models import LEAStereoConfig, best_sceneflow_model
    from leastereo_tpu.parallel import make_mesh

    maxdisp, h, w = 408, 48, 72
    rng = np.random.RandomState(2)
    left = jnp.asarray(rng.randn(1, h, w, 3), jnp.float32)
    right = jnp.asarray(rng.randn(1, h, w, 3), jnp.float32)

    base = best_sceneflow_model(LEAStereoConfig(maxdisp=maxdisp, compute_dtype="float32"))
    variables = base.init(jax.random.PRNGKey(0), left, right)
    want = np.asarray(jax.jit(lambda l, r: base.apply(variables, l, r))(left, right))
    assert want.shape == (1, h, w)

    sharded_model = best_sceneflow_model(
        LEAStereoConfig(
            maxdisp=maxdisp, compute_dtype="float32", cost_volume_pspec=("data", "disp")
        )
    )
    mesh = make_mesh(data=1, disp=4)
    with jax.sharding.set_mesh(mesh):
        got = np.asarray(
            jax.jit(lambda l, r: sharded_model.apply(variables, l, r))(left, right)
        )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_data_parallel_train_step_matches_single_device():
    """Same batch, 1-device vs 8-device mesh: loss must agree."""
    import jax.numpy as jnp

    from leastereo_tpu.models import LEAStereoConfig, best_sceneflow_model
    from leastereo_tpu.parallel import make_mesh
    from leastereo_tpu.train import TrainState, make_optimizer, make_train_step

    maxdisp = 24
    cfg = LEAStereoConfig(maxdisp=maxdisp, compute_dtype="float32")
    model = best_sceneflow_model(cfg)
    rng = np.random.RandomState(0)
    batch = {
        "left": jnp.asarray(rng.randn(8, 24, 48, 3), jnp.float32),
        "right": jnp.asarray(rng.randn(8, 24, 48, 3), jnp.float32),
        "disparity": jnp.asarray(rng.rand(8, 24, 48) * 20, jnp.float32),
    }
    variables = model.init(jax.random.PRNGKey(0), batch["left"][:1], batch["right"][:1])

    def new_state():
        return TrainState.create(
            apply_fn=model.apply,
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            tx=make_optimizer("adam", 1e-3),
        )

    single = make_train_step(maxdisp, mesh=None, donate=False)
    _, m1 = single(new_state(), batch)

    mesh = make_mesh(disp=1)
    with jax.sharding.set_mesh(mesh):
        sharded = make_train_step(maxdisp, mesh=mesh, donate=False)
        _, m8 = sharded(new_state(), batch)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m1["epe"]), float(m8["epe"]), rtol=1e-5)
