"""NAS search tests: decoder parity with the reference torch implementation,
supernet forward, bilevel step partitioning, decode -> fixed-model round trip."""

import sys

import numpy as np
import pytest

from conftest import REFERENCE, requires_reference

from leastereo_tpu.search import (
    AutoStereoSupernet,
    SearchState,
    SupernetConfig,
    arch_label_tree,
    decode_arch,
    genotype_decode,
    make_arch_tx,
    make_search_steps,
    make_weight_tx,
    save_decoded,
    viterbi_decode,
)

STEPS = 3


# ------------------------------------------------------------- decoder -----


@requires_reference
@pytest.mark.parametrize("num_layers", [6, 12])
def test_viterbi_parity_with_reference(num_layers):
    import torch

    sys.path.insert(0, str(REFERENCE))
    from models.decoding_formulas import Decoder

    rng = np.random.RandomState(7)
    for trial in range(5):
        alphas = rng.randn(9, 2).astype(np.float32)
        betas = rng.randn(num_layers, 4, 3).astype(np.float32)
        ref = Decoder(torch.from_numpy(alphas), torch.from_numpy(betas), STEPS)
        ref_path, ref_space = ref.viterbi_decode()
        got_path = viterbi_decode(betas)
        np.testing.assert_array_equal(got_path, ref_path)

        ref_gene = ref.genotype_decode()
        got_gene = genotype_decode(alphas, STEPS)
        np.testing.assert_array_equal(got_gene, ref_gene)


def test_decode_roundtrip_into_fixed_model(tmp_path):
    """Decoded artifacts must load into the fixed-genotype model."""
    rng = np.random.RandomState(0)
    fea = decode_arch(rng.randn(9, 2), rng.randn(6, 4, 3))
    mat = decode_arch(rng.randn(9, 2), rng.randn(12, 4, 3))
    paths = save_decoded(str(tmp_path), fea, mat)

    from leastereo_tpu.models.genotypes import load_architecture

    arch_f = load_architecture(paths["net_arch_fea"], paths["cell_arch_fea"])
    arch_m = load_architecture(paths["net_arch_mat"], paths["cell_arch_mat"])
    assert arch_f.num_layers == 6 and arch_m.num_layers == 12
    assert len(arch_f.cell_genotype) == 2 * STEPS
    # Paths must be legal trellis walks starting at level 0 or 1.
    for arch in (arch_f, arch_m):
        assert arch.network_path[0] in (0, 1)
        for a, b in zip(arch.network_path, arch.network_path[1:]):
            assert abs(a - b) <= 1


# ------------------------------------------------------------ supernet -----


@pytest.fixture(scope="module")
def tiny_supernet():
    import jax
    import jax.numpy as jnp

    model = AutoStereoSupernet(
        maxdisp=12,
        fea=SupernetConfig(3, 2, 2, steps=2),
        mat=SupernetConfig(3, 2, 2, steps=2),
        dtype=jnp.float32,
    )
    left = jnp.zeros((1, 24, 48, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), left, left)
    return model, variables


def test_supernet_forward_shapes(tiny_supernet):
    import jax
    import jax.numpy as jnp

    model, variables = tiny_supernet
    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.randn(1, 24, 48, 3), jnp.float32)
    right = jnp.asarray(rng.randn(1, 24, 48, 3), jnp.float32)
    disp = jax.jit(model.apply)(variables, left, right)
    assert disp.shape == (1, 24, 48)
    assert np.isfinite(np.asarray(disp)).all()


def test_arch_label_partition(tiny_supernet):
    import jax

    _, variables = tiny_supernet
    labels = arch_label_tree(variables["params"])
    flat = jax.tree_util.tree_flatten_with_path(labels)[0]
    arch = [jax.tree_util.keystr(p) for p, v in flat if v == "arch"]
    weight = [jax.tree_util.keystr(p) for p, v in flat if v == "weight"]
    assert sorted(arch) == [
        "['feature']['alphas']",
        "['feature']['betas']",
        "['matching']['alphas']",
        "['matching']['betas']",
    ]
    assert len(weight) > 50


def test_bilevel_steps_update_correct_partition(tiny_supernet):
    import jax
    import jax.numpy as jnp

    model, variables = tiny_supernet
    tx_w = make_weight_tx(variables["params"], lr_schedule=0.01)
    tx_a = make_arch_tx(variables["params"], lr=1e-3)
    state = SearchState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        tx_w=tx_w,
        tx_a=tx_a,
    )
    weight_step, arch_step = make_search_steps(maxdisp=12)

    rng = np.random.RandomState(1)
    batch = {
        "left": jnp.asarray(rng.randn(2, 24, 48, 3), jnp.float32),
        "right": jnp.asarray(rng.randn(2, 24, 48, 3), jnp.float32),
        "disparity": jnp.asarray(rng.rand(2, 24, 48) * 10, jnp.float32),
    }

    p0 = jax.tree.map(np.asarray, state.params)
    state, metrics = weight_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    p1 = jax.tree.map(np.asarray, state.params)
    # weight step: alphas/betas unchanged, weights changed
    np.testing.assert_array_equal(p1["feature"]["alphas"], p0["feature"]["alphas"])
    np.testing.assert_array_equal(p1["matching"]["betas"], p0["matching"]["betas"])
    stem = lambda p: p["feature"]["stem0"]["conv"]["kernel"]
    assert np.abs(stem(p1) - stem(p0)).max() > 0

    state, metrics = arch_step(state, batch)
    p2 = jax.tree.map(np.asarray, state.params)
    # arch step: alphas/betas changed, weights unchanged
    assert np.abs(p2["feature"]["alphas"] - p1["feature"]["alphas"]).max() > 0
    assert np.abs(p2["matching"]["betas"] - p1["matching"]["betas"]).max() > 0
    np.testing.assert_array_equal(stem(p2), stem(p1))
