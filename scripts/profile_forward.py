"""Per-component timing of the flagship forward on the current backend."""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

import leastereo_tpu

leastereo_tpu.setup_compilation_cache()

from leastereo_tpu.models import LEAStereoConfig, best_sceneflow_model
from leastereo_tpu.models.feature_net import FeatureNet
from leastereo_tpu.models.matching_net import MatchingNet
from leastereo_tpu.models.genotypes import BEST_SCENEFLOW
from leastereo_tpu.ops.cost_volume import build_cost_volume
from leastereo_tpu.ops.softargmin import soft_argmin, soft_argmin_fast

H, W, MAXDISP = 384, 1248, 192
cfg = LEAStereoConfig(maxdisp=MAXDISP, compute_dtype="bfloat16")
dtype = cfg.dtype

rng = np.random.RandomState(0)
left = jnp.asarray(rng.randn(1, H, W, 3), dtype)
right = jnp.asarray(rng.randn(1, H, W, 3), dtype)

fea = FeatureNet(genotype=BEST_SCENEFLOW["feature"], filter_multiplier=8,
                 block_multiplier=4, steps=3, dtype=dtype)
fvars = jax.jit(fea.init)(jax.random.PRNGKey(0), left)
fea_fn = jax.jit(lambda v, x: fea.apply(v, x))

f_left = fea_fn(fvars, left)
f_left.block_until_ready()
print("feature out:", f_left.shape, f_left.dtype)
f_right = fea_fn(fvars, right)

cv_fn = jax.jit(lambda a, b: build_cost_volume(a, b, MAXDISP // 3))
cost = cv_fn(f_left, f_right)
cost.block_until_ready()
print("cost volume:", cost.shape, cost.dtype)

mat = MatchingNet(genotype=BEST_SCENEFLOW["matching"], filter_multiplier=8,
                  block_multiplier=4, steps=3, dtype=dtype)
mvars = jax.jit(mat.init)(jax.random.PRNGKey(0), cost)
mat_fn = jax.jit(lambda v, x: mat.apply(v, x))
mcost = mat_fn(mvars, cost)
mcost.block_until_ready()
print("matching out:", mcost.shape, mcost.dtype)

sa_fn = jax.jit(lambda x: soft_argmin(x, MAXDISP))
saf_fn = jax.jit(lambda x: soft_argmin_fast(x, MAXDISP))
sa_fn(mcost).block_until_ready()
saf_fn(mcost).block_until_ready()


def bench(fn, *args, iters=10):
    fn(*args)  # warm
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


t_fea = bench(fea_fn, fvars, left)
t_cv = bench(cv_fn, f_left, f_right)
t_mat = bench(mat_fn, mvars, cost)
t_sa = bench(sa_fn, mcost)
t_saf = bench(saf_fn, mcost)

print(f"feature net (x1):   {t_fea*1e3:8.2f} ms  (x2 views = {2*t_fea*1e3:.2f})")
print(f"cost volume:        {t_cv*1e3:8.2f} ms")
print(f"matching net:       {t_mat*1e3:8.2f} ms")
print(f"soft-argmin parity: {t_sa*1e3:8.2f} ms")
print(f"soft-argmin fast:   {t_saf*1e3:8.2f} ms")
total = 2 * t_fea + t_cv + t_mat + t_sa
print(f"sum (parity head):  {total*1e3:8.2f} ms -> {1/total:.2f} fps")

# Full fused model, same as bench.py.
model = best_sceneflow_model(cfg)
left32 = left.astype(jnp.float32)
right32 = right.astype(jnp.float32)
variables = jax.jit(model.init)(jax.random.PRNGKey(0), left32, right32)
full_fn = jax.jit(lambda l, r: model.apply(variables, l, r))
t_full = bench(full_fn, left32, right32)
print(f"full fused model:   {t_full*1e3:8.2f} ms -> {1/t_full:.2f} fps")
