"""Quick device-time profile of the flagship forward (fast-compiling parts).

Same chained-fori_loop methodology as profile_forward.py, restricted to the
components on the actual inference path so it compiles in ~1 min.
"""

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
from leastereo_tpu.models.matching_packed import PackedMatchingNet
from leastereo_tpu.models.genotypes import BEST_SCENEFLOW
from leastereo_tpu.ops.softargmin import soft_argmin
from leastereo_tpu.ops.pallas_softargmin import soft_argmin_pallas

H, W, MAXDISP = 384, 1248, 192
N1, N2 = 4, 12
cfg = LEAStereoConfig(maxdisp=MAXDISP, compute_dtype="bfloat16")
dtype = cfg.dtype

rng = np.random.RandomState(0)
left = jnp.asarray(rng.randn(1, H, W, 3), dtype)
right = jnp.asarray(rng.randn(1, H, W, 3), dtype)


def device_time(fn, *args, n1=N1, n2=N2):
    def looped(n):
        @jax.jit
        def run(x0, rest):
            def body(_, carry):
                a, x = carry
                out = fn(x + a * jnp.asarray(1e-30, x.dtype), *rest)
                leaf = jax.tree.leaves(out)[0]
                return leaf.ravel()[0].astype(x.dtype), x

            a, _ = jax.lax.fori_loop(0, n, body, (jnp.asarray(0, x0.dtype), x0))
            return a

        run(args[0], args[1:]).block_until_ready()
        t0 = time.perf_counter()
        np.asarray(run(args[0], args[1:]))
        return time.perf_counter() - t0

    t1 = looped(n1)
    t2 = looped(n2)
    return (t2 - t1) / (n2 - n1)


fea = FeatureNet(genotype=BEST_SCENEFLOW["feature"], filter_multiplier=8,
                 block_multiplier=4, steps=3, dtype=dtype)
fvars = jax.jit(fea.init)(jax.random.PRNGKey(0), left)
f_left = jax.jit(lambda x: fea.apply(fvars, x))(left)
f_right = jax.jit(lambda x: fea.apply(fvars, x))(right)

mat = PackedMatchingNet(genotype=BEST_SCENEFLOW["matching"], filter_multiplier=8,
                        block_multiplier=4, steps=3, dtype=dtype)
mvars = jax.jit(lambda k, l, r: mat.init(k, (l, r, MAXDISP // 3)))(
    jax.random.PRNGKey(0), f_left, f_right)
mcost = jax.jit(lambda l, r: mat.apply(mvars, (l, r, MAXDISP // 3)))(f_left, f_right)

model = best_sceneflow_model(cfg)
left32 = left.astype(jnp.float32)
right32 = right.astype(jnp.float32)
variables = jax.jit(model.init)(jax.random.PRNGKey(0), left32, right32)

components = [
    ("feature net (x1)", lambda x: fea.apply(fvars, x), left),
    ("packed matching (fused)", lambda l, r: mat.apply(mvars, (l, r, MAXDISP // 3)), f_left, f_right),
    ("soft-argmin jnp parity", lambda x: soft_argmin(x, MAXDISP), mcost),
    ("soft-argmin pallas", lambda x: soft_argmin_pallas(x[..., 0], MAXDISP), mcost),
    ("FULL model", lambda l, r: model.apply(variables, l, r), left32, right32),
]

times = {}
for name, fn, *args in components:
    t = device_time(fn, *args)
    times[name] = t
    print(f"{name:28s} {t * 1e3:9.3f} ms", flush=True)

s = 2 * times["feature net (x1)"] + times["packed matching (fused)"] + times["soft-argmin pallas"]
print(f"{'sum 2*fea + mat + pallas':28s} {s * 1e3:9.3f} ms")
print(f"{'FULL -> fps':28s} {1.0 / times['FULL model']:9.2f}")
