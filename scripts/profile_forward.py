"""Per-component device-time profile of the flagship forward.

Host-side timing through a remote-device tunnel is unreliable (per-dispatch
RPC overhead >> device time for sub-10ms programs), so each component is
timed as N chained iterations inside ONE jitted fori_loop — the loop carry
feeds back into the input so XLA cannot CSE the iterations — and we report
(t(N2) - t(N1)) / (N2 - N1), which cancels dispatch + fetch overhead exactly.
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
from leastereo_tpu.models.matching_net import MatchingNet
from leastereo_tpu.models.genotypes import BEST_SCENEFLOW
from leastereo_tpu.ops.cost_volume import build_cost_volume
from leastereo_tpu.ops.softargmin import soft_argmin, soft_argmin_fast

H, W, MAXDISP = 384, 1248, 192
N1, N2 = 4, 12
cfg = LEAStereoConfig(maxdisp=MAXDISP, compute_dtype="bfloat16")
dtype = cfg.dtype

rng = np.random.RandomState(0)
left = jnp.asarray(rng.randn(1, H, W, 3), dtype)
right = jnp.asarray(rng.randn(1, H, W, 3), dtype)


def device_time(fn, *args, n1=N1, n2=N2):
    """Seconds per iteration of ``fn(*args)`` on-device.

    fn's first arg gets a carry-dependent perturbation each iteration so the
    loop body cannot be hoisted/CSE'd; remaining args are closed over.
    """

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

        run(args[0], args[1:]).block_until_ready()  # compile
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

mat = MatchingNet(genotype=BEST_SCENEFLOW["matching"], filter_multiplier=8,
                  block_multiplier=4, steps=3, dtype=dtype)
mvars = jax.jit(lambda k, l, r: mat.init(k, (l, r, MAXDISP // 3)))(
    jax.random.PRNGKey(0), f_left, f_right)
cost = jax.jit(lambda a, b: build_cost_volume(a, b, MAXDISP // 3))(f_left, f_right)
mvars_u = jax.jit(mat.init)(jax.random.PRNGKey(0), cost)
mcost = jax.jit(lambda l, r: mat.apply(mvars, (l, r, MAXDISP // 3)))(f_left, f_right)

model = best_sceneflow_model(cfg)
left32 = left.astype(jnp.float32)
right32 = right.astype(jnp.float32)
variables = jax.jit(model.init)(jax.random.PRNGKey(0), left32, right32)

components = [
    ("feature net (x1)", lambda x: fea.apply(fvars, x), left),
    ("cost volume build", lambda a, b: build_cost_volume(a, b, MAXDISP // 3), f_left, f_right),
    ("matching net (fused stem)", lambda l, r: mat.apply(mvars, (l, r, MAXDISP // 3)), f_left, f_right),
    ("matching net (unfused)", lambda c: mat.apply(mvars_u, c), cost),
    ("soft-argmin parity", lambda x: soft_argmin(x, MAXDISP), mcost),
    ("soft-argmin fast", lambda x: soft_argmin_fast(x, MAXDISP), mcost),
    ("FULL model", lambda l, r: model.apply(variables, l, r), left32, right32),
]

times = {}
for name, fn, *args in components:
    t = device_time(fn, *args)
    times[name] = t
    print(f"{name:28s} {t * 1e3:9.3f} ms", flush=True)

s = 2 * times["feature net (x1)"] + times["matching net (fused stem)"] + times["soft-argmin parity"]
print(f"{'sum 2*fea + mat + softargmin':28s} {s * 1e3:9.3f} ms")
print(f"{'FULL -> fps':28s} {1.0 / times['FULL model']:9.2f}")
