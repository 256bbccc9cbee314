"""Per-stage device-time profile of the SHIPPED flagship forward (packed
matching + fused stem + pallas head) at the KITTI bench shape.

Host-side timing through a remote-device tunnel is unreliable (per-dispatch
RPC overhead >> device time for sub-10ms programs), so each component is
timed as N chained iterations inside ONE jitted fori_loop — the loop carry
feeds back into the input so XLA cannot CSE the iterations — and we report
(t(N2) - t(N1)) / (N2 - N1), which cancels dispatch + fetch overhead exactly.
The trip count is a traced argument, so each stage compiles once.

Matching-net stages are measured by truncating the REAL model via
``PackedMatchingNet.profile_stop`` (models/matching_packed.py) — per-stage
cost is the delta between consecutive truncation points, so there is no
profiling replica to drift out of sync with the model.

Writes a JSON artifact (--out, default PROFILE.json) — regenerate this as
PROFILE_r<N>.json each round; it is the perf-regression alarm.
"""

import argparse
import json
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
from leastereo_tpu.models.genotypes import BEST_SCENEFLOW
from leastereo_tpu.models.matching_packed import PackedMatchingNet
from leastereo_tpu.ops.pallas_softargmin import pallas_supported, soft_argmin_fused
from leastereo_tpu.ops.softargmin import soft_argmin, soft_argmin_fast

H, W, MAXDISP = 384, 1248, 192
N1, N2 = 4, 12


def device_time(fn, *args, n1=N1, n2=N2):
    """Seconds per iteration of ``fn(*args)`` on-device.

    fn's first arg gets a carry-dependent perturbation each iteration so the
    loop body cannot be hoisted/CSE'd; remaining args are closed over. The
    trip count is dynamic: one compile, two timed runs.

    The witness is a full reduction of the stage output: a first-element
    witness (used before r5) let XLA elide part of the final ops of the
    measured prefix, under-reporting FULL_model by ~15% vs the HLO trace's
    device-time total (45.9 vs 53.5 ms). The witness reduce itself is timed
    too — deltas between prefixes still isolate stages, since consecutive
    prefixes carry same-shaped reduces (exactly equal only when consecutive
    stage outputs match in shape).
    """

    @jax.jit
    def run(n, x0, rest):
        def body(_, carry):
            a, x = carry
            out = fn(x + a * jnp.asarray(1e-30, x.dtype), *rest)
            leaf = jax.tree.leaves(out)[0]
            return (jnp.sum(leaf.astype(jnp.float32)) * 1e-30).astype(x.dtype), x

        a, _ = jax.lax.fori_loop(0, n, body, (jnp.asarray(0, x0.dtype), x0))
        return a

    for n in (1, n1, n2):  # compile + warm the executable on both timed paths
        run(jnp.int32(n), args[0], args[1:]).block_until_ready()

    def timed(n):
        t0 = time.perf_counter()
        np.asarray(run(jnp.int32(n), args[0], args[1:]))
        return time.perf_counter() - t0

    # Median of 3 (t2-t1) deltas rides out tunnel-RPC jitter.
    deltas = []
    for _ in range(3):
        t1 = timed(n1)
        t2 = timed(n2)
        deltas.append((t2 - t1) / (n2 - n1))
    return sorted(deltas)[1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="PROFILE.json")
    args = ap.parse_args()

    cfg = LEAStereoConfig(maxdisp=MAXDISP, compute_dtype="bfloat16")
    dtype = cfg.dtype
    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.randn(1, H, W, 3), dtype)
    right = jnp.asarray(rng.randn(1, H, W, 3), dtype)

    fea = FeatureNet(genotype=BEST_SCENEFLOW["feature"], filter_multiplier=8,
                     block_multiplier=4, steps=3, dtype=dtype)
    fvars = jax.jit(fea.init)(jax.random.PRNGKey(0), left)
    f_left = jax.jit(lambda x: fea.apply(fvars, x))(left)
    f_right = jax.jit(lambda x: fea.apply(fvars, x))(right)

    def packed_matching(profile_stop=None):
        return PackedMatchingNet(
            genotype=BEST_SCENEFLOW["matching"], filter_multiplier=8,
            block_multiplier=4, steps=3, dtype=dtype, profile_stop=profile_stop,
        )

    mat = packed_matching()
    mvars = jax.jit(lambda k, l, r: mat.init(k, (l, r, MAXDISP // 3)))(
        jax.random.PRNGKey(0), f_left, f_right)
    mcost = jax.jit(lambda l, r: mat.apply(mvars, (l, r, MAXDISP // 3)))(f_left, f_right)

    model = best_sceneflow_model(cfg)
    left32 = left.astype(jnp.float32)
    right32 = right.astype(jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), left32, right32)

    times: dict[str, float] = {}

    def record(name, fn, *a):
        t = device_time(fn, *a)
        times[name] = t
        print(f"{name:32s} {t * 1e3:9.3f} ms", flush=True)
        return t

    record("feature_net_x1", lambda x: fea.apply(fvars, x), left)

    # Matching-net truncation points (the final network level is 1, so the
    # head runs only last_6). Truncated applies reuse the full param dict —
    # flax ignores the unused suffix.
    path = BEST_SCENEFLOW["matching"].network_path
    stops = ["stem0", "stem1"] + [f"cell_{i}" for i in range(len(path))]
    level = path[-1]
    stops += [s for lvl, s in ((3, "last_24"), (2, "last_12"), (1, "last_6")) if level >= lvl]
    cum = {}
    for s in stops:
        m = packed_matching(s)
        cum[s] = record(
            f"matching[..{s}]",
            lambda l, r, m=m: m.apply(mvars, (l, r, MAXDISP // 3)),
            f_left, f_right,
        )
    record("matching_full", lambda l, r: mat.apply(mvars, (l, r, MAXDISP // 3)), f_left, f_right)

    record("softargmin_parity", lambda x: soft_argmin(x, MAXDISP), mcost)
    record("softargmin_fast", lambda x: soft_argmin_fast(x, MAXDISP), mcost)
    if pallas_supported(mcost.shape[:4]):
        record("softargmin_pallas", lambda x: soft_argmin_fused(x, MAXDISP), mcost)

    record("FULL_model", lambda l, r: model.apply(variables, l, r), left32, right32)

    deltas = {}
    prev = 0.0
    for s in stops:
        deltas[s] = cum[s] - prev
        prev = cum[s]
    deltas["head_after_" + stops[-1]] = times["matching_full"] - prev

    print("\n-- matching per-stage deltas --")
    for k, v in deltas.items():
        print(f"{k:32s} {v * 1e3:9.3f} ms")
    fps = 1.0 / times["FULL_model"]
    print(f"{'FULL -> fps':32s} {fps:9.2f}")

    out = {
        "shape": {"h": H, "w": W, "maxdisp": MAXDISP},
        "device": str(jax.devices()[0]),
        "times_ms": {k: round(v * 1e3, 3) for k, v in times.items()},
        "matching_stage_deltas_ms": {k: round(v * 1e3, 3) for k, v in deltas.items()},
        "full_model_fps": round(fps, 2),
    }
    pathlib.Path(args.out).write_text(json.dumps(out, indent=1))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
