"""On-hardware numerical parity of the compiled Pallas kernels.

The unit tests (tests/test_pallas_head.py, tests/test_pallas_softargmin.py)
validate the kernel MATH in Pallas interpreter mode on CPU; this script
validates the Mosaic-COMPILED kernels on the real TPU — a Mosaic miscompile
would ship wrong disparities while every interpreter-mode test stays green
(reference analog: ``make_onnx.py:63-81`` numerically checks its export).

Checks, at the KITTI serving shape (d=64, 128x416 at 1/3 res, C=32, g=4):

  * fused head (``conv_soft_argmin_pallas``) compiled on TPU vs a float64
    NumPy ground truth of the identical math (band conv + align_corners=False
    3x trilinear + softmin expectation), side by side with the XLA
    ``_jnp_reference`` path's error against the same truth. The two TPU paths
    differ by ~1 px on RANDOM volumes — not a miscompile: the XLA path
    rounds the cost volume to bf16 (conv output dtype) where the kernel
    accumulates and keeps it f32, and a diffuse random softmin amplifies
    that rounding; the f64 truth shows which path carries the error.
  * ``soft_argmin_pallas`` (f32 input) compiled on TPU vs the jnp parity head.
  * in-model: the real FeatureNet -> PackedMatchingNet pipeline with the
    exact ``head_fn`` wiring LEAStereo uses; the pre-head packed volume is
    extracted via ``profile_stop`` and the fused in-model output is checked
    against the f64 truth of that exact volume + kernel.

Writes a JSON artifact (--out, default KERNEL_PARITY.json).
"""

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def f64_head_truth(x: np.ndarray, k: np.ndarray) -> np.ndarray:
    """Float64 ground truth of the head: 3x3x3 conv (zero pad) -> 3x trilinear
    upsample (align_corners=False, edge clamp) -> softmin expectation.
    Mirrors ops/softargmin.soft_argmin's phase algebra, in f64 NumPy."""
    x = x.astype(np.float64)
    k = k.astype(np.float64)
    b, d, h, w, c = x.shape
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    cost = np.zeros((b, d, h, w), np.float64)
    for dz in range(3):
        for dy in range(3):
            for dx in range(3):
                cost += xp[:, dz : dz + d, dy : dy + h, dx : dx + w, :] @ k[dz, dy, dx, :, 0]

    def up3(a, axis):
        lo = np.concatenate([a.take([0], axis), a.take(range(a.shape[axis] - 1), axis)], axis)
        hi = np.concatenate([a.take(range(1, a.shape[axis]), axis), a.take([-1], axis)], axis)
        r0 = (lo + 2.0 * a) / 3.0
        r2 = (2.0 * a + hi) / 3.0
        out = np.stack([r0, a, r2], axis=axis + 1)
        sh = list(a.shape)
        sh[axis] *= 3
        return out.reshape(sh)

    cost = up3(up3(cost, 2), 3)  # (b, d, 3h, 3w)
    lo = np.concatenate([cost[:, :1], cost[:, :-1]], 1)
    hi = np.concatenate([cost[:, 1:], cost[:, -1:]], 1)
    a0 = (lo + 2.0 * cost) / 3.0
    a2 = (2.0 * cost + hi) / 3.0
    m = np.minimum(np.minimum(a0, cost), a2).min(axis=1, keepdims=True)
    e0, e1, e2 = np.exp(m - a0), np.exp(m - cost), np.exp(m - a2)
    i3 = 3.0 * np.arange(d, dtype=np.float64)[None, :, None, None]
    den = (e0 + e1 + e2).sum(axis=1)
    num = (i3 * e0 + (i3 + 1.0) * e1 + (i3 + 2.0) * e2).sum(axis=1)
    return num / den


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="KERNEL_PARITY.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import leastereo_tpu

    leastereo_tpu.setup_compilation_cache()

    from leastereo_tpu.ops.packed3d import pack
    from leastereo_tpu.ops.pallas_head import _jnp_reference, conv_soft_argmin_pallas
    from leastereo_tpu.ops.pallas_softargmin import soft_argmin_pallas
    from leastereo_tpu.ops.softargmin import soft_argmin

    assert jax.default_backend() == "tpu", jax.default_backend()
    b, d, h3, w3, c, g = 1, 64, 128, 416, 32, 4
    maxdisp = 3 * d
    rng = np.random.RandomState(0)
    results = {}

    def record(name, err, atol, note=""):
        results[name] = {"max_abs_err": err, "atol": atol, "ok": bool(err <= atol)}
        if note:
            results[name]["note"] = note
        print(f"{name:34s} max|err| = {err:.3e} (atol {atol})  "
              f"{'OK' if err <= atol else 'FAIL'}", flush=True)

    def maxerr(a, ref):
        return float(np.max(np.abs(np.asarray(a, np.float64) - np.asarray(ref, np.float64))))

    # 1) Fused head kernel and its XLA fallback, each vs f64 ground truth.
    xin = (rng.randn(b, d, h3, w3, c) * 0.5).astype(np.float32)
    kin = (rng.randn(3, 3, 3, c, 1) * 0.2).astype(np.float32)
    x = jnp.asarray(xin, jnp.bfloat16)  # model activations are bf16
    k = jnp.asarray(kin, jnp.bfloat16)  # model casts the kernel to compute dtype
    p = pack(x, g)
    truth = f64_head_truth(np.asarray(x, np.float32), np.asarray(k, np.float32))
    got = jax.jit(lambda dd, kk: conv_soft_argmin_pallas(dd, kk, g, c, maxdisp))(p.data, k)
    ref = jax.jit(lambda dd, kk: _jnp_reference(dd, kk, g, c, maxdisp))(p.data, k)
    err_pallas = maxerr(got, truth)
    err_xla = maxerr(ref, truth)
    # The kernel must be at least as close to the f64 truth as the XLA path
    # it replaces (it keeps the cost f32; XLA rounds it to bf16) — and within
    # an absolute bound on this diffuse random-volume worst case.
    record("head_pallas_vs_f64", err_pallas, max(2.0 * err_xla, 0.05),
           note="random diffuse volume; trained volumes are peaky and far tighter")
    record("head_xla_vs_f64", err_xla, 5.0,
           note="informational: XLA path rounds the cost to bf16")
    results["head_pallas_more_accurate_than_xla"] = bool(err_pallas <= err_xla)

    # 2) Fused soft-argmin kernel (f32 input, no dtype confound) vs jnp parity.
    cost = jnp.asarray(rng.randn(b, d, h3, w3) * 2.0, jnp.float32)[..., None]
    got = jax.jit(lambda cc: soft_argmin_pallas(cc[..., 0], maxdisp))(cost)
    ref = jax.jit(lambda cc: soft_argmin(cc, maxdisp))(cost)
    record("soft_argmin_pallas_vs_jnp", maxerr(got, ref), 2e-3)

    # 3) In-model, serving config (bf16, KITTI shape): run the REAL pipeline
    # (FeatureNet -> PackedMatchingNet with the exact head_fn wiring
    # LEAStereo uses), extract the pre-head packed volume via profile_stop,
    # and check the fused in-model output against the f64 truth of that
    # exact volume + kernel. This catches wiring bugs AND Mosaic codegen on
    # a realistic (not random-volume) head input.
    #
    # (A fused-vs-XLA-model comparison is NOT used as the criterion: on an
    # untrained model the cost is diffuse/saturated and the XLA head's conv
    # truncates its operands to bf16, which flips saturated pixels by up to
    # 0.5 px — the f64 checks above show the fused path is the accurate one.)
    from leastereo_tpu.models.feature_net import FeatureNet
    from leastereo_tpu.models.genotypes import BEST_SCENEFLOW
    from leastereo_tpu.models.matching_packed import PackedMatchingNet
    from leastereo_tpu.ops.packed3d import Packed, unpack
    from leastereo_tpu.ops.pallas_head import conv_soft_argmin_fused

    dt = jnp.bfloat16
    h, w = 3 * h3, 3 * w3
    left = jnp.asarray(rng.randn(1, h, w, 3), dt)
    right = jnp.asarray(rng.randn(1, h, w, 3), dt)
    fea = FeatureNet(genotype=BEST_SCENEFLOW["feature"], filter_multiplier=8,
                     block_multiplier=4, steps=3, dtype=dt)
    fvars = jax.jit(fea.init)(jax.random.PRNGKey(0), left)
    f_left = jax.jit(lambda q: fea.apply(fvars, q))(left)
    f_right = jax.jit(lambda q: fea.apply(fvars, q))(right)

    def matching(**kw):
        return PackedMatchingNet(genotype=BEST_SCENEFLOW["matching"], filter_multiplier=8,
                                 block_multiplier=4, steps=3, dtype=dt, **kw)

    # head_fn additionally returns its own input, so the f64 truth is
    # computed on the EXACT volume the compiled kernel consumed (a separately
    # compiled truncation can differ by ulps, which saturated untrained-cost
    # pixels amplify to ~0.4 px).
    head_fn = lambda pk, kk: (
        conv_soft_argmin_fused(pk.data, kk, pk.g, pk.channels, maxdisp),
        pk.data,
        kk,
    )
    m_head = matching(head_fn=head_fn)
    mvars = jax.jit(lambda key, l, r: m_head.init(key, (l, r, d)))(
        jax.random.PRNGKey(1), f_left, f_right)
    got, last, kern = jax.jit(lambda l, r: m_head.apply(mvars, (l, r, d)))(f_left, f_right)
    truth = f64_head_truth(
        np.asarray(unpack(Packed(last, g=g, channels=c)), np.float32),
        np.asarray(kern, np.float32),
    )
    ref = jax.jit(lambda dd, kk: _jnp_reference(dd, kk, g, c, maxdisp))(last, kern)
    delta = np.abs(np.asarray(got, np.float64) - truth)
    delta_jnp = np.abs(np.asarray(ref, np.float64) - truth)

    def stats(dl):
        return float(np.percentile(dl, 99.9)), float(np.mean(dl > 0.05))

    p999, frac = stats(delta)
    p999_jnp, frac_jnp = stats(delta_jnp)
    print(f"in-model vs f64:  fused p99.9={p999:.2e} frac>0.05={frac:.2e} max={delta.max():.3f}")
    print(f"                  xla   p99.9={p999_jnp:.2e} frac>0.05={frac_jnp:.2e} max={delta_jnp.max():.3f}")
    # The untrained pre-head cost has a huge dynamic range (random BN), so
    # f32 conv reassociation — in ANY implementation, the XLA path included —
    # crosses the margin between near-tied disparity planes on ~0.1% of
    # pixels vs f64. Criterion: the fused kernel is no worse than the XLA
    # head it replaces on the exact same volume (f64 as arbiter).
    record("in_model_fused_p999_vs_f64", p999, max(p999_jnp, 5e-3),
           note=f"xla-path p99.9 on same volume: {p999_jnp:.2e}; "
                "tie-flips from f32 margin crossings, not Mosaic codegen")
    record("in_model_fused_flip_frac", frac, max(frac_jnp, 1e-4),
           note=f"xla-path flip frac: {frac_jnp:.2e}")

    out = {
        "device": str(jax.devices()[0]),
        "shape": {"d": d, "h3": h3, "w3": w3, "channels": c, "g": g, "maxdisp": maxdisp},
        "kernels": results,
        "all_ok": all(r["ok"] for r in results.values() if isinstance(r, dict)),
    }
    pathlib.Path(args.out).write_text(json.dumps(out, indent=1))
    print(f"wrote {args.out}  all_ok={out['all_ok']}")
    return 0 if out["all_ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
