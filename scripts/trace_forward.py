"""Capture a device trace of the flagship forward and print top HLO ops.

Writes a jax.profiler trace, then parses it with xprof's hlo_stats tool to
attribute device time per HLO op — the ground truth the chained-loop probes
approximate. Usage: python scripts/trace_forward.py [out_dir]
"""

import glob
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

import leastereo_tpu

leastereo_tpu.setup_compilation_cache()

from leastereo_tpu.models import LEAStereoConfig, best_sceneflow_model


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace"
    h, w, maxdisp = 384, 1248, 192
    cfg = LEAStereoConfig(maxdisp=maxdisp, compute_dtype="bfloat16")
    model = best_sceneflow_model(cfg)
    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.randn(1, h, w, 3), jnp.float32)
    right = jnp.asarray(rng.randn(1, h, w, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), left, right)

    @jax.jit
    def forward(left, right):
        return model.apply(variables, left, right)

    forward(left, right).block_until_ready()
    forward(left, right).block_until_ready()

    with jax.profiler.trace(out):
        for _ in range(6):
            o = forward(left, right)
        o.block_until_ready()

    xplanes = glob.glob(f"{out}/**/*.xplane.pb", recursive=True)
    print("xplane files:", xplanes, flush=True)
    report(
        xplanes,
        out_json=sys.argv[2] if len(sys.argv) > 2 else None,
        meta={
            "shape": {"h": h, "w": w, "maxdisp": maxdisp},
            "device": str(jax.devices()[0]),
            "what": "per-HLO-op device-time attribution of the shipped KITTI forward",
        },
    )


def report(xplanes, top=45, iters=6, out_json=None, meta=None):
    import re

    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(xplanes, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    tbl = json.loads(data)
    cols = [c["label"] for c in tbl["cols"]]

    def idx(sub):
        return next(i for i, c in enumerate(cols) if sub.lower() in c.lower())

    i_ts = idx("Total self time (us)")
    i_occ = idx("#Occurrences")
    i_cat = idx("HLO op category")
    i_name = idx("HLO op name")
    i_src = idx("Source Info")
    i_bw = idx("Measured memory BW")
    i_fr = idx("Model GFLOP")
    i_bound = idx("Bound by")
    rows = []
    for r in tbl["rows"]:
        v = [c.get("v") if isinstance(c, dict) else c for c in r["c"]]
        rows.append(v)
    total = sum(float(r[i_ts] or 0) for r in rows)
    rows.sort(key=lambda r: -float(r[i_ts] or 0))
    print(f"total device self-time: {total:.0f} us over trace ({total/iters:.0f} us/iter)")
    top_rows = []
    for r in rows[:top]:
        src = re.sub(r"<[^>]*>", "", str(r[i_src] or ""))
        src = ";".join(
            s.split("/")[-1]
            for s in src.splitlines()
            if "leastereo" in s or "scripts" in s
        )[:100]
        frames = str(r[i_name] or "")
        print(
            f"{float(r[i_ts] or 0)/iters:9.1f}us x{float(r[i_occ] or 0)/iters:4.1f} "
            f"{float(r[i_ts] or 0)/total*100:4.1f}% {str(r[i_cat])[:24]:24s} "
            f"{str(r[i_bound])[:4]:4s} bw={float(r[i_bw] or 0):6.1f} fl={float(r[i_fr] or 0):7.0f} "
            f"{frames[:22]:22s} {src}"
        )
        top_rows.append(
            {
                "us_per_iter": round(float(r[i_ts] or 0) / iters, 1),
                "pct": round(float(r[i_ts] or 0) / total * 100, 2),
                "category": str(r[i_cat]),
                "bound_by": str(r[i_bound]),
                "bw_gbps": round(float(r[i_bw] or 0), 1),
                "gflops_per_s": round(float(r[i_fr] or 0), 0),
                "op": frames[:48],
                "source": src,
            }
        )
    if out_json:
        out = dict(meta or {})
        out["device_us_per_iter"] = round(total / iters, 1)
        out["top_ops"] = top_rows
        pathlib.Path(out_json).write_text(json.dumps(out, indent=1))
        print(f"wrote {out_json}")
    return total / iters


if __name__ == "__main__":
    main()
