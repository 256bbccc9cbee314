"""Measure the native C++ host-IO loader vs the Python (PIL+numpy) path.

Decodes + standardizes SceneFlow-style samples (PNG pair + PFM disparities)
at the reference's frame size (540x960, dataloaders/datasets/sceneflow.py)
and records samples/s for both paths to ``NATIVE_IO_BENCH.json``.
"""

import json
import pathlib
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tests"))

import numpy as np


def main():
    from PIL import Image

    from leastereo_tpu.data.loaders import _finish, _open_image
    from leastereo_tpu.data.native import load_stereo_sample_native, native_available
    from leastereo_tpu.data.pfm import read_pfm, write_pfm
    from leastereo_tpu.data.transforms import standardize_stack

    if not native_available():
        print("native library not built (scripts/build_native.sh)")
        return 1

    h, w = 540, 960
    rng = np.random.RandomState(0)
    with tempfile.TemporaryDirectory() as td:
        root = pathlib.Path(td)
        paths = []
        for side in ("left", "right"):
            p = root / f"{side}.png"
            Image.fromarray(rng.randint(0, 255, (h, w, 3)).astype(np.uint8)).save(p)
            paths.append(str(p))
        for side in ("left", "right"):
            p = root / f"{side}.pfm"
            write_pfm(p, (rng.rand(h, w) * 120).astype(np.float32))
            paths.append(str(p))

        def python_load():
            return _finish(
                standardize_stack(_open_image(paths[0]), _open_image(paths[1])),
                read_pfm(paths[2]),
                read_pfm(paths[3]),
            )

        def native_load():
            return load_stereo_sample_native(*paths)

        out = {}
        for name, fn in (("python", python_load), ("native", native_load)):
            fn()  # warm page cache / lazy init
            n = 30
            t0 = time.perf_counter()
            for _ in range(n):
                x = fn()
            dt = time.perf_counter() - t0
            out[f"{name}_samples_per_s"] = round(n / dt, 2)
            out[f"{name}_ms_per_sample"] = round(dt / n * 1e3, 2)
        np.testing.assert_allclose(python_load(), native_load(), rtol=1e-4, atol=1e-4)
        out["frame"] = "540x960 PNG pair + 2 PFM, decode+standardize"
        out["speedup"] = round(out["native_samples_per_s"] / out["python_samples_per_s"], 2)

    path = pathlib.Path(__file__).resolve().parent.parent / "NATIVE_IO_BENCH.json"
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
