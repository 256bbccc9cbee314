"""Model export driver — the reference's ONNX export analog
(``make_onnx.py``), done the JAX way: serialize the jitted forward as
StableHLO via ``jax.export`` (portable, versioned IR runnable from C++/IREE/
TF), with numeric self-check against the eager model."""

from __future__ import annotations

import sys

import jax
import numpy as np

from ..utils import restore_checkpoint, tolerant_merge
from .common import build_model
from .config import export_parser

__all__ = ["main", "export_stablehlo"]


def export_stablehlo(model, variables, height: int, width: int):
    """-> (serialized bytes, exported object)."""
    from jax import export as jax_export

    def fwd(left, right):
        return model.apply(variables, left, right)

    spec = jax.ShapeDtypeStruct((1, height, width, 3), np.float32)
    exported = jax_export.export(jax.jit(fwd))(spec, spec)
    return exported.serialize(), exported


def main(argv=None) -> int:
    args = export_parser().parse_args(argv)
    from .config import apply_platform

    apply_platform(args)
    from .. import setup_compilation_cache

    setup_compilation_cache()

    model = build_model(args)
    sample = np.zeros((1, args.height, args.width, 3), np.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), sample, sample)
    if args.checkpoint:
        template = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
        variables = dict(tolerant_merge(template, restore_checkpoint(args.checkpoint, template)))

    if args.format == "stablehlo":
        blob, exported = export_stablehlo(model, variables, args.height, args.width)
        with open(args.out, "wb") as f:
            f.write(blob)
        # Numeric self-check, like the reference's onnxruntime validation
        # (make_onnx.py:63-81): deserialize and compare outputs.
        from jax import export as jax_export

        rng = np.random.RandomState(0)
        left = rng.randn(1, args.height, args.width, 3).astype(np.float32)
        right = rng.randn(1, args.height, args.width, 3).astype(np.float32)
        want = np.asarray(model.apply(variables, left, right))
        got = np.asarray(jax_export.deserialize(blob).call(left, right))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)
        print(f"exported StableHLO to {args.out} ({len(blob)} bytes); round-trip check passed")
    else:
        import tensorflow as tf  # gated: only needed for SavedModel
        from jax.experimental import jax2tf

        f = tf.function(
            jax2tf.convert(lambda l, r: model.apply(variables, l, r), with_gradient=False),
            autograph=False,
            input_signature=[
                tf.TensorSpec((1, args.height, args.width, 3), tf.float32),
                tf.TensorSpec((1, args.height, args.width, 3), tf.float32),
            ],
        )
        module = tf.Module()
        module.f = f
        tf.saved_model.save(module, args.out)
        print(f"exported SavedModel to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
