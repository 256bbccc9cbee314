"""Convert reference (PyTorch LEAStereo) checkpoints into this framework.

Lets users of the reference repo carry their trained ``.pth`` checkpoints
straight onto TPU. Maps the reference's module naming
(``retrain/LEAStereo.py`` / ``retrain/new_model_2d.py`` /
``retrain/skip_model_3d.py``) onto this framework's Flax variable tree:

* torch Conv2d ``(O, I, kh, kw)``  -> flax ``(kh, kw, I, O)``
* torch Conv3d ``(O, I, kd, kh, kw)`` -> flax ``(kd, kh, kw, I, O)``
* BatchNorm weight/bias -> scale/bias; running_mean/var -> batch_stats
* ``module.`` DataParallel prefixes are stripped
  (reference ``predict.py:56-61`` behavior).

Only tensors present in the target tree are consumed (the reference
instantiates unused heads like ``last_24`` whose weights are dead).
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np

__all__ = ["import_torch_state_dict"]


def _torch_name(path: tuple[str, ...]) -> str:
    """Map a flax variable path (sans leaf) to the reference module prefix."""
    out: list[str] = []
    for p in path:
        if p.startswith("cell_"):
            out.append(f"cells.{p[5:]}")
        elif p == "skip_conv_4":
            out.append("conv1")
        elif p == "skip_conv_8":
            out.append("conv2")
        elif p.startswith("op_"):
            out.append(f"_ops.{p[3:]}")
        else:
            out.append(p)
    return ".".join(out)


def _leaf_name(collection: str, module: str, leaf: str) -> str:
    if module == "conv":
        return "conv.weight"
    if module == "bn":
        if collection == "params":
            return "bn.weight" if leaf == "scale" else "bn.bias"
        return "bn.running_mean" if leaf == "mean" else "bn.running_var"
    raise KeyError(f"unknown leaf {collection}/{module}/{leaf}")


def _convert(name: str, t: np.ndarray, target_shape: tuple[int, ...]) -> np.ndarray:
    a = np.asarray(t, dtype=np.float32)
    if name.endswith("conv.weight"):
        if a.ndim == 4:  # (O, I, kh, kw) -> (kh, kw, I, O)
            a = a.transpose(2, 3, 1, 0)
        elif a.ndim == 5:  # (O, I, kd, kh, kw) -> (kd, kh, kw, I, O)
            a = a.transpose(2, 3, 4, 1, 0)
    if a.shape != tuple(target_shape):
        raise ValueError(f"{name}: shape {a.shape} != target {tuple(target_shape)}")
    return a


def import_torch_state_dict(variables: Mapping[str, Any], state_dict: Mapping[str, Any]):
    """Return a new flax ``variables`` dict with tensors from ``state_dict``.

    ``state_dict`` values may be torch tensors or numpy arrays. Raises if any
    required tensor is missing from the checkpoint.
    """
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("module."):
            k = k[len("module.") :]
        sd[k] = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    import flax

    flat = flax.traverse_util.flatten_dict(variables)
    out = {}
    for path, value in flat.items():
        collection, *mods, leaf = path
        prefix = _torch_name(tuple(mods[:-1]))
        name = (prefix + "." if prefix else "") + _leaf_name(collection, mods[-1], leaf)
        if name not in sd:
            raise KeyError(f"checkpoint missing tensor {name!r} for {path}")
        out[path] = jnp.asarray(_convert(name, sd[name], value.shape))
    return flax.traverse_util.unflatten_dict(out)
