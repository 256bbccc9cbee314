"""leastereo_tpu — TPU-native stereo-depth framework with NAS.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
LEAStereo reference (NeurIPS 2020 hierarchical NAS stereo matching +
satellite-stereo extensions): searchable 2D feature / 3D matching supernets,
genotype decoding, decoded retraining models, cost-volume stereo inference,
data pipelines, and distributed execution over TPU meshes.
"""

__version__ = "0.1.0"

import os as _os


def setup_compilation_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache.

    The decoded model compiles in ~1-2 min and the search supernet in ~20 min
    per (shape, dtype) specialization; the on-disk cache makes every
    subsequent driver/bench run hit warm. Safe to call more than once.
    """
    import jax

    path = path or _os.environ.get(
        "LEASTEREO_TPU_CACHE", _os.path.expanduser("~/.cache/leastereo_tpu_xla")
    )
    _os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
