"""Full decoded stereo model (reference ``retrain/LEAStereo.py:12-52``).

``disparity = LEAStereo(left, right)``: shared-weight Feature Net on both
views -> concat feature volume over ``maxdisp/3`` candidate disparities ->
3D Matching Net -> soft-argmin disparity regression at full resolution.

Inputs are NHWC ``(B, H, W, 3)`` with H, W divisible by 3 (stem stride) and
by 12 at 1/3-resolution for the deepest matching level; outputs ``(B, H, W)``.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

import logging

from ..ops.cost_volume import build_cost_volume
from ..ops.packed3d import choose_pack
from ..ops.pallas_head import conv_soft_argmin_fused, fused_head_gate_reason

logger = logging.getLogger(__name__)
_gate_warned: set = set()
from ..ops.pallas_softargmin import pallas_supported, soft_argmin_fused
from ..ops.softargmin import disparity_entropy, soft_argmin, soft_argmin_fast
from .feature_net import FeatureNet
from .genotypes import BEST_SCENEFLOW, Architecture
from .matching_net import MatchingNet
from .matching_packed import PackedMatchingNet


@dataclasses.dataclass(frozen=True)
class LEAStereoConfig:
    """Shape hyper-parameters (reference ``config_utils/leastereo_args.py:4-13``)."""

    maxdisp: int = 192
    fea_filter_multiplier: int = 8
    fea_block_multiplier: int = 4
    fea_steps: int = 3
    mat_filter_multiplier: int = 8
    mat_block_multiplier: int = 4
    mat_steps: int = 3
    compute_dtype: str = "bfloat16"
    fast_head: bool = False  # soft_argmin_fast serving mode
    # Fuse cost-volume construction into the matching stem (exact same math,
    # the 5-D volume never materialises — see ops/fused_stem.py). Disable to
    # force the reference-shaped explicit volume path.
    fused_stem: bool = True
    # Run the matching net in the depth-packed layout (ops/packed3d.py):
    # identical math and parameter tree, but activations stored as
    # (B, D/G, H, W, G*C) so narrow channels fill the TPU's 128 lanes instead
    # of being padded 4-16x. Disable to force the plain NDHWC execution.
    packed_matching: bool = True
    # Use the fused Pallas soft-argmin head (ops/pallas_softargmin.py) when
    # running on TPU with supported shapes: identical math to the parity head
    # (fp32 reassociation only), one VMEM-resident pass instead of several
    # full-volume HBM round trips. Falls back to the jnp parity path off-TPU.
    pallas_head: bool = True
    # Also return the per-pixel disparity-entropy confidence map (reference
    # DispEntropy, models/build_model_2d.py:11-24 — dead code there; wired
    # here via predict/evaluate --confidence). Output becomes (disp, entropy).
    return_entropy: bool = False
    # Optional PartitionSpec (as a tuple of axis names / None) constraining the
    # (B, D, H, W, 2C) cost volume, e.g. ("data", "disp") shards the disparity
    # axis across the mesh — the CP-analog for maxdisp-408 Middlebury frames
    # (SURVEY.md §2.4). Requires running under jax.sharding.set_mesh(mesh).
    cost_volume_pspec: tuple | None = None

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)


class LEAStereo(nn.Module):
    feature_arch: Architecture
    matching_arch: Architecture
    config: LEAStereoConfig = LEAStereoConfig()

    @nn.compact
    def __call__(self, left: jnp.ndarray, right: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        cfg = self.config
        dtype = cfg.dtype
        left = left.astype(dtype)
        right = right.astype(dtype)

        feature = FeatureNet(
            genotype=self.feature_arch,
            filter_multiplier=cfg.fea_filter_multiplier,
            block_multiplier=cfg.fea_block_multiplier,
            steps=cfg.fea_steps,
            dtype=dtype,
            name="feature",
        )
        # Shared weights across views (reference retrain/LEAStereo.py:31-32).
        f_left = feature(left, train=train)
        f_right = feature(right, train=train)

        if cfg.fused_stem:
            cost = (f_left, f_right, cfg.maxdisp // 3)
        else:
            cost = build_cost_volume(f_left, f_right, cfg.maxdisp // 3)
            if cfg.cost_volume_pspec is not None:
                cost = jax.lax.with_sharding_constraint(
                    cost, jax.sharding.PartitionSpec(*cfg.cost_volume_pspec)
                )

        matching_cls = PackedMatchingNet if cfg.packed_matching else MatchingNet
        extra = {}
        if cfg.packed_matching:
            # Fused Pallas head (ops/pallas_head.py): the final 1-channel conv
            # + soft-argmin in one kernel off the packed volume — the
            # (B, D, h, w) cost never exists in HBM. Eval/serving only (the
            # training path keeps the differentiable XLA chain) and only when
            # the shape/backend qualify.
            d3, h3, w3 = cfg.maxdisp // 3, left.shape[1] // 3, left.shape[2] // 3
            ifm = cfg.mat_filter_multiplier * cfg.mat_block_multiplier
            g = choose_pack(d3, ifm)
            if (
                cfg.pallas_head
                and not train
                and not cfg.fast_head
                and not cfg.return_entropy
                and cfg.cost_volume_pspec is None
            ):
                reason = fused_head_gate_reason(
                    left.shape[0], d3, h3, w3, ifm, g, dtype.itemsize
                )
                if reason is None:

                    def head_fn(p, k):
                        # The gate above evaluated the pre-head shape it
                        # EXPECTS; assert the packed volume that actually
                        # reaches the head matches, so gate and kernel can
                        # never disagree (e.g. an architecture whose final
                        # level packs differently).
                        assert (p.g, p.channels, p.size) == (g, ifm, (d3, h3, w3)), (
                            (p.g, p.channels, p.size),
                            (g, ifm, (d3, h3, w3)),
                        )
                        return conv_soft_argmin_fused(
                            p.data, k, p.g, p.channels, cfg.maxdisp
                        )

                    extra["head_fn"] = head_fn
                elif reason not in _gate_warned:
                    # Trace-time (static shapes), warn once per reason: the
                    # XLA fallback head is ~2x slower — a silent drop here
                    # reads as a mysterious serving regression.
                    _gate_warned.add(reason)
                    logger.warning("fused Pallas head disabled: %s", reason)
        mat = matching_cls(
            genotype=self.matching_arch,
            filter_multiplier=cfg.mat_filter_multiplier,
            block_multiplier=cfg.mat_block_multiplier,
            steps=cfg.mat_steps,
            dtype=dtype,
            volume_pspec=cfg.cost_volume_pspec,
            name="matching",
            **extra,
        )(cost, train=train)
        if extra.get("head_fn") is not None:
            return mat  # already the (B, 3h, 3w) disparity map

        if cfg.fast_head:
            disp = soft_argmin_fast(mat, cfg.maxdisp)
        elif (
            cfg.pallas_head
            and cfg.cost_volume_pspec is None  # kernel is single-device; GSPMD paths use jnp
            and pallas_supported(mat.shape[:4])
        ):
            disp = soft_argmin_fused(mat, cfg.maxdisp)
        else:
            disp = soft_argmin(mat, cfg.maxdisp)
        if cfg.return_entropy:
            return disp, disparity_entropy(mat, cfg.maxdisp)
        return disp


def best_sceneflow_model(config: LEAStereoConfig = LEAStereoConfig()) -> LEAStereo:
    """The shipped best-searched architecture
    (reference run/sceneflow/best/architecture/*.npy)."""
    return LEAStereo(
        feature_arch=BEST_SCENEFLOW["feature"],
        matching_arch=BEST_SCENEFLOW["matching"],
        config=config,
    )
