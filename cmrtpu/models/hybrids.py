"""Stacked 2D-in-3D hybrid U-Nets (the reference's wrapper-model family).

Parity targets — each a Keras graph in the reference, re-designed here as a
flax module that folds the z axis into the batch axis for the 2D trunk (one
big MXU-friendly batched conv instead of a per-slice Python loop):

  * SliceDistributed2D                 (ref: create_3d_wrapper_for_2d_unet,
    src/models/Unets.py:347-404): forward every z slice through one shared
    2D U-Net and restack. The reference also shuffles the slice order at
    graph-build time (Unets.py:321-331); with shared weights and sorted
    restacking that is mathematically the identity, so it is intentionally
    not reproduced (SURVEY.md §7 "quirks").
  * Stacked2D3D                        (ref: ..._followed_3d_unet :289-345
    and ..._concat_input_followed_3d_unet :407-463): 2D U-Net per slice,
    optionally concat the input volume, feed a 3D U-Net, 1x1x1 conv +
    softmax head.
  * Avg2D3D                            (ref: ..._avg_with_3D_unet :466-563
    and create_2d_3d_avg_model :563-645): average the per-slice 2D softmax
    volume with a 3D U-Net's softmax volume; optional trailing 1x1x1 conv.

``build_hybrid_model`` mirrors the reference's config-derivation rule: the 2D
sub-config strips the leading (z) entry from DIM/F_SIZE/M_POOL
(ref: Unets.py:312-316).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from cmrtpu import config as C
from cmrtpu.models.unet import UNet, apply_softcap, build_model, _he_normal


def _as_2d_config(config: Dict) -> Dict:
    """Strip the z entry from the geometry keys (ref: Unets.py:312-316).

    F_SIZE/M_POOL are only stripped when they actually carry a z entry
    (rank == len(DIM)); 2D-shaped values (the config defaults) pass through,
    otherwise the 2D sub-net would end up with rank-1 kernels."""
    cfg = dict(config)
    dim = list(C.get(config, "DIM"))
    cfg["DIM"] = dim[1:]

    def strip(key, default3):
        value = list(C.get(config, key) or default3)
        return value[1:] if len(value) >= len(dim) else value

    cfg["F_SIZE"] = strip("F_SIZE", [3, 3, 3])
    cfg["M_POOL"] = strip("M_POOL", [1, 2, 2])
    return cfg


def _slice_forward(unet_2d: nn.Module, x: jax.Array, train: bool,
                   frozen: bool) -> jax.Array:
    """Shared 2D U-Net over all z slices: fold z into batch, one forward."""
    b, z, h, w, c = x.shape
    out = unet_2d(x.reshape(b * z, h, w, c), train=train and not frozen)
    if frozen:
        out = jax.lax.stop_gradient(out)
    return out.reshape(b, z, h, w, out.shape[-1])


class SliceDistributed2D(nn.Module):
    """A 3D-shaped model that is a shared 2D U-Net over the z axis
    (ref: create_3d_wrapper_for_2d_unet, Unets.py:347-404)."""
    unet_2d: UNet
    freeze_2d: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        return _slice_forward(self.unet_2d, x, train, self.freeze_2d)


class Stacked2D3D(nn.Module):
    """2D-per-slice predictions (optionally concat the input) -> 3D U-Net ->
    1x1x1 conv softmax (ref: Unets.py:289-345, :407-463)."""
    unet_2d: UNet
    unet_3d: UNet
    mask_classes: int = 4
    concat_input: bool = False
    freeze_2d: bool = False
    # same tanh stabiliser as the plain-UNet head (LOGIT_SOFTCAP): the knob
    # must cover the hybrid's own head too, not only the inner trunks
    logit_softcap: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        out2d = _slice_forward(self.unet_2d, x, train, self.freeze_2d)
        feed = jnp.concatenate([out2d, x.astype(out2d.dtype)], axis=-1) \
            if self.concat_input else out2d
        out3d = self.unet_3d(feed, train=train)
        logits = nn.Conv(self.mask_classes, (1, 1, 1), kernel_init=_he_normal(),
                         dtype=jnp.float32, param_dtype=jnp.float32,
                         name="head_3d")(out3d.astype(jnp.float32))
        return jax.nn.softmax(apply_softcap(logits, self.logit_softcap),
                              axis=-1)


class Avg2D3D(nn.Module):
    """Average of the slice-wise 2D prediction volume and a 3D U-Net's
    prediction volume (ref: Unets.py:466-563, :563-645).

    ``final_conv`` adds the trailing 1x1x1 softmax conv of the
    avg_with_3D_unet variant (Unets.py:552-556); off reproduces
    create_2d_3d_avg_model (plain average output, Unets.py:628-645).
    """
    unet_2d: UNet
    unet_3d: UNet
    mask_classes: int = 4
    freeze_2d: bool = False
    final_conv: bool = True
    # same tanh stabiliser as the plain-UNet head (LOGIT_SOFTCAP): covers
    # all three hybrid heads, not only the inner trunks
    logit_softcap: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        out2d = _slice_forward(self.unet_2d, x, train, self.freeze_2d)
        logits2d = nn.Conv(self.mask_classes, (1, 1, 1), kernel_init=_he_normal(),
                           dtype=jnp.float32, param_dtype=jnp.float32,
                           name="head_2d")(out2d.astype(jnp.float32))
        prob2d = jax.nn.softmax(apply_softcap(logits2d, self.logit_softcap),
                                axis=-1)

        out3d = self.unet_3d(x, train=train)
        logits3d = nn.Conv(self.mask_classes, (1, 1, 1), kernel_init=_he_normal(),
                           dtype=jnp.float32, param_dtype=jnp.float32,
                           name="head_3d")(out3d.astype(jnp.float32))
        prob3d = jax.nn.softmax(apply_softcap(logits3d, self.logit_softcap),
                                axis=-1)

        avg = (prob2d + prob3d) * 0.5
        if not self.final_conv:
            return avg
        logits = nn.Conv(self.mask_classes, (1, 1, 1), kernel_init=_he_normal(),
                         dtype=jnp.float32, param_dtype=jnp.float32,
                         name="head_avg")(avg)
        return jax.nn.softmax(apply_softcap(logits, self.logit_softcap),
                              axis=-1)


def _bare_unet(config: Dict, supervision: bool) -> UNet:
    """A trunk U-Net without its own sigmoid head is not needed — the
    reference feeds the 2D net's sigmoid output onward, so we reuse
    build_model directly (the head is part of the sub-net there too,
    ref: Unets.py:128,:331)."""
    return build_model(config, supervision=supervision)


def build_hybrid_model(config: Dict, variant: str = "avg",
                       supervision: bool = False) -> nn.Module:
    """Factory for the hybrid family (ref: get_model, Unets.py:984-998).

    variant: 'wrapper' | 'followed' | 'concat' | 'avg' | 'avg_plain'
    """
    cfg = C.normalise_config(config)
    mask_classes = C.get(cfg, "MASK_CLASSES")
    softcap = C.get(cfg, "LOGIT_SOFTCAP", None)
    cfg2d = _as_2d_config(cfg)
    unet_2d = _bare_unet(cfg2d, supervision)
    if variant == "wrapper":
        return SliceDistributed2D(unet_2d=unet_2d)
    if variant in ("followed", "concat"):
        cfg3d = dict(cfg)
        # the 3D net consumes the 2D net's class channels (+1 if the input
        # image is concatenated), ref: Unets.py:333-336, :455-459
        cfg3d["IMG_CHANNELS"] = mask_classes + (1 if variant == "concat" else 0)
        return Stacked2D3D(unet_2d=unet_2d, unet_3d=_bare_unet(cfg3d, supervision),
                           mask_classes=mask_classes,
                           concat_input=(variant == "concat"),
                           logit_softcap=softcap)
    if variant in ("avg", "avg_plain"):
        return Avg2D3D(unet_2d=unet_2d, unet_3d=_bare_unet(cfg, supervision),
                       mask_classes=mask_classes,
                       final_conv=(variant == "avg"),
                       logit_softcap=softcap)
    raise ValueError(f"unknown hybrid variant: {variant}")


def get_model(config: Dict, supervision: bool = False):
    """Top-level dispatcher matching the reference's get_model switch
    (ref: src/models/Unets.py:984-998): MODEL_VARIANT selects the plain
    dimension-generic U-Net (default) or a hybrid."""
    variant = str(C.get(config, "MODEL_VARIANT", "unet")).lower()
    if variant in ("unet", ""):
        return build_model(config, supervision=supervision)
    if variant == "unet_2p1d":
        # (2+1)D factorized 3D U-Net (R(2+1)D, arXiv:1711.11248): each
        # t x d x d conv becomes spatial 1xdxd + act + temporal tx1x1 —
        # a TPU-first option for cine/3D configs with no reference analog
        return build_model(config, supervision=supervision, factorized=True)
    return build_hybrid_model(config, variant=variant, supervision=supervision)
