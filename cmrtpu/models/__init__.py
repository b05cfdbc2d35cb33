"""Dimension-generic U-Net model family (flax.linen, NHWC/NDHWC, MXU-friendly)."""

from cmrtpu.models.unet import UNet, build_model, model_summary

__all__ = ["UNet", "build_model", "model_summary"]
