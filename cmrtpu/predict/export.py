"""Ahead-of-time model export for serving (jax.export / StableHLO).

The reference's serving story is "rebuild the keras graph from config, then
load_weights" (ref: src/models/predict_model.py:75-76) — every consumer needs
the framework, the config, and a Python model rebuild. The TPU-native
equivalent exports the jitted forward pass ONCE as a portable StableHLO
artifact plus a weights npz:

  * ``export_model(config, model_path, out_dir)`` — builds the flagship
    forward (restored weights baked in as constants is deliberately NOT done:
    weights stay a separate npz so a retrained checkpoint slots in without
    re-export), serializes the traced computation with jax.export.
  * ``load_exported(out_dir)`` — deserializes and returns a callable
    ``(params_npz_weights, x) -> sigmoid channels`` that runs WITHOUT the
    model code — only jax + the artifact. Version-checked by jax.export's
    own serialization versioning.

This is the hand-off format for serving processes that should not import
flax/model code, and it pins the compiled interface (shapes, dtypes) at
export time.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Tuple

import numpy as np

from cmrtpu import config as C

ARTIFACT = "forward.stablehlo"
META = "export.json"
WEIGHTS = "weights.npz"

_BN_EPS = 1e-3  # ConvBlock's nn.BatchNorm epsilon (cmrtpu/models/unet.py)


def fold_batch_norm(config: Dict, params, batch_stats):
    """Fold inference-time BatchNorm into the preceding conv weights.

    Valid ONLY for the ``BN_FIRST`` ordering (conv -> BN -> act): there the
    frozen BN is an affine map directly on the conv output, so
    ``W' = W * s`` (per output channel) and ``b' = (b - mean) * s + beta``
    with ``s = gamma / sqrt(var + eps)`` — bit-for-bit the same function
    with one op less per block at serve time. For the default
    conv -> act -> BN ordering the ReLU sits between conv and BN, the fold
    is not an affine rewrite of the conv, and this raises.

    Returns ``(folded_config, folded_params)``: the config has
    ``BATCH_NORMALISATION=False`` (build the BN-less twin model with it) and
    the params tree has the BatchNorm scopes removed.
    """
    from flax import traverse_util

    if not C.get(config, "BATCH_NORMALISATION", True):
        raise ValueError("model has no BatchNorm to fold")
    if not C.get(config, "BN_FIRST", False):
        raise ValueError(
            "BN folding requires BN_FIRST (conv->BN->act); the default "
            "conv->act->BN ordering has an activation between conv and BN")
    flat_p = traverse_util.flatten_dict(jax_device_get(params))
    flat_s = traverse_util.flatten_dict(jax_device_get(batch_stats))
    out = {k: np.asarray(v) for k, v in flat_p.items()
           if "BatchNorm_0" not in k}
    for scope in sorted({k[:-2] for k in flat_p if k[-2] == "BatchNorm_0"}):
        gamma = np.asarray(flat_p[scope + ("BatchNorm_0", "scale")], np.float64)
        beta = np.asarray(flat_p[scope + ("BatchNorm_0", "bias")], np.float64)
        mean = np.asarray(flat_s[scope + ("BatchNorm_0", "mean")], np.float64)
        var = np.asarray(flat_s[scope + ("BatchNorm_0", "var")], np.float64)
        s = gamma / np.sqrt(var + _BN_EPS)
        w_key = scope + ("Conv_0", "kernel")
        b_key = scope + ("Conv_0", "bias")
        dtype = out[w_key].dtype
        out[w_key] = (out[w_key].astype(np.float64) * s).astype(dtype)
        out[b_key] = ((out[b_key].astype(np.float64) - mean) * s
                      + beta).astype(dtype)
    folded_cfg = dict(config)
    folded_cfg["BATCH_NORMALISATION"] = False
    return folded_cfg, traverse_util.unflatten_dict(out)


def jax_device_get(tree):
    import jax
    return jax.device_get(tree)


def export_model(config: Dict, model_path: str, out_dir: str,
                 batch: int = 8, fold_bn: bool = False,
                 int8_calib=None) -> str:
    """Serialize the restored model's forward pass + weights into out_dir.

    ``fold_bn=True`` folds the frozen BatchNorm statistics into the conv
    weights before export (BN_FIRST configs only — see ``fold_batch_norm``):
    the serving artifact then runs one op less per block with bit-equal
    outputs.

    ``int8_calib``: an iterable of model-ready calibration batches — exports
    the post-training-quantized int8 twin instead of the float model
    (cmrtpu/predict/quantize.py; int8 weights are 4x smaller and the MXU
    runs int8 pairs at 2x its bf16 peak). Composes with ``fold_bn``: BN is
    folded first, then the BN-less model is calibrated and quantized."""
    import jax
    from jax import export as jex

    from cmrtpu.models.hybrids import get_model
    from cmrtpu.train.checkpoint import load_weights_for_model
    from cmrtpu.utils.io_utils import ensure_dir

    cfg = C.normalise_config(config)
    model = get_model(cfg)  # honors MODEL_VARIANT (hybrids export too)
    params, batch_stats = load_weights_for_model(model_path, cfg, model)
    if fold_bn:
        cfg, params = fold_batch_norm(cfg, params, batch_stats)
        batch_stats = {}
        model = get_model(cfg)
    if int8_calib is not None:
        from cmrtpu.predict.quantize import quantize_model
        cfg, qvars = quantize_model(
            cfg, {"params": params, "batch_stats": batch_stats}, int8_calib)
        params, batch_stats = qvars["params"], qvars["batch_stats"]
        model = get_model(cfg)

    dim = tuple(C.get(cfg, "DIM"))
    channels = int(C.get(cfg, "IMG_CHANNELS", 1))
    x_shape = (batch, *dim, channels)

    def forward(variables, x):
        return model.apply(variables, x, train=False)

    if C.get(cfg, "TTA", False):
        # bake the rot90-orbit TTA (probs OR coords mode) into the artifact
        # so a deployed serving process inherits the fold's TTA decision
        from cmrtpu.predict.tta import tta_forward_from_config
        forward = tta_forward_from_config(
            lambda v, x: model.apply(v, x, train=False), cfg)

    variables = {"params": params, "batch_stats": batch_stats}
    args = (jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype),
        variables),
        jax.ShapeDtypeStruct(x_shape, np.float32))
    try:
        # multi-platform lowering: one artifact serves on CPU and TPU
        exported = jex.export(jax.jit(forward),
                              platforms=("cpu", "tpu"))(*args)
    except TypeError:  # older jax.export without the platforms kwarg ONLY —
        # a real lowering failure must surface here, not at serve time
        exported = jex.export(jax.jit(forward))(*args)
        import logging
        logging.warning("multi-platform export unavailable; artifact serves "
                        "on %s only", exported.platforms)

    ensure_dir(out_dir)
    with open(os.path.join(out_dir, ARTIFACT), "wb") as fh:
        fh.write(exported.serialize())
    # weights ride separately so a retrained checkpoint can be dropped in
    from cmrtpu.train.checkpoint import save_weights
    os.replace(save_weights(out_dir, params, batch_stats),
               os.path.join(out_dir, WEIGHTS))
    # the full config rides along (callables by name, init_config-style, ref:
    # src/utils/Utils_io.py:163-213) so a serving process can preprocess
    # inputs (SPACING/SCALER/RESAMPLE/DIM) and route heads (HEADS) from the
    # artifact alone — see cmrtpu/predict/serving.py
    safe_cfg = {}
    for k, v in cfg.items():
        try:
            json.dumps(v)
            safe_cfg[k] = v
        except TypeError:
            safe_cfg[k] = getattr(v, "__name__", str(v))
    with open(os.path.join(out_dir, META), "w") as fh:
        json.dump({"x_shape": list(x_shape), "dim": list(dim),
                   "mask_classes": int(C.get(cfg, "MASK_CLASSES", 2)),
                   "config": safe_cfg}, fh)
    return out_dir


def load_exported(out_dir: str) -> Tuple[object, Dict]:
    """Rehydrate (callable, meta). The callable takes (variables, x[B,H,W,C])
    and needs no cmrtpu model code — variables come from ``load_weights``
    on the bundled weights npz."""
    from jax import export as jex

    with open(os.path.join(out_dir, ARTIFACT), "rb") as fh:
        exported = jex.deserialize(fh.read())
    with open(os.path.join(out_dir, META)) as fh:
        meta = json.load(fh)
    return exported.call, meta


def load_exported_weights(out_dir: str):
    """(params, batch_stats) for the exported callable."""
    from cmrtpu.train.checkpoint import load_weights
    return load_weights(os.path.join(out_dir, WEIGHTS))
