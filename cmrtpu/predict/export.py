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


def export_model(config: Dict, model_path: str, out_dir: str,
                 batch: int = 8) -> str:
    """Serialize the restored model's forward pass + weights into out_dir."""
    import jax
    from jax import export as jex

    from cmrtpu.models.hybrids import get_model
    from cmrtpu.train.checkpoint import load_weights_for_model
    from cmrtpu.utils.io_utils import ensure_dir

    cfg = C.normalise_config(config)
    model = get_model(cfg)  # honors MODEL_VARIANT (hybrids export too)
    params, batch_stats = load_weights_for_model(model_path, cfg, model)

    dim = tuple(C.get(cfg, "DIM"))
    channels = int(C.get(cfg, "IMG_CHANNELS", 1))
    x_shape = (batch, *dim, channels)

    def forward(variables, x):
        return model.apply(variables, x, train=False)

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
    with open(os.path.join(out_dir, META), "w") as fh:
        json.dump({"x_shape": list(x_shape), "dim": list(dim),
                   "mask_classes": int(C.get(cfg, "MASK_CLASSES", 2))}, fh)
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
