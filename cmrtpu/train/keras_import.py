"""Import the reference's published keras weights-only ``model.h5`` into the
flax U-Net.

The reference restores models by rebuilding the graph from config and calling
``model.load_weights(MODEL_PATH/model.h5)`` (ref: src/models/predict_model.py:
75-76, fallback chain src/models/ModelUtils.py:7-73). Those h5 files are the
only published artifacts of the trained folds, so importing them is the one
credible route to checking quality parity against the published numbers.

Format: keras "weights-only" HDF5 — root attribute ``layer_names`` lists the
model's layers in creation order; each layer group's ``weight_names``
attribute lists its weight datasets (``conv2d/kernel:0`` etc.). Mapping is by
ORDER, not by name: keras auto-names (``conv2d_17``) depend on how many
models were built in the session, but the creation order of weighted layers
is fixed by the graph (ref: src/models/Unets.py:755-869,
src/models/KerasLayers.py:660-777):

    per encoder block:  conv [bn] conv [bn]            (down block)
    bottleneck:         conv [bn] conv [bn]
    per decoder block:  up-conv, conv [bn] conv [bn]   (up block)
    head:               1x1 conv ('unet')

Layouts: keras Conv kernels are HWIO like flax — copied verbatim; keras
Conv2DTranspose kernels are (kh, kw, out, in) and get their last two axes
swapped; BatchNorm (gamma, beta, moving_mean, moving_variance) maps to flax
(scale, bias) params + (mean, var) batch_stats.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Tuple

import numpy as np

from cmrtpu import config as C


def read_keras_h5_weights(path: str) -> List[Tuple[str, List[Tuple[str, np.ndarray]]]]:
    """All weighted layers of a keras weights-only h5, in stored layer order:
    [(layer_name, [(weight_name, array), ...]), ...]."""
    import h5py

    def _s(v) -> str:
        return v.decode() if isinstance(v, bytes) else str(v)

    layers = []
    with h5py.File(path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        layer_names = [_s(n) for n in root.attrs["layer_names"]]
        for name in layer_names:
            group = root[name]
            weight_names = [_s(n) for n in group.attrs.get("weight_names", [])]
            if not weight_names:
                continue  # Input/Dropout/MaxPool/UpSampling/Concat layers
            layers.append((name, [(w, np.asarray(group[w]))
                                  for w in weight_names]))
    return layers


def _classify(weights: List[Tuple[str, np.ndarray]]) -> str:
    """'conv' (kernel+bias), 'bn' (gamma/beta/mean/var) or 'other'."""
    names = [w.split("/")[-1].split(":")[0] for w, _ in weights]
    if "kernel" in names:
        return "conv"
    if "moving_variance" in names or ("gamma" in names and "beta" in names):
        return "bn"
    return "other"


def _conv_arrays(weights, transpose_kernel=False):
    kernel = bias = None
    for name, arr in weights:
        leaf = name.split("/")[-1].split(":")[0]
        if leaf == "kernel":
            kernel = arr
        elif leaf == "bias":
            bias = arr
    if transpose_kernel:
        # keras Conv*DTranspose stores (spatial..., out, in) and TF computes
        # the transpose conv as the gradient of a strided conv with that
        # kernel. flax's ConvTranspose (transpose_kernel=False) instead runs
        # a fractionally-strided conv with its (spatial..., in, out) kernel
        # as-is — equal to the TF result only after flipping every spatial
        # axis AND swapping the channel axes (verified exactly against the
        # vjp-of-strided-conv definition; see tests/test_keras_import.py).
        spatial_flip = tuple(slice(None, None, -1)
                             for _ in range(kernel.ndim - 2))
        kernel = np.swapaxes(kernel[spatial_flip], -1, -2)
    return kernel, bias


def _bn_arrays(weights):
    out = {}
    for name, arr in weights:
        out[name.split("/")[-1].split(":")[0]] = arr
    return out  # gamma, beta, moving_mean, moving_variance


class _Assigner:
    """Walks the keras weighted-layer stream while filling the flax tree."""

    def __init__(self, layers, params, batch_stats):
        self.stream = list(layers)
        self.pos = 0
        self.params = params
        self.batch_stats = batch_stats

    def _next(self, kind: str):
        if self.pos >= len(self.stream):
            raise ValueError(
                f"keras weight stream exhausted while looking for a {kind} "
                f"layer — model/config mismatch (DEPTH/BATCH_NORMALISATION/"
                f"USE_UPSAMPLE must match the training config)")
        name, weights = self.stream[self.pos]
        got = _classify(weights)
        if got != kind:
            raise ValueError(
                f"expected a {kind} layer at stream position {self.pos} "
                f"but found '{name}' ({got}) — model/config mismatch")
        self.pos += 1
        return name, weights

    def conv(self, *flax_path: str, transpose_kernel: bool = False):
        name, weights = self._next("conv")
        kernel, bias = _conv_arrays(weights, transpose_kernel)
        node = self._dig(self.params, flax_path)
        for leaf, arr in (("kernel", kernel), ("bias", bias)):
            if node[leaf].shape != arr.shape:
                raise ValueError(
                    f"shape mismatch importing '{name}' into "
                    f"{'/'.join(flax_path)}/{leaf}: h5 {arr.shape} vs flax "
                    f"{node[leaf].shape}")
            node[leaf] = arr.astype(np.float32)

    def bn(self, *flax_path: str):
        name, weights = self._next("bn")
        arrs = _bn_arrays(weights)
        pnode = self._dig(self.params, flax_path)
        snode = self._dig(self.batch_stats, flax_path)
        for leaf, key, node in (("scale", "gamma", pnode),
                                ("bias", "beta", pnode),
                                ("mean", "moving_mean", snode),
                                ("var", "moving_variance", snode)):
            arr = arrs[key]
            if node[leaf].shape != arr.shape:
                raise ValueError(
                    f"shape mismatch importing '{name}' into "
                    f"{'/'.join(flax_path)}/{leaf}: h5 {arr.shape} vs flax "
                    f"{node[leaf].shape}")
            node[leaf] = arr.astype(np.float32)

    @staticmethod
    def _dig(tree, path):
        node = tree
        for key in path:
            if key not in node:
                raise ValueError(f"flax tree has no node {'/'.join(path)} "
                                 f"(missing '{key}')")
            node = node[key]
        return node

    def done(self):
        if self.pos != len(self.stream):
            leftover = [n for n, _ in self.stream[self.pos:]]
            raise ValueError(
                f"{len(leftover)} unconsumed keras weight layers after "
                f"import: {leftover} — model/config mismatch")


def import_keras_unet_weights(variables: Dict[str, Any], h5_path: str,
                              config: Dict) -> Dict[str, Any]:
    """Map a reference ``model.h5`` onto {'params', 'batch_stats'} of the
    flax ``UNet`` built from the same config. Returns new variables (numpy
    leaves); raises ValueError on any structural or shape mismatch."""
    import jax

    depth = int(C.get(config, "DEPTH", 4))
    batch_norm = bool(C.get(config, "BATCH_NORMALISATION", True))
    use_upsample = bool(C.get(config, "USE_UPSAMPLE", True))

    params = jax.tree_util.tree_map(np.asarray, _unfreeze(variables["params"]))
    batch_stats = jax.tree_util.tree_map(np.asarray,
                                         _unfreeze(variables.get("batch_stats", {})))

    a = _Assigner(read_keras_h5_weights(h5_path), params, batch_stats)

    def conv_block(*prefix):
        a.conv(*prefix, "Conv_0")
        if batch_norm:
            a.bn(*prefix, "BatchNorm_0")

    for level in range(depth):
        down = f"DownBlock_{level}"
        conv_block(down, "ConvBlock_0")
        conv_block(down, "ConvBlock_1")
    conv_block("ConvBlock_0")  # bottleneck conv 1
    conv_block("ConvBlock_1")  # bottleneck conv 2
    for level in range(depth):
        up = f"UpBlock_{level}"
        if use_upsample:
            a.conv(up, "Conv_0")
        else:
            a.conv(up, "ConvTranspose_0", transpose_kernel=True)
        conv_block(up, "ConvBlock_0")
        conv_block(up, "ConvBlock_1")
    a.conv("head")  # the 1x1 sigmoid conv named 'unet' in the reference
    a.done()

    logging.info("imported keras weights from %s (%d weighted layers)",
                 h5_path, a.pos)
    return {"params": params, "batch_stats": batch_stats}


def _unfreeze(tree):
    if hasattr(tree, "unfreeze"):
        tree = tree.unfreeze()
    if isinstance(tree, dict):
        return {k: _unfreeze(v) for k, v in tree.items()}
    return tree
