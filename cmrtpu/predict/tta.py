"""Rot90-orbit test-time augmentation (TTA) for inference.

The reference trains WITH RandomRotate90 augmentation (ref:
src/data/Preprocess.py:382-422 `_create_aug_compose`) but always serves a
single forward pass (ref: src/models/predict_model.py:143). Because the
90-degree orbit is inside the training distribution, averaging the model's
sigmoid probabilities over that orbit is a free quality lever at deploy
time: predict each of the four rotations, rotate the probability maps back,
and average. No flips — the reference's augmentation family contains no
chirality change, so mirrored inputs would be out-of-distribution.

TPU-native shape: the whole orbit is ONE jitted program (the k-loop unrolls
at trace time; XLA fuses the rotations into the surrounding copies), so TTA
costs exactly |orbit| forwards of MXU time and no extra host round-trips.

Opt-in via config key ``TTA: true`` — honored by the live ``Predictor``
(and therefore ``pred_fold`` / the ServingEngine's checkpoint path) and
baked into ``jax.export`` artifacts by ``export_model``, so a deployed
artifact carries its TTA decision with it.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp


def rot90_orbit(dim: Sequence[int]) -> tuple:
    """The shape-preserving rot90 multiples for a spatial DIM: the full
    orbit (0, 1, 2, 3) for square in-plane dims, else only the 180-degree
    pair (0, 2) — 90/270 would transpose H and W and change the compiled
    input shape."""
    return (0, 1, 2, 3) if dim[-1] == dim[-2] else (0, 2)


def predict_tta_twin(exp_root: str) -> str:
    """Re-run inference for every fold of a trained experiment root with
    ``TTA: true`` into a sibling ``<exp_root>_tta`` root (same checkpoints —
    TTA is inference-only). Returns the twin root, ready for evaluate_cv.

    The sibling-root layout keeps evaluate_cv's one-fold-family-per-root
    contract (same pattern as the int8 twins, quantize.py quantize_fold)."""
    from cmrtpu.predict.predictor import predict_override_twin

    return predict_override_twin(exp_root, {"TTA": True}, "tta")


def tta_rot90_forward(apply_fn: Callable, dim: Sequence[int]) -> Callable:
    """Wrap ``apply_fn(variables, x) -> outputs`` with a rot90-orbit
    average.

    ``x`` is [..., H, W, C] (2D batches and 2D+t / 3D volumes alike: the
    in-plane axes are always the last-but-one pair). Outputs may be a
    single array or a dict of per-head arrays in the same spatial layout —
    each leaf is rotated back and averaged leaf-wise."""
    ks = rot90_orbit(dim)

    def forward(variables, x):
        outs = []
        for k in ks:
            o = apply_fn(variables, jnp.rot90(x, k, axes=(-3, -2)))
            outs.append(jax.tree_util.tree_map(
                lambda a, k=k: jnp.rot90(a, -k, axes=(-3, -2)), o))
        return jax.tree_util.tree_map(
            lambda *leaves: sum(leaves) / len(leaves), *outs)

    return forward
