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


def predict_tta_twin(exp_root: str, mode: str = "probs") -> str:
    """Re-run inference for every fold of a trained experiment root with
    ``TTA: true`` into a sibling ``<exp_root>_tta_<mode>`` root (same
    checkpoints — TTA is inference-only). Returns the twin root, ready for
    evaluate_cv. ``mode`` picks the combiner: 'probs' (reference-style
    orbit averaging, rescue-only) or 'coords' (identity-anchored, cannot
    degrade a converged run — see tta_rot90_coords_forward).

    The sibling-root layout keeps evaluate_cv's one-fold-family-per-root
    contract (same pattern as the int8 twins, quantize.py quantize_fold)."""
    from cmrtpu.predict.predictor import predict_override_twin

    return predict_override_twin(exp_root, {"TTA": True, "TTA_MODE": mode},
                                 f"tta_{mode}")


def _com_coords(prob: jax.Array):
    """Per-channel thresholded centre of mass over the in-plane axes.

    ``prob`` is [..., H, W, C]; returns (coords [..., C, 2] in (y, x) pixel
    units, valid [..., C] = any pixel crossed 0.5) — the same binary-CoM
    definition the evaluation suite scores (ref: get_mean_rvip_2d,
    src/models/evaluate_cv.py:418)."""
    b = (prob > 0.5).astype(jnp.float32)
    h, w = prob.shape[-3], prob.shape[-2]
    iy = jnp.arange(h, dtype=jnp.float32)[:, None, None]
    ix = jnp.arange(w, dtype=jnp.float32)[None, :, None]
    cnt = jnp.sum(b, axis=(-3, -2))
    sy = jnp.sum(b * iy, axis=(-3, -2))
    sx = jnp.sum(b * ix, axis=(-3, -2))
    safe = jnp.maximum(cnt, 1.0)
    return jnp.stack([sy / safe, sx / safe], axis=-1), cnt > 0


def tta_rot90_coords_forward(apply_fn: Callable, dim: Sequence[int]
                             ) -> Callable:
    """Coordinate-space TTA (``TTA_MODE: 'coords'``): average landmark
    COORDINATES over the rot90 orbit instead of probability maps.

    Probability-space orbit averaging can blur heatmap peaks — members whose
    peaks sit a sub-pixel rotation offset apart average into a flatter, wider
    blob, which measurably DEGRADES a converged run (RESULTS.md: 0.497 ->
    0.742 mm) while still rescuing undertrained ones. Averaging in
    coordinate space makes peak blur impossible by construction: each orbit
    member's per-channel thresholded CoM is extracted in its own frame,
    inverse-rotated analytically back to the identity frame, and the valid
    members' coordinates are averaged.

    Identity-anchored, so a CONVERGED run cannot be degraded — by
    construction, not by luck (measured motivation: on a 0.323/0.400 mm
    converged GN CV, probability averaging moved error to 0.928/0.751 mm
    and plain coordinate averaging to 0.640/0.577 — rotated members are
    systematically weaker than the identity forward, and any synthesized
    stamp quantizes the sub-pixel CoM the model's own blob shape carries).
    Per (slice, channel):

      * detection = MAJORITY vote over the orbit (>= ceil(K/2) members
        cross the 0.5 threshold);
      * identity detects AND majority confirms -> pass the IDENTITY
        member's raw probability map through untouched — bit-identical to
        the single-forward path, zero possible regression;
      * identity misses but the majority detects -> RESCUE: a 3x3 stamp of
        1.0 at the valid members' mean coordinate (inverse-rotated
        analytically; the same blob geometry the GT masks use);
      * identity detects but the majority does not -> spurious detection,
        suppressed to zero (the FP-suppression probability averaging
        provided, kept without its peak blur).

    Square in-plane dims use the full 4-member orbit; non-square fall back
    to the 180-degree pair (same rule as ``tta_rot90_forward``). Dict
    (multi-head) outputs are not supported — coordinate averaging is a
    landmark-head semantic."""
    ks = rot90_orbit(dim)
    majority = (len(ks) + 1) // 2
    assert ks[0] == 0  # identity member anchors the no-regression path

    def forward(variables, x):
        h, w = x.shape[-3], x.shape[-2]
        coords_k, valid_k = [], []
        identity_map = None
        for k in ks:
            o = apply_fn(variables, jnp.rot90(x, k, axes=(-3, -2)))
            if not isinstance(o, jnp.ndarray) and not hasattr(o, "shape"):
                raise TypeError(
                    "TTA_MODE='coords' supports single-array (landmark-head) "
                    "outputs only; multi-head models need TTA_MODE='probs'")
            o = jnp.rot90(o, -k, axes=(-3, -2))
            if k == 0:
                identity_map = o
            coords, valid = _com_coords(o)
            coords_k.append(coords)
            valid_k.append(valid)
        coords = jnp.stack(coords_k)                      # [K, ..., C, 2]
        valid = jnp.stack(valid_k).astype(jnp.float32)    # [K, ..., C]
        n_valid = jnp.sum(valid, axis=0)                  # [..., C]
        mean = (jnp.sum(coords * valid[..., None], axis=0)
                / jnp.maximum(n_valid, 1.0)[..., None])   # [..., C, 2]
        detected = n_valid >= majority                    # [..., C]
        anchored = (valid[0] > 0) & detected              # [..., C]

        my = jnp.round(mean[..., 0])[..., None, None, :]  # [..., 1, 1, C]
        mx = jnp.round(mean[..., 1])[..., None, None, :]
        yy = jnp.arange(h, dtype=jnp.float32)[:, None, None]
        xx = jnp.arange(w, dtype=jnp.float32)[None, :, None]
        blob = (jnp.abs(yy - my) <= 1) & (jnp.abs(xx - mx) <= 1)
        stamp = jnp.where(blob & detected[..., None, None, :], 1.0, 0.0)
        out = jnp.where(anchored[..., None, None, :],
                        identity_map.astype(jnp.float32), stamp)
        return out.astype(jnp.float32)

    return forward


def tta_forward_from_config(apply_fn: Callable, config) -> Callable:
    """The ONE dispatch for every TTA consumer (Predictor, export_model,
    EnsemblePredictor): honors TTA + TTA_MODE so the three serving surfaces
    cannot drift."""
    from cmrtpu import config as C

    dim = tuple(C.get(config, "DIM"))
    mode = str(C.get(config, "TTA_MODE", "probs") or "probs").lower()
    if mode in ("probs", "prob", ""):
        return tta_rot90_forward(apply_fn, dim)
    if mode in ("coords", "coord"):
        if C.get(config, "HEADS", ()) or ():
            raise ValueError(
                "TTA_MODE='coords' is a landmark-head semantic and does not "
                "support multi-head (HEADS) models — use TTA_MODE='probs'")
        return tta_rot90_coords_forward(apply_fn, dim)
    raise ValueError(f"TTA_MODE={mode!r}: expected 'probs' or 'coords'")


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
