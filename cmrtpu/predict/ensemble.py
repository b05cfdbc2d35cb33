"""Cross-validation ensemble inference (BASELINE config 5).

The reference runs each fold's model separately and evaluates them fold-wise
(ref: src/models/predict_model.py per-fold, src/models/evaluate_cv.py over
the exp glob). The TPU-native ensemble goes further: all K fold models share
one architecture, so their parameter pytrees stack along a leading axis and
ONE vmapped forward evaluates every fold member in a single XLA program —
the MXU sees K-fold-larger batched convolutions instead of K sequential
model calls. Member probabilities are averaged on-device.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cmrtpu import config as C
from cmrtpu.models.hybrids import get_model
from cmrtpu.train.checkpoint import load_weights_for_model


def _stack_pytrees(trees):
    return jax.tree_util.tree_map(lambda *leaves: jnp.stack(leaves), *trees)


class EnsemblePredictor:
    """Average-probability ensemble over fold checkpoints.

    >>> ens = EnsemblePredictor.from_exp_root("exp/rvip/2026-01-01_00_00", cfg)
    >>> probs = ens.predict(x)            # [B, H, W, C] mean over members
    """

    def __init__(self, config: Dict, weight_dirs: Sequence[str]):
        assert weight_dirs, "no fold checkpoints given"
        self.config = C.normalise_config(config)
        self.model = get_model(self.config)  # honors MODEL_VARIANT
        members = [load_weights_for_model(d, self.config, self.model)
                   for d in weight_dirs]
        self.n_members = len(members)
        self._params = _stack_pytrees([m[0] for m in members])
        self._batch_stats = _stack_pytrees([m[1] for m in members])

        def member_forward(params, batch_stats, x):
            return self.model.apply({"params": params,
                                     "batch_stats": batch_stats}, x, train=False)

        # one compiled program: vmap over the stacked member axis; the mean
        # is tree-mapped so multi-head (dict-output) models ensemble too
        def ensemble_forward(_, x):
            return jax.tree_util.tree_map(
                lambda a: jnp.mean(a, axis=0),
                jax.vmap(member_forward, in_axes=(0, 0, None))(
                    self._params, self._batch_stats, x))

        if C.get(self.config, "TTA", False):
            # the fold configs were qualified with rot90-TTA — the deployed
            # ensemble must honor it too (for 'probs' averaging is linear,
            # so orbit-of-member-mean == member-mean-of-orbit; for 'coords'
            # the member mean happens in probability space first, then the
            # orbit average in coordinate space — one jitted program)
            from cmrtpu.predict.tta import tta_forward_from_config
            ensemble_forward = tta_forward_from_config(
                ensemble_forward, self.config)
        self._forward = jax.jit(lambda x: ensemble_forward(None, x))

    @classmethod
    def from_exp_root(cls, exp_root: str, config: Optional[Dict] = None
                      ) -> "EnsemblePredictor":
        """Collect f<k>/model checkpoints under a timestamped experiment root
        (layout written by train_fold: exp/<EXP>/<ts>/f<k>/model/model.npz)."""
        fold_models = sorted(glob.glob(os.path.join(exp_root, "f[0-9]*", "model")))
        fold_models = [d for d in fold_models
                       if os.path.exists(os.path.join(d, "model.npz"))]
        if config is None:
            cfg_files = sorted(glob.glob(os.path.join(
                exp_root, "f[0-9]*", "config", "config.json")))
            assert cfg_files, f"no fold configs under {exp_root}"
            config = C.load_config(cfg_files[0])
        return cls(config, fold_models)

    def predict(self, x: np.ndarray):
        """Mean member probability for a [B, ...] batch — [B, ..., C], or a
        dict of per-head arrays for multi-head (HEADS) models."""
        out = jax.device_get(self._forward(jnp.asarray(x)))
        return jax.tree_util.tree_map(np.asarray, out)

    def soup(self):
        """Uniform weight average of the members (model soup, Wortsman et
        al., arXiv:2203.05482 — 'uniform soup'): returns (params,
        batch_stats) of ONE model approximating the ensemble at 1/K its
        serving cost. Fold checkpoints share init/architecture and differ
        only by training split, the regime soups were shown to work in."""
        def mean_leaf(a):  # leading axis = stacked members; f64 accumulate
            a = np.asarray(a)
            return np.mean(a.astype(np.float64), axis=0).astype(a.dtype)

        params = jax.tree_util.tree_map(mean_leaf,
                                        jax.device_get(self._params))
        stats = jax.tree_util.tree_map(mean_leaf,
                                       jax.device_get(self._batch_stats))
        return params, stats

    def predict_members(self, x: np.ndarray):
        """Per-member probabilities [K, B, ...] (dict of them for multi-head
        models) — for disagreement analysis."""
        def member_forward(params, batch_stats, xx):
            return self.model.apply({"params": params,
                                     "batch_stats": batch_stats}, xx, train=False)
        out = jax.vmap(member_forward, in_axes=(0, 0, None))(
            self._params, self._batch_stats, jnp.asarray(x))
        return jax.tree_util.tree_map(np.asarray, jax.device_get(out))


def soup_experiment(exp_root: str, out_root: str = None) -> str:
    """Materialize the uniform model soup of a CV root as a sibling
    experiment root and re-run every fold's test-split inference with it.

    The vmapped 4-fold ensemble costs 4x the single-model serving rate
    (measured 1,422 vs 6,165 slices/s); the soup collapses the four fold
    checkpoints into ONE parameter tree (``EnsemblePredictor.soup``), so
    serving costs exactly the single-model rate. Layout: the averaged
    weights are written once to ``<root>_soup/model``; each ``f<k>`` twin
    fold keeps its own config (same FOLD -> same test split) but points
    MODEL_PATH at the shared soup — so ``evaluate_cv`` on the soup root is
    row-for-row comparable with the float CV root and with any ensemble
    scored on the same per-fold splits. Float checkpoints only (quantize
    the soup AFTERWARDS for int8 serving: averaging int8 grids is neither
    meaningful nor supported).
    """
    import json

    from cmrtpu.predict.predictor import pred_fold
    from cmrtpu.train.checkpoint import save_weights
    from cmrtpu.utils.io_utils import ensure_dir

    folds = sorted(glob.glob(os.path.join(exp_root, "f[0-9]*")))
    folds = [f for f in folds
             if os.path.exists(os.path.join(f, "model", "model.npz"))]
    if not folds:
        raise FileNotFoundError(f"no trained fold dirs under {exp_root}")
    cfg0 = C.load_config(os.path.join(folds[0], "config", "config.json"))
    if C.get(cfg0, "QUANT_INT8", False):
        raise ValueError("cannot soup int8 twins — soup the float root, "
                         "then quantize the soup")
    ens = EnsemblePredictor(cfg0, [os.path.join(f, "model") for f in folds])
    params, stats = ens.soup()

    out_root = out_root or exp_root.rstrip("/") + "_soup"
    soup_model = os.path.join(out_root, "model")
    save_weights(soup_model, params, stats)
    for fold_dir in folds:
        t_fold = os.path.join(out_root, os.path.basename(fold_dir))
        cfg = C.load_config(os.path.join(fold_dir, "config", "config.json"))
        cfg["EXP_PATH"] = t_fold
        cfg["MODEL_PATH"] = soup_model
        ensure_dir(os.path.join(t_fold, "config"))
        with open(os.path.join(t_fold, "config", "config.json"), "w") as fh:
            json.dump(cfg, fh, indent=2, default=str)
        pred_fold(cfg)
    return out_root
