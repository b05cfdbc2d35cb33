"""Head-to-head quality A/B: cmrtpu (JAX) vs a faithful tf_keras twin.

Round-3 verdict asked for a TRUE differential quality row against the
reference's actual model math, not just structural parity:
tests/test_tf_parity.py already pins forward/loss equality at the function
level; this tool trains BOTH frameworks on the IDENTICAL model-ready
tensors — the same phantom cohort, sliced by the same ETL, preprocessed by
the same deterministic generator (resample -> clip -> normalise -> pad/crop
-> sigma=2 heatmap targets; augmentation off on both sides so the data is
bit-identical) — and scores both with the same CoM landmark extraction in
mm. The TF twin is the fresh Keras-2 rebuild of the reference graph from
tests/test_tf_parity.py (ref: src/models/Unets.py:61-133), trained with the
reference's loss (BceDiceLoss) and optimizer (adam).

CPU-only by design (TF has no TPU here; JAX is pinned to cpu so the run
never touches the tunnel): run it alongside TPU work.

Usage:
  python tools/tf_twin_ab.py [--root /tmp/tf_twin_ab] [--patients 24]
                             [--dim 64] [--epochs 300]

Prints one JSON summary line: {"tf": {...}, "cmrtpu": {...}, "delta_mm": ..}
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def materialize(xs, ys, cfg):
    """Model-ready (x, y) arrays via the real DataGenerator (deterministic:
    SHUFFLE/AUGMENT off)."""
    from cmrtpu.pipeline.generator import DataGenerator

    gen = DataGenerator(xs, ys, config=dict(cfg, SHUFFLE=False, AUGMENT=False,
                                            HIST_MATCHING=False))
    bx, by = [], []
    for i in range(len(gen)):
        x, y = gen[i]
        bx.append(np.asarray(x))
        by.append(np.asarray(y))
    return np.concatenate(bx), np.concatenate(by)


def com_mm_errors(pred, gt, spacing_mm):
    """Per-slice, per-channel CoM distance in mm where both detect
    (the evaluation suite's both-present pairing); plus detection counts."""
    from cmrtpu.eval.detection import peaks_com

    p_xy, p_ok = (np.asarray(a) for a in peaks_com(pred))
    g_xy, g_ok = (np.asarray(a) for a in peaks_com(gt))
    both = (p_ok > 0.5) & (g_ok > 0.5)
    dists = np.linalg.norm(np.nan_to_num(p_xy) - np.nan_to_num(g_xy),
                           axis=-1) * spacing_mm
    out = {}
    for ch, name in enumerate(("ant", "inf")):
        m = both[:, ch]
        out[name] = float(dists[:, ch][m].mean()) if m.any() else float("nan")
        out[f"det_{name}"] = float((p_ok[:, ch] > 0.5).sum())
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/tf_twin_ab")
    ap.add_argument("--patients", type=int, default=24)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    # default: JAX pinned to cpu so the A/B never touches the TPU tunnel.
    # CMRTPU_TWIN_JAX_PLATFORM=tpu runs the JAX side on the real chip —
    # minutes instead of hours (the CPU JAX side measures ~3 s/step at
    # 64² b32; quality is platform-independent) — while TF stays on CPU.
    platform = os.environ.get("CMRTPU_TWIN_JAX_PLATFORM", "cpu").lower()
    if platform == "cpu":
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from examples.full_cv_demo import generate_cohort
    from cmrtpu.cli.make_dataset import main as make_dataset_main
    from cmrtpu.data.dataset import get_trainings_files

    if not os.path.isdir(os.path.join(args.root, "2D")):
        hw = max(64, int(args.dim * 200 / 224))
        generate_cohort(args.root, n_patients=args.patients, hw=hw)
        make_dataset_main(args.root, os.path.join(args.root, "original"))

    cfg = {"DIM": [args.dim, args.dim], "SPACING": [1.2, 1.2],
           "RESAMPLE": True, "DEPTH": 4, "FILTERS": 32, "M_POOL": [2, 2],
           "F_SIZE": [3, 3], "MASK_VALUES": [1, 2], "MASK_CLASSES": 2,
           "BATCHSIZE": args.batch, "LEARNING_RATE": 1e-3,
           "OPTIMIZER": "adam", "LOSS_FUNCTION": "BceDiceLoss",
           "GAUS": True, "SIGMA": 2, "SCALER": "MinMax",
           "MIXED_PRECISION": False, "USE_UPSAMPLE": False,
           "BATCH_NORMALISATION": True, "SEED": args.seed,
           "AUGMENT": False, "EPOCHS": args.epochs}

    xt, yt, xv, yv = get_trainings_files(
        os.path.join(args.root, "2D"), fold=0,
        path_to_folds_df=os.path.join(args.root, "df_kfold.csv"))
    print(f"fold 0: {len(xt)} train / {len(xv)} val slices", flush=True)
    x_train, y_train = materialize(xt, yt, cfg)
    x_val, y_val = materialize(xv, yv, cfg)
    print(f"tensors: train {x_train.shape}, val {x_val.shape}", flush=True)
    spacing = float(cfg["SPACING"][0])
    # binary gt for CoM scoring (the sigma=2 smoothing keeps peak CoM
    # position; threshold at 0.5 exactly like the predict path)
    gt_val = (y_val >= 0.5).astype(np.float32)

    # --- cmrtpu side ------------------------------------------------------
    from cmrtpu.train.trainer import Trainer

    class _Batches:
        def __init__(self, x, y, batch, rng):
            self.x, self.y, self.batch, self.rng = x, y, batch, rng

        def __iter__(self):
            order = self.rng.permutation(len(self.x))
            for s in range(0, len(order) - self.batch + 1, self.batch):
                sel = order[s:s + self.batch]
                yield self.x[sel], self.y[sel]

    trainer = Trainer(cfg)
    trainer.fit(_Batches(x_train, y_train, args.batch,
                         np.random.default_rng(args.seed)),
                epochs=args.epochs)
    jx_pred = (np.asarray(trainer.predict(x_val)) >= 0.5).astype(np.float32)
    jx = com_mm_errors(jx_pred, gt_val, spacing)
    print("cmrtpu:", json.dumps(jx), flush=True)

    # --- TF twin ----------------------------------------------------------
    import tensorflow as tf
    import tf_keras as keras
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tests"))
    from test_tf_parity import build_tf_twin, _tf_dice

    tf.random.set_seed(args.seed)
    tf_model = build_tf_twin(cfg)

    def bce_dice(y_true, y_pred):
        return (tf.reduce_mean(keras.losses.binary_crossentropy(
            y_true, y_pred)) - _tf_dice(y_true, y_pred))

    tf_model.compile(optimizer=keras.optimizers.Adam(cfg["LEARNING_RATE"]),
                     loss=bce_dice)
    tf_model.fit(x_train, y_train, batch_size=args.batch,
                 epochs=args.epochs, shuffle=True, verbose=0)
    tf_pred = (np.asarray(tf_model.predict(x_val, batch_size=args.batch,
                                           verbose=0))
               >= 0.5).astype(np.float32)
    tfm = com_mm_errors(tf_pred, gt_val, spacing)
    print("tf:", json.dumps(tfm), flush=True)

    summary = {
        "config": {"patients": args.patients, "dim": args.dim,
                   "epochs": args.epochs, "fold": 0, "augment": False,
                   "targets": "gaus_sigma2"},
        "cmrtpu_mm": {k: jx[k] for k in ("ant", "inf")},
        "tf_mm": {k: tfm[k] for k in ("ant", "inf")},
        "delta_mm": {k: round(jx[k] - tfm[k], 4) for k in ("ant", "inf")},
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
