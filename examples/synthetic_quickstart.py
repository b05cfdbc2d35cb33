"""End-to-end quickstart on synthetic data — no ACDC download needed.

Generates a synthetic SAX-like RVIP dataset (per-patient insertion-point
positions, visible image cues), builds the k-fold dataframe, trains one fold
through the real CLI path, runs chained inference and the full metric suite,
and prints the resulting mm localisation errors.

Defaults train the GAUS sigma=2 heatmap variant (Var.2 of the published
experiments): heatmap targets converge in ~250 epochs where the plain
near-0.1%-foreground BCE+Dice targets need the reference's much longer
schedules (measured here: 0.31/0.38 mm ant/inf at the defaults).

Runs on CPU (~15 min) or TPU (~2 min):

    python examples/synthetic_quickstart.py --root /tmp/cmrtpu_quickstart \
        --epochs 250 --patients 10
"""

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def generate_dataset(root: str, n_patients: int = 10, hw: int = 64,
                     n_slices: int = 8, seed: int = 0) -> None:
    from cmrtpu.data.dataset import get_kfolded_data
    from cmrtpu.io import MedicalImage, write_image
    from cmrtpu.utils.io_utils import ensure_dir

    rng = np.random.default_rng(seed)
    ensure_dir(os.path.join(root, "2D"))
    for p in range(n_patients):
        pid = f"patient{p + 1:03d}"
        ant = np.array([hw // 3 + rng.integers(-4, 5),
                        2 * hw // 3 + rng.integers(-4, 5)])
        inf = np.array([2 * hw // 3 + rng.integers(-4, 5),
                        hw // 3 + rng.integers(-4, 5)])
        for frame in ("01", "12"):
            for z in range(n_slices):
                yy, xx = np.mgrid[0:hw, 0:hw]
                a = ant + rng.integers(-1, 2, 2)
                i = inf + rng.integers(-1, 2, 2)
                img = (2.0 * np.exp(-((yy - a[0]) ** 2 + (xx - a[1]) ** 2) / 18.0)
                       - 2.0 * np.exp(-((yy - i[0]) ** 2 + (xx - i[1]) ** 2) / 18.0)
                       + np.exp(-((yy - hw / 2) ** 2 + (xx - hw / 2) ** 2) / 400.0)
                       + rng.normal(0, 0.15, (hw, hw)))
                msk = np.zeros((hw, hw), np.uint8)
                msk[a[0] - 1:a[0] + 2, a[1] - 1:a[1] + 2] = 1
                msk[i[0] - 1:i[0] + 2, i[1] - 1:i[1] + 2] = 2
                stem = f"{pid}__t{frame}_z{z}"
                write_image(MedicalImage(array=img.astype(np.float32),
                                         spacing=(1.4, 1.4)),
                            os.path.join(root, "2D", f"{stem}_img.nrrd"))
                write_image(MedicalImage(array=msk, spacing=(1.4, 1.4)),
                            os.path.join(root, "2D", f"{stem}_msk.nrrd"))
    df = get_kfolded_data(kfolds=4, path_to_data=os.path.join(root, "2D"))
    df.to_csv(os.path.join(root, "df_kfold.csv"), index=False)
    print(f"dataset: {df.patient.nunique()} patients, {len(df) // 4} slices")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", default="/tmp/cmrtpu_quickstart")
    parser.add_argument("--epochs", type=int, default=250)
    parser.add_argument("--patients", type=int, default=10)
    parser.add_argument("--dim", type=int, default=64)
    parser.add_argument("--cache-dtype", default="float32",
                        help="device-cache storage dtype: float32 | "
                             "bfloat16 | uint8 (per-example affine "
                             "quantization; quality A/B knob)")
    parser.add_argument("--ws", action="store_true",
                        help="normalization-free scaled-WS convs instead of "
                             "BatchNorm (WEIGHT_STANDARDISATION; EXPERIMENTAL — "
                             "collapses at flagship scale; +16%% step "
                             "throughput — quality A/B knob)")
    parser.add_argument("--ema", action="store_true",
                        help="train with an EMA shadow of the params "
                             "(EMA: true, decay 0.999) — checkpoints and "
                             "the evaluation then use the shadow")
    parser.add_argument("--tta", action="store_true",
                        help="after the float evaluation, re-predict the "
                             "same checkpoint with rot90-orbit test-time "
                             "augmentation (TTA: true) into a sibling root "
                             "and print the quality A/B")
    parser.add_argument("--tta-mode", default="coords",
                        choices=["coords", "probs"],
                        help="TTA combiner: 'coords' (identity-anchored, "
                             "cannot degrade a converged run) or 'probs' "
                             "(reference-style orbit averaging)")
    parser.add_argument("--int8", action="store_true",
                        help="after the float eval, quantize the trained "
                             "fold to its int8 serving twin "
                             "(cmrtpu/predict/quantize.py), re-predict and "
                             "re-evaluate — prints the quality A/B")
    args = parser.parse_args()

    generate_dataset(args.root, n_patients=args.patients, hw=args.dim)

    config = {
        "EXPERIMENT": "quickstart", "EXPERIMENTS_ROOT": os.path.join(args.root, "exp/"),
        "SEED": 42, "EPOCHS": args.epochs, "BATCHSIZE": 32, "FOLDS": [0],
        "DIM": [args.dim, args.dim], "SPACING": [1.4, 1.4], "RESAMPLE": True,
        "DEPTH": 3, "FILTERS": 16, "M_POOL": [2, 2], "F_SIZE": [3, 3],
        "MASK_VALUES": [1, 2], "MASK_CLASSES": 2, "OPTIMIZER": "adam",
        "LEARNING_RATE": 1e-3, "LOSS_FUNCTION": "BceDiceLoss",
        "AUGMENT": True, "AUGMENT_PROB": 0.8, "SHIFTSCALEROTATE": True,
        "GRIDDISTORTION": True, "SCALER": "MinMax", "CC_FILTER": True,
        "USE_UPSAMPLE": False, "EARLY_STOPPING_PATIENCE": args.epochs,
        "MONITOR_FUNCTION": "val_loss", "SAVE_MODEL_FUNCTION": "val_loss",
        "GAUS": True, "SIGMA": 2,  # Var.2 heatmap targets: fast convergence
        "CACHE_DTYPE": args.cache_dtype,
        "WEIGHT_STANDARDISATION": args.ws,
        "WS_I_UNDERSTAND": args.ws,  # the explicit --ws flag is the ack
        "BATCH_NORMALISATION": not args.ws,
        "EMA": args.ema,
    }
    from cmrtpu.train.fold import run_experiment
    exp_path = run_experiment(config, data_path=args.root)

    from cmrtpu.eval.evaluate import evaluate_cv
    df = evaluate_cv(exp_path, args.root)
    cols = ["mdists_ant_gtpred", "mdists_inf_gtpred",
            "tpr_ant_point_th15", "ppv_ant_point_th15"]
    print("\n=== localisation results (mm) ===")
    for c in cols:
        if c in df:
            print(f"  {c:28s} {df[c].mean():8.3f} +- {df[c].std():.3f}")
    if any(c in df and df[c].isna().all()
           for c in ("mdists_ant_gtpred", "mdists_inf_gtpred")):
        print("  NOTE: NaN volume distances mean a landmark never crossed "
              "the 0.5 detection\n  threshold (volume CoM needs BOTH labels "
              "present) — train more epochs.")
    print(f"df_eval.csv: {os.path.join(exp_path, 'df_eval.csv')}")

    if args.tta:
        from cmrtpu.predict.tta import predict_tta_twin

        t_root = predict_tta_twin(exp_path, mode=args.tta_mode)
        df_t = evaluate_cv(t_root, args.root)
        print("\n=== single-forward vs rot90-TTA (mm / rate) ===")
        for c in cols:
            if c in df and c in df_t:
                print(f"  {c:28s} plain {df[c].mean():7.3f}   "
                      f"tta {df_t[c].mean():7.3f}")
        print(f"tta df_eval.csv: {os.path.join(t_root, 'df_eval.csv')}")

    if args.int8:
        from cmrtpu.predict.predictor import pred_fold
        from cmrtpu.predict.quantize import quantize_fold
        from cmrtpu import config as C

        calib = sorted(glob.glob(os.path.join(args.root, "2D", "*_img.nrrd")))
        fold_dir = sorted(glob.glob(os.path.join(exp_path, "f[0-9]")))[0]
        # the twin lands in a sibling EXPERIMENT root so evaluate_cv's
        # exp-layout globs see exactly one fold family per root
        q_root = exp_path.rstrip("/") + "_int8"
        q_fold = quantize_fold(fold_dir, calib,
                               out_dir=os.path.join(q_root, "f0"))
        pred_fold(C.load_config(os.path.join(q_fold, "config",
                                             "config.json")))
        df_q = evaluate_cv(q_root, args.root)
        print("\n=== float vs int8 twin (mm / rate) ===")
        for c in cols:
            if c in df and c in df_q:
                print(f"  {c:28s} float {df[c].mean():7.3f}   "
                      f"int8 {df_q[c].mean():7.3f}")
        print(f"int8 df_eval.csv: {os.path.join(q_root, 'df_eval.csv')}")


if __name__ == "__main__":
    main()
