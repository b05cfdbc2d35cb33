"""Quality loop for BASELINE config 3: 2D+t cine heatmap regression.

Generates synthetic cine SAX stacks whose RVIP landmarks move smoothly over
the cardiac cycle (per-frame contraction toward the stack centre), trains a
3D (t,y,x) U-Net with t-preserving pooling (M_POOL=[1,2,2]) through the
device-cached fused loop — the same volume-batched path bench.py's
`cine_2dt` row measures — and reports per-frame mm localisation error on
held-out patients for both detection strategies (CoM = reference parity,
ref: src/models/evaluate_cv.py:418; argmax).

The augmentation draw broadcasts across t (ReplayCompose
additional_targets semantics, ref: src/data/Preprocess.py:230-352), so a
whole stack receives one consistent warp — pinned by tests/test_cine.py;
this demo shows the config trains to sub-pixel quality, not just that the
loss decreases.

Measured (12 patients, 48², t=6, CPU ~10 min): 600 epochs → held-out CoM
0.50 mm mean / argmax 0.86 mm, 31/36 landmarks detected; 250 epochs →
1.35 mm / 2.0 mm.

    python examples/cine_quality_demo.py --patients 12 --epochs 600
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SPACING_MM = 1.4


def generate_cine_cohort(root, n_patients, t_frames, hw, seed=0):
    """Per-patient cine stacks: landmarks oscillate toward the centre over
    t (systole-like motion), image carries bright/dark cues + noise."""
    from cmrtpu.io import MedicalImage, write_image
    from cmrtpu.utils.io_utils import ensure_dir

    rng = np.random.default_rng(seed)
    ensure_dir(root)
    xs, ys, gts = [], [], {}
    for p in range(n_patients):
        pid = f"patient{p:03d}"
        ant0 = np.array([hw // 3 + rng.integers(-3, 4),
                         2 * hw // 3 + rng.integers(-3, 4)], float)
        inf0 = np.array([2 * hw // 3 + rng.integers(-3, 4),
                         hw // 3 + rng.integers(-3, 4)], float)
        centre = np.array([hw / 2, hw / 2])
        img = rng.normal(0, 0.2, size=(t_frames, hw, hw)).astype(np.float32)
        msk = np.zeros((t_frames, hw, hw), np.uint8)
        gt = np.zeros((t_frames, 2, 2), float)  # [t, (ant,inf), (y,x)]
        for t in range(t_frames):
            # contraction phase: 0 -> ~20% toward the centre -> back
            phase = 0.2 * np.sin(np.pi * t / max(t_frames - 1, 1))
            a = np.round(ant0 + phase * (centre - ant0)).astype(int)
            i = np.round(inf0 + phase * (centre - inf0)).astype(int)
            img[t, a[0] - 1:a[0] + 2, a[1] - 1:a[1] + 2] += 2.0
            img[t, i[0] - 1:i[0] + 2, i[1] - 1:i[1] + 2] -= 2.0
            msk[t, a[0] - 1:a[0] + 2, a[1] - 1:a[1] + 2] = 1
            msk[t, i[0] - 1:i[0] + 2, i[1] - 1:i[1] + 2] = 2
            gt[t, 0], gt[t, 1] = a, i
        xp = os.path.join(root, f"{pid}__cine_img.nrrd")
        yp = os.path.join(root, f"{pid}__cine_msk.nrrd")
        write_image(MedicalImage(array=img, spacing=(SPACING_MM,) * 2 + (1.0,)), xp)
        write_image(MedicalImage(array=msk, spacing=(SPACING_MM,) * 2 + (1.0,)), yp)
        xs.append(xp)
        ys.append(yp)
        gts[pid] = gt
    return xs, ys, gts


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", default="/tmp/cmrtpu_cine_demo")
    parser.add_argument("--patients", type=int, default=16)
    parser.add_argument("--t-frames", type=int, default=8)
    parser.add_argument("--dim", type=int, default=48)
    parser.add_argument("--epochs", type=int, default=200)
    parser.add_argument("--sigma", type=float, default=2)
    parser.add_argument("--pool-t", action="store_true",
                        help="M_POOL=[2,2,2]: pool the t axis too — the "
                             "measured +34%% throughput arm (tools/"
                             "probe3d.py); the decoder upsamples t back so "
                             "output stays per-frame. A/B this flag for "
                             "quality before adopting.")
    parser.add_argument("--variant", default="unet",
                        help="MODEL_VARIANT (e.g. unet_2p1d, or 'wrapper' "
                             "for the SliceDistributed2D hybrid that rides "
                             "the 2D step)")
    parser.add_argument("--depth", type=int, default=3,
                        help="U-Net DEPTH — use 4 to match the bench/"
                             "flagship configuration (the advisor's r4 "
                             "finding: quality A/Bs must run at the depth "
                             "being advertised)")
    parser.add_argument("--filters", type=int, default=8)
    parser.add_argument("--budget-s", type=float, default=0,
                        help="equal-wall-clock mode: train until this many "
                             "seconds elapse (epochs becomes an upper "
                             "bound) — the fair way to A/B architectures "
                             "with different step rates")
    parser.add_argument("--group-norm", type=int, default=0,
                        help="GROUP_NORM groups (0 = BatchNorm)")
    args = parser.parse_args()

    from cmrtpu.eval.detection import detect
    from cmrtpu.pipeline.generator import DataGenerator
    from cmrtpu.train.trainer import Trainer

    xs, ys, gts = generate_cine_cohort(args.root, args.patients,
                                       args.t_frames, args.dim)
    n_test = max(2, args.patients // 4)
    train_x, train_y = xs[:-n_test], ys[:-n_test]
    test_x, test_y = xs[-n_test:], ys[-n_test:]

    cfg = {"DIM": [args.t_frames, args.dim, args.dim],
           "MODEL_VARIANT": args.variant,
           "F_SIZE": [3, 3, 3],
           "M_POOL": [2, 2, 2] if args.pool_t else [1, 2, 2],
           "DEPTH": args.depth, "FILTERS": args.filters,
           "GROUP_NORM": args.group_norm,
           "BATCHSIZE": min(4, len(train_x)),
           "MASK_VALUES": [1, 2], "MASK_CLASSES": 2, "SEED": 42,
           "OPTIMIZER": "adam", "LEARNING_RATE": 1e-3,
           "LOSS_FUNCTION": "BceDiceLoss", "SCALER": "MinMax",
           "RESAMPLE": False, "MIXED_PRECISION": True,
           "AUGMENT": True, "AUGMENT_PROB": 0.8, "RANDOMROTATE": True,
           "SHIFTSCALEROTATE": True, "GRIDDISTORTION": True,
           "GAUS": args.sigma > 0, "SIGMA": args.sigma}

    trainer = Trainer(cfg)
    callbacks = []
    epochs = args.epochs
    if args.budget_s > 0:
        from cmrtpu.train.callbacks import TimeBudget
        callbacks.append(TimeBudget(args.budget_s))
        epochs = max(args.epochs, 1_000_000)  # budget decides, not epochs
    import time
    t0 = time.time()
    hist = trainer.fit_cached(DataGenerator(train_x, train_y, config=cfg),
                              epochs=epochs, callbacks=callbacks)
    wall = time.time() - t0
    n_epochs = len(hist)
    frames = len(train_x) * args.t_frames * n_epochs
    print(f"train loss {hist[0]['loss']:.4f} -> {hist[-1]['loss']:.4f} "
          f"({n_epochs} epochs, {wall:.1f}s wall, "
          f"{frames / max(wall, 1e-9):.1f} frames/s incl. compile)")

    # held-out stacks through the deterministic stage only (no augmentation,
    # binary masks so GT positions come from the same geometry the model saw)
    test_gen = DataGenerator(test_x, test_y,
                             config=dict(cfg, AUGMENT=False, GAUS=False,
                                         SHUFFLE=False,
                                         BATCHSIZE=1))  # < n_test, so no
    # held-out stack is dropped by batch truncation
    errs = {"com": [], "argmax": []}
    missed = 0
    for b in range(len(test_gen)):
        xb, yb = test_gen[b]
        preds = np.asarray(trainer.predict(np.asarray(xb)))
        B, T = preds.shape[:2]
        flat_pred = preds.reshape(B * T, *preds.shape[2:])
        flat_gt = np.asarray(yb).reshape(B * T, *preds.shape[2:])
        gt_coords, gt_valid = detect(flat_gt, strategy="com")
        for strategy in errs:
            coords, valid = detect(flat_pred, strategy=strategy)
            coords, valid = np.asarray(coords), np.asarray(valid)
            ok = np.asarray(gt_valid) & valid
            d = np.linalg.norm(coords - np.asarray(gt_coords), axis=-1)
            errs[strategy].extend((d[ok] * SPACING_MM).tolist())
            if strategy == "com":
                missed += int((np.asarray(gt_valid) & ~valid).sum())

    print(f"\n=== held-out per-frame localisation, {n_test} patients x "
          f"{args.t_frames} frames (mm @ {SPACING_MM} mm spacing) ===")
    for strategy, d in errs.items():
        d = np.array(d)
        if len(d) == 0:
            print(f"  {strategy:7s} no landmark crossed the 0.5 threshold "
                  f"— train more epochs")
            continue
        print(f"  {strategy:7s} mean {d.mean():6.3f} +- {d.std():.3f}   "
              f"p95 {np.percentile(d, 95):6.3f}   n={len(d)}")
    print(f"  landmarks missed (never crossed 0.5): {missed}")


if __name__ == "__main__":
    main()
