"""mm-level A/B of a trained CV experiment against its int8 PTQ twin.

Sigmoid-space deviation (the test gate) is a proxy; the deployment question
is whether int8 moves the LANDMARKS. This tool quantizes every fold
(cmrtpu/predict/quantize.py quantize_fold — GN configs get the automatic
GroupNorm affine recalibration), re-runs each fold's test-split inference
with the twin, evaluates both roots through the full metric suite, and
prints the side-by-side localisation columns.

    python tools/int8_ab.py -exp exp/<EXP>/<ts> -data <root>
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

COLS = ("mdists_ant_gtpred", "mdists_inf_gtpred",
        "tpr_ant_point_th15", "ppv_ant_point_th15",
        "tpr_inf_point_th15", "ppv_inf_point_th15")


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        description="A/B a trained CV root against its int8 PTQ twin")
    parser.add_argument("-exp", required=True,
                        help="trained experiment root (exp/<EXP>/<ts>)")
    parser.add_argument("-data", required=True, help="dataset root")
    parser.add_argument("--calib-studies", type=int, default=16,
                        help="number of original study files to calibrate on")
    args = parser.parse_args(argv)

    from cmrtpu import config as C
    from cmrtpu.eval.evaluate import evaluate_cv
    from cmrtpu.predict.predictor import pred_fold
    from cmrtpu.predict.quantize import quantize_fold

    calib = sorted(
        f for f in glob.glob(os.path.join(args.data, "original", "*",
                                          "*frame[0-9][0-9].nii.gz"))
        if not f.endswith("_gt.nii.gz"))[:args.calib_studies]
    assert calib, f"no original study files under {args.data}/original"

    df = evaluate_cv(args.exp, args.data)
    int8_root = None
    for fold_dir in sorted(glob.glob(os.path.join(args.exp, "f[0-9]*"))):
        out = quantize_fold(fold_dir, calib)
        int8_root = os.path.dirname(out)
        cfg = C.load_config(os.path.join(out, "config", "config.json"))
        pred_fold(cfg)
    df_q = evaluate_cv(int8_root, args.data)
    print("\n=== float vs int8 twin (mean over patient-phases) ===")
    for c in COLS:
        if c in df and c in df_q:
            print(f"  {c:24s} float {df[c].mean():8.3f}   "
                  f"int8 {df_q[c].mean():8.3f}")
    print(f"float df_eval: {os.path.join(args.exp, 'df_eval.csv')}")
    print(f"int8 df_eval:  {os.path.join(int8_root, 'df_eval.csv')}")


if __name__ == "__main__":
    main()
