"""CLI: serving export — a trained fold to a portable StableHLO artifact.

``python -m cmrtpu.cli.export -exp <fold_dir> -out <dir> [--batch 8]
[--fold-bn] [--int8 --calib <study_dir>]``

The reference's serving story is rebuild-the-graph-then-load_weights
(ref: src/models/predict_model.py:75-76); this emits the jitted forward as
a jax.export artifact + weights npz instead, so serving processes run it
without the model code (see cmrtpu/predict/export.py). ``--fold-bn`` folds
frozen BatchNorm into the conv weights first (BN_FIRST configs only).
"""

import argparse
import json
import os


def main():
    parser = argparse.ArgumentParser(
        description="export a trained fold's forward pass for serving")
    parser.add_argument("-exp", action="store", required=True,
                        help="fold experiment dir (contains config/config.json"
                             " and model/)")
    parser.add_argument("-out", action="store", required=True,
                        help="output dir for the artifact + weights")
    parser.add_argument("--batch", type=int, default=8,
                        help="batch size baked into the exported interface")
    parser.add_argument("--fold-bn", action="store_true",
                        help="fold frozen BatchNorm into conv weights "
                             "(BN_FIRST configs)")
    parser.add_argument("--int8", action="store_true",
                        help="export the post-training-quantized int8 twin "
                             "(4x smaller weights; MXU int8 rate) — needs "
                             "--calib")
    parser.add_argument("--calib", action="store",
                        help="directory of representative studies "
                             "(.nii/.nii.gz/.nrrd) for int8 calibration")
    parser.add_argument("--calib-slices", type=int, default=256,
                        help="max calibration slices drawn from --calib")
    args = parser.parse_args()
    print(f"given parameters: {args}")

    cfg_path = os.path.join(args.exp, "config", "config.json")
    with open(cfg_path, encoding="utf-8") as fh:
        config = json.load(fh)
    model_path = os.path.join(args.exp, "model")

    int8_calib = None
    if args.int8:
        if not args.calib:
            parser.error("--int8 needs --calib <dir of studies>")
        # same study-discovery policy as the serving engine, plus the
        # label-family exclusion: activation scales calibrated on binary
        # masks (the _msk/_seg/_rvip siblings in dataset and fold layouts)
        # would skew the quantization range for real images
        from cmrtpu.predict.serving import (DEFAULT_PATTERNS, LABEL_SUFFIXES,
                                            _worklist)
        paths = _worklist(args.calib, DEFAULT_PATTERNS,
                          exclude=LABEL_SUFFIXES)
        if not paths:
            parser.error(f"no image studies found under {args.calib}")
        from cmrtpu.predict.quantize import calibration_batches_from_studies
        int8_calib = calibration_batches_from_studies(
            paths, config, batch=args.batch, max_slices=args.calib_slices)
    elif args.calib:
        parser.error("--calib only applies with --int8")

    from cmrtpu.predict.export import export_model
    out = export_model(config, model_path, args.out, batch=args.batch,
                       fold_bn=args.fold_bn, int8_calib=int8_calib)
    print(f"exported serving artifact to {out}")


if __name__ == "__main__":
    main()
