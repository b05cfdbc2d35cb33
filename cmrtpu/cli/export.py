"""CLI: serving export — a trained fold to a portable StableHLO artifact.

``python -m cmrtpu.cli.export -exp <fold_dir> -out <dir> [--batch 8]
[--fold-bn]``

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
    args = parser.parse_args()
    print(f"given parameters: {args}")

    cfg_path = os.path.join(args.exp, "config", "config.json")
    with open(cfg_path, encoding="utf-8") as fh:
        config = json.load(fh)
    model_path = os.path.join(args.exp, "model")

    from cmrtpu.predict.export import export_model
    out = export_model(config, model_path, args.out, batch=args.batch,
                       fold_bn=args.fold_bn)
    print(f"exported serving artifact to {out}")


if __name__ == "__main__":
    main()
