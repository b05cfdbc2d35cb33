"""CLI: per-fold inference (flag parity with
``python src/models/predict_model.py -exp <fold_dir> -data <root>``)."""

import argparse
import json
import os


def main():
    parser = argparse.ArgumentParser(description="predict a trained RVIP fold")
    parser.add_argument("-exp", action="store", default=None,
                        help="path to a fold experiment dir (contains config/config.json)")
    parser.add_argument("-data", action="store", default=None)
    args = parser.parse_args()
    print(f"given parameters: {args}")

    cfg_path = os.path.join(args.exp, "config", "config.json")
    with open(cfg_path, encoding="utf-8") as fh:
        config = json.load(fh)
    config["MODEL_PATH"] = os.path.join(args.exp, "model")
    config["EXP_PATH"] = args.exp
    if args.data:
        config["DATA_PATH_SAX"] = os.path.join(args.data, "2D")
        df_folds = os.path.join(args.data, "df_kfold.csv")
        config["DF_FOLDS"] = df_folds if os.path.isfile(df_folds) else None
        config["DATA_PATH_ORIG"] = os.path.join(args.data, "original")

    from cmrtpu.predict.predictor import pred_fold
    pred_fold(config)


if __name__ == "__main__":
    main()
