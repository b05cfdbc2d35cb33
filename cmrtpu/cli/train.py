"""CLI: train a RVIP detection model (flag parity with
``python src/models/train_model.py -cfg <json> -data <root>``)."""

import argparse
import json


def main():
    parser = argparse.ArgumentParser(
        description="train a RV IP detection/segmentation model on CMR images")
    parser.add_argument("-cfg", action="store", default=None,
                        help="path to an experiment config (exp/template_cfgs)")
    parser.add_argument("-data", action="store", default=None,
                        help="path to the data-root folder (2D/, df_kfold.csv, original/)")
    parser.add_argument("-inmemory", action="store", default=None,
                        help="cache deterministic preprocessing in RAM")
    parser.add_argument("-resume", action="store", default=None,
                        help="path to an EXISTING timestamped run "
                             "(exp/<EXP>/<ts>) to resume after a crash or "
                             "preemption — restores each fold's full train "
                             "state and continues its epoch count")
    args = parser.parse_args()
    print(f"given parameters: {args}")
    assert args.cfg is not None, "no config given"
    assert args.data is not None, "no data given"

    with open(args.cfg, encoding="utf-8") as fh:
        config = json.load(fh)
    if args.resume:
        config["RESUME"] = True

    from cmrtpu.train.fold import run_experiment
    run_experiment(config, data_path=args.data, exp_path=args.resume)


if __name__ == "__main__":
    main()
