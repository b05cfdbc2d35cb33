"""CLI: run a trained 2D CV over full 4D CMR sequences (flag parity with
``python src/models/predict_4d_on_seg.py -exp <exp_root> -data <root>``,
ref: src/models/predict_4d_on_seg.py:23-113)."""

import argparse


def main():
    parser = argparse.ArgumentParser(
        description="predict 4D cine CMR with a trained 2D cross-validation")
    parser.add_argument("-exp", action="store", default=None,
                        help="experiment root containing the f<k> fold dirs")
    parser.add_argument("-data", action="store", default=None,
                        help="data root (original/ with *4d.nii.gz files)")
    parser.add_argument("-suffix", action="store", default="pred_4d",
                        help="per-fold export sub-directory name")
    args = parser.parse_args()
    print(f"given parameters: {args}")
    assert args.exp is not None, "no experiment root given"
    assert args.data is not None, "no data given"

    from cmrtpu.predict.predictor import predict_4d_on_2d_cv
    predict_4d_on_2d_cv(args.exp, args.data, export_suffix=args.suffix)


if __name__ == "__main__":
    main()
