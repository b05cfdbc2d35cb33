"""CLI: CV evaluation -> df_eval.csv (flag parity with
``python src/models/evaluate_cv.py -exp <exp_root> -data <root>``)."""

import argparse


def main():
    parser = argparse.ArgumentParser(
        description="evaluate the cv of a rvip detection model")
    parser.add_argument("-exp", action="store", default=None)
    parser.add_argument("-data", action="store", default=None)
    args = parser.parse_args()
    print(f"given parameters: {args}")

    from cmrtpu.eval.evaluate import evaluate_cv
    df = evaluate_cv(args.exp, args.data)
    print(f"evaluation done for {args.exp}: {len(df)} patient-phase rows "
          "-> df_eval.csv")


if __name__ == "__main__":
    main()
