"""A/B a trained CV experiment against its uniform model soup.

The vmapped 4-fold ensemble (BASELINE config 5) pays 4x the single-model
serving cost; the soup (average the fold checkpoints into ONE model,
cmrtpu/predict/ensemble.py soup_experiment) pays 1x. This tool materializes
the soup root, evaluates both through the full metric suite, and prints the
side-by-side localisation columns — the quality evidence for (or against)
deploying the soup instead of the ensemble.

    python tools/soup_ab.py -exp exp/<EXP>/<ts> -data <root>
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

COLS = ("mdists_ant_gtpred", "mdists_inf_gtpred",
        "tpr_ant_point_th15", "ppv_ant_point_th15",
        "tpr_inf_point_th15", "ppv_inf_point_th15")


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        description="A/B a trained CV root against its uniform model soup")
    parser.add_argument("-exp", required=True,
                        help="trained experiment root (exp/<EXP>/<ts>)")
    parser.add_argument("-data", required=True, help="dataset root")
    args = parser.parse_args(argv)

    from cmrtpu.eval.evaluate import evaluate_cv
    from cmrtpu.predict.ensemble import soup_experiment

    df = evaluate_cv(args.exp, args.data)
    soup_root = soup_experiment(args.exp)
    df_s = evaluate_cv(soup_root, args.data)
    print("\n=== per-fold CV vs uniform soup (mean over patient-phases) ===")
    for c in COLS:
        if c in df and c in df_s:
            print(f"  {c:24s} cv {df[c].mean():8.3f}   "
                  f"soup {df_s[c].mean():8.3f}")
    print(f"cv df_eval:   {os.path.join(args.exp, 'df_eval.csv')}")
    print(f"soup df_eval: {os.path.join(soup_root, 'df_eval.csv')}")


if __name__ == "__main__":
    main()
