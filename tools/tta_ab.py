"""A/B a trained CV experiment against its rot90-TTA twin.

For every fold of a trained experiment root, re-run inference with
``TTA: true`` (same checkpoints — TTA is inference-only,
cmrtpu/predict/tta.py) into a sibling ``<root>_tta`` experiment root,
evaluate both through the full metric suite, and print the side-by-side
localisation columns.

    python tools/tta_ab.py -exp exp/<EXP>/<ts> -data <data_root>

The sibling-root layout keeps evaluate_cv's one-fold-family-per-root
contract (same pattern as the int8 twins, cmrtpu/predict/quantize.py
``quantize_fold``).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

COLS = ("mdists_ant_gtpred", "mdists_inf_gtpred",
        "tpr_ant_point_th15", "ppv_ant_point_th15",
        "tpr_inf_point_th15", "ppv_inf_point_th15")


def main() -> None:
    parser = argparse.ArgumentParser(
        description="A/B a trained CV experiment against its rot90-TTA twin")
    parser.add_argument("-exp", required=True,
                        help="trained experiment root (exp/<EXP>/<ts>)")
    parser.add_argument("-data", required=True, help="dataset root")
    args = parser.parse_args()

    from cmrtpu.eval.evaluate import evaluate_cv

    from cmrtpu.predict.tta import predict_tta_twin

    df = evaluate_cv(args.exp, args.data)
    t_root = predict_tta_twin(args.exp)
    df_t = evaluate_cv(t_root, args.data)
    print("\n=== single-forward vs rot90-TTA (mean over patient-phases) ===")
    for c in COLS:
        if c in df and c in df_t:
            print(f"  {c:24s} plain {df[c].mean():8.3f}   "
                  f"tta {df_t[c].mean():8.3f}")
    print(f"plain df_eval: {os.path.join(args.exp, 'df_eval.csv')}")
    print(f"tta df_eval:   {os.path.join(t_root, 'df_eval.csv')}")


if __name__ == "__main__":
    main()
