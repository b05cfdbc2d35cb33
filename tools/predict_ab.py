"""A/B a trained CV experiment against an inference-only override twin.

For every fold of a trained experiment root, re-run inference with the
given config overrides (same checkpoints) into a sibling
``<root>_<suffix>`` root, evaluate both through the full metric suite, and
print the side-by-side localisation columns. Generalises tools/tta_ab.py
to ANY predict-time knob:

    python tools/predict_ab.py -exp exp/<EXP>/<ts> -data <root> \
        --set CC_FILTER=3d --suffix cc3d

(--set values are JSON-parsed when possible, so booleans/numbers work.)
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
        description="A/B a trained CV root against an inference-override twin")
    parser.add_argument("-exp", required=True,
                        help="trained experiment root (exp/<EXP>/<ts>)")
    parser.add_argument("-data", required=True, help="dataset root")
    parser.add_argument("--set", dest="overrides", action="append",
                        default=[], metavar="KEY=VAL", required=True,
                        help="inference-only config override (repeatable)")
    parser.add_argument("--suffix", default="ab",
                        help="sibling-root suffix (default 'ab')")
    args = parser.parse_args(argv)

    from cmrtpu import config as C
    from cmrtpu.eval.evaluate import evaluate_cv
    from cmrtpu.predict.predictor import predict_override_twin

    # typed + validated: Python-literal booleans become real booleans
    # (--set TTA=False must DISABLE the knob) and typo'd keys raise
    overrides = C.parse_override_pairs(args.overrides)
    df = evaluate_cv(args.exp, args.data)
    t_root = predict_override_twin(args.exp, overrides, args.suffix)
    df_t = evaluate_cv(t_root, args.data)
    print(f"\n=== plain vs {overrides} (mean over patient-phases) ===")
    for c in COLS:
        if c in df and c in df_t:
            print(f"  {c:24s} plain {df[c].mean():8.3f}   "
                  f"twin {df_t[c].mean():8.3f}")
    print(f"plain df_eval: {os.path.join(args.exp, 'df_eval.csv')}")
    print(f"twin df_eval:  {os.path.join(t_root, 'df_eval.csv')}")


if __name__ == "__main__":
    main()
