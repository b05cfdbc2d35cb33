"""Analysis of a df_eval.csv — the script analogue of the reference's
Evaluate notebooks (ref: notebooks/Evaluate/*.ipynb): summary statistics in
the BVM-poster table layout, violin panels, Bland-Altman agreement and the
per-metric distribution figures, written as PNGs next to the csv.

    python examples/analyze_results.py --df <exp_root>/df_eval.csv
"""

import argparse
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def summarise(df: pd.DataFrame) -> pd.DataFrame:
    """Mean ± SD rows matching the poster tables (BASELINE.md layout)."""
    rows = []
    metric_map = [
        ("volume-based |d| anterior (mm)", "mdists_ant_gtpred"),
        ("volume-based |d| inferior (mm)", "mdists_inf_gtpred"),
        ("slice-based |d| anterior (mm)", "mdists_ant_gtpred_slice_wise"),
        ("slice-based |d| inferior (mm)", "mdists_inf_gtpred_slice_wise"),
        ("slice-based + UB |d| anterior (mm)", "mdists_ant_gtpred_slice_wise_up"),
        ("slice-based + UB |d| inferior (mm)", "mdists_inf_gtpred_slice_wise_up"),
        ("TPR (line)", "tpr_ant"),
        ("PPV (line)", "ppv_ant"),
        ("TPR w/ 15mm threshold", "tpr_ant_point_th15"),
        ("PPV w/ 15mm threshold", "ppv_ant_point_th15"),
        ("septum-angle diff (deg)", "mdiffs_gtpred"),
    ]
    for label, col in metric_map:
        if col in df:
            vals = pd.to_numeric(df[col], errors="coerce").dropna()
            if len(vals):
                rows.append({"metric": label, "mean": vals.mean(),
                             "sd": vals.std(), "n": len(vals)})
    return pd.DataFrame(rows)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--df", required=True, help="path to df_eval.csv")
    parser.add_argument("--out", default=None, help="figure directory")
    args = parser.parse_args()

    from cmrtpu.visualization import analysis as VA

    df = pd.read_csv(args.df)
    out = args.out or os.path.join(os.path.dirname(os.path.abspath(args.df)),
                                   "figures")
    os.makedirs(out, exist_ok=True)

    table = summarise(df)
    print(table.to_string(index=False,
                          formatters={"mean": "{:.3f}".format,
                                      "sd": "{:.3f}".format}))
    table.to_csv(os.path.join(out, "summary.csv"), index=False)

    dist_cols = [c for c in ("mdists_ant_gtpred", "mdists_inf_gtpred")
                 if c in df and df[c].notna().any()]
    if dist_cols:
        VA.create_eval_plot(df[dist_cols].apply(pd.to_numeric, errors="coerce"),
                            eval_name="localisation", names=("|d| mm",),
                            path=os.path.join(out, "violin_distances.png"))
    tpr_cols = [c for c in ("tpr_ant", "tpr_inf", "ppv_ant", "ppv_inf") if c in df]
    if tpr_cols:
        VA.create_eval_plot(df[tpr_cols].apply(pd.to_numeric, errors="coerce"),
                            eval_name="detection", names=("TPR / PPV",),
                            path=os.path.join(out, "violin_detection.png"))

    if ("mdists_ant_gtpred" in df and "mdists_inf_gtpred" in df
            and df["mdists_ant_gtpred"].notna().any()):
        a = pd.to_numeric(df["mdists_ant_gtpred"], errors="coerce").fillna(0)
        b = pd.to_numeric(df["mdists_inf_gtpred"], errors="coerce").fillna(0)
        fig, (md, sd) = VA.bland_altman_metric_plot(a, b, label="|d| ant vs inf")
        fig.savefig(os.path.join(out, "bland_altman.png"), dpi=96)
        print(f"bland-altman: mean diff {md:.3f} ± {1.96 * sd:.3f}")

    if "pathology" in df and df["pathology"].notna().any():
        for col in dist_cols:
            per = df.groupby("pathology")[col].agg(["mean", "std", "count"])
            print(f"\nper-pathology {col}:")
            print(per.to_string())

    print(f"\nfigures written to {out}")


if __name__ == "__main__":
    main()
