"""A/B a trained CV experiment against its rot90-TTA twin.

Thin wrapper over the generic inference-override A/B (tools/predict_ab.py)
with ``--set TTA=true --suffix tta`` pre-filled — kept for the documented
CLI surface; the twin logic lives in one place
(cmrtpu/predict/predictor.py::predict_override_twin).

    python tools/tta_ab.py -exp exp/<EXP>/<ts> -data <data_root>
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import predict_ab  # noqa: E402


def main() -> None:
    parser = argparse.ArgumentParser(
        description="A/B a trained CV experiment against its rot90-TTA twin")
    parser.add_argument("-exp", required=True,
                        help="trained experiment root (exp/<EXP>/<ts>)")
    parser.add_argument("-data", required=True, help="dataset root")
    parser.add_argument("--mode", default="probs", choices=["probs", "coords"],
                        help="probs = orbit-average the sigmoid maps (can "
                             "blur peaks); coords = orbit-average landmark "
                             "COORDINATES (blur-proof; cmrtpu/predict/tta.py)")
    args = parser.parse_args()
    predict_ab.main(["-exp", args.exp, "-data", args.data,
                     "--set", "TTA=true",
                     "--set", f"TTA_MODE={args.mode}",
                     "--suffix", f"tta_{args.mode}"])


if __name__ == "__main__":
    main()
