"""CLI: production batch serving over a directory of CMR studies.

``python -m cmrtpu.cli.serve -artifact <export_dir> -in <dir> -out <dir>
[--watch] [--poll 2.0] [--stats <file.jsonl>] [--max-studies N]``

or from a trained fold (live restore, reference-style rebuild):

``python -m cmrtpu.cli.serve -exp <fold_dir> -in <dir> -out <dir> ...``

Restores ONCE, then streams every ``*.nii.gz`` / ``*.nii`` / ``*.nrrd``
study in ``-in`` through the fixed-shape compiled forward and writes
``<stem>_<head>_pred.nrrd`` predictions in each study's ORIGINAL geometry
into ``-out``, with per-study latency records in crash-safe ``.done.json``
markers (which also make re-runs and concurrent servers idempotent).
``--watch`` keeps polling for new arrivals. The reference has no serving
entry point — its closest analog re-runs predict_model.py per experiment
(ref: src/models/predict_model.py:204-255), paying the restore every time.
"""

import argparse
import json
import logging
import os


def main():
    parser = argparse.ArgumentParser(
        description="serve CMR landmark predictions over a study directory")
    src = parser.add_mutually_exclusive_group(required=True)
    src.add_argument("-artifact", action="store",
                     help="serving artifact dir (cmrtpu.cli.export output)")
    src.add_argument("-exp", action="store",
                     help="trained fold dir (config/config.json + model/)")
    src.add_argument("-ensemble", action="store",
                     help="timestamped experiment root (exp/<EXP>/<ts>): "
                          "serve ALL fold checkpoints as one vmapped "
                          "average-probability ensemble")
    parser.add_argument("-in", dest="in_dir", action="store", required=True,
                        help="directory of input studies (nii/nii.gz/nrrd)")
    parser.add_argument("-out", dest="out_dir", action="store", required=True,
                        help="output directory for predictions + markers")
    parser.add_argument("--watch", action="store_true",
                        help="keep polling for new studies (Ctrl-C to stop)")
    parser.add_argument("--poll", type=float, default=2.0,
                        help="watch-mode poll interval in seconds")
    parser.add_argument("--stats", action="store",
                        help="append per-study latency records to this JSONL")
    parser.add_argument("--max-studies", type=int, default=None,
                        help="stop after N studies (drain/smoke runs)")
    args = parser.parse_args()
    print(f"given parameters: {args}")
    logging.basicConfig(level=logging.INFO)

    from cmrtpu.predict.serving import ServingEngine, serve_directory

    if args.artifact:
        engine = ServingEngine(artifact_dir=args.artifact)
    elif args.ensemble:
        engine = ServingEngine(ensemble_root=args.ensemble)
    else:
        cfg_path = os.path.join(args.exp, "config", "config.json")
        with open(cfg_path, encoding="utf-8") as fh:
            config = json.load(fh)
        engine = ServingEngine(config=config,
                               model_path=os.path.join(args.exp, "model"))

    try:
        totals = serve_directory(engine, args.in_dir, args.out_dir,
                                 watch=args.watch, poll_s=args.poll,
                                 stats_path=args.stats,
                                 max_studies=args.max_studies)
    except KeyboardInterrupt:
        totals = engine.totals()
    print(json.dumps(totals))


if __name__ == "__main__":
    main()
