"""Execute the guided notebook suite end-to-end with nbclient.

Mirrors the reference's notebooks/ walkthroughs (SURVEY.md §2.1 — the
8-notebook suite). Each notebook is self-contained: its bootstrap cell
forces the CPU platform and synthesizes its own tiny dataset under /tmp,
so the suite runs anywhere the package's CPU path runs.

Usage:  python tools/run_notebooks.py [--pattern SUBSTR] [--timeout SEC]

Exit 0 when every notebook executed cleanly; the executed notebooks are NOT
written back (the repo keeps them output-free).
"""

import argparse
import glob
import os
import sys
import time


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--pattern", default="",
                        help="only notebooks whose path contains this")
    parser.add_argument("--timeout", type=int, default=1200,
                        help="per-cell execution timeout (seconds)")
    args = parser.parse_args()

    import nbformat
    from nbclient import NotebookClient

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = sorted(glob.glob(os.path.join(repo, "notebooks", "**", "*.ipynb"),
                             recursive=True))
    paths = [p for p in paths if args.pattern in p]
    if not paths:
        print(f"no notebooks match {args.pattern!r}")
        return 2

    failures = []
    for path in paths:
        rel = os.path.relpath(path, repo)
        t0 = time.perf_counter()
        nb = nbformat.read(path, as_version=4)
        client = NotebookClient(nb, timeout=args.timeout,
                                resources={"metadata": {
                                    "path": os.path.dirname(path)}})
        try:
            client.execute()
            print(f"ok   {rel} ({time.perf_counter() - t0:.1f}s)")
        except Exception as e:  # nbclient raises CellExecutionError
            failures.append(rel)
            print(f"FAIL {rel}: {type(e).__name__}: {str(e)[:400]}")
    print(f"{len(paths) - len(failures)}/{len(paths)} notebooks executed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
