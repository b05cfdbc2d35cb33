"""Production batch serving: a restore-once engine that streams CMR studies
through a fixed-shape compiled forward, writing predictions back in ORIGINAL
image geometry, with per-stage latency accounting and an idempotent
directory-watch driver.

The reference's serving story ends at re-running ``predict_model.py`` per
experiment — every invocation pays the full graph rebuild + weight load
(ref: src/models/predict_model.py:75-76, :204-255). A TPU deployment wants
the opposite shape: initialise ONCE (deserialize the jax.export artifact or
restore a checkpoint, compile the fixed-batch forward, warm it), then keep
the chip fed with bucket-padded batches while the host does IO. This module
provides that:

  * ``ServingEngine`` — loads either a serving artifact
    (``cmrtpu/predict/export.py``; no model code needed, config embedded in
    the export META) or a live checkpoint (config + model dir). Studies go
    through the deterministic preprocessing chain
    (``preprocess_model_input``), the compiled forward in fixed-size chunks
    (one XLA program for every study shape), per-head threshold/argmax
    flattening, optional on-device connected-component filtering, and the
    inverse-preprocess into the study's own geometry.
  * ``serve_directory`` — worklist/watch driver: processes every matching
    study in a directory exactly once (crash-safe ``<stem>.done.json``
    markers that double as the latency record), optionally polling for new
    arrivals; per-study stats stream to a JSONL ledger.

Single-chip by design: serving parallelism on a pod is one engine process
per chip fed from a shared worklist — the markers make that coordination
free (rename-once semantics), no collective is involved.
"""

from __future__ import annotations

import glob
import json
import logging
import os
import time
from typing import Dict, List, Optional, Sequence

import numpy as np

from cmrtpu import config as C
from cmrtpu.io import MedicalImage, read_image, write_image
from cmrtpu.ops import resample as R
from cmrtpu.predict.postprocess import undo_generator_steps
from cmrtpu.predict.predictor import (_head_outputs, preprocess_model_input)
from cmrtpu.utils.io_utils import ensure_dir


def _flat_pred_heads(cfg: Dict, preds):
    """[(suffix, pred_flat, label_values), ...] for serve-time predictions —
    the predict-path head contract (``_head_outputs``: first sigmoid head
    owns the ``msk`` suffix, softmax heads argmax) without ground truth."""
    return [(suffix, pred_flat, label_values)
            for suffix, pred_flat, _gt, label_values
            in _head_outputs(cfg, preds, None)]


_IMAGE_EXTS = (".nii.gz", ".nii", ".nrrd")


def _stem(path: str) -> str:
    """Study identity: the basename with only the known image extension
    stripped — NOT split('.')[0], which would collide dotted names (e.g.
    DICOM-UID-style '1.2.840.1.nii.gz' and '1.2.840.2.nii.gz')."""
    base = os.path.basename(path)
    for ext in _IMAGE_EXTS:
        if base.endswith(ext):
            return base[: -len(ext)]
    return os.path.splitext(base)[0]


class ServingEngine:
    """Restore-once inference engine over a serving artifact or checkpoint.

    ``artifact_dir``: a ``cmrtpu.cli.export`` output — the exported forward
    runs without model code and the embedded config drives preprocessing.
    ``ensemble_root``: a timestamped experiment root (exp/<EXP>/<ts>) — all
    fold checkpoints serve as ONE vmapped average-probability ensemble
    (BASELINE config 5, cmrtpu/predict/ensemble.py).
    ``config``+``model_path``: live fallback (graph rebuild, reference-style).
    ``warmup``: compile/prime the forward at init so the first study does not
    pay it (the artifact's fixed batch makes this a single compilation)."""

    def __init__(self, artifact_dir: Optional[str] = None,
                 config: Optional[Dict] = None,
                 model_path: Optional[str] = None, warmup: bool = True,
                 ensemble_root: Optional[str] = None):
        t0 = time.perf_counter()
        if artifact_dir and ensemble_root:
            raise ValueError("pass an artifact_dir OR an ensemble_root")
        if ensemble_root:
            from cmrtpu.predict.ensemble import EnsemblePredictor
            ens = EnsemblePredictor.from_exp_root(ensemble_root, config)
            self.config = ens.config
            self.batch = max(int(C.get(self.config, "BATCHSIZE", 8) or 8), 1)
            self._forward = ens._forward
            self.n_members = ens.n_members
        elif artifact_dir:
            from cmrtpu.predict.export import (load_exported,
                                               load_exported_weights)
            fn, meta = load_exported(artifact_dir)
            cfg = meta.get("config") or config
            if cfg is None:
                raise ValueError(
                    f"artifact {artifact_dir} predates config-embedding "
                    "exports — pass the training config explicitly")
            self.config = C.normalise_config(dict(cfg, **(config or {})))
            params, batch_stats = load_exported_weights(artifact_dir)
            variables = {"params": params, "batch_stats": batch_stats or {}}
            self.batch = int(meta["x_shape"][0])
            self._forward = lambda x: fn(variables, x)
        else:
            if config is None:
                raise ValueError("need an artifact_dir or a config")
            from cmrtpu.predict.predictor import Predictor
            predictor = Predictor(config, model_path)
            self.config = predictor.config
            self.batch = max(int(C.get(self.config, "BATCHSIZE", 8) or 8), 1)
            self._forward = predictor._forward
        self._dim = tuple(C.get(self.config, "DIM"))
        # CC_FILTER is constant per engine — resolve the cleaner once (and
        # fail fast on an invalid mode) instead of per head per study
        from cmrtpu.predict.predictor import cc_clean_fn
        self._cc = cc_clean_fn(self.config)
        if warmup:
            x = np.zeros((self.batch, *self._dim,
                          int(C.get(self.config, "IMG_CHANNELS", 1))),
                         np.float32)
            import jax
            jax.device_get(self._forward(x))
        self.init_s = time.perf_counter() - t0
        self._totals = {"studies": 0, "slices": 0, "total_s": 0.0}
        logging.info("serving engine ready in %.1fs (batch=%d, source=%s)",
                     self.init_s, self.batch,
                     artifact_dir or ensemble_root or model_path or "config")

    # dispatch window for predict_slices: how many chunk computations may
    # be in flight before the oldest result is pulled back. JAX dispatch is
    # async, so a window > 1 overlaps chunk i's device compute with chunk
    # i+1's host prep/upload and chunk i-1's download — a serial
    # device_get per chunk instead makes the device idle through every
    # host round-trip. 4 bounds in-flight HBM to 4 batch-activations.
    PIPELINE_WINDOW = 4

    def predict_slices(self, x: np.ndarray):
        """Forward a [N, H, W, C] batch through the fixed-shape program in
        ``self.batch``-row chunks (last chunk zero-padded) — one compiled
        executable regardless of study size. Chunks are dispatched up to
        ``PIPELINE_WINDOW`` ahead so upload/compute/download overlap."""
        from collections import deque

        import jax
        n = x.shape[0]
        outs: List = []
        pending: deque = deque()
        for start in range(0, n, self.batch):
            chunk = x[start:start + self.batch]
            pad = self.batch - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad, *x.shape[1:]), x.dtype)])
            pending.append(self._forward(chunk))
            if len(pending) >= self.PIPELINE_WINDOW:
                outs.append(jax.device_get(pending.popleft()))
        while pending:
            outs.append(jax.device_get(pending.popleft()))
        joined = jax.tree_util.tree_map(
            lambda *cs: np.concatenate([np.asarray(c) for c in cs])[:n],
            *outs)
        return joined

    def process_study(self, path: str, out_dir: str) -> Dict:
        """One study end-to-end: read -> preprocess -> forward -> flatten
        heads (+ optional CC filter) -> inverse-preprocess -> write
        ``<stem>_<suffix>_pred.nrrd`` per head. Returns the latency record."""
        stats: Dict = {"file": os.path.basename(path)}
        t0 = time.perf_counter()
        img = read_image(path)
        nda = img.array
        squeeze_2d = nda.ndim == 2
        if squeeze_2d:  # single slice -> z-stack of one
            nda = nda[None]
        if nda.ndim != 3:
            raise ValueError(
                f"{path}: serving handles 2D/3D studies, got shape "
                f"{nda.shape} (slice 4D cine with cmrtpu.cli.predict_4d)")
        stats["read_s"] = round(time.perf_counter() - t0, 4)

        t1 = time.perf_counter()
        x = preprocess_model_input(nda, img.spacing[:2], self.config)
        stats["preprocess_s"] = round(time.perf_counter() - t1, 4)

        t2 = time.perf_counter()
        preds = self.predict_slices(x)
        stats["forward_s"] = round(time.perf_counter() - t2, 4)

        t3 = time.perf_counter()
        stem = _stem(path)
        outputs = []
        if squeeze_2d:
            # promote the single slice to a z-stack of one: 10 mm slice
            # thickness is the reference's config-spacing fallback
            # (ref: src/models/predict_model.py:174-181)
            orig = MedicalImage(array=nda,
                                spacing=tuple(img.spacing[:2]) + (10.0,),
                                origin=tuple(img.origin[:2]) + (0.0,),
                                metadata=dict(img.metadata))
        else:
            orig = MedicalImage(array=nda, spacing=img.spacing,
                                origin=img.origin, direction=img.direction,
                                metadata=dict(img.metadata))
        for suffix, flat, label_values in _flat_pred_heads(self.config,
                                                           preds):
            if self._cc is not None:
                import jax
                flat = np.asarray(jax.device_get(
                    self._cc(flat, label_values)))
            out_img = undo_generator_steps(flat.astype(np.uint8),
                                           self.config, R.NEAREST, orig)
            if squeeze_2d:
                out_img = MedicalImage(
                    array=out_img.array[0], spacing=out_img.spacing[:2],
                    origin=out_img.origin[:2],
                    metadata=dict(out_img.metadata))
            name = f"{stem}_{suffix}_pred.nrrd"
            write_image(out_img, os.path.join(out_dir, name))
            outputs.append(name)
        stats["post_write_s"] = round(time.perf_counter() - t3, 4)

        stats["slices"] = int(x.shape[0])
        stats["outputs"] = outputs
        stats["total_s"] = round(time.perf_counter() - t0, 4)
        stats["slices_per_s"] = round(stats["slices"] / stats["total_s"], 1)
        self._totals["studies"] += 1
        self._totals["slices"] += stats["slices"]
        self._totals["total_s"] += stats["total_s"]
        return stats

    def totals(self) -> Dict:
        t = dict(self._totals)
        t["slices_per_s"] = round(t["slices"] / t["total_s"], 1) \
            if t["total_s"] else 0.0
        return t


DEFAULT_PATTERNS = ("*.nii.gz", "*.nii", "*.nrrd")
# label-valued files that must never be treated as image studies: our own
# serving outputs, pred_fold's mask families, and dataset/RVIP ground truth
LABEL_SUFFIXES = ("_pred.nrrd", "_msk.nrrd", "_seg.nrrd", "_rvip.nrrd")
# non-study outputs of our own pipelines: label families plus pred_fold's
# original-geometry CMR copies — a serve pass over an experiment dir must
# not re-ingest any of them as fresh studies
DEFAULT_EXCLUDE = LABEL_SUFFIXES + ("_cmr.nrrd",)


_warned_collisions: set = set()  # watch mode rebuilds the worklist every
# poll; an ONGOING stem collision warns once per (loser, winner) pair, and
# pairs that disappear from their directory's scan are pruned so a
# resolved-then-reintroduced collision warns again (bounded memo)


def _worklist(in_dir: str, patterns: Sequence[str],
              exclude: Sequence[str] = DEFAULT_EXCLUDE) -> List[str]:
    files: List[str] = []
    for pat in patterns:
        files.extend(glob.glob(os.path.join(in_dir, pat)))
    # default: never re-ingest our own outputs when in_dir == out_dir
    out = sorted(f for f in set(files) if not f.endswith(tuple(exclude)))
    # one study identity per stem: patientA.nii + patientA.nrrd would share
    # the marker and the output names — the duplicate would either be
    # silently skipped forever or overwrite the first's outputs. Serve the
    # (sorted) first, warn loudly about the rest.
    seen: Dict[str, str] = {}
    unique: List[str] = []
    current: set = set()
    for f in out:
        stem = _stem(f)
        if stem in seen:
            pair = (f, seen[stem])
            current.add(pair)
            if pair not in _warned_collisions:
                logging.warning(
                    "serve worklist: %s collides with %s on study stem '%s'"
                    " — only the first is served; rename one of them to "
                    "serve both", f, seen[stem], stem)
            continue
        seen[stem] = f
        unique.append(f)
    # refresh the memo for THIS directory only: keep ongoing collisions,
    # drop resolved ones (other directories' scans are left untouched)
    prefix = os.path.join(in_dir, "")
    _warned_collisions.difference_update(
        p for p in tuple(_warned_collisions)
        if p[0].startswith(prefix) and p not in current)
    _warned_collisions.update(current)
    return unique


def _claim(marker: str, stale_claim_s: float) -> Optional[int]:
    """Atomically claim a study. Returns an open fd, or None if the study
    is already served/claimed. An EMPTY marker older than ``stale_claim_s``
    is a dead claim (hard-killed server mid-study) and is taken over —
    live claimants heartbeat their marker's mtime while processing (see
    serve_directory), so only a truly dead claim ever ages past the
    threshold. The takeover itself is a RENAME: exactly one of N competing
    reclaimers wins it (the losers' rename raises), closing the window the
    previous O_TRUNC re-open left where several watchers could all
    "reclaim" and interleave writes into one marker."""
    try:
        return os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        try:
            st = os.stat(marker)
            if st.st_size == 0 and time.time() - st.st_mtime > stale_claim_s:
                grave = f"{marker}.stale.{os.getpid()}"
                os.rename(marker, grave)  # atomic: one winner, losers raise
                os.unlink(grave)
                logging.warning("reclaimed stale empty claim %s (a previous "
                                "server died mid-study)", marker)
                return os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except OSError:
            pass
        return None


def _heartbeat(marker: str, interval_s: float):
    """Background mtime touch while a study is being processed, so a study
    that legitimately outlives ``stale_claim_s`` (large stack, cold engine)
    is never mistaken for a dead claim and double-served. Returns a stop
    callable."""
    import threading

    stop = threading.Event()

    def _touch():
        while not stop.wait(interval_s):
            try:
                os.utime(marker)
            except OSError:  # marker released (interrupt path) — stop
                return

    t = threading.Thread(target=_touch, daemon=True,
                         name="cmrtpu-claim-heartbeat")
    t.start()

    def _stop():
        stop.set()
        t.join(timeout=interval_s + 1.0)

    return _stop


def serve_directory(engine: ServingEngine, in_dir: str, out_dir: str,
                    patterns: Sequence[str] = DEFAULT_PATTERNS,
                    watch: bool = False, poll_s: float = 2.0,
                    settle_s: float = 1.0, stale_claim_s: float = 900.0,
                    stats_path: Optional[str] = None,
                    max_studies: Optional[int] = None,
                    stop_after_idle_polls: Optional[int] = None) -> Dict:
    """Process every matching study in ``in_dir`` exactly once.

    Idempotent and crash-safe: a study is claimed by atomically creating
    ``<stem>.done.json`` in ``out_dir`` (O_EXCL) BEFORE processing and the
    marker is filled with the latency record after. Concurrent engine
    processes sharing a worklist coordinate through the same markers. An
    interrupt (Ctrl-C/SIGTERM-as-exception) mid-study removes its own claim
    so a restart re-serves the study; a HARD-killed server leaves an empty
    marker, which is reclaimed once older than ``stale_claim_s``. Files
    modified less than ``settle_s`` ago are deferred (half-written uploads)
    in both watch and one-shot modes — a one-shot run simply leaves them
    unclaimed for the next run. ``watch=True`` keeps polling every
    ``poll_s`` for new arrivals; ``stop_after_idle_polls`` bounds watch mode
    for tests/drains. ``max_studies`` bounds the studies ATTEMPTED by this
    call (not the engine's lifetime count). Returns the aggregate
    throughput record."""
    ensure_dir(out_dir)
    stats_fh = open(stats_path, "a") if stats_path else None
    idle_polls = 0
    attempted = 0
    try:
        while True:
            did_work = False
            deferred = 0
            for path in _worklist(in_dir, patterns):
                if max_studies and attempted >= max_studies:
                    break
                marker = os.path.join(out_dir, f"{_stem(path)}.done.json")
                try:
                    if time.time() - os.path.getmtime(path) < settle_s:
                        deferred += 1
                        continue  # still being written — defer
                except OSError:
                    continue  # vanished between glob and stat
                fd = _claim(marker, stale_claim_s)
                if fd is None:
                    continue  # processed (or live-claimed) already
                stop_heartbeat = _heartbeat(marker,
                                            max(stale_claim_s / 4.0, 0.5))
                with os.fdopen(fd, "w") as fh:
                    try:
                        record = engine.process_study(path, out_dir)
                    except Exception as e:
                        record = {"file": os.path.basename(path),
                                  "error": f"{type(e).__name__}: {e}"}
                        logging.exception("serving failed on %s", path)
                    except BaseException:
                        # interrupt mid-study: release the claim so a
                        # restart re-serves this study instead of skipping
                        # it forever on an empty marker
                        os.unlink(marker)
                        raise
                    finally:
                        stop_heartbeat()
                    json.dump(record, fh)
                attempted += 1
                if stats_fh:
                    stats_fh.write(json.dumps(record) + "\n")
                    stats_fh.flush()
                did_work = True
                logging.info("served %s: %s", path,
                             record.get("slices_per_s", record.get("error")))
            if max_studies and attempted >= max_studies:
                break
            if not watch:
                if deferred:
                    logging.warning(
                        "serve_directory: %d file(s) modified < %.1fs ago "
                        "were deferred as possibly half-written and left "
                        "unclaimed — re-run (or use --watch) to serve them",
                        deferred, settle_s)
                break
            idle_polls = 0 if did_work else idle_polls + 1
            if stop_after_idle_polls and idle_polls >= stop_after_idle_polls:
                break
            time.sleep(poll_s)
    finally:
        if stats_fh:
            stats_fh.close()
    totals = engine.totals()
    logging.info("serve_directory done: %s", totals)
    return totals
