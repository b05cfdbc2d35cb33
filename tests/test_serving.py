"""Production serving engine + directory watcher (cmrtpu/predict/serving.py).

The reference has no serving entry point (its closest analog re-runs
predict_model.py per experiment, ref: src/models/predict_model.py:204-255);
these tests pin the restore-once engine: artifact and live restores agree,
outputs land in the study's original geometry, markers make re-runs and
watch mode idempotent, and latency records are complete.
"""

import glob
import json
import os

import numpy as np
import pytest

from cmrtpu.io import MedicalImage, read_image, write_image
from cmrtpu.predict.serving import (ServingEngine, _flat_pred_heads,
                                    serve_directory)
from cmrtpu.train import checkpoint as ckpt
from cmrtpu.train.trainer import Trainer

CFG = {"DIM": [32, 32], "DEPTH": 2, "FILTERS": 4, "MASK_CLASSES": 2,
       "MASK_VALUES": [1, 2], "BATCHSIZE": 4, "MIXED_PRECISION": False,
       "SPACING": [1.0, 1.0], "RESAMPLE": True, "SCALER": "MinMax",
       "LEARNING_RATE": 1e-3, "SEED": 11}


def _study(path: str, z: int = 3, seed: int = 0) -> MedicalImage:
    rng = np.random.default_rng(seed)
    img = MedicalImage(array=rng.normal(size=(z, 24, 28)).astype(np.float32),
                       spacing=(1.5, 1.5, 8.0), origin=(3.0, -2.0, 10.0))
    write_image(img, path)
    os.utime(path, (0, 0))  # settled (serve defers files younger than settle_s)
    return img


@pytest.fixture(scope="module")
def fold_dir(tmp_path_factory):
    """A 'trained' fold: tiny config + saved weights."""
    d = tmp_path_factory.mktemp("fold")
    trainer = Trainer(CFG)
    model_dir = str(d / "model")
    ckpt.save_weights(model_dir, trainer.state.params,
                      trainer.state.batch_stats)
    return str(d)


def test_serve_directory_once(fold_dir, tmp_path):
    in_dir, out_dir = tmp_path / "in", tmp_path / "out"
    in_dir.mkdir()
    studies = {f"study{i:02d}": _study(str(in_dir / f"study{i:02d}.nrrd"),
                                       z=2 + i, seed=i) for i in range(2)}

    engine = ServingEngine(config=CFG,
                           model_path=os.path.join(fold_dir, "model"))
    stats_path = str(tmp_path / "stats.jsonl")
    totals = serve_directory(engine, str(in_dir), str(out_dir),
                             stats_path=stats_path)

    assert totals["studies"] == 2
    assert totals["slices"] == 2 + 3
    assert totals["slices_per_s"] > 0
    for stem, src in studies.items():
        out = read_image(str(out_dir / f"{stem}_msk_pred.nrrd"))
        # original geometry restored despite the 1.5mm->1.0mm model spacing
        assert out.array.shape == src.array.shape
        assert out.spacing == pytest.approx(src.spacing)
        assert out.origin == pytest.approx(src.origin)
        assert set(np.unique(out.array)) <= {0, 1, 2}
        marker = json.loads((out_dir / f"{stem}.done.json").read_text())
        assert marker["slices"] == src.array.shape[0]
        assert marker["outputs"] == [f"{stem}_msk_pred.nrrd"]
        for key in ("read_s", "preprocess_s", "forward_s", "post_write_s",
                    "total_s", "slices_per_s"):
            assert key in marker
    with open(stats_path) as fh:
        assert len(fh.readlines()) == 2

    # idempotence: a second pass (fresh engine totals) processes nothing new
    totals2 = serve_directory(engine, str(in_dir), str(out_dir))
    assert totals2["studies"] == 2  # unchanged engine totals — no new work
    assert len(glob.glob(str(out_dir / "*_pred.nrrd"))) == 2


def test_artifact_and_live_engines_agree(fold_dir, tmp_path):
    from cmrtpu.predict.export import export_model

    artifact = str(tmp_path / "artifact")
    export_model(CFG, os.path.join(fold_dir, "model"), artifact, batch=4)
    # the embedded config makes the artifact self-contained for serving
    meta = json.loads(open(os.path.join(artifact, "export.json")).read())
    assert meta["config"]["SPACING"] == [1.0, 1.0]

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    _study(str(in_dir / "s.nrrd"), z=5, seed=3)

    served = ServingEngine(artifact_dir=artifact)
    live = ServingEngine(config=CFG,
                         model_path=os.path.join(fold_dir, "model"))
    out_a, out_b = tmp_path / "out_a", tmp_path / "out_b"
    served.process_study(str(in_dir / "s.nrrd"), str(out_a.mkdir() or out_a))
    live.process_study(str(in_dir / "s.nrrd"), str(out_b.mkdir() or out_b))
    a = read_image(str(out_a / "s_msk_pred.nrrd"))
    b = read_image(str(out_b / "s_msk_pred.nrrd"))
    np.testing.assert_array_equal(a.array, b.array)
    # chunking: z=5 through a fixed batch of 4 pads the second chunk
    assert a.array.shape[0] == 5


def test_watch_mode_drains_and_stops(fold_dir, tmp_path):
    in_dir, out_dir = tmp_path / "in", tmp_path / "out"
    in_dir.mkdir()
    _study(str(in_dir / "w.nrrd"), z=2, seed=5)
    os.utime(str(in_dir / "w.nrrd"), (0, 0))  # old mtime — settled

    engine = ServingEngine(config=CFG,
                           model_path=os.path.join(fold_dir, "model"))
    totals = serve_directory(engine, str(in_dir), str(out_dir), watch=True,
                             poll_s=0.01, stop_after_idle_polls=2)
    assert totals["studies"] == 1
    assert (out_dir / "w_msk_pred.nrrd").exists()


def test_single_slice_2d_study(fold_dir, tmp_path):
    in_dir, out_dir = tmp_path / "in", tmp_path / "out"
    in_dir.mkdir()
    img = MedicalImage(
        array=np.random.default_rng(1).normal(size=(24, 28)).astype(np.float32),
        spacing=(1.5, 1.5))
    write_image(img, str(in_dir / "flat.nrrd"))
    os.utime(str(in_dir / "flat.nrrd"), (0, 0))
    engine = ServingEngine(config=CFG,
                           model_path=os.path.join(fold_dir, "model"))
    serve_directory(engine, str(in_dir), str(out_dir))
    out = read_image(str(out_dir / "flat_msk_pred.nrrd"))
    assert out.array.shape == img.array.shape
    assert out.spacing[:2] == pytest.approx(img.spacing[:2])


def test_flat_pred_heads_multihead_suffixes():
    cfg = {"HEADS": [["rvip", 2, "sigmoid"], ["sep", 3, "softmax"]]}
    rng = np.random.default_rng(0)
    preds = {"rvip": rng.random((2, 8, 8, 2)),
             "sep": rng.random((2, 8, 8, 3))}
    outs = _flat_pred_heads(cfg, preds)
    assert [o[0] for o in outs] == ["msk", "sep"]
    msk, sep = outs[0][1], outs[1][1]
    assert set(np.unique(msk)) <= {0, 1, 2}          # sigmoid 0.5 -> {1,2}
    assert set(np.unique(sep)) <= {0, 1, 2}          # argmax, 0 = background
    assert outs[0][2] == (1, 2) and outs[1][2] == (1, 2)


def test_ensemble_serving(tmp_path):
    """An experiment root's fold checkpoints serve as ONE vmapped ensemble
    whose output is the average member probability (BASELINE config 5)."""
    import json as _json

    from cmrtpu.predict.predictor import Predictor

    exp_root = tmp_path / "exp" / "ts"
    fold_model_dirs = []
    for k in range(2):
        trainer = Trainer(dict(CFG, SEED=100 + k))
        d = exp_root / f"f{k}"
        (d / "config").mkdir(parents=True)
        (d / "config" / "config.json").write_text(_json.dumps(CFG))
        ckpt.save_weights(str(d / "model"), trainer.state.params,
                          trainer.state.batch_stats)
        fold_model_dirs.append(str(d / "model"))

    in_dir, out_dir = tmp_path / "in", tmp_path / "out"
    in_dir.mkdir()
    _study(str(in_dir / "e.nrrd"), z=3, seed=7)

    engine = ServingEngine(ensemble_root=str(exp_root))
    assert engine.n_members == 2
    totals = serve_directory(engine, str(in_dir), str(out_dir))
    assert totals["studies"] == 1
    out = read_image(str(out_dir / "e_msk_pred.nrrd"))
    assert set(np.unique(out.array)) <= {0, 1, 2}

    # the engine's forward IS the member-probability mean
    x = np.random.default_rng(2).normal(size=(4, 32, 32, 1)).astype(np.float32)
    members = [Predictor(CFG, model_path=d).predict(x)
               for d in fold_model_dirs]
    np.testing.assert_allclose(np.asarray(engine.predict_slices(x)),
                               np.mean(members, axis=0), atol=1e-5)


def test_dotted_filenames_keep_distinct_identities(fold_dir, tmp_path):
    """DICOM-UID-style dotted names must not collide to one stem (a split on
    the first '.' would silently skip the second study and overwrite the
    first's outputs)."""
    in_dir, out_dir = tmp_path / "in", tmp_path / "out"
    in_dir.mkdir()
    _study(str(in_dir / "1.2.840.a.nrrd"), z=2, seed=0)
    _study(str(in_dir / "1.2.840.b.nrrd"), z=2, seed=1)
    engine = ServingEngine(config=CFG,
                           model_path=os.path.join(fold_dir, "model"))
    totals = serve_directory(engine, str(in_dir), str(out_dir))
    assert totals["studies"] == 2
    assert (out_dir / "1.2.840.a_msk_pred.nrrd").exists()
    assert (out_dir / "1.2.840.b_msk_pred.nrrd").exists()


def test_interrupt_releases_claim_and_stale_claims_are_reclaimed(
        fold_dir, tmp_path, monkeypatch):
    """Ctrl-C mid-study must not leave a claim that skips the study forever;
    a hard-killed server's empty marker is reclaimed once stale."""
    in_dir, out_dir = tmp_path / "in", tmp_path / "out"
    in_dir.mkdir()
    out_dir.mkdir()
    _study(str(in_dir / "s.nrrd"), z=2, seed=0)
    engine = ServingEngine(config=CFG,
                           model_path=os.path.join(fold_dir, "model"))

    # interrupt mid-study: the claim marker is removed on the way out
    monkeypatch.setattr(engine, "process_study",
                        lambda *a: (_ for _ in ()).throw(KeyboardInterrupt))
    with pytest.raises(KeyboardInterrupt):
        serve_directory(engine, str(in_dir), str(out_dir), settle_s=0)
    assert not (out_dir / "s.done.json").exists()
    monkeypatch.undo()

    # hard-kill remnant: an EMPTY marker. Fresh -> respected (live claim);
    # stale -> reclaimed and the study served.
    marker = out_dir / "s.done.json"
    marker.write_text("")
    totals = serve_directory(engine, str(in_dir), str(out_dir), settle_s=0,
                             stale_claim_s=3600)
    assert totals["studies"] == 0  # fresh empty marker = live claim elsewhere
    os.utime(str(marker), (0, 0))  # age it
    totals = serve_directory(engine, str(in_dir), str(out_dir), settle_s=0,
                             stale_claim_s=60)
    assert totals["studies"] == 1
    assert json.loads(marker.read_text())["slices"] == 2


def test_max_studies_bounds_this_call_not_lifetime(fold_dir, tmp_path):
    in_dir, out_dir = tmp_path / "in", tmp_path / "out"
    in_dir.mkdir()
    for i in range(3):
        _study(str(in_dir / f"s{i}.nrrd"), z=2, seed=i)
    engine = ServingEngine(config=CFG,
                           model_path=os.path.join(fold_dir, "model"))
    serve_directory(engine, str(in_dir), str(out_dir), settle_s=0,
                    max_studies=2)
    assert engine.totals()["studies"] == 2
    # the engine already served 2; a new call with max_studies=1 must still
    # attempt ONE more (per-call bound, not lifetime)
    serve_directory(engine, str(in_dir), str(out_dir), settle_s=0,
                    max_studies=1)
    assert engine.totals()["studies"] == 3


def test_ensemble_multihead_dict_predict():
    """Multi-head ensembles return a dict of per-head mean probabilities
    (np.asarray on a dict would mangle it into a 0-d object array)."""
    import json as _json

    from cmrtpu.predict.ensemble import EnsemblePredictor

    cfg = dict(CFG, HEADS=[["rvip", 2, "sigmoid"], ["sep", 3, "softmax"]])
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        dirs = []
        for k in range(2):
            trainer = Trainer(dict(cfg, SEED=k))
            md = os.path.join(d, f"f{k}", "model")
            ckpt.save_weights(md, trainer.state.params,
                              trainer.state.batch_stats)
            dirs.append(md)
        ens = EnsemblePredictor(cfg, dirs)
        x = np.zeros((2, 32, 32, 1), np.float32)
        out = ens.predict(x)
        assert set(out) == {"rvip", "sep"}
        assert out["rvip"].shape == (2, 32, 32, 2)
        members = ens.predict_members(x)
        assert members["sep"].shape == (2, 2, 32, 32, 3)
        np.testing.assert_allclose(out["sep"], members["sep"].mean(axis=0),
                                   atol=1e-6)


def test_serve_cli_end_to_end(fold_dir, tmp_path):
    """The installed entry point (`python -m cmrtpu.cli.serve -exp ...`)
    drives the whole chain in a fresh process: restore, serve a directory,
    print the aggregate JSON."""
    import subprocess
    import sys

    in_dir, out_dir = tmp_path / "in", tmp_path / "out"
    in_dir.mkdir()
    _study(str(in_dir / "cli.nrrd"), z=2, seed=4)
    cfg_dir = tmp_path / "fold" / "config"
    cfg_dir.mkdir(parents=True)
    (cfg_dir / "config.json").write_text(json.dumps(CFG))
    os.symlink(os.path.join(fold_dir, "model"),
               str(tmp_path / "fold" / "model"))

    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(__file__))]
        + env.get("PYTHONPATH", "").split(os.pathsep))
    # config-API platform pin: the container sitecustomize overrides the
    # JAX_PLATFORMS env var in fresh processes, which would send this
    # subprocess to the (possibly busy) tunneled TPU instead of CPU
    env["CMRTPU_PLATFORM"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-m", "cmrtpu.cli.serve", "-exp",
         str(tmp_path / "fold"), "-in", str(in_dir), "-out", str(out_dir),
         "--stats", str(tmp_path / "s.jsonl")],
        env=env, capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stdout + out.stderr
    totals = json.loads(out.stdout.strip().splitlines()[-1])
    assert totals["studies"] == 1 and totals["slices"] == 2
    assert (out_dir / "cli_msk_pred.nrrd").exists()


def test_failed_study_records_error_and_continues(fold_dir, tmp_path):
    in_dir, out_dir = tmp_path / "in", tmp_path / "out"
    in_dir.mkdir()
    (in_dir / "broken.nrrd").write_bytes(b"not an image")
    os.utime(str(in_dir / "broken.nrrd"), (0, 0))
    _study(str(in_dir / "good.nrrd"), z=2, seed=9)

    engine = ServingEngine(config=CFG,
                           model_path=os.path.join(fold_dir, "model"))
    totals = serve_directory(engine, str(in_dir), str(out_dir))
    assert totals["studies"] == 1  # the good one
    marker = json.loads((out_dir / "broken.done.json").read_text())
    assert "error" in marker
    assert (out_dir / "good_msk_pred.nrrd").exists()


def test_serve_skips_pipeline_output_families(fold_dir, tmp_path):
    """A serve pass over a dir holding pred_fold / dataset families must
    ingest only real studies: label masks (_msk/_seg/_rvip/_pred.nrrd) and
    the original-geometry CMR copies (_cmr.nrrd) are our own pipelines'
    outputs, never fresh studies (serving.DEFAULT_EXCLUDE)."""
    in_dir, out_dir = tmp_path / "in", tmp_path / "out"
    in_dir.mkdir()
    _study(str(in_dir / "patient1.nrrd"), z=2, seed=1)
    for family in ("patient1_ED_msk.nrrd", "patient1_ED_seg.nrrd",
                   "patient1_rvip.nrrd", "patient1_ED_cmr.nrrd",
                   "patient1_msk_pred.nrrd"):
        _study(str(in_dir / family), z=2, seed=2)

    engine = ServingEngine(config=CFG,
                           model_path=os.path.join(fold_dir, "model"))
    totals = serve_directory(engine, str(in_dir), str(out_dir))
    assert totals["studies"] == 1
    assert sorted(os.path.basename(p)
                  for p in glob.glob(str(out_dir / "*_pred.nrrd"))) \
        == ["patient1_msk_pred.nrrd"]


def test_worklist_stem_collision_serves_first_and_warns(fold_dir, tmp_path,
                                                        caplog):
    """patientA.nii + patientA.nrrd share one study identity (marker and
    output names): the sorted-first is served, the duplicate is skipped
    with a loud warning instead of silently lost or overwritten."""
    import logging as _logging

    in_dir, out_dir = tmp_path / "in", tmp_path / "out"
    in_dir.mkdir()
    _study(str(in_dir / "patientA.nrrd"), z=2, seed=0)
    _study(str(in_dir / "patientA.nii"), z=3, seed=1)

    engine = ServingEngine(config=CFG,
                           model_path=os.path.join(fold_dir, "model"))
    with caplog.at_level(_logging.WARNING):
        totals = serve_directory(engine, str(in_dir), str(out_dir))
    assert totals["studies"] == 1
    assert any("collides" in r.message for r in caplog.records)


def test_worklist_collision_warns_once_then_rewarns_after_resolution(
        tmp_path, caplog):
    """Watch mode rebuilds the worklist every poll: an ONGOING collision
    warns once (not per poll), but a collision that is resolved and later
    reintroduced must warn again — the memo prunes resolved pairs."""
    import logging as _logging

    from cmrtpu.predict.serving import _worklist

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    (in_dir / "patientA.nrrd").write_bytes(b"x")
    (in_dir / "patientA.nii").write_bytes(b"x")

    def n_warnings():
        return sum("collides" in r.message for r in caplog.records)

    with caplog.at_level(_logging.WARNING):
        for _ in range(3):  # three polls, one ongoing collision
            _worklist(str(in_dir), ("*.nii", "*.nrrd"))
        assert n_warnings() == 1
        (in_dir / "patientA.nrrd").unlink()  # operator resolves it
        assert _worklist(str(in_dir), ("*.nii", "*.nrrd"))
        (in_dir / "patientA.nrrd").write_bytes(b"x")  # ...reintroduced
        _worklist(str(in_dir), ("*.nii", "*.nrrd"))
        assert n_warnings() == 2


def test_pipelined_chunks_match_single_dispatch(fold_dir, tmp_path):
    """predict_slices dispatches up to PIPELINE_WINDOW chunks before
    collecting — a study spanning more chunks than the window (plus a
    padded tail) must produce exactly what one whole-batch forward does."""
    engine = ServingEngine(config=CFG,
                           model_path=os.path.join(fold_dir, "model"))
    n = engine.batch * (engine.PIPELINE_WINDOW + 2) + 3  # >window + tail pad
    x = np.random.default_rng(11).normal(
        size=(n, 32, 32, 1)).astype(np.float32)
    import jax
    got = np.asarray(engine.predict_slices(x))
    assert got.shape[0] == n
    ref = np.concatenate([
        np.asarray(jax.device_get(engine._forward(np.concatenate(
            [x[s:s + engine.batch],
             np.zeros((max(0, s + engine.batch - n), 32, 32, 1),
                      np.float32)]))))
        for s in range(0, n, engine.batch)])[:n]
    np.testing.assert_allclose(got, ref, atol=1e-6)
