"""Compiled-HLO assertions on the multi-chip parallelism contract.

The framework's scale-out story (SURVEY.md §2.2) is: batch sharded over the
'data' mesh axis, parameters/optimizer state replicated, gradients all-reduced
by XLA over ICI, and the HBM-resident cache replicated so the per-step index
gather is communication-free. These tests pin that contract at the compiled-
program level on the virtual 8-device CPU mesh — a regression here means a
resharding crept in (e.g. an accidental all-gather of activations or a
collective in the input path), which would silently tax ICI at scale.
"""

import re

import jax
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from cmrtpu.parallel.mesh import create_mesh
from cmrtpu.train.device_cache import make_cached_train_step, upload_cache
from cmrtpu.train.trainer import Trainer

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs the 8-device virtual mesh")

CFG = {"DIM": [32, 32], "DEPTH": 2, "FILTERS": 4, "MASK_CLASSES": 2,
       "BATCHSIZE": 16, "MIXED_PRECISION": True, "MASK_VALUES": [1, 2],
       "AUGMENT": True, "AUGMENT_PROB": 1.0, "RANDOMROTATE": True,
       "SHIFTSCALEROTATE": True, "GRIDDISTORTION": True,
       "LEARNING_RATE": 1e-3, "SEED": 0}


@pytest.fixture(scope="module")
def compiled_step():
    mesh = create_mesh(devices=jax.devices()[:8])
    trainer = Trainer(CFG, mesh=mesh)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(64, 32, 32)).astype(np.float32)
    y = (rng.random((64, 32, 32)) > 0.9).astype(np.float32)
    data_x, data_y = upload_cache(x, y, mesh)
    step = make_cached_train_step(trainer.model, trainer.optimizer,
                                  trainer.loss_fn, {}, CFG, mesh, augment=True)
    idxs = jax.device_put(np.arange(16, dtype=np.int32),
                          NamedSharding(mesh, P("data")))
    lowered = step.lower(trainer.state, data_x, data_y, idxs, trainer.rng)
    return lowered.compile()


def test_gradients_are_all_reduced(compiled_step):
    """The compiled step must contain cross-device all-reduces (the gradient
    psum XLA inserts for data parallelism over the 'data' axis)."""
    hlo = compiled_step.as_text()
    assert re.search(r"all-reduce", hlo), (
        "no all-reduce in the compiled train step: gradients are not being "
        "combined across the data-parallel mesh")


def test_no_gather_style_collectives(compiled_step):
    """Replicated cache + sharded index gather must stay communication-free:
    no all-gather / all-to-all / collective-permute should appear anywhere in
    the step (activations stay batch-sharded end-to-end; only scalar/gradient
    reductions cross devices)."""
    hlo = compiled_step.as_text()
    for bad in ("all-gather", "all-to-all", "collective-permute"):
        assert not re.search(bad, hlo), (
            f"unexpected {bad} in the compiled train step: an intermediate "
            "is being resharded instead of staying batch-sharded")


def test_state_stays_replicated_and_logs_scalar(compiled_step):
    """Output shardings: the new train state must be fully replicated (no
    device owns a parameter shard) and the logs are replicated scalars."""
    out_shardings = jax.tree_util.tree_leaves(
        compiled_step.output_shardings,
        is_leaf=lambda s: isinstance(s, jax.sharding.Sharding))
    assert out_shardings, "no output shardings reported"
    for s in out_shardings:
        spec = getattr(s, "spec", None)
        assert spec is not None and all(axis is None for axis in spec), (
            f"non-replicated output sharding {s}")


# ---------------------------------------------------------------------------
# CACHE_SHARDED contract: the example-sharded cache gather must ALSO be
# communication-free (each device gathers its per-step rows from its local
# shard; hist-matching runs shard-locally) — only the gradient all-reduce
# crosses devices.
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def compiled_sharded_step():
    from cmrtpu.train.device_cache import upload_cache_sharded

    cfg = dict(CFG, CACHE_SHARDED=True, HIST_MATCHING=True)
    mesh = create_mesh(devices=jax.devices()[:8])
    trainer = Trainer(cfg, mesh=mesh)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(64, 32, 32)).astype(np.float32)
    y = (rng.random((64, 32, 32)) > 0.9).astype(np.float32)
    data_x, data_y, n_padded = upload_cache_sharded(x, y, mesh)
    assert n_padded == 64
    step = make_cached_train_step(trainer.model, trainer.optimizer,
                                  trainer.loss_fn, {}, cfg, mesh,
                                  augment=True, cache_sharded=True)
    # local row ids: each device's block indexes its OWN 8-row shard
    idxs = jax.device_put(np.tile(np.arange(2, dtype=np.int32), 8),
                          NamedSharding(mesh, P("data")))
    lowered = step.lower(trainer.state, data_x, data_y, idxs, trainer.rng)
    return lowered.compile()


def test_sharded_cache_gradients_all_reduced(compiled_sharded_step):
    hlo = compiled_sharded_step.as_text()
    assert re.search(r"all-reduce", hlo), (
        "no all-reduce in the sharded-cache train step: gradients are not "
        "being combined across the data-parallel mesh")


def test_sharded_cache_gather_is_communication_free(compiled_sharded_step):
    """The capacity win of CACHE_SHARDED must not be paid back in ICI: the
    local-shard gather (and the shard-local hist-matching) introduce NO
    gather-style collectives on top of the replicated-cache baseline."""
    hlo = compiled_sharded_step.as_text()
    for bad in ("all-gather", "all-to-all", "collective-permute"):
        assert not re.search(bad, hlo), (
            f"unexpected {bad} in the sharded-cache train step: the local "
            "gather is leaking cross-device traffic")


def test_sharded_cache_state_replicated(compiled_sharded_step):
    out_shardings = jax.tree_util.tree_leaves(
        compiled_sharded_step.output_shardings,
        is_leaf=lambda s: isinstance(s, jax.sharding.Sharding))
    assert out_shardings
    for s in out_shardings:
        spec = getattr(s, "spec", None)
        assert spec is not None and all(axis is None for axis in spec), (
            f"non-replicated output sharding {s}")


# ---------------------------------------------------------------------------
# GRAD_ALLREDUCE_DTYPE: the manual-collectives step must emit its gradient
# all-reduce in bf16 (half the ICI bytes on a pod) and nothing else.
# ---------------------------------------------------------------------------

def test_bf16_gradient_all_reduce_in_hlo():
    from cmrtpu.train.manual_collectives import make_manual_train_step
    from cmrtpu.train.device_cache import upload_cache

    cfg = dict(CFG, GRAD_ALLREDUCE_DTYPE="bfloat16")
    mesh = create_mesh(devices=jax.devices()[:8])
    trainer = Trainer(cfg, mesh=mesh)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(64, 32, 32)).astype(np.float32)
    y = (rng.random((64, 32, 32)) > 0.9).astype(np.float32)
    data_x, data_y = upload_cache(x, y, mesh)
    step = make_manual_train_step(trainer.model, trainer.optimizer,
                                  trainer.loss_fn, {}, cfg, mesh,
                                  augment=True)
    idxs = jax.device_put(np.arange(16, dtype=np.int32),
                          NamedSharding(mesh, P("data")))
    lowered = step.lower(trainer.state, data_x, data_y, idxs, trainer.rng)
    # assert on the LOWERED IR: the gradient all-reduces carry bf16
    # operands there. (The compiled text can't be used for this on the cpu
    # test backend — XLA:CPU's bf16-normalization pass legalizes bf16
    # collectives to convert+f32-all-reduce+convert; TPU executes them
    # natively in bf16, which is the deployment this knob targets.)
    pat = re.compile(r"stablehlo\.all_reduce.*?\}\) : \(tensor<([^>]*)>\)",
                     re.S)
    elem_types = [m.group(1).split("x")[-1]
                  for m in pat.finditer(lowered.as_text())]
    assert elem_types.count("bf16") > 0, (
        "no bf16 all-reduce in the lowered step — gradients are reduced "
        "in f32")
    # gradients dominate the collective count (BN stats + logs stay f32)
    assert elem_types.count("bf16") > elem_types.count("f32")
    hlo = lowered.compile().as_text()
    for bad in ("all-gather", "all-to-all"):
        assert not re.search(bad, hlo), f"unexpected {bad} in manual step"


def test_manual_step_matches_global_view_in_f32():
    """With GRAD_ALLREDUCE_DTYPE='float32', a shard-linear loss (MSE: a
    mean over examples) and no stochastic stages, the explicit
    pmean-of-local-grads equals the global-view gradients — one step from
    the same state must land on (nearly) the same parameters. (Dice-family
    losses are deliberately excluded: mean-of-per-shard dice != global-batch
    dice, the documented MirroredStrategy-like semantics of the manual
    step.)"""
    from cmrtpu.train.device_cache import (make_cached_train_step,
                                           upload_cache)
    from cmrtpu.train.manual_collectives import make_manual_train_step

    cfg = dict(CFG, AUGMENT=False, MIXED_PRECISION=False,
               GRAD_ALLREDUCE_DTYPE="float32", LOSS_FUNCTION="mse",
               BATCH_NORMALISATION=False,  # BN stats semantics differ by design
               DROPOUT_MIN=0.0, DROPOUT_MAX=0.0,  # PRNG streams differ by design
               OPTIMIZER="sgd")  # linear update: param delta == lr*grad delta
               # (adam at step 1 is ~lr*sign(grad): reduction-order noise on
               # near-zero grads flips signs and breaks bitwise comparisons)
    mesh = create_mesh(devices=jax.devices()[:8])
    trainer = Trainer(cfg, mesh=mesh)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(64, 32, 32)).astype(np.float32)
    y = (rng.random((64, 32, 32)) > 0.9).astype(np.float32)
    data_x, data_y = upload_cache(x, y, mesh)
    idxs = jax.device_put(np.arange(16, dtype=np.int32),
                          NamedSharding(mesh, P("data")))

    global_step = make_cached_train_step(
        trainer.model, trainer.optimizer, trainer.loss_fn, {}, cfg, mesh,
        augment=False)
    manual_step = make_manual_train_step(
        trainer.model, trainer.optimizer, trainer.loss_fn, {}, cfg, mesh,
        augment=False)
    state0 = jax.device_put(jax.device_get(trainer.state))
    s_global, logs_g = global_step(jax.device_put(jax.device_get(state0)),
                                   data_x, data_y, idxs, trainer.rng)
    s_manual, logs_m = manual_step(jax.device_put(jax.device_get(state0)),
                                   data_x, data_y, idxs, trainer.rng)
    np.testing.assert_allclose(float(logs_g["loss"]), float(logs_m["loss"]),
                               rtol=1e-5)
    # reduction order differs (partial-sum all-reduce vs local-sum + pmean)
    # and adam normalizes by sqrt(v), amplifying ~1e-7 gradient noise into
    # ~1e-4 parameter deltas — anything beyond that is a real divergence
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(s_global.params)),
                    jax.tree_util.tree_leaves(jax.device_get(s_manual.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)


def test_bf16_allreduce_training_converges():
    """The bf16 gradient reduction trains end-to-end through the cached
    loop (knob wired via DeviceCachedLoop._build_train_step)."""
    from cmrtpu.train.device_cache import DeviceCachedLoop

    class _Gen:
        masks = True

    cfg = dict(CFG, AUGMENT=False, GRAD_ALLREDUCE_DTYPE="bfloat16",
               LEARNING_RATE=1e-3)
    mesh = create_mesh(devices=jax.devices()[:8])
    trainer = Trainer(cfg, mesh=mesh)
    rng = np.random.default_rng(0)
    tg = _Gen()
    tg._cache_x = rng.normal(size=(32, 32, 32)).astype(np.float32)
    tg._cache_y = np.zeros((32, 32, 32), np.float32)
    tg._cache_y[:, 8:12, 6:10] = 1.0
    tg._cache_y[:, 20:24, 12:16] = 2.0
    loop = DeviceCachedLoop(trainer, tg)
    losses = [loop.run_train_epoch()["loss"] for _ in range(10)]
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]


def test_shard_batch_respects_2d_mesh():
    """shard_batch's per-device fast path must split over the DATA axis
    only: on a 2D (data x model) mesh each model-axis replica holds the
    same contiguous batch slice (a naive split over ALL devices produces
    shard-shape mismatches)."""
    from cmrtpu.parallel.mesh import create_mesh, shard_batch

    mesh = create_mesh({"MESH_SHAPE": [4, 2]}, devices=jax.devices()[:8])
    x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    out = shard_batch(x, mesh)
    np.testing.assert_array_equal(np.asarray(out), x)
    assert {s.data.shape for s in out.addressable_shards} == {(2, 3)}
    # model-axis replicas of the same data coordinate hold identical rows
    by_index = {}
    for s in out.addressable_shards:
        by_index.setdefault(s.index, []).append(np.asarray(s.data))
    assert all(len(v) == 2 and np.array_equal(*v) for v in by_index.values())


def test_manual_step_applies_hist_matching():
    """HIST_MATCHING must ride the explicit-collectives step too (Var.1
    configs with GRAD_ALLREDUCE_DTYPE set would otherwise silently train
    without histogram matching): with prob 1.0 one step from the same state
    lands on different parameters than with matching off."""
    from cmrtpu.train.device_cache import upload_cache
    from cmrtpu.train.manual_collectives import make_manual_train_step

    cfg = dict(CFG, GRAD_ALLREDUCE_DTYPE="bfloat16",
               HIST_MATCHING=True, HIST_MATCHING_PROB=1.0)
    mesh = create_mesh(devices=jax.devices()[:8])
    trainer = Trainer(cfg, mesh=mesh)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(64, 32, 32)).astype(np.float32) + \
        np.linspace(0, 4, 64)[:, None, None]  # distinct per-slice histograms
    y = (rng.random((64, 32, 32)) > 0.9).astype(np.float32)
    data_x, data_y = upload_cache(x, y, mesh)
    idxs = jax.device_put(np.arange(16, dtype=np.int32),
                          NamedSharding(mesh, P("data")))

    state0 = jax.device_get(trainer.state)
    outs = {}
    for key, c in {"hist": cfg, "plain": dict(cfg, HIST_MATCHING=False)}.items():
        step = make_manual_train_step(trainer.model, trainer.optimizer,
                                      trainer.loss_fn, {}, c, mesh,
                                      augment=True)
        s, logs = step(jax.device_put(state0), data_x, data_y, idxs,
                       trainer.rng)
        assert np.isfinite(float(logs["loss"]))
        outs[key] = np.concatenate([np.ravel(l) for l in
                                    jax.tree_util.tree_leaves(
                                        jax.device_get(s.params))])
    assert not np.allclose(outs["hist"], outs["plain"])


def test_training_loops_on_2d_mesh():
    """End-to-end smoke of BOTH training loops on a 2D (data x model) mesh
    (MESH_SHAPE=[4,2], 'model' axis reserved for future tensor-parallel
    configs): cached epoch + streamed epoch produce finite losses."""
    import ml_dtypes

    from cmrtpu.train.device_cache import DeviceCachedLoop
    from cmrtpu.train.streaming import StreamedLoop

    cfg = dict(CFG, DIM=[32, 32], MESH_SHAPE=[4, 2], MIXED_PRECISION=False)
    mesh = create_mesh(cfg, devices=jax.devices()[:8])
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    trainer = Trainer(cfg, mesh=mesh)

    class _Gen:
        masks = True

    g = _Gen()
    rng = np.random.default_rng(0)
    g._cache_x = rng.normal(size=(48, 32, 32)).astype(np.float32)
    g._cache_y = np.zeros((48, 32, 32), np.float32)
    g._cache_y[:, 8:12, 6:10] = 1.0
    loop = DeviceCachedLoop(trainer, g)
    assert np.isfinite(loop.run_train_epoch()["loss"])

    xp = g._cache_x.astype(ml_dtypes.bfloat16)
    yp = g._cache_y.astype(np.uint8)

    class _PG:
        masks = True

        def __len__(self):
            return 3

        def raw_batch(self, i):
            sel = np.arange(i * 16, (i + 1) * 16)
            return xp[sel], yp[sel]

    sl = StreamedLoop(Trainer(cfg, mesh=mesh), _PG())
    assert np.isfinite(sl.run_train_epoch()["loss"])
