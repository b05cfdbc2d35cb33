"""Per-host sharded device cache (CACHE_PER_HOST): each process materializes
only the example rows its own devices hold, so host RAM / decode work scale
with hosts like HBM capacity scales with chips.

Single-controller coverage here (loader locality, content parity with the
all-at-once sharded upload, the lazy-generator end-to-end loop); the real
2-process assembly is exercised by tests/test_multihost.py.
"""

import numpy as np
import pytest

from cmrtpu.io import MedicalImage, write_image
from cmrtpu.pipeline.generator import DataGenerator
from cmrtpu.train.trainer import Trainer


def _mesh8():
    import jax
    from cmrtpu.parallel.mesh import create_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    return create_mesh(devices=jax.devices()[:8])


def test_per_host_upload_matches_sharded_upload():
    """Same global array content as upload_cache_sharded, and each block is
    loaded exactly once with its wrap-padded global ids."""
    import jax
    from cmrtpu.train.device_cache import (upload_cache_sharded,
                                           upload_cache_sharded_per_host)

    mesh = _mesh8()
    rng = np.random.default_rng(3)
    x = rng.normal(size=(13, 6, 6)).astype(np.float32)   # 13 -> padded 16
    y = (rng.random((13, 6, 6)) > 0.5).astype(np.float32)

    calls = []

    def load_rows(ids):
        calls.append(np.asarray(ids))
        return x[ids], y[ids]

    dx, dy, padded = upload_cache_sharded_per_host(load_rows, 13, mesh)
    rx, ry, rpadded = upload_cache_sharded(x, y, mesh)
    assert padded == rpadded == 16
    np.testing.assert_array_equal(np.asarray(jax.device_get(dx)),
                                  np.asarray(jax.device_get(rx)))
    np.testing.assert_array_equal(np.asarray(jax.device_get(dy)),
                                  np.asarray(jax.device_get(ry)))
    # one load per data block, each with its contiguous wrap-padded ids
    # (compared as sets of tuples: block 7's wrapped ids [14,15]%13 = [1,2]
    # break any ordering by first id)
    assert len(calls) == 8
    local_n = padded // 8
    expect = {tuple(np.arange(d * local_n, (d + 1) * local_n) % 13)
              for d in range(8)}
    assert {tuple(ids) for ids in calls} == expect
    # masks packed identically (uint8 here: exact 0/1 floats)
    assert dy.dtype == ry.dtype == np.uint8


def test_per_host_upload_rejects_empty():
    from cmrtpu.train.device_cache import upload_cache_sharded_per_host

    mesh = _mesh8()
    with pytest.raises(ValueError, match="at least one example"):
        upload_cache_sharded_per_host(lambda ids: (None, None), 0, mesh)


@pytest.fixture
def lazy_gens(tmp_path):
    rng = np.random.default_rng(0)
    xs, ys = [], []
    for i in range(12):
        img = rng.normal(size=(24, 24)).astype(np.float32)
        msk = np.zeros((24, 24), np.uint8)
        msk[8:11, 6:9] = 1
        msk[16:19, 12:15] = 2
        xp = str(tmp_path / f"patient{i:03d}__t01_z0_img.nrrd")
        yp = str(tmp_path / f"patient{i:03d}__t01_z0_msk.nrrd")
        write_image(MedicalImage(array=img, spacing=(1.4, 1.4)), xp)
        write_image(MedicalImage(array=msk, spacing=(1.4, 1.4)), yp)
        xs.append(xp)
        ys.append(yp)
    cfg = {"DIM": [24, 24], "BATCHSIZE": 8, "MASK_VALUES": [1, 2],
           "MASK_CLASSES": 2, "DEPTH": 1, "FILTERS": 2, "SEED": 0,
           "LEARNING_RATE": 1e-3, "MIXED_PRECISION": False,
           "AUGMENT": False, "RESAMPLE": False,
           "CACHE_SHARDED": True, "CACHE_PER_HOST": True}
    train = DataGenerator(xs[:8], ys[:8], config=cfg, in_memory=False)
    val = DataGenerator(xs[8:], ys[8:], config=cfg, in_memory=False)
    return train, val, cfg


def test_fixed_rows_matches_in_memory_cache(lazy_gens):
    """The on-demand loader returns exactly the rows the materialized cache
    would hold at those positions."""
    train, _, cfg = lazy_gens
    assert train._cache_x is None
    eager = DataGenerator(train.images, train.labels, config=cfg,
                          in_memory=True)
    ids = np.array([5, 0, 3])
    x_rows, y_rows = train.fixed_rows(ids)
    np.testing.assert_array_equal(x_rows, eager._cache_x[ids])
    np.testing.assert_array_equal(y_rows, eager._cache_y[ids])


def test_per_host_cached_loop_end_to_end(lazy_gens):
    """DeviceCachedLoop with CACHE_PER_HOST: no host-side full cache is ever
    materialized, the shards land example-sharded, training converges and
    eval covers the whole val set."""
    from cmrtpu.train.device_cache import DeviceCachedLoop

    train, val, cfg = lazy_gens
    mesh = _mesh8()
    trainer = Trainer(cfg, mesh=mesh)
    loop = DeviceCachedLoop(trainer, train, val)
    assert loop.per_host and loop.sharded and loop.n_shards == 8
    assert train._cache_x is None and val._cache_x is None  # stayed lazy
    shard_rows = [s.data.shape[0] for s in loop.x_train.addressable_shards]
    assert len(shard_rows) == 8
    assert all(rows == loop._local_n_train for rows in shard_rows)
    losses = []
    for _ in range(12):
        logs = loop.run_train_epoch()
        elogs = loop.run_eval_epoch()
        assert np.isfinite(logs["loss"]) and np.isfinite(elogs["loss"])
        losses.append(logs["loss"])
    assert losses[-1] < losses[0]


def test_fold_picks_cached_loop_for_per_host(lazy_gens):
    """The fold driver's loop choice honors the per-host opt-in even though
    there is no host cache to size-check."""
    from cmrtpu.train.fold import _per_host_cache, _picks_device_cache

    train, _, cfg = lazy_gens
    mesh = _mesh8()
    assert _per_host_cache(cfg)
    assert _picks_device_cache(cfg, train, mesh)
    off = dict(cfg, CACHE_PER_HOST=False)
    assert not _per_host_cache(off)
    assert not _picks_device_cache(off, train, mesh)  # lazy gen, no cache
