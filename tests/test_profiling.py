"""Structured tracing: StageTimer stats + generator integration."""

import time

from cmrtpu.utils.profiling import GLOBAL_TIMER, StageTimer, annotate


def test_stage_timer_counts_and_means():
    t = StageTimer()
    for _ in range(3):
        with t.stage("work"):
            time.sleep(0.01)
    s = t.summary()["work"]
    assert s["count"] == 3
    assert s["total_s"] >= 0.03
    assert s["mean_s"] >= 0.01
    assert s["max_s"] <= s["total_s"]
    t.reset()
    assert t.summary() == {}


def test_stage_timer_thread_safety():
    import threading
    t = StageTimer()

    def worker():
        for _ in range(50):
            with t.stage("x"):
                pass

    threads = [threading.Thread(target=worker) for _ in range(8)]
    [th.start() for th in threads]
    [th.join() for th in threads]
    assert t.summary()["x"]["count"] == 400


def test_annotate_noop():
    with annotate("anything"):
        pass


def test_generator_reports_stages(tmp_path, rng):
    import numpy as np
    from cmrtpu.io import MedicalImage, write_image
    from cmrtpu.pipeline.generator import DataGenerator

    xs, ys = [], []
    for i in range(4):
        img = rng.normal(size=(24, 24)).astype(np.float32)
        msk = np.zeros((24, 24), np.uint8)
        msk[8:11, 6:9] = 1
        xp = str(tmp_path / f"patient{i:03d}__t01_z0_img.nrrd")
        yp = str(tmp_path / f"patient{i:03d}__t01_z0_msk.nrrd")
        write_image(MedicalImage(array=img, spacing=(1.4, 1.4)), xp)
        write_image(MedicalImage(array=msk, spacing=(1.4, 1.4)), yp)
        xs.append(xp)
        ys.append(yp)

    GLOBAL_TIMER.reset()
    gen = DataGenerator(xs, ys, config={"DIM": [24, 24], "BATCHSIZE": 4,
                                        "MASK_VALUES": [1], "SEED": 1})
    _ = gen[0]
    stats = GLOBAL_TIMER.summary()
    assert stats["generator/fix_preprocess"]["count"] == 4  # in-memory cache
    assert stats["generator/batch"]["count"] == 1
