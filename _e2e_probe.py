"""End-to-end epoch throughput: DataGenerator (decode+cache+augment on device)
-> prefetch -> pjit train step, full 224x224 resolution."""
import os, tempfile, time
import numpy as np
import jax
from cmrtpu.io import MedicalImage, write_image
from cmrtpu.pipeline.generator import DataGenerator
from cmrtpu.train.trainer import Trainer

d = tempfile.mkdtemp()
rng = np.random.default_rng(0)
xs, ys = [], []
for i in range(512):
    img = rng.normal(size=(224, 224)).astype(np.float32)
    msk = np.zeros((224, 224), np.uint8)
    msk[60:64, 60:64] = 1; msk[160:164, 160:164] = 2
    xp = os.path.join(d, f"patient{i:03d}__t01_z0_img.nrrd")
    write_image(MedicalImage(array=img, spacing=(1.4, 1.4)), xp)
    write_image(MedicalImage(array=msk, spacing=(1.4, 1.4)), xp.replace("img", "msk"))
    xs.append(xp); ys.append(xp.replace("img", "msk"))

cfg = {"DIM": [224, 224], "BATCHSIZE": 128, "SPACING": [1.2, 1.2], "RESAMPLE": True,
       "MASK_VALUES": [1, 2], "MASK_CLASSES": 2, "AUGMENT": True, "AUGMENT_PROB": 0.8,
       "SHIFTSCALEROTATE": True, "GRIDDISTORTION": True, "RANDOMROTATE": True,
       "USE_UPSAMPLE": False, "MIXED_PRECISION": True, "LEARNING_RATE": 1e-4,
       "SEED": 0, "DEPTH": 4, "FILTERS": 32}
t0 = time.time()
gen = DataGenerator(xs, ys, config=cfg)
print(f"generator init (512 slices decode+cache): {time.time()-t0:.1f}s")
trainer = Trainer(cfg)
trainer.fit(gen, epochs=2)   # compile + warm
t0 = time.time()
hist = trainer.fit(gen, epochs=5)
dt = time.time() - t0
n = len(gen) * 128 * 5
print(f"END-TO-END: {n/dt:.0f} slices/s over 5 epochs "
      f"({np.mean([h['epoch_time'] for h in hist]):.2f}s/epoch, 512 slices/epoch)")
