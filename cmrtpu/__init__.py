"""cmrtpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for cardiac-MR landmark detection.

From-scratch rebuild of the capabilities of Cardio-AI/cmr-landmark-detection
(reference mounted read-only at /root/reference): RVIP (anterior/inferior right-
ventricular insertion point) detection in cine short-axis CMR, framed as slice-wise
2-channel segmentation/heatmap regression with a dimension-generic U-Net, 4-fold
pathology-stratified cross-validation on ACDC, inverse-preprocessing of predictions
back into original image geometry and a full localisation/detection metric suite.

Layer map (mirrors SURVEY.md §1, re-designed TPU-first):
  config            flat UPPERCASE-key JSON config (ref: src/utils/Utils_io.py:163)
  io/               NIfTI/NRRD codecs + MedicalImage geometry (ref: SimpleITK usage)
  data/             ACDC ingest, ETL, k-fold dataframes (ref: src/data/Dataset.py)
  pipeline/         fused jit preprocessing + augmentation + async prefetch
                    (ref: src/data/Preprocess.py, src/data/Generators.py)
  models/           dimension-generic flax U-Net (ref: src/models/Unets.py)
  ops/              XLA/Pallas kernels: resample, heatmap, CC, CoM
  parallel/         Mesh/pjit sharding utilities (ref: tf.distribute.MirroredStrategy)
  train/            pjit train loop, losses, metrics, callbacks, checkpoints
                    (ref: src/models/train_model.py, src/utils/KerasCallbacks.py)
  predict/          restore → inference → inverse-preprocess → nrrd writer
                    (ref: src/models/predict_model.py, src/data/Postprocess.py)
  eval/             landmark metric suite → df_eval.csv (ref: src/models/evaluate_cv.py)
  visualization/    overlays and training-progress figures (ref: src/visualization/)
  cli/              train / predict / evaluate_cv / make_dataset entry points
"""

__version__ = "0.1.0"

# CMRTPU_PLATFORM=cpu|tpu pins jax's platform via the CONFIG API before any
# backend initializes. The env-var route (JAX_PLATFORMS) is unreliable in
# fresh processes here: a container sitecustomize force-registers the TPU
# plugin and overrides it, so a subprocess meant for CPU (CLI tests, smoke
# drives) would instead block on the — possibly busy — tunneled chip. The
# config API wins over the sitecustomize; a no-op unless the variable is set.
import os as _os

_platform = _os.environ.get("CMRTPU_PLATFORM", "")
if _platform:
    import jax as _jax

    _jax.config.update("jax_platforms", _platform)
del _os, _platform
