"""Inference: restore -> per-patient prediction -> inverse preprocess -> nrrd."""
