"""Compute kernels (XLA + Pallas) for the preprocessing/postprocessing hot path."""
