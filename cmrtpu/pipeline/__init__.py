"""Input pipeline: deterministic preprocessing, on-device augmentation, prefetch."""
