"""Training: losses, metrics, optimizers, pjit train step, callbacks, trainer."""
