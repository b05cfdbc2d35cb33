"""Optimizer + LR-schedule factory (optax) — parity with src/models/ModelUtils.py:75-118.

Every optimizer is wrapped in ``optax.inject_hyperparams`` so the learning
rate is a runtime-mutable leaf of the optimizer state: ReduceLROnPlateau and
the SGDR/polynomial schedulers adjust it between steps without recompiling
the pjit'd train step (the TPU-native analogue of keras' mutable
``optimizer.lr`` variable).
"""

from __future__ import annotations

import math
from typing import Dict

import optax

from cmrtpu import config as C


def get_optimizer(config: Dict) -> optax.GradientTransformation:
    """adam/nadam/sgd(nesterov)/adagrad/rmsprop/adadelta/radam by config name."""
    name = str(C.get(config, "OPTIMIZER", "adam")).lower()
    lr = float(C.get(config, "LEARNING_RATE", 1e-4))
    eps = float(C.get(config, "EPSILON", 1e-8))

    if name == "adagrad":
        return optax.inject_hyperparams(optax.adagrad)(learning_rate=lr)
    if name == "rmsprop":
        return optax.inject_hyperparams(optax.rmsprop)(learning_rate=lr)
    if name == "adadelta":
        return optax.inject_hyperparams(optax.adadelta)(learning_rate=lr)
    if name == "radam":
        return optax.inject_hyperparams(optax.radam)(learning_rate=lr, eps=eps)
    if name == "nadam":
        return optax.inject_hyperparams(optax.nadam)(learning_rate=lr, eps=eps)
    if name == "sgd":
        # keras SGD(nesterov=True) has momentum=0.0 by default; MOMENTUM is a
        # config extension for a useful nesterov setting
        momentum = float(C.get(config, "MOMENTUM", 0.0)) or None
        return optax.inject_hyperparams(optax.sgd)(
            learning_rate=lr, momentum=momentum,
            nesterov=momentum is not None)
    return optax.inject_hyperparams(optax.adam)(learning_rate=lr, eps=eps)


def get_learning_rate(opt_state) -> float:
    """Read the injected learning rate from an optimizer state."""
    return float(opt_state.hyperparams["learning_rate"])


def set_learning_rate(opt_state, lr: float):
    """Return a new optimizer state with the learning rate replaced."""
    import jax.numpy as jnp
    hyper = dict(opt_state.hyperparams)
    hyper["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    return opt_state._replace(hyperparams=hyper)


def polynomial_decay(epoch: int, max_epochs: int, init_alpha: float,
                     power: float = 2.0) -> float:
    """alpha = init * (1 - epoch/max)^power (ref: KerasCallbacks.py:230-243)."""
    decay = (1.0 - (epoch / float(max_epochs))) ** power
    return float(init_alpha * max(decay, 0.0))


def sgdr_schedule(iteration: int, lr_min: float, lr_max: float,
                  cycle_length: float, mult_factor: float = 2.0) -> float:
    """Cosine annealing with warm restarts (ref: SGDRScheduler,
    KerasCallbacks.py:308-384), expressed as a pure function of the global
    iteration count."""
    remaining = float(iteration)
    length = float(cycle_length)
    while remaining >= length:
        remaining -= length
        length *= mult_factor
    fraction = remaining / length
    return float(lr_min + 0.5 * (lr_max - lr_min) * (1.0 + math.cos(fraction * math.pi)))
