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
    """adam/nadam/sgd(nesterov)/adagrad/rmsprop/adadelta/radam by config name.

    ``AGC`` (a clipping factor, e.g. 0.08) prepends adaptive gradient
    clipping (Brock et al. 2021, arXiv:2102.06171): each unit's gradient is
    clipped to ``AGC * max(||w||, eps)`` — the published stabiliser for
    normalization-free (WEIGHT_STANDARDISATION) training, where nothing
    renormalises activations and one oversized early step can dive the net
    into the all-zero-prediction basin."""
    base = _named_optimizer(config)
    agc = C.get(config, "AGC", None)
    if agc:
        return optax.chain(
            optax.adaptive_grad_clip(float(agc), eps=1e-3), base)
    return base


def _named_optimizer(config: Dict) -> optax.GradientTransformation:
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


def _hyperparams_holder(opt_state):
    """The inject_hyperparams state, whether the optimizer is bare or
    wrapped in an optax.chain (e.g. by AGC). Returns (holder, index) with
    index=None for the bare case."""
    if hasattr(opt_state, "hyperparams"):
        return opt_state, None
    for i, sub in enumerate(opt_state):
        if hasattr(sub, "hyperparams"):
            return sub, i
    raise ValueError("optimizer state carries no injected hyperparams")


def get_learning_rate(opt_state) -> float:
    """Read the injected learning rate from an optimizer state."""
    holder, _ = _hyperparams_holder(opt_state)
    return float(holder.hyperparams["learning_rate"])


def set_learning_rate(opt_state, lr: float):
    """Return a new optimizer state with the learning rate replaced."""
    import jax.numpy as jnp
    holder, idx = _hyperparams_holder(opt_state)
    hyper = dict(holder.hyperparams)
    hyper["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    new = holder._replace(hyperparams=hyper)
    if idx is None:
        return new
    return tuple(new if i == idx else sub
                 for i, sub in enumerate(opt_state))


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
