"""TrainState + pjit-compiled train/eval steps.

The whole optimisation step — forward, BCE+Dice loss, backward, optimizer
update, BN-statistics update, metric computation — is one XLA program,
compiled once per shape over the device mesh. The batch rides the 'data'
mesh axis; XLA inserts the gradient all-reduce over ICI
(SURVEY.md §2.2 "TPU-native rebuild target" for DP).

Replaces the reference hot loop ``model.fit`` + MirroredStrategy
(ref: src/models/train_model.py:105-112, src/models/Unets.py:70-75).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cmrtpu.parallel.mesh import DATA_AXIS
from cmrtpu.train import losses as L


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    # EMA shadow of params (config key EMA) — None when EMA is off, so the
    # pytree structure (and every existing checkpoint) is unchanged unless
    # the feature is enabled. BN batch_stats are already running averages
    # and are not shadowed.
    ema_params: Any = None


def create_train_state(model, variables, optimizer,
                       ema: bool = False) -> TrainState:
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=optimizer.init(params),
        # independent buffers: the shadow must not alias params or the
        # step's donate_argnums would donate the same buffer twice
        ema_params=jax.tree_util.tree_map(jnp.copy, params) if ema else None,
    )


def ema_decay_from_config(cfg) -> Optional[float]:
    """Config key ``EMA``: False/absent -> off; True -> decay 0.999; a
    number -> that decay."""
    from cmrtpu import config as C
    ema = C.get(cfg, "EMA", False)
    if not ema:
        return None
    return 0.999 if ema is True else float(ema)


def ema_update(state: TrainState, new_params, decay: Optional[float]):
    """One EMA step: shadow <- d*shadow + (1-d)*params, with the TF-style
    decay warmup d = min(decay, (1+t)/(10+t)). Without the warmup a 0.999
    decay needs ~1000 steps before the shadow stops being mostly the INIT
    weights — short schedules (few steps/epoch) would checkpoint garbage
    (measured: 24 mm vs 0.5 mm localisation on the 150-epoch quickstart).
    No-op (returns None) when the feature is off."""
    if decay is None:
        return None
    t = state.step.astype(jnp.float32) + 1.0
    d = jnp.minimum(jnp.float32(decay), (1.0 + t) / (10.0 + t))
    return jax.tree_util.tree_map(
        lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
        state.ema_params, new_params)


def inference_params(state: TrainState):
    """Params every inference-time consumer (eval epochs, checkpoints,
    trainer.predict) should read: the EMA shadow when EMA is on, the live
    params otherwise. The switch is structural (None vs pytree), so inside
    jit it resolves at trace time with zero runtime cost."""
    return state.params if state.ema_params is None else state.ema_params


def make_train_step(model, optimizer, loss_fn: Callable,
                    metrics: Optional[Dict[str, Callable]] = None,
                    mesh: Optional[Mesh] = None,
                    ema_decay: Optional[float] = None):
    """Build the jitted (state, x, y, rng) -> (state, logs) train step."""
    metrics = metrics or {}

    def step_fn(state: TrainState, x, y, rng):
        dropout_rng = jax.random.fold_in(rng, state.step)

        def compute_loss(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            preds, mutated = model.apply(
                variables, x, train=True, rngs={"dropout": dropout_rng},
                mutable=["batch_stats"])
            return loss_fn(y, preds), (preds, mutated)

        (loss, (preds, mutated)), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        import optax
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=mutated["batch_stats"],
                                  opt_state=new_opt_state,
                                  ema_params=ema_update(state, new_params,
                                                        ema_decay))
        logs = {"loss": loss}
        for name, fn in metrics.items():
            logs[name] = fn(y, preds)
        return new_state, logs

    if mesh is not None:
        data = NamedSharding(mesh, P(DATA_AXIS))
        repl = NamedSharding(mesh, P())
        return jax.jit(step_fn,
                       in_shardings=(repl, data, data, repl),
                       out_shardings=(repl, repl),
                       donate_argnums=(0,))
    return jax.jit(step_fn, donate_argnums=(0,))


def make_eval_step(model, loss_fn: Callable,
                   metrics: Optional[Dict[str, Callable]] = None,
                   mesh: Optional[Mesh] = None):
    """Jitted validation step: running BN stats, no dropout, no updates."""
    metrics = metrics or {}

    def step_fn(state: TrainState, x, y):
        variables = {"params": inference_params(state),
                     "batch_stats": state.batch_stats}
        preds = model.apply(variables, x, train=False)
        logs = {"loss": loss_fn(y, preds)}
        for name, fn in metrics.items():
            logs[name] = fn(y, preds)
        return logs

    if mesh is not None:
        data = NamedSharding(mesh, P(DATA_AXIS))
        repl = NamedSharding(mesh, P())
        return jax.jit(step_fn, in_shardings=(repl, data, data),
                       out_shardings=repl)
    return jax.jit(step_fn)


def make_predict_step(model, mesh: Optional[Mesh] = None):
    """Jitted inference forward (ref: model.predict, predict_model.py:143)."""

    def step_fn(params, batch_stats, x):
        variables = {"params": params, "batch_stats": batch_stats}
        return model.apply(variables, x, train=False)

    if mesh is not None:
        data = NamedSharding(mesh, P(DATA_AXIS))
        repl = NamedSharding(mesh, P())
        return jax.jit(step_fn, in_shardings=(repl, repl, data), out_shardings=data)
    return jax.jit(step_fn)
