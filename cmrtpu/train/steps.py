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


def create_train_state(model, variables, optimizer) -> TrainState:
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=optimizer.init(params),
    )


def make_train_step(model, optimizer, loss_fn: Callable,
                    metrics: Optional[Dict[str, Callable]] = None,
                    mesh: Optional[Mesh] = None):
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
                                  opt_state=new_opt_state)
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
        variables = {"params": state.params, "batch_stats": state.batch_stats}
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
