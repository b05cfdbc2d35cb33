"""Manual-collectives train step: explicit, dtype-controlled gradient
all-reduce (GRAD_ALLREDUCE_DTYPE).

The default fused step (cmrtpu/train/device_cache.py) is global-view GSPMD:
XLA places the gradient all-reduce itself, always in the gradient dtype
(f32). On a real pod the gradient all-reduce is the step's only ICI traffic
— halving its bytes halves the collective time. This module provides the
step variant that makes that possible: the whole step runs under
``shard_map`` with per-device local batches, and the ONLY cross-device
communication is an explicit ``lax.pmean`` over the 'data' axis whose
operand dtype is the ``GRAD_ALLREDUCE_DTYPE`` knob ('bfloat16' halves
gradient ICI bytes; 'float32' reproduces the default numerics). Pinned by
``tests/test_sharding.py``: the compiled HLO must contain a bf16 all-reduce
and no other collectives.

Semantics deltas vs the global-view step (all MirroredStrategy-like, i.e.
closer to the reference's actual multi-GPU behaviour,
ref: src/models/Unets.py:70-75):
  * BatchNorm batch statistics are computed per local batch and
    cross-replica averaged (the global-view step computes them over the
    global batch via XLA's collective).
  * scalar logs are per-shard means pmean'd (a mean-of-means; equal for
    equal shard sizes).
  * augmentation / dropout PRNG streams fold in the device index, so they
    differ from the global-view step's streams (still SEED-deterministic).
  * the optimized objective is the MEAN OF PER-REPLICA LOSSES. For
    shard-linear losses (BCE, MSE) this equals the global-batch loss; for
    dice-family terms it does not (dice is nonlinear across examples) —
    which is exactly what keras MirroredStrategy optimizes for the
    reference's BceDice, so this variant is the closer multi-GPU parity.
  * HIST_MATCHING (Var.1) matches each device's quota of batch rows
    against random rows of its LOCAL cache view (shard-local references,
    like the sharded-cache gather) — same expected 10% fraction, zero
    extra collectives.

On one chip the knob is a no-op in traffic terms; it exists so multi-chip
deployments flip ONE config key instead of restructuring the step.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cmrtpu import config as C
from cmrtpu.parallel.mesh import DATA_AXIS
from cmrtpu.pipeline.augment import augment_batch_fn
from cmrtpu.pipeline.generator import finalize_batch
from cmrtpu.train import steps as S
from cmrtpu.train.device_cache import (_gated_match, _hist_match_setup,
                                       _shard_map, hist_quota)


def _pcast_varying(x):
    """Mark a device-invariant value as varying over 'data' (jax>=0.9
    pcast; pvary on older versions)."""
    try:
        return jax.lax.pcast(x, DATA_AXIS, to="varying")
    except (AttributeError, TypeError):  # pragma: no cover - older jax
        return jax.lax.pvary(x, DATA_AXIS)


def make_manual_train_step(model, optimizer, loss_fn: Callable,
                           metrics: Optional[Dict[str, Callable]],
                           config: Dict, mesh: Mesh, augment: bool,
                           masks: bool = True, cache_sharded: bool = False):
    """(state, data_x, data_y, idxs, rng) -> (state, logs); same call
    signature as make_cached_train_step, explicit collectives inside."""
    metrics = metrics or {}
    cfg = dict(config)
    ema_decay = S.ema_decay_from_config(cfg)
    reduce_dtype = str(C.get(cfg, "GRAD_ALLREDUCE_DTYPE",
                             "bfloat16")).lower()
    rd = jnp.bfloat16 if reduce_dtype in ("bfloat16", "bf16") else jnp.float32
    # one shared knob-reading with the GSPMD step builder: flipping
    # GRAD_ALLREDUCE_DTYPE must never change Var.1's matcher configuration
    match_fn, hist_prob = _hist_match_setup(cfg, augment)
    hist_matching = match_fn is not None

    def local_step(state: S.TrainState, dx, dy, ix, rng):
        # everything below sees LOCAL views: dx/dy are this device's cache
        # shard (or the full replicated cache), ix its local index rows
        rng = rng[0]
        axis = jax.lax.axis_index(DATA_AXIS)
        imgs = jnp.take(dx, ix, axis=0).astype(jnp.float32)
        msks = jnp.take(dy, ix, axis=0).astype(jnp.float32)
        if hist_matching:
            # Var.1 through the explicit-collectives step: per-device gated
            # candidates (batch rows are a uniform epoch draw) match against
            # random rows of the LOCAL cache view — the reference's
            # random-other-image semantics (ref: Generators.py:352).
            # hist_quota's ceil+gate keeps the expected fraction exact even
            # when prob*local_batch < 0.5 (a plain round() would silently
            # disable Var.1 on wide meshes)
            quota, gate_p = hist_quota(hist_prob, ix.shape[0])
            if quota > 0:
                hm_key = jax.random.fold_in(jax.random.fold_in(
                    jax.random.fold_in(rng, 0x415), state.step), axis)
                imgs = _gated_match(match_fn, imgs, dx, hm_key, quota,
                                    gate_p)
        if augment:
            aug_key = jax.random.fold_in(jax.random.fold_in(
                jax.random.fold_in(rng, 0xA06), state.step), axis)
            imgs, msks = augment_batch_fn(aug_key, imgs, msks, cfg)
        x, y = finalize_batch(imgs, msks, cfg, masks=masks)
        dropout_rng = jax.random.fold_in(
            jax.random.fold_in(rng, state.step), axis)

        def compute_loss(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            preds, mutated = model.apply(
                variables, x, train=True, rngs={"dropout": dropout_rng},
                mutable=["batch_stats"])
            return loss_fn(y, preds), (preds, mutated)

        # differentiate wrt VARYING copies of the params: grad of a varying
        # loss wrt device-INVARIANT params makes shard_map auto-insert an
        # f32 psum (the invariance-repair collective) — which would both
        # bypass the reduce-dtype knob and double-count the batch mean. The
        # pcast keeps the cotangents local so the single explicit pmean
        # below is the step's only gradient collective.
        params_v = jax.tree_util.tree_map(_pcast_varying, state.params)
        (loss, (preds, mutated)), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(params_v)
        # THE knob: the one cross-device transfer of the step, in rd dtype.
        # pmean keeps magnitudes loss-mean-like so the lr is unchanged.
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.pmean(g.astype(rd), DATA_AXIS).astype(g.dtype),
            grads)
        # cross-replica BN statistics (MirroredStrategy-like averaging)
        batch_stats = jax.tree_util.tree_map(
            lambda s: jax.lax.pmean(s, DATA_AXIS), mutated["batch_stats"])
        import optax
        updates, new_opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=batch_stats,
                                  opt_state=new_opt_state,
                                  ema_params=S.ema_update(state, new_params,
                                                          ema_decay))
        logs = {"loss": jax.lax.pmean(loss, DATA_AXIS)}
        for name, fn in metrics.items():
            logs[name] = jax.lax.pmean(fn(y, preds), DATA_AXIS)
        return new_state, logs

    repl, data = P(), P(DATA_AXIS)
    cache_spec = data if cache_sharded else repl
    stepped = _shard_map(
        local_step, mesh,
        in_specs=(repl, cache_spec, cache_spec, data, repl),
        out_specs=(repl, repl))

    def step_fn(state, dx, dy, ix, rng):
        return stepped(state, dx, dy, ix, rng[None])

    repl_s = NamedSharding(mesh, repl)
    data_s = NamedSharding(mesh, data)
    cache_s = data_s if cache_sharded else repl_s
    return jax.jit(step_fn,
                   in_shardings=(repl_s, cache_s, cache_s, data_s, repl_s),
                   out_shardings=(repl_s, repl_s),
                   donate_argnums=(0,))
