"""Per-level pool clamping: deep configs must not silently pool an axis to
zero size (advisor finding r4-high: DEPTH=4 + M_POOL=[2,2,2] on t=8 pooled
t as 8->4->2->1->0, leaving a zero-size bottleneck computing nothing; the
reference's Keras MaxPooling3D would fail loudly at graph build)."""

import jax
import jax.numpy as jnp
import pytest

from cmrtpu.models.unet import (DownBlock, UNet, build_model,
                                effective_pools, init_variables)

CFG = {"DIM": [8, 32, 32], "DEPTH": 4, "FILTERS": 4, "F_SIZE": [3, 3, 3],
       "M_POOL": [2, 2, 2], "MASK_CLASSES": 2, "IMG_CHANNELS": 1,
       "MIXED_PRECISION": False, "BATCH_NORMALISATION": True,
       "DROPOUT_MIN": 0.0, "DROPOUT_MAX": 0.0}


def test_effective_pools_clamps_exhausted_axis():
    pools, clamped = effective_pools((8, 32, 32), (2, 2, 2), 4)
    assert pools == ((2, 2, 2), (2, 2, 2), (2, 2, 2), (1, 2, 2))
    assert clamped
    pools, clamped = effective_pools((32, 32), (2, 2), 4)
    assert pools == ((2, 2),) * 4 and not clamped
    # an axis never poolable stays 1 at every level
    pools, clamped = effective_pools((1, 16, 16), (2, 2, 2), 2)
    assert pools == ((1, 2, 2), (1, 2, 2)) and clamped


def test_deep_cine_config_warns_and_keeps_bottleneck_alive():
    model = build_model(CFG)
    rng = jax.random.PRNGKey(0)
    with pytest.warns(UserWarning, match="exhausts an axis"):
        variables = init_variables(model, CFG, rng)
    x = jnp.ones((2, 8, 32, 32, 1), jnp.float32)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 8, 32, 32, 2)

    # the deepest encoder level must contribute: grads through its conv
    # kernel are nonzero (pre-fix the bottleneck was zero-size dead compute)
    def loss(params):
        v = dict(variables, params=params)
        y = model.apply(v, x, train=False)
        return jnp.sum((y - 0.25) ** 2)

    g = jax.grad(loss)(variables["params"])
    deep_kernel = g["DownBlock_3"]["ConvBlock_0"]["Conv_0"]["kernel"]
    assert float(jnp.abs(deep_kernel).max()) > 0.0


def test_clamped_params_match_unclamped_tree():
    """Pool factors carry no parameters: the variable tree of the clamped
    model is identical in structure/shapes to a t-rich one, so checkpoints
    stay interchangeable across DIM."""
    rng = jax.random.PRNGKey(0)
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        v_clamped = init_variables(build_model(CFG), CFG, rng)
    rich = dict(CFG, DIM=[16, 32, 32])
    v_rich = init_variables(build_model(rich), rich, rng)
    s1 = jax.tree_util.tree_map(lambda a: a.shape, v_clamped["params"])
    s2 = jax.tree_util.tree_map(lambda a: a.shape, v_rich["params"])
    assert s1 == s2


def test_downblock_raises_on_zero_pool():
    block = DownBlock(filters=4, f_size=(3, 3, 3), m_pool=(2, 2, 2),
                      drop=0.0, dtype=jnp.float32)
    x = jnp.ones((1, 1, 8, 8, 1), jnp.float32)
    with pytest.raises(ValueError, match="zero size"):
        block.init(jax.random.PRNGKey(0), x, False)
