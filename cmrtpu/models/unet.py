"""Dimension-generic U-Net as flax modules — the TPU-native model layer.

Re-designs the reference's encoder/decoder U-Net
(ref: src/models/Unets.py:61-133,755-869; src/models/KerasLayers.py:660-777)
as flax.linen modules:

  * ConvBlock     = Conv -> BN -> act  (BN_FIRST) or Conv+act -> BN
                    (ref: KerasLayers.py conv_layer_fn :660-693)
  * DownBlock     = ConvBlock, Dropout, ConvBlock, MaxPool  (:696-723)
  * UpBlock       = Upsample+Conv | ConvTranspose, Concat(skip),
                    ConvBlock, Dropout, ConvBlock            (:726-777)
  * UNet          = depth x DownBlock, bottleneck Conv-Drop-Conv,
                    depth x UpBlock, optional deep supervision (Unets.py:840-868),
                    1x1 Conv + sigmoid head (Unets.py:128)

TPU-first choices (not translations):
  * NHWC / NDHWC layout — XLA:TPU's native conv layout.
  * bfloat16 activations with float32 params/BN statistics (MIXED_PRECISION);
    the MXU consumes bf16 natively, variance accumulation stays f32.
  * dimension genericity via kernel-size rank (2D vs 3D selected by len(DIM),
    ref: src/models/Unets.py:90), one module tree for both.
  * dropout rates follow the reference's linspace(DROPOUT_MIN, DROPOUT_MAX,
    DEPTH) schedule rounded to 1 decimal (ref: src/models/Unets.py:105).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from cmrtpu import config as C


def _he_normal():
    return nn.initializers.he_normal()


def effective_pools(spatial: Sequence[int], m_pool: Sequence[int],
                    depth: int) -> Tuple[Tuple[Tuple[int, ...], ...], bool]:
    """Per-level pool factors with exhausted axes clamped to 1.

    The reference's Keras graph fails loudly at build time when a pooled
    axis reaches zero (MaxPooling3D raises); a naive static m_pool under
    XLA instead produces silent zero-size tensors — e.g. DEPTH=4,
    M_POOL=[2,2,2] on t=8 pools t as 8->4->2->1->0, making the whole
    bottleneck dead compute. Clamp each factor to 1 once its axis can no
    longer be pooled (dim // factor < 1), so deep configs degrade to
    t-preserving pooling at depth instead of silently computing nothing.

    Returns (pools_per_level, clamped_any).
    """
    dims = list(spatial)
    pools = []
    clamped = False
    for _ in range(depth):
        level = []
        for i, p in enumerate(m_pool):
            p = int(p)
            if p > 1 and dims[i] // p >= 1:
                level.append(p)
                dims[i] //= p
            else:
                level.append(1)
                clamped = clamped or p > 1
        pools.append(tuple(level))
    return tuple(pools), clamped


def apply_softcap(logits, softcap):
    """tanh soft cap on head logits: logits <- cap * tanh(logits / cap).

    Falsy (None/False/0) and non-positive values mean DISABLED: the config
    convention maps ``--set LOGIT_SOFTCAP=false`` to bool False and a bare
    0 to 0.0, and dividing by a zero cap would NaN-poison the whole forward
    pass silently. Shared by the plain-UNet head and the hybrid heads."""
    if not softcap:
        return logits
    cap = float(softcap)
    if cap <= 0:
        return logits
    capf = jnp.float32(cap)
    return capf * jnp.tanh(logits / capf)


class WSConv(nn.Module):
    """Scaled weight-standardized conv (NF-style, Brock et al. 2021,
    arXiv:2101.08692): the kernel is standardized over (spatial, in) per
    output channel and scaled by ``gain / sqrt(fan_in * var)`` with a
    learnable per-channel gain. Normalizes the WEIGHTS (a few KB, once per
    step) instead of the ACTIVATIONS (BatchNorm's second multi-MB pass over
    every conv output) — measured +16% fused-step throughput at the
    flagship size on one v5e chip (1154 -> 1343 slices/s without the BN
    passes). The statistics are input-independent, so train and inference
    run the same function (no running averages, nothing to fold at export)."""
    features: int
    f_size: Tuple[int, ...]
    pad: str = "SAME"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        shape = (*self.f_size, x.shape[-1], self.features)
        kernel = self.param("kernel", _he_normal(), shape, jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        gain = self.param("gain", nn.initializers.ones,
                          (self.features,), jnp.float32)
        axes = tuple(range(kernel.ndim - 1))
        mean = jnp.mean(kernel, axes, keepdims=True)
        var = jnp.var(kernel, axes, keepdims=True)
        fan_in = float(np.prod(shape[:-1]))
        k = (kernel - mean) * (gain * jax.lax.rsqrt(
            jnp.maximum(var * fan_in, 1e-4)))
        rank = len(self.f_size)
        spatial = "DHW"[-rank:]
        spec = ("N" + spatial + "C", spatial + "IO", "N" + spatial + "C")
        dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, spec)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), k.astype(self.dtype),
            window_strides=(1,) * rank, padding=self.pad,
            dimension_numbers=dn)
        return y + bias.astype(y.dtype)


class QuantConv(nn.Module):
    """Int8 post-training-quantized conv for serving.

    Symmetric per-INPUT-CHANNEL activation quantization (``act_scale``
    vector, calibrated offline — see cmrtpu/predict/quantize.py) and
    symmetric per-output-channel weight quantization (``w_scale``): the MXU
    consumes the int8 operands at 2x its bf16 peak on v5e-class chips, the
    conv accumulates in int32, and one fused epilogue rescales
    ``y * w_scale + bias`` back to the working dtype. The per-channel
    activation scales are FOLDED into the quantized kernel offline
    (kernel' = kernel * act_scale along the input-channel axis), so the
    epilogue needs no activation rescale — per-channel fidelity at the cost
    of the same one elementwise divide per input as the per-tensor scheme.
    Zero-point-free by design: SAME padding injects zeros in quantized
    space, and symmetric quantization maps them to exactly 0.0 — the same
    values nn.Conv pads with."""
    features: int
    f_size: Tuple[int, ...]
    pad: str = "SAME"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        shape = (*self.f_size, x.shape[-1], self.features)
        kernel_q = self.param("kernel_q", nn.initializers.zeros,
                              shape, jnp.int8)
        w_scale = self.param("w_scale", nn.initializers.ones,
                             (self.features,), jnp.float32)
        act_scale = self.param("act_scale", nn.initializers.ones,
                               (x.shape[-1],), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / act_scale),
                     -127, 127).astype(jnp.int8)
        rank = len(self.f_size)
        spatial = "DHW"[-rank:]
        spec = ("N" + spatial + "C", spatial + "IO", "N" + spatial + "C")
        dn = jax.lax.conv_dimension_numbers(x.shape, kernel_q.shape, spec)
        y = jax.lax.conv_general_dilated(
            q, kernel_q, window_strides=(1,) * rank, padding=self.pad,
            dimension_numbers=dn, preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * w_scale + bias
        return y.astype(self.dtype)


class ConvBlock(nn.Module):
    """Conv + BatchNorm + activation with the reference's ordering switch.

    ``ws=True`` swaps in the normalization-free scaled weight-standardized
    conv (see WSConv) — BatchNorm is dropped (the ordering switch becomes
    moot) and the block is plain WSConv -> activation.

    ``quant_mode`` drives the serving-time int8 path (cmrtpu/predict/
    quantize.py): '' is the float path, 'calib' additionally sows the block
    input's max-abs into the 'quant_calib' collection (calibration forward),
    'int8' replaces the conv with QuantConv (BN, frozen at inference, stays
    a float epilogue; XLA fuses it)."""
    filters: int
    f_size: Tuple[int, ...]
    activation: str = "relu"
    batch_norm: bool = True
    bn_first: bool = False
    ws: bool = False
    quant_mode: str = ""
    bn_bf16: bool = False
    # (2+1)D factorization for rank-3 convs (R(2+1)D, arXiv:1711.11248 §3):
    # one t x d x d conv becomes a 1 x d x d spatial conv + activation +
    # a t x 1 x 1 temporal conv. FLOPs drop from t*d^2 to d^2 + t per tap
    # and the heavy conv becomes 2D-spatial, which XLA tiles much better
    # onto the MXU for NDHWC volumes. Opt-in via MODEL_VARIANT='unet_2p1d';
    # ignored for 2D blocks and the ws/int8 conv paths.
    factorized: bool = False
    # GROUP_NORM=N replaces BatchNorm with GroupNorm(min(N, filters) groups,
    # Wu & He 2018, arXiv:1803.08494): batch-independent statistics (no
    # running averages, identical train/eval function, stable at any
    # per-chip batch), probed as the stable normalization alternative to the
    # collapsed WS arm (round-3 verdict #4). Takes precedence over
    # batch_norm when set; same conv->act->norm ordering switch applies.
    group_norm: int = 0
    pad: str = "SAME"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        act = getattr(nn, self.activation)
        if self.quant_mode == "calib":
            # per-INPUT-CHANNEL max-abs: channel ranges after relu differ by
            # orders of magnitude, so per-channel activation scales cut the
            # dominant PTQ error term; they fold into the kernel offline
            # (cmrtpu/predict/quantize.py) so serving cost is unchanged
            self.sow("quant_calib", "amax",
                     jnp.max(jnp.abs(x.astype(jnp.float32)),
                             axis=tuple(range(x.ndim - 1))),
                     init_fn=lambda: jnp.zeros((x.shape[-1],), jnp.float32),
                     reduce_fn=jnp.maximum)
        factorized = (self.factorized and len(self.f_size) == 3
                      and not self.ws and not self.quant_mode
                      and self.f_size[0] > 1)
        if self.quant_mode == "int8":
            conv = QuantConv(self.filters, self.f_size, pad=self.pad,
                             dtype=self.dtype)
        elif self.ws:
            conv = WSConv(self.filters, self.f_size, pad=self.pad,
                          dtype=self.dtype)
        elif factorized:
            # the heavy spatial conv runs as a TRUE 2D conv with t folded
            # into batch — the exact NHWC shape the 2D flagship step tiles
            # at full MXU efficiency. A (1,d,d) conv on the 5D NDHWC tensor
            # instead compiles to layouts that pad 32-channel temps 4x in
            # the lane dim (measured: compile-time HBM OOM at the cine
            # flagship size, tools/probe3d.py round 4).
            spatial = nn.Conv(self.filters, tuple(self.f_size[1:]),
                              padding=self.pad, kernel_init=_he_normal(),
                              dtype=self.dtype, param_dtype=jnp.float32)
            temporal = nn.Conv(self.filters, (self.f_size[0], 1, 1),
                               padding=self.pad, kernel_init=_he_normal(),
                               dtype=self.dtype, param_dtype=jnp.float32)

            def conv(y):
                b, t_, h, w, c = y.shape
                ys = act(spatial(y.reshape(b * t_, h, w, c)))
                return temporal(ys.reshape(b, t_, h, w, self.filters))
        else:
            conv = nn.Conv(self.filters, self.f_size, padding=self.pad,
                           kernel_init=_he_normal(), dtype=self.dtype,
                           param_dtype=jnp.float32)
        if self.ws:
            # NF-style variance-preserving activation gain (Brock et al.
            # 2021 Tab.5): without BatchNorm re-standardizing every block,
            # relu shrinks signal variance by 1 - 1/pi per layer and a
            # depth-4 U-Net's ~18 conv stack collapses the head logits to
            # ~0 (observed: sigmoid outputs never cross 0.5). gamma restores
            # unit variance per block; 1.0 for activations without a
            # published constant (shallow nets tolerate the residual drift).
            gamma = {"relu": 1.7139, "gelu": 1.7015, "silu": 1.7881,
                     "elu": 1.2717}.get(self.activation, 1.0)
            x = act(conv(x)) * gamma
            return x.astype(self.dtype)
        if self.group_norm:
            groups = min(int(self.group_norm), self.filters)
            while self.filters % groups:  # GroupNorm needs groups | channels
                groups -= 1
            bn = lambda y: nn.GroupNorm(num_groups=groups, epsilon=1e-3,
                                        dtype=jnp.float32,
                                        name="GroupNorm_0")(y)
        elif not self.batch_norm:
            bn = lambda y: y
        elif self.bn_bf16:
            # name pinned to nn.BatchNorm's auto-name so the param /
            # batch_stats tree is byte-identical either way — checkpoints
            # written with one BN flavour restore under the other
            bn = lambda y: BF16BatchNorm(use_running_average=not train,
                                         momentum=0.99, epsilon=1e-3,
                                         dtype=self.dtype,
                                         name="BatchNorm_0")(y)
        else:
            bn = lambda y: nn.BatchNorm(use_running_average=not train,
                                        momentum=0.99, epsilon=1e-3,
                                        dtype=jnp.float32)(y)
        if self.bn_first:
            x = conv(x)
            x = bn(x)
            x = act(x)
        else:
            x = act(conv(x))
            x = bn(x)
        return x.astype(self.dtype)


class BF16BatchNorm(nn.Module):
    """BatchNorm whose big-tensor math stays bf16 (f32 statistics only).

    flax's ``nn.BatchNorm(dtype=float32)`` promotes the whole activation
    tensor to f32 for the normalize pass — at the 224² flagship size that
    doubles the HBM bytes of every post-conv epilogue, and the fused train
    step is bandwidth-bound (tools/roofline.py). This twin never
    materializes an f32 tensor: the mean / E[x²] reductions accumulate in
    f32 (the elementwise cast fuses into the reduce — one bf16 read pass),
    and the normalize collapses to a per-channel fused multiply-add in
    bf16. Semantics otherwise mirror nn.BatchNorm (biased variance,
    momentum running averages, same param/batch_stats tree: scale, bias,
    mean, var — checkpoints interchange freely).

    Opt-in via ``BN_BF16: true`` (MIXED_PRECISION only): the ~3 decimal
    digits of bf16 match the precision of every other activation in the
    mixed-precision net, but it is a numerics change vs the reference's
    f32 BN, so it stays off by default. Measured at the 2D flagship size
    the fused-step rate is unchanged (1151 vs 1154 slices/s — XLA already
    fuses the f32 promotion into the epilogue); the knob's real effect is
    halving BatchNorm's RESIDENT tensor bytes, which matters when 3D
    configs are squeezing activations into HBM alongside REMAT.
    """
    use_running_average: bool
    momentum: float = 0.99
    epsilon: float = 1e-3
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        ch = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (ch,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (ch,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((ch,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((ch,), jnp.float32))
        axes = tuple(range(x.ndim - 1))
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)  # fuses into the reductions below
            mean = jnp.mean(xf, axis=axes)
            # biased variance via E[x²] - E[x]² (flax's _compute_stats form);
            # clamp for the catastrophic-cancellation corner
            var = jnp.maximum(
                jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean), 0.0)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * var
        inv = scale * jax.lax.rsqrt(var + self.epsilon)
        # y = x*inv + (bias - mean*inv): one bf16 FMA over the big tensor
        return x * inv.astype(self.dtype) + (bias - mean * inv).astype(self.dtype)


class DownBlock(nn.Module):
    """conv-drop-conv + max-pool; returns (skip, pooled)."""
    filters: int
    f_size: Tuple[int, ...]
    m_pool: Tuple[int, ...]
    drop: float
    activation: str = "relu"
    batch_norm: bool = True
    bn_first: bool = False
    ws: bool = False
    quant_mode: str = ""
    bn_bf16: bool = False
    factorized: bool = False
    group_norm: int = 0
    pad: str = "SAME"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        kw = dict(f_size=self.f_size, activation=self.activation,
                  batch_norm=self.batch_norm, bn_first=self.bn_first,
                  ws=self.ws, quant_mode=self.quant_mode,
                  bn_bf16=self.bn_bf16, factorized=self.factorized,
                  group_norm=self.group_norm,
                  pad=self.pad, dtype=self.dtype)
        x = ConvBlock(self.filters, **kw)(x, train)
        x = nn.Dropout(self.drop, deterministic=not train)(x)
        skip = ConvBlock(self.filters, **kw)(x, train)
        bad = [f"axis {i} (size {d}, pool {p})"
               for i, (d, p) in enumerate(zip(skip.shape[1:-1], self.m_pool))
               if d // int(p) < 1]
        if bad:
            raise ValueError(
                f"DownBlock m_pool={tuple(self.m_pool)} would pool "
                f"{', '.join(bad)} of shape {skip.shape} to zero size — the "
                "level would silently compute nothing. Reduce DEPTH, enlarge "
                "DIM, or use per-level clamped pools (see effective_pools).")
        pooled = nn.max_pool(skip, self.m_pool, strides=self.m_pool)
        return skip, pooled


def _upsample_nearest(x, factors: Sequence[int]):
    """Nearest-neighbour upsampling (keras UpSampling default) for any rank.

    broadcast_to + reshape instead of jnp.repeat: XLA lowers the broadcast to
    a layout change with no gather, measurably faster on TPU."""
    for axis, f in enumerate(factors, start=1):
        if f != 1:
            expanded = jnp.expand_dims(x, axis + 1)
            target = x.shape[:axis + 1] + (f,) + x.shape[axis + 1:]
            x = jnp.broadcast_to(expanded, target).reshape(
                x.shape[:axis] + (x.shape[axis] * f,) + x.shape[axis + 1:])
    return x


class UpBlock(nn.Module):
    """upsample+conv (or transpose-conv), concat skip, conv-drop-conv."""
    filters: int
    f_size: Tuple[int, ...]
    up_size: Tuple[int, ...]
    drop: float
    use_upsample: bool = True
    activation: str = "relu"
    batch_norm: bool = True
    bn_first: bool = False
    ws: bool = False
    quant_mode: str = ""
    bn_bf16: bool = False
    factorized: bool = False
    group_norm: int = 0
    pad: str = "SAME"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, lower, skip, train: bool = True):
        act = getattr(nn, self.activation)
        if self.use_upsample:
            x = _upsample_nearest(lower, self.up_size)
            x = act(nn.Conv(self.filters, self.f_size, padding=self.pad,
                            kernel_init=_he_normal(), dtype=self.dtype,
                            param_dtype=jnp.float32)(x))
        else:
            x = act(nn.ConvTranspose(self.filters, self.f_size,
                                     strides=self.up_size, padding=self.pad,
                                     kernel_init=_he_normal(), dtype=self.dtype,
                                     param_dtype=jnp.float32)(lower))
        x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
        kw = dict(f_size=self.f_size, activation=self.activation,
                  batch_norm=self.batch_norm, bn_first=self.bn_first,
                  ws=self.ws, quant_mode=self.quant_mode,
                  bn_bf16=self.bn_bf16, factorized=self.factorized,
                  group_norm=self.group_norm,
                  pad=self.pad, dtype=self.dtype)
        x = ConvBlock(self.filters, **kw)(x, train)
        x = nn.Dropout(self.drop, deterministic=not train)(x)
        x = ConvBlock(self.filters, **kw)(x, train)
        return x


class ConvEncoder(nn.Module):
    """Standalone reusable encoder: depth x DownBlock + conv-drop-conv
    bottleneck, returns (encoding, skips) — the composable half the reference
    exposes for building custom models (ref: ConvEncoder,
    src/models/KerasLayers.py:237-327)."""
    depth: int = 4
    filters: int = 32
    f_size: Tuple[int, ...] = (3, 3)
    m_pool: Tuple[int, ...] = (2, 2)
    dropouts: Tuple[float, ...] = (0.3, 0.4, 0.4, 0.5)
    drop_bottleneck: float = 0.5
    activation: str = "relu"
    batch_norm: bool = True
    bn_first: bool = False
    ws: bool = False
    quant_mode: str = ""
    bn_bf16: bool = False
    factorized: bool = False
    group_norm: int = 0
    pad: str = "SAME"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        kw = dict(f_size=self.f_size, activation=self.activation,
                  batch_norm=self.batch_norm, bn_first=self.bn_first,
                  ws=self.ws, quant_mode=self.quant_mode,
                  bn_bf16=self.bn_bf16, factorized=self.factorized,
                  group_norm=self.group_norm,
                  pad=self.pad, dtype=self.dtype)
        x = x.astype(self.dtype)
        pools, clamped = effective_pools(x.shape[1:-1], self.m_pool, self.depth)
        if clamped:
            import warnings
            warnings.warn(
                f"ConvEncoder: m_pool={tuple(self.m_pool)} exhausts an axis "
                f"before depth={self.depth} on input {x.shape}; clamped "
                f"per-level pools to {pools}. Pair with a ConvDecoder whose "
                "up factors mirror these.", stacklevel=2)
        filters = self.filters
        skips = []
        for level in range(self.depth):
            skip, x = DownBlock(filters, m_pool=pools[level],
                                drop=self.dropouts[level], **kw)(x, train)
            skips.append(skip)
            filters *= 2
        x = ConvBlock(filters, **kw)(x, train)
        x = nn.Dropout(self.drop_bottleneck, deterministic=not train)(x)
        x = ConvBlock(filters, **kw)(x, train)
        return x, skips


class ConvDecoder(nn.Module):
    """Standalone reusable decoder: depth x UpBlock consuming an encoder's
    (encoding, skips) (ref: ConvDecoder, src/models/KerasLayers.py:348-430).
    No head — append a 1x1 conv + activation for a complete model.

    Reference semantics: ``filters`` is the STARTING (largest) filter count,
    halved after every up-block, and ``dropouts[layer]`` applies in forward
    order — dropouts[0] at the deepest up-block (ref: KerasLayers.py:384-398).
    For a decoder symmetric to a ``ConvEncoder(filters=f, depth=d)``, pass
    ``filters = f * 2**(d-1)``."""
    depth: int = 4
    filters: int = 256
    f_size: Tuple[int, ...] = (3, 3)
    up_size: Tuple[int, ...] = (2, 2)
    dropouts: Tuple[float, ...] = (0.3, 0.4, 0.4, 0.5)
    use_upsample: bool = True
    activation: str = "relu"
    batch_norm: bool = True
    bn_first: bool = False
    ws: bool = False
    quant_mode: str = ""
    bn_bf16: bool = False
    factorized: bool = False
    group_norm: int = 0
    pad: str = "SAME"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, encoding, skips, train: bool = True):
        kw = dict(f_size=self.f_size, activation=self.activation,
                  batch_norm=self.batch_norm, bn_first=self.bn_first,
                  ws=self.ws, quant_mode=self.quant_mode,
                  bn_bf16=self.bn_bf16, factorized=self.factorized,
                  group_norm=self.group_norm,
                  pad=self.pad, dtype=self.dtype)
        x = encoding
        skips = list(skips)
        filters = self.filters
        for layer in range(self.depth):
            x = UpBlock(filters, up_size=self.up_size,
                        drop=self.dropouts[layer],
                        use_upsample=self.use_upsample, **kw)(
                x, skips.pop(), train)
            filters //= 2
        return x


class UNet(nn.Module):
    """Encoder/decoder U-Net with sigmoid head and optional deep supervision.

    ``heads`` allows the multi-head variant (BASELINE.json config 4): a dict
    of name -> (channels, 'sigmoid'|'softmax') sharing the full trunk. The
    default single 'unet' head with sigmoid matches ref: src/models/Unets.py:128.
    """
    depth: int = 4
    filters: int = 32
    f_size: Tuple[int, ...] = (3, 3)
    m_pool: Tuple[int, ...] = (2, 2)
    mask_classes: int = 2
    dropouts: Tuple[float, ...] = (0.3, 0.4, 0.4, 0.5)
    drop_bottleneck: float = 0.5
    activation: str = "relu"
    batch_norm: bool = True
    bn_first: bool = False
    ws: bool = False
    quant_mode: str = ""
    bn_bf16: bool = False
    factorized: bool = False
    group_norm: int = 0
    use_upsample: bool = True
    pad: str = "SAME"
    supervision: bool = False
    heads: Tuple[Tuple[str, int, str], ...] = ()
    remat: Any = False
    # sigmoid-head bias init to the foreground prior logit log(p/(1-p))
    # (RetinaNet-style, arXiv:1708.02002 §3.3). With ~0.05% foreground the
    # all-zero prediction is a strong basin; starting AT the prior removes
    # the epoch-1 plunge that collapses normalization-free (WS) training —
    # BatchNorm nets resist that basin structurally, WS nets do not
    # (measured: 224² depth-4 WS run pinned at sigmoid≈1e-7, all-zero preds).
    head_bias_prior: Any = None
    # tanh soft cap on head logits: logits <- cap * tanh(logits / cap)
    # (the Gemma-2 stabiliser, arXiv:2408.00118 §2). Bounds the head's
    # pre-activation to (-cap, cap) so the BCE gradient can never be driven
    # through a fully saturated sigmoid — the normalization-free (WS)
    # collapse signature was head logits at ±40k (IMPLEMENTATION_STATUS.md).
    # Near the origin tanh is identity, so a healthy run is unaffected.
    logit_softcap: Any = None
    dtype: Any = jnp.bfloat16

    def _cap(self, logits):
        return apply_softcap(logits, self.logit_softcap)

    @nn.compact
    def __call__(self, x, train: bool = True):
        kw = dict(f_size=self.f_size, activation=self.activation,
                  batch_norm=self.batch_norm, bn_first=self.bn_first,
                  ws=self.ws, quant_mode=self.quant_mode,
                  bn_bf16=self.bn_bf16, factorized=self.factorized,
                  group_norm=self.group_norm,
                  pad=self.pad, dtype=self.dtype)
        # REMAT: recompute block activations in the backward pass instead of
        # storing them. ``True`` remats every block — at the 2D flagship
        # size the extra FLOPs lose (868-892 vs 1152 slices/s measured on
        # v5e), but 3D volume configs need it to fit activations in HBM.
        # An int N remats only the N SHALLOWEST levels (level 0 holds the
        # full-resolution activations — by far the most bytes per FLOP
        # recomputed), a finer HBM-vs-FLOPs ladder for 3D/volume configs:
        # measured at the 2D flagship size REMAT=1/2/True = 1010/946/893
        # vs 1154 slices/s, so the knob is for fitting memory, not speed.
        n_remat = (self.depth if self.remat is True
                   else int(self.remat or 0))
        RDown = nn.remat(DownBlock, static_argnums=(2,))
        RUp = nn.remat(UpBlock, static_argnums=(3,))
        x = x.astype(self.dtype)
        # Per-level pools with exhausted axes clamped to 1 (t-preserving at
        # depth): DEPTH=4 + M_POOL=[2,2,2] on t=8 would otherwise pool t to
        # zero at the deepest level and the bottleneck would be zero-size
        # dead compute. Pool factors carry no parameters, so clamping never
        # changes the variable tree — checkpoints stay interchangeable.
        pools, clamped = effective_pools(x.shape[1:-1], self.m_pool, self.depth)
        if clamped:
            import warnings
            warnings.warn(
                f"UNet: M_POOL={tuple(self.m_pool)} exhausts an axis before "
                f"DEPTH={self.depth} on input {x.shape}; using per-level "
                f"pools {pools} (exhausted axes preserved at depth).",
                stacklevel=2)
        filters = self.filters
        skips = []
        for level in range(self.depth):
            Down = RDown if level < n_remat else DownBlock
            # names pinned so the variable tree is identical for every REMAT
            # setting (checkpoints interchange; resume may change the knob)
            skip, x = Down(filters, m_pool=pools[level],
                           drop=self.dropouts[level],
                           name=f"DownBlock_{level}", **kw)(x, train)
            skips.append(skip)
            filters *= 2

        # bottleneck: conv -> drop(max) -> conv (ref: Unets.py:810-816)
        x = ConvBlock(filters, **kw)(x, train)
        x = nn.Dropout(self.drop_bottleneck, deterministic=not train)(x)
        x = ConvBlock(filters, **kw)(x, train)

        pre_last = None
        dropouts = list(self.dropouts)
        for i in range(self.depth):
            filters //= 2
            pre_last = x
            # decoder iteration i produces level depth-1-i (shallowest last)
            Up = RUp if (self.depth - 1 - i) < n_remat else UpBlock
            # decoder mirrors the encoder's (possibly clamped) pool factors
            x = Up(filters, up_size=pools[self.depth - 1 - i],
                   drop=dropouts.pop(),
                   use_upsample=self.use_upsample,
                   name=f"UpBlock_{i}", **kw)(x, skips.pop(), train)

        if self.supervision:
            # mask branch from the pre-last decoder block (ref: Unets.py:840-868)
            act = getattr(nn, self.activation)
            lower = act(nn.Conv(self.filters, tuple([1] * len(self.f_size)),
                                padding=self.pad, kernel_init=_he_normal(),
                                dtype=self.dtype, param_dtype=jnp.float32)(pre_last))
            lower = _upsample_nearest(lower, pools[0])
            x = lower * x

        one = tuple([1] * len(self.f_size))
        if self.head_bias_prior is None:
            bias_init = nn.initializers.zeros
        else:
            p = float(self.head_bias_prior)
            bias_init = nn.initializers.constant(
                float(np.log(p / (1.0 - p))))
        if self.heads:
            outputs = {}
            for name, channels, head_act in self.heads:
                # prior init applies to sigmoid heads only — softmax heads
                # normalise across channels, a common bias shift is a no-op
                b_init = (bias_init if head_act != "softmax"
                          else nn.initializers.zeros)
                logits = nn.Conv(channels, one, kernel_init=_he_normal(),
                                 bias_init=b_init,
                                 dtype=jnp.float32, param_dtype=jnp.float32,
                                 name=f"head_{name}")(x.astype(jnp.float32))
                logits = self._cap(logits)
                outputs[name] = (jax.nn.softmax(logits, axis=-1)
                                 if head_act == "softmax" else nn.sigmoid(logits))
            return outputs
        logits = nn.Conv(self.mask_classes, one, kernel_init=_he_normal(),
                         bias_init=bias_init,
                         dtype=jnp.float32, param_dtype=jnp.float32,
                         name="head")(x.astype(jnp.float32))
        return nn.sigmoid(self._cap(logits))


def dropout_schedule(config: Dict) -> Tuple[float, ...]:
    """linspace(DROPOUT_MIN, DROPOUT_MAX, DEPTH) rounded to 1 decimal
    (ref: src/models/Unets.py:105)."""
    depth = C.get(config, "DEPTH")
    lin = np.linspace(C.get(config, "DROPOUT_MIN"), C.get(config, "DROPOUT_MAX"), depth)
    return tuple(round(float(v), 1) for v in lin)


def build_model(config: Dict, supervision: bool = False,
                factorized: bool = False) -> UNet:
    """Model factory from the flat config (ref: create_unet, src/models/Unets.py:61).

    len(DIM) selects 2D vs 3D; M_POOL/F_SIZE are right-sliced to the model
    rank exactly like the reference (ref: Unets.py:92-95).
    """
    ndims = C.ndims(config)
    f_size = tuple(C.get(config, "F_SIZE"))[-ndims:]
    m_pool = tuple(C.get(config, "M_POOL"))[-ndims:]
    heads = tuple(tuple(h) for h in C.get(config, "HEADS", ()) or ())
    act = str(C.get(config, "ACTIVATION")).lower()
    act = {"elu": "elu", "relu": "relu", "gelu": "gelu", "leaky_relu": "leaky_relu"}.get(act, "relu")
    dtype = jnp.bfloat16 if C.get(config, "MIXED_PRECISION") else jnp.float32
    ws = bool(C.get(config, "WEIGHT_STANDARDISATION", False))
    # serving-time int8 path: set by cmrtpu/predict/quantize.py on the
    # quantized twin config; never used for training
    quant_mode = "int8" if C.get(config, "QUANT_INT8", False) else ""
    batch_norm = C.get(config, "BATCH_NORMALISATION")
    if ws:
        # CLOSED as a measured dead-end (IMPLEMENTATION_STATUS.md): +16%
        # fused-step rate but collapses to all-zero predictions at flagship
        # scale by ~epoch 5; the full rescue matrix (AGC, head-prior, lr,
        # dropout, LOGIT_SOFTCAP) failed. A knob whose documented behavior
        # is "collapses in production" must not be one typo away from a
        # silent quality disaster — it requires an explicit acknowledgment.
        if not C.get(config, "WS_I_UNDERSTAND", False):
            raise ValueError(
                "WEIGHT_STANDARDISATION is a CLOSED experimental dead-end: "
                "it trains at small scale but collapsed to all-zero "
                "predictions on every flagship-scale RVIP config tested "
                "(see IMPLEMENTATION_STATUS.md). Set WS_I_UNDERSTAND=true "
                "to build it anyway (small-scale probes only); use "
                "GROUP_NORM=16 for a stable BatchNorm alternative.")
        import logging
        logging.warning(
            "WEIGHT_STANDARDISATION (acknowledged via WS_I_UNDERSTAND): "
            "EXPERIMENTAL, collapses at flagship scale%s.",
            "; BATCH_NORMALISATION is ignored for the conv blocks"
            if batch_norm else "")
    return UNet(
        depth=C.get(config, "DEPTH"),
        filters=C.get(config, "FILTERS"),
        f_size=f_size,
        m_pool=m_pool,
        mask_classes=C.get(config, "MASK_CLASSES"),
        dropouts=dropout_schedule(config),
        drop_bottleneck=float(C.get(config, "DROPOUT_MAX")),
        activation=act,
        batch_norm=batch_norm,
        bn_first=C.get(config, "BN_FIRST"),
        ws=ws,
        quant_mode=quant_mode,
        use_upsample=bool(C.get(config, "USE_UPSAMPLE", True)),
        supervision=supervision,
        heads=heads,
        bn_bf16=bool(C.get(config, "BN_BF16", False)
                     and C.get(config, "MIXED_PRECISION")),
        # (2+1)D factorized conv blocks for 3D/cine configs — opt-in via
        # MODEL_VARIANT='unet_2p1d' (get_model) or FACTORIZED_3D=True
        factorized=bool(factorized or C.get(config, "FACTORIZED_3D", False)),
        # GROUP_NORM=N: batch-independent GroupNorm instead of BatchNorm
        group_norm=int(C.get(config, "GROUP_NORM", 0) or 0),
        remat=C.get(config, "REMAT", False),
        head_bias_prior=C.get(config, "HEAD_BIAS_PRIOR", None),
        logit_softcap=C.get(config, "LOGIT_SOFTCAP", None),
        dtype=dtype,
    )


def init_variables(model: UNet, config: Dict, rng: jax.Array):
    """Initialise params/batch_stats for the configured input shape."""
    dim = tuple(C.get(config, "DIM"))
    x = jnp.zeros((1, *dim, C.get(config, "IMG_CHANNELS")), jnp.float32)
    return model.init({"params": rng, "dropout": rng}, x, train=False)


def model_summary(model, variables) -> str:
    """Text summary with per-collection parameter counts
    (stand-in for keras model.summary -> model_summary.txt,
    ref: src/models/train_model.py:87-89). Works for any flax module —
    hybrid wrappers included — by only reading attributes that exist."""
    attrs = " ".join(f"{name}={getattr(model, name)}"
                     for name in ("depth", "filters", "f_size", "m_pool",
                                  "mask_classes", "dtype")
                     if hasattr(model, name))
    lines = [f"{type(model).__name__} {attrs}".rstrip()]
    total = 0
    flat = jax.tree_util.tree_leaves_with_path(variables.get("params", {}))
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        lines.append(f"  {name:60s} {str(leaf.shape):18s} {leaf.size}")
        total += leaf.size
    bn = sum(l.size for l in jax.tree_util.tree_leaves(variables.get("batch_stats", {})))
    lines.append(f"Trainable params: {total}")
    lines.append(f"BatchNorm statistics: {bn}")
    return "\n".join(lines)
