"""Pallas TPU kernels for the hot post/pre-processing ops.

Two ops profit from hand-written kernels (the conv U-Net itself is left to
XLA, which already fuses BN/act into the MXU convolutions):

  * ``gaussian_blur_2d_pallas`` — separable Gaussian used for heatmap target
    synthesis (GAUS/SIGMA, ref: src/data/Generators.py:385-391). The jnp
    fallback materialises one shifted copy of the image per kernel tap
    (33 copies at sigma=4); the kernel accumulates both passes in a VMEM
    scratch without leaving the chip.
  * ``converge_labels_pallas`` — iterative min-label propagation for
    connected-component filtering (CC_FILTER, ref: src/data/Postprocess.py:
    108-120). The XLA while_loop formulation writes the full label image to
    HBM every sweep; the kernel keeps the slice VMEM-resident across all
    sweeps and early-exits on a fixed point.

Both kernels run per-(slice) program over a 1D grid, are shape-static, and
fall back to interpret mode off-TPU so the same code path is unit-testable
on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# plain python int: jnp scalars at module level would be captured as consts
# inside pallas kernels, which pallas_call rejects
_INF = 2 ** 30


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# separable Gaussian blur
# ---------------------------------------------------------------------------

def _blur_kernel(x_ref, k_ref, out_ref, tmp_ref, *, radius: int, h: int, w: int):
    """One [H+2r, W+2r] symmetric-padded slice -> [H, W] blurred slice.

    Row pass into VMEM scratch, column pass into the output block. The tap
    loop is a static python range — fully unrolled VPU multiply-adds over
    VMEM-resident data.
    """
    k = k_ref[:]
    x = x_ref[0]  # block is (1, H+2r, W+2r)
    taps = 2 * radius + 1
    # pass 1: blur along the row axis (axis 0 of the padded block)
    acc = jnp.zeros((h, w + 2 * radius), jnp.float32)
    for t in range(taps):
        acc = acc + k[t] * x[t:t + h, :]
    tmp_ref[:] = acc
    # pass 2: blur along the column axis
    acc2 = jnp.zeros((h, w), jnp.float32)
    for t in range(taps):
        acc2 = acc2 + k[t] * tmp_ref[:, t:t + w]
    out_ref[0] = acc2


@functools.partial(jax.jit, static_argnames=("radius",))
def _blur_call(padded, kernel, radius: int):
    n, hp, wp = padded.shape
    h, w = hp - 2 * radius, wp - 2 * radius
    return pl.pallas_call(
        functools.partial(_blur_kernel, radius=radius, h=h, w=w),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.float32),
        scratch_shapes=[pltpu.VMEM((h, w + 2 * radius), jnp.float32)],
        interpret=_interpret(),
    )(padded, kernel)


def gaussian_blur_2d_pallas(img, sigma: float, truncate: float = 4.0):
    """Blur the trailing two axes of [..., H, W] (scipy-parity: reflect
    boundary, radius = int(truncate*sigma + 0.5)). Leading axes are folded
    into the kernel grid."""
    from cmrtpu.ops.gaussian import gaussian_kernel1d

    kernel = jnp.asarray(gaussian_kernel1d(sigma, truncate))
    radius = (kernel.shape[0] - 1) // 2
    x = jnp.asarray(img, jnp.float32)
    lead = x.shape[:-2]
    h, w = x.shape[-2], x.shape[-1]
    flat = x.reshape((-1, h, w))
    pad = [(0, 0), (radius, radius), (radius, radius)]
    padded = jnp.pad(flat, pad, mode="symmetric")
    out = _blur_call(padded, kernel, radius)
    return out.reshape(*lead, h, w)


# ---------------------------------------------------------------------------
# connected-component label propagation
# ---------------------------------------------------------------------------

def _cc_kernel(mask_ref, labels_ref, *, h: int, w: int, max_iters: int):
    """Converge min-label propagation for one [H, W] binary mask.

    Seeds every foreground pixel with its linear index and sweeps the
    4-neighbourhood min until nothing changes (or max_iters). All sweeps stay
    in VMEM; per-sweep the VPU does 4 shifted mins over the resident block.
    """
    mask = mask_ref[0] != 0  # block is (1, H, W)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    idx = row_ids * w + col_ids
    labels = jnp.where(mask, idx, _INF)

    inf_row = jnp.full((1, w), _INF, jnp.int32)
    inf_col = jnp.full((h, 1), _INF, jnp.int32)

    def sweep(labels):
        up = jnp.concatenate([labels[1:], inf_row], axis=0)
        down = jnp.concatenate([inf_row, labels[:-1]], axis=0)
        left = jnp.concatenate([labels[:, 1:], inf_col], axis=1)
        right = jnp.concatenate([inf_col, labels[:, :-1]], axis=1)
        neigh = jnp.minimum(jnp.minimum(up, down), jnp.minimum(left, right))
        return jnp.where(mask, jnp.minimum(labels, neigh), _INF)

    def cond(state):
        i, _, changed = state
        return jnp.logical_and(changed, i < max_iters)

    def body(state):
        i, labels, _ = state
        new = sweep(labels)
        return i + 1, new, jnp.any(new != labels)

    _, labels, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), labels, jnp.bool_(True)))
    labels_ref[0] = labels


@functools.partial(jax.jit, static_argnames=("max_iters",))
def converge_labels_pallas(masks, max_iters: int = None):
    """Label 4-connected components of a stack of binary masks [N, H, W].

    Returns int32 labels (component id = min linear index, background =
    2**30 sentinel) — same contract as
    cmrtpu.ops.connected_components.label_components_2d, batched.

    ``max_iters`` defaults to h*w, the worst-case geodesic diameter (a
    serpentine single component), so the propagation always reaches the true
    fixed point like the XLA fallback; the while_loop exits as soon as a
    sweep changes nothing, so the generous bound costs nothing in practice.
    """
    masks = jnp.asarray(masks)
    n, h, w = masks.shape
    if max_iters is None:
        max_iters = h * w
    return pl.pallas_call(
        functools.partial(_cc_kernel, h=h, w=w, max_iters=max_iters),
        grid=(n,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.int32),
        interpret=_interpret(),
    )(masks.astype(jnp.int32))
