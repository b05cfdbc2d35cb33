"""Device-cached training: the whole dataset lives in HBM, the train step
fuses batch gather + augmentation + target synthesis + optimisation.

Motivation (measured on the target hardware): per-step host->device uploads
of full-resolution batches collapse to 25-50 MB/s when interleaved with
compute (1.2-2.2 s per 51 MB batch), while steps on device-resident data run
at ~107 ms. The deterministic-preprocessed ACDC 2D dataset is only ~2-4 GB —
it fits HBM outright. So instead of streaming batches (the reference's keras
queue model, ref: src/models/train_model.py:105-112), the TPU-native hot loop
is:

    upload once  ->  per step: idxs [B] (bytes)  ->  ONE XLA program:
        gather -> augment (affine/grid/rot90 warps) -> normalise ->
        mask channels / Gaussian heatmaps -> fwd -> loss -> bwd -> adam

Only scalar metrics leave the device. Epoch shuffling stays host-side
(a per-epoch permutation, parity with BaseGenerator.on_epoch_end,
ref: src/data/Generators.py:164).

Multi-chip: by default the cache is replicated; the per-step index vector is
sharded over the 'data' mesh axis, so the gather output — and everything
after it — is batch-sharded and XLA inserts the usual gradient psum over ICI.

CACHE_SHARDED=True instead shards the EXAMPLES over the 'data' axis, so
aggregate cache capacity grows linearly with the chip count (a v5e-8 holds
8x what one chip does — the difference between the fused hot loop and the
host-streaming fallback for full-res cine/3D cohorts). The per-step gather
is communication-free: each device gathers its per-step rows from its LOCAL
shard (a shard_map around jnp.take), and the host draws those rows from
per-shard epoch permutations — every example is still visited exactly once
per epoch; only the batch composition is stratified (each batch holds
B/n_dev examples per shard). CACHE_RESHUFFLE_EPOCHS=k re-randomizes the
example->shard assignment every k epochs with ONE donated all-to-all-style
gather over ICI (off by default: stratified sampling is already
epoch-uniform; the reshuffle only decorrelates batch composition across
epochs).
"""

from __future__ import annotations

import logging
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cmrtpu import config as C
from cmrtpu.parallel.mesh import DATA_AXIS, put_global
from cmrtpu.pipeline.augment import augment_batch_fn
from cmrtpu.pipeline.generator import finalize_batch
from cmrtpu.train import steps as S


def cache_nbytes(*arrays: np.ndarray) -> int:
    return sum(int(a.nbytes) for a in arrays)


_UINT8_MEMO: Dict = {}  # id-keyed, weakref-evicted (see _uint8_packable)


def _uint8_packable(y: np.ndarray, memoize: bool = True) -> bool:
    """True when a float mask packs losslessly to uint8 (exact small
    non-negative integers only — the same test upload_cache applies).

    Chunked with early exit: a whole-array ``astype`` round-trip would
    allocate ~2x the (multi-GB) mask cache in transient host RAM just to
    answer the admission question. Large arrays memoize the answer (the
    cache-admission check and the upload-time pack would otherwise each
    full-scan the same multi-GB array); a weakref finalizer evicts the
    entry when the array dies, so recycled ids cannot alias. Callers
    scanning transient per-batch arrays (fresh id every call, zero future
    hits) pass ``memoize=False`` to skip the dict/finalizer churn."""
    import weakref

    key = (id(y), y.dtype.str, y.shape)
    hit = _UINT8_MEMO.get(key)
    if hit is not None:
        return hit

    def scan() -> bool:
        if not (np.issubdtype(y.dtype, np.floating) and y.size):
            return False
        if float(y.min()) < 0 or float(y.max()) > 255:
            return False
        flat = np.ravel(y)
        step = 1 << 24  # 16M elements (~64 MB f32) of temporaries per chunk
        for i in range(0, flat.size, step):
            c = flat[i:i + step]
            if not np.array_equal(c.astype(np.uint8).astype(c.dtype), c):
                return False
        return True

    result = scan()
    if memoize and y.nbytes > (1 << 20):  # only when a rescan is expensive
        try:
            weakref.finalize(y, _UINT8_MEMO.pop, key, None)
            _UINT8_MEMO[key] = result
        except TypeError:  # non-weakref-able array subclass
            pass
    return result


def quantize_images_uint8(imgs: np.ndarray) -> np.ndarray:
    """Per-example affine quantization of float images to uint8 (4x smaller
    than f32, 2x smaller than bf16). Semantically transparent through this
    framework's preprocessing: every scaler in finalize_batch (MinMax /
    Standard / Robust) is invariant under a per-example affine map, the
    augmentation warps are linear in the values, and finalize re-normalises
    AFTER the gather — so storing round((x-min)/(max-min)*255) changes the
    training math only by the ~0.4%-of-range quantization noise (the same
    order as bf16's 8-bit mantissa). Caveats: (1) a constant-fill
    augmentation border (BORDER_MODE=0) with BORDER_VALUE != 0 is NOT
    scale-invariant — the packers warn on that combination; (2) the
    hist-matcher's pad-exclusion keys on exact zeros, which quantization
    preserves only when 0 is the per-example minimum (true for the MinMax
    deterministic stage, where pad_and_crop's zero borders ARE the min; a
    Standard-scaled cache maps pad zeros to a mid-range bucket, so Var.1 +
    SCALER='Standard' + uint8 includes borders in the match histograms).

    Chunked over examples into a preallocated output: uint8 packing exists
    precisely for caches near host-RAM scale, so the transient float32
    temporaries (astype copy + elementwise temps, ~2x the cache) of a
    whole-array formulation would OOM at upload time — the same blowup
    ``_uint8_packable`` chunks to avoid."""
    flat = imgs.reshape(imgs.shape[0], -1)
    out = np.empty(flat.shape, np.uint8)
    rows = max(1, (1 << 24) // max(flat.shape[1], 1))
    tiny = np.finfo(np.float32).tiny
    for start in range(0, flat.shape[0], rows):
        c = flat[start:start + rows].astype(np.float32, copy=False)
        lo = c.min(axis=1, keepdims=True)
        span = np.maximum(c.max(axis=1, keepdims=True) - lo, tiny)
        out[start:start + rows] = np.rint((c - lo) / span * 255.0)
    return out.reshape(imgs.shape)


def _warn_if_uint8_unsafe(config: Optional[Dict], knob: str) -> None:
    cfg = config or {}
    mode = C.get(cfg, "BORDER_MODE", 4)
    mode = 4 if mode is None else int(mode)  # NOT `or 4` — 0 is the case
    if mode == 0 and float(C.get(cfg, "BORDER_VALUE", 0) or 0) != 0.0:
        logging.warning(
            "%s='uint8' with a constant non-zero augmentation border "
            "(BORDER_MODE=0, BORDER_VALUE=%s): the border constant is not "
            "rescaled with the per-example quantization, so padded regions "
            "shift intensity — use BORDER_VALUE=0 or a reflect border",
            knob, C.get(cfg, "BORDER_VALUE"))
    if (bool(C.get(cfg, "HIST_MATCHING", False))
            and str(C.get(cfg, "SCALER", "MinMax")).lower() == "standard"):
        logging.warning(
            "%s='uint8' with HIST_MATCHING and SCALER='Standard': pad zeros "
            "are not the per-example minimum under Standard scaling, so "
            "quantization maps them to a mid-range bucket and the matcher's "
            "zero-exclusion stops masking the padded borders — the match "
            "histograms include border pixels (MinMax is unaffected)", knob)


def _packed_nbytes(config: Optional[Dict], x: np.ndarray, y: np.ndarray) -> int:
    """Post-upload storage size: CACHE_DTYPE may halve (bf16) or quarter
    (uint8) the image cache and small-integer masks pack to uint8 (mirrors
    upload_cache's casts). The mask-uint8 estimate is only taken when the
    pack is verified lossless — otherwise a float-valued target (e.g.
    masks=False regression labels in [0,255]) would be under-counted 4x and
    could admit a cache that OOMs HBM instead of falling back to host
    streaming."""
    x_bytes = int(x.nbytes)
    cache_dtype = str(C.get(config or {}, "CACHE_DTYPE", "float32")).lower()
    if cache_dtype in ("bfloat16", "bf16"):
        x_bytes = x.size * 2
    elif cache_dtype in ("uint8", "u8"):
        x_bytes = x.size
    y_bytes = y.size if _uint8_packable(y) else int(y.nbytes)
    return x_bytes + y_bytes


def fits_device_cache(config: Dict, *arrays: np.ndarray,
                      n_shards: int = 1) -> bool:
    """HBM-budget guard: the cache must fit comfortably next to
    params/activations. Bound configurable via DEVICE_CACHE_LIMIT_GB (a
    PER-DEVICE budget); the estimate accounts for CACHE_DTYPE / uint8 mask
    packing. With CACHE_SHARDED the examples are spread over ``n_shards``
    devices, so aggregate capacity is n_shards x the per-device budget."""
    limit_gb = float(C.get(config, "DEVICE_CACHE_LIMIT_GB", 8.0) or 8.0)
    if len(arrays) == 2:
        total = _packed_nbytes(config, *arrays)
    else:
        total = cache_nbytes(*arrays)
    return total <= limit_gb * (1 << 30) * max(1, int(n_shards))


def cache_shards(config: Optional[Dict], mesh: Mesh) -> int:
    """Number of example shards the cache spreads over: the data-axis size
    under CACHE_SHARDED, else 1 (replicated)."""
    if not bool(C.get(config or {}, "CACHE_SHARDED", False)):
        return 1
    return int(mesh.shape[DATA_AXIS])


def per_host_cache(config: Optional[Dict]) -> bool:
    """True when this run uses the PER-HOST sharded device cache: each
    process materializes and uploads only the example rows its own devices
    hold, so host RAM/decode scale with hosts (CACHE_PER_HOST, defaulting
    on for multi-controller sharded runs).

    THE single resolution of the knob — the fold driver's loop choice /
    resume epoch math and DeviceCachedLoop must agree on it, or the
    steps-per-epoch derivation drifts from the loop actually run."""
    if not bool(C.get(config or {}, "CACHE_SHARDED", False)):
        return False
    knob = C.get(config, "CACHE_PER_HOST", None)
    return jax.process_count() > 1 if knob is None else bool(knob)


def _hist_match_setup(config: Dict, augment: bool):
    """(match_fn, hist_prob) for Var.1 hist-matching inside a fused step;
    match_fn is None when the variant is off. THE single reading of the
    HIST_MATCHING/_PROB/_BINS knobs — the GSPMD and explicit-collectives
    step builders must configure the matcher identically or
    GRAD_ALLREDUCE_DTYPE would silently change Var.1 semantics.

    The reference hardcodes the 10% rate (ref: src/data/Generators.py:350);
    _PROB is exposed for tests/ablations. _BINS>0 selects the sort-free
    binned-CDF matcher (default 2048 from a v5e sweep: 998 vs 961 slices/s
    at 4096, matcher max-error 7e-3 of the intensity range — well under
    augmentation noise); 0 selects the exact sorted-quantile formulation.
    exclude_zeros: the cache holds pad_and_crop'ed images whose zero
    borders must not enter the histograms (host parity: match unpadded,
    then re-pad with zeros)."""
    hist_prob = float(C.get(config, "HIST_MATCHING_PROB", 0.1))
    if not (bool(C.get(config, "HIST_MATCHING", False)) and augment):
        return None, hist_prob
    from cmrtpu.pipeline.histmatch import (match_histograms_binned_jax,
                                           match_histograms_jax)
    hist_bins = int(C.get(config, "HIST_MATCHING_BINS", 2048))
    if hist_bins > 0:
        return (lambda s, r: match_histograms_binned_jax(
            s, r, bins=hist_bins, exclude_zeros=True)), hist_prob
    return match_histograms_jax, hist_prob


def _pack_arrays(x: np.ndarray, y: np.ndarray, config: Optional[Dict],
                 y_uint8: Optional[bool] = None):
    """Storage-dtype packing shared by the replicated and sharded uploads:
    CACHE_DTYPE='bfloat16' halves the image cache's HBM footprint (the model
    computes in bf16 anyway under MIXED_PRECISION, so the extra mantissa
    bits of a float32 cache are mostly discarded at the first conv); masks
    whose values are exact small non-negative integers pack to uint8 (4x
    smaller). Consumers cast back to float32 right after the gather, so
    augmentation interpolation and loss math are unchanged.

    ``y_uint8`` pins the mask-packing decision externally — the per-host
    sharded upload must make it GLOBALLY (every process's shards need one
    dtype), so it computes the local packability and all-reduces the AND."""
    x = np.ascontiguousarray(x)
    y = np.ascontiguousarray(y)
    cache_dtype = str(C.get(config or {}, "CACHE_DTYPE", "float32")).lower()
    if cache_dtype in ("bfloat16", "bf16"):
        import ml_dtypes
        x = x.astype(ml_dtypes.bfloat16)
    elif cache_dtype in ("uint8", "u8"):
        _warn_if_uint8_unsafe(config, "CACHE_DTYPE")
        x = quantize_images_uint8(x)
    if _uint8_packable(y) if y_uint8 is None else y_uint8:
        y = y.astype(np.uint8)
    return x, y


def _all_processes_agree(flag: bool) -> bool:
    """AND of a per-process boolean across every process (trivially the flag
    itself single-controller). Used for packing decisions that must be
    identical on every shard of one global array."""
    if jax.process_count() == 1:
        return bool(flag)
    from jax.experimental import multihost_utils
    return bool(np.all(multihost_utils.process_allgather(
        np.asarray(bool(flag)))))


def upload_cache(x_padded: np.ndarray, y_padded: np.ndarray, mesh: Mesh,
                 config: Optional[Dict] = None):
    """Upload the padded deterministic cache once, replicated over the mesh."""
    x, y = _pack_arrays(x_padded, y_padded, config)
    repl = NamedSharding(mesh, P())
    return put_global(x, repl), put_global(y, repl)


def upload_cache_sharded(x_padded: np.ndarray, y_padded: np.ndarray,
                         mesh: Mesh, config: Optional[Dict] = None):
    """Upload the cache example-sharded over the 'data' axis (CACHE_SHARDED).

    The example count is padded to a multiple of the shard count by wrapping
    (the duplicates are the same examples a remainder-dropping epoch would
    under-sample — bounded by n_shards-1 rows). Shard d holds the contiguous
    row block [d*local_n, (d+1)*local_n); the per-step index vector uses
    LOCAL row ids so the gather stays communication-free.

    Multi-controller runs work (each process puts its addressable blocks)
    but still materialize the FULL host arrays on every process — use
    ``upload_cache_sharded_per_host`` to scale host RAM/decode with hosts.

    Returns (data_x, data_y, n_padded)."""
    n = x_padded.shape[0]
    n_shards = int(mesh.shape[DATA_AXIS])
    padded = -(-n // n_shards) * n_shards
    if padded != n:
        reps = np.arange(padded - n) % n
        x_padded = np.concatenate([x_padded, x_padded[reps]])
        y_padded = np.concatenate([y_padded, y_padded[reps]])
    y_u8 = _all_processes_agree(_uint8_packable(y_padded))
    x, y = _pack_arrays(x_padded, y_padded, config, y_uint8=y_u8)
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return put_global(x, sharding), put_global(y, sharding), padded


def _owned_data_blocks(mesh: Mesh) -> Dict:
    """{addressable device -> data-axis block index} for this process, in
    mesh-device order. Model-axis replicas of one data block map to the same
    index."""
    axis = list(mesh.axis_names).index(DATA_AXIS)
    owned = {}
    for pos in np.ndindex(mesh.devices.shape):
        dev = mesh.devices[pos]
        if dev.process_index == jax.process_index():
            owned[dev] = int(pos[axis])
    return owned


def upload_cache_sharded_per_host(load_rows: Callable, n_examples: int,
                                  mesh: Mesh, config: Optional[Dict] = None):
    """CACHE_SHARDED upload for multi-controller runs where each process
    materializes ONLY the example rows its local devices own — host RAM and
    decode work scale with the host count exactly like HBM capacity scales
    with the chip count. (Also valid single-controller, where it simply
    loads block-by-block instead of all at once.)

    ``load_rows(global_ids) -> (x_rows, y_rows)`` returns the
    deterministic-stage padded rows for the given example ids in order —
    ``DataGenerator.fixed_rows`` is the canonical loader. Same wrap-padding
    and block layout as ``upload_cache_sharded``.

    Returns (data_x, data_y, n_padded)."""
    if n_examples <= 0:
        raise ValueError("per-host sharded upload needs at least one example")
    n_shards = int(mesh.shape[DATA_AXIS])
    padded = -(-n_examples // n_shards) * n_shards
    local_n = padded // n_shards
    owned = _owned_data_blocks(mesh)
    if not owned:
        raise ValueError(
            "this process owns no devices in the mesh — every process must "
            "contribute devices to a multi-controller mesh")
    # one load per DISTINCT block: model-axis replicas share the rows
    blocks = {}
    for d in sorted(set(owned.values())):
        ids = np.arange(d * local_n, (d + 1) * local_n) % n_examples
        x_rows, y_rows = load_rows(ids)
        if x_rows.shape[0] != local_n:
            raise ValueError(
                f"load_rows returned {x_rows.shape[0]} rows for a "
                f"{local_n}-row block")
        blocks[d] = (np.ascontiguousarray(x_rows),
                     np.ascontiguousarray(y_rows))
    # the mask-packing decision must be identical across every process
    y_u8 = _all_processes_agree(
        all(_uint8_packable(y) for _, y in blocks.values()))
    packed = {d: _pack_arrays(x, y, config, y_uint8=y_u8)
              for d, (x, y) in blocks.items()}
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    any_x, any_y = next(iter(packed.values()))
    shape_x = (padded,) + any_x.shape[1:]
    shape_y = (padded,) + any_y.shape[1:]
    shards_x = [jax.device_put(packed[d][0], dev) for dev, d in owned.items()]
    shards_y = [jax.device_put(packed[d][1], dev) for dev, d in owned.items()]
    data_x = jax.make_array_from_single_device_arrays(
        shape_x, sharding, shards_x)
    data_y = jax.make_array_from_single_device_arrays(
        shape_y, sharding, shards_y)
    return data_x, data_y, padded


def _shard_map(fn, mesh: Mesh, in_specs, out_specs):
    try:  # moved between jax versions (experimental -> top-level in 0.8)
        from jax import shard_map
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map
    return shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs)


def hist_quota(prob: float, batch: int):
    """Static (candidate_count, gate_probability) for per-batch
    hist-matching with the reference's EXPECTED fraction (ref:
    Generators.py:350 matches each example w.p. ~prob; XLA needs static
    shapes, so the count cannot be a per-step bernoulli draw). The
    candidate count is ceil(prob*batch) — never rounding an expected
    fraction below 1 to a silent zero (small per-device local batches on
    wide meshes) — and each candidate is gated w.p. expect/count, making
    the expected matched count exactly prob*batch."""
    expect = float(prob) * int(batch)
    if expect <= 0:
        return 0, 1.0
    count = int(np.ceil(expect))
    return count, expect / count


def _gated_match(match_fn, imgs, dx, key, quota: int, gate_p: float,
                 sel=None):
    """Quantile-match ``quota`` rows of ``imgs`` — the first rows, or the
    rows picked by index vector ``sel`` — against random rows of ``dx``,
    each candidate gated w.p. ``gate_p`` (see hist_quota). The single home
    of the expected-fraction gate math for both the sharded (first local
    rows) and replicated (random permutation) cached paths."""
    k_ref, k_gate = jax.random.split(key)
    ref_idx = jax.random.randint(k_ref, (quota,), 0, dx.shape[0])
    refs = jnp.take(dx, ref_idx, axis=0).astype(jnp.float32)
    cand = imgs[:quota] if sel is None else jnp.take(imgs, sel, axis=0)
    matched = jax.vmap(match_fn)(cand, refs)
    if gate_p < 1.0:
        gate = jax.random.bernoulli(k_gate, gate_p, (quota,))
        matched = jnp.where(
            gate.reshape((quota,) + (1,) * (imgs.ndim - 1)),
            matched, cand)
    if sel is None:
        return imgs.at[:quota].set(matched)
    return imgs.at[sel].set(matched)


def _sharded_gather(mesh: Mesh, data_x, data_y, idxs,
                    hist_key=None, quota_local: int = 0, match_fn=None,
                    gate_p: float = 1.0):
    """Communication-free batch gather from an example-sharded cache: each
    device takes its slice of the (data-sharded) LOCAL index vector from its
    LOCAL rows; the result leaves batch-sharded over 'data'. No collective
    is generated — pinned by tests/test_sharding.py's compiled-HLO check.

    Optional shard-local hist-matching: each device quantile-matches
    ``quota_local`` gated candidates of its local batch (batch rows are a
    uniform epoch draw, so this is a uniform example subset) against random
    rows of its LOCAL cache shard — the reference's random-other-image
    semantics (ref: Generators.py:352) in distribution, still with zero
    collectives."""
    spec = P(DATA_AXIS)

    def body(dx, dy, ix, key):
        imgs = jnp.take(dx, ix, axis=0).astype(jnp.float32)
        msks = jnp.take(dy, ix, axis=0).astype(jnp.float32)
        if quota_local > 0:
            k = jax.random.fold_in(key[0], jax.lax.axis_index(DATA_AXIS))
            imgs = _gated_match(match_fn, imgs, dx, k, quota_local, gate_p)
        return imgs, msks

    gather = _shard_map(body, mesh,
                        in_specs=(spec, spec, spec, P()),
                        out_specs=(spec, spec))
    if hist_key is None:
        hist_key = jax.random.key(0)  # unused when quota_local == 0
    return gather(data_x, data_y, idxs, hist_key[None])



def sharded_eval_plan(n_real: int, n_padded: int, n_shards: int,
                      local_batch: int):
    """Coverage plan for evaluating a wrap-padded, example-sharded cache
    exactly once per real example.

    Shard d holds global rows [d*local_n, (d+1)*local_n); rows >= n_real are
    wrap-padding (possibly spanning several shards for tiny cohorts) and
    must never be counted. Full batches take local rows [0, steps *
    local_batch) of EVERY shard — steps is capped by the smallest per-shard
    real-row count so a covered row is always real. Returns (steps,
    tail_global): the leftover real global rows for the replicated twin."""
    local_n = n_padded // n_shards
    real_per_shard = [max(0, min(local_n, n_real - d * local_n))
                      for d in range(n_shards)]
    steps = min(real_per_shard) // local_batch
    covered = steps * local_batch
    tail_global = [g for d in range(n_shards)
                   for r in range(covered, local_n)
                   if (g := d * local_n + r) < n_real]
    return steps, tail_global


def make_cache_reshuffler(mesh: Mesh):
    """jit program re-randomizing the example->shard assignment: a global
    permutation gather over the sharded cache, lowered by XLA to ICI
    collectives; inputs are donated so peak HBM stays ~one cache + one
    in-flight shard. Cost per call ~= cache_bytes/n_dev through ICI —
    microseconds-to-milliseconds at v5e ICI rates for GB-scale caches."""
    data = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())

    def reshuffle(x, y, perm):
        return jnp.take(x, perm, axis=0), jnp.take(y, perm, axis=0)

    return jax.jit(reshuffle, in_shardings=(data, data, repl),
                   out_shardings=(data, data), donate_argnums=(0, 1))


def make_cached_train_step(model, optimizer, loss_fn: Callable,
                           metrics: Optional[Dict[str, Callable]],
                           config: Dict, mesh: Mesh, augment: bool,
                           masks: bool = True, cache_sharded: bool = False):
    """(state, data_x, data_y, idxs, rng) -> (state, logs), fully fused.

    ``cache_sharded``: the cache is example-sharded over 'data' and ``idxs``
    carries LOCAL row ids per shard (see upload_cache_sharded); the batch
    gather runs shard-locally with no collective."""
    metrics = metrics or {}
    cfg = dict(config)
    ema_decay = S.ema_decay_from_config(cfg)
    # hist-matching rides the fused step too (Var.1 of the published
    # experiments, ref: src/data/Generators.py:350-358): ~10% of examples are
    # quantile-matched against a random slice drawn from the resident cache,
    # so the flagship throughput path covers all four experiment variants
    match_fn, hist_prob = _hist_match_setup(cfg, augment)
    hist_matching = match_fn is not None

    def step_fn(state: S.TrainState, data_x, data_y, idxs, rng):
        # gather in storage dtype (bf16/uint8 caches move half the bytes),
        # then everything downstream computes in f32 as before.
        # hist-matching uses a static per-batch candidate quota instead of
        # a per-example bernoulli: XLA needs static shapes, and matching the
        # whole batch to select ~10% wastes 90% of the (sort-heavy) work —
        # measured 2.7x slower end-to-end. ceil(prob*B) uniformly-chosen
        # candidates, each gated w.p. prob*B/ceil(prob*B) (hist_quota),
        # preserve the reference's expected fraction EXACTLY (the only
        # thing its unseeded RNG guarantees, ref: Generators.py:350) even
        # when prob*B < 0.5 — a plain round() would silently disable Var.1
        # for small per-device local batches on wide meshes.
        hm_key = jax.random.fold_in(
            jax.random.fold_in(rng, 0x415), state.step) if hist_matching \
            else None
        if cache_sharded:
            local_batch = idxs.shape[0] // int(mesh.shape[DATA_AXIS])
            quota_local, gate_p = hist_quota(hist_prob, local_batch) \
                if hist_matching else (0, 1.0)
            imgs, msks = _sharded_gather(mesh, data_x, data_y, idxs,
                                         hist_key=hm_key,
                                         quota_local=quota_local,
                                         match_fn=match_fn, gate_p=gate_p)
        else:
            imgs = jnp.take(data_x, idxs, axis=0).astype(jnp.float32)
            msks = jnp.take(data_y, idxs, axis=0).astype(jnp.float32)
        if hist_matching and not cache_sharded:
            batch = idxs.shape[0]
            quota, gate_p = hist_quota(hist_prob, batch)
            if quota > 0:
                k_sel, k_gm = jax.random.split(hm_key)
                sel = jax.random.permutation(k_sel, batch)[:quota]
                imgs = _gated_match(match_fn, imgs, data_x, k_gm,
                                    quota, gate_p, sel=sel)
        if augment:
            # two-level fold with a constant tag: decorrelated from the
            # dropout stream (which is fold_in(rng, step)) for every step
            aug_key = jax.random.fold_in(
                jax.random.fold_in(rng, 0xA06), state.step)
            imgs, msks = augment_batch_fn(aug_key, imgs, msks, cfg)
        x, y = finalize_batch(imgs, msks, cfg, masks=masks)

        dropout_rng = jax.random.fold_in(rng, state.step)

        def compute_loss(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            preds, mutated = model.apply(
                variables, x, train=True, rngs={"dropout": dropout_rng},
                mutable=["batch_stats"])
            return loss_fn(y, preds), (preds, mutated)

        (loss, (preds, mutated)), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)
        import optax
        updates, new_opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=mutated["batch_stats"],
                                  opt_state=new_opt_state,
                                  ema_params=S.ema_update(state, new_params,
                                                          ema_decay))
        logs = {"loss": loss}
        for name, fn in metrics.items():
            logs[name] = fn(y, preds)
        return new_state, logs

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    cache = data if cache_sharded else repl
    return jax.jit(step_fn,
                   in_shardings=(repl, cache, cache, data, repl),
                   out_shardings=(repl, repl),
                   donate_argnums=(0,))


def make_cached_eval_step(model, loss_fn: Callable,
                          metrics: Optional[Dict[str, Callable]],
                          config: Dict, mesh: Mesh, masks: bool = True,
                          shard_batch_axis: bool = True,
                          cache_sharded: bool = False):
    """(state, data_x, data_y, idxs) -> logs; no augmentation, no updates.

    ``shard_batch_axis=False`` replicates the index vector instead of
    sharding it over the 'data' axis — every device computes the whole
    (small) batch redundantly. That lifts the batch-divides-mesh constraint
    for partial/remainder batches; for their size the redundancy is free.
    ``cache_sharded``: local-row gather from an example-sharded cache
    (requires shard_batch_axis=True)."""
    metrics = metrics or {}
    cfg = dict(config)
    assert not (cache_sharded and not shard_batch_axis), (
        "a replicated index vector cannot gather from a sharded cache")

    def step_fn(state: S.TrainState, data_x, data_y, idxs):
        if cache_sharded:
            imgs, msks = _sharded_gather(mesh, data_x, data_y, idxs)
        else:
            imgs = jnp.take(data_x, idxs, axis=0).astype(jnp.float32)
            msks = jnp.take(data_y, idxs, axis=0).astype(jnp.float32)
        x, y = finalize_batch(imgs, msks, cfg, masks=masks)
        variables = {"params": S.inference_params(state),
                     "batch_stats": state.batch_stats}
        preds = model.apply(variables, x, train=False)
        logs = {"loss": loss_fn(y, preds)}
        for name, fn in metrics.items():
            logs[name] = fn(y, preds)
        return logs

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS)) if shard_batch_axis else repl
    cache = NamedSharding(mesh, P(DATA_AXIS)) if cache_sharded else repl
    return jax.jit(step_fn, in_shardings=(repl, cache, cache, data),
                   out_shardings=repl)


def _gen_examples(gen) -> int:
    """Example-row count of a DataGenerator's deterministic stage — cache
    rows when materialized, else the file-list length (identical by
    construction: the cache is built over range(len(images)))."""
    cache = getattr(gen, "_cache_x", None)
    if cache is not None:
        return int(cache.shape[0])
    return int(len(gen.images))


def _fixed_rows_of(gen, ids: np.ndarray):
    """Deterministic-stage rows by global id: the in-memory cache when
    present, the on-demand loader otherwise."""
    cache = getattr(gen, "_cache_x", None)
    if cache is not None:
        return cache[ids], gen._cache_y[ids]
    return gen.fixed_rows(ids)


class DeviceCachedLoop:
    """Drives epochs over an HBM-resident dataset for a Trainer.

    Built from DataGenerators (whose in-memory padded caches provide the
    arrays) or from raw padded numpy arrays."""

    def __init__(self, trainer, train_gen, val_gen=None):
        self.trainer = trainer
        cfg = trainer.config
        mesh = trainer.mesh
        self.batch = int(C.get(cfg, "BATCHSIZE", 32) or 0)
        if self.batch <= 0:
            raise ValueError(f"BATCHSIZE must be positive, got {self.batch}")
        self.rng = np.random.default_rng(C.get(cfg, "SEED", 42))

        self.n_shards = cache_shards(cfg, mesh)
        self.sharded = self.n_shards > 1 or bool(
            C.get(cfg, "CACHE_SHARDED", False))
        # CACHE_PER_HOST (default: on for multi-controller sharded runs):
        # each process fix-preprocesses and uploads only the example rows
        # its own devices hold — host RAM/decode scale with hosts. Needs a
        # loader (DataGenerator.fixed_rows); the generator may then run with
        # CACHE_IN_MEMORY=False so no host ever materializes the full set.
        # per_host_cache is the ONE resolution of the knob, shared with the
        # fold driver's loop choice and resume epoch math.
        self.per_host = per_host_cache(cfg)
        if not self.per_host:
            assert getattr(train_gen, "_cache_x", None) is not None, (
                "DeviceCachedLoop needs an in-memory DataGenerator "
                "(CACHE_IN_MEMORY=True), or CACHE_SHARDED+CACHE_PER_HOST "
                "with a generator exposing fixed_rows")
        if self.sharded:
            assert self.batch % self.n_shards == 0, (
                f"BATCHSIZE {self.batch} must be a multiple of the data-mesh "
                f"size {self.n_shards} for a sharded cache")
            self.local_batch = self.batch // self.n_shards
            if self.per_host:
                self.x_train, self.y_train, self._n_train_padded = \
                    upload_cache_sharded_per_host(
                        lambda ids: _fixed_rows_of(train_gen, ids),
                        _gen_examples(train_gen), mesh, config=cfg)
            else:
                self.x_train, self.y_train, self._n_train_padded = \
                    upload_cache_sharded(train_gen._cache_x,
                                         train_gen._cache_y,
                                         mesh, config=cfg)
            self._local_n_train = self._n_train_padded // self.n_shards
            self._reshuffle_epochs = int(
                C.get(cfg, "CACHE_RESHUFFLE_EPOCHS", 0) or 0)
            self._reshuffler = None
            self._epochs_run = 0
        else:
            self.x_train, self.y_train = upload_cache(
                train_gen._cache_x, train_gen._cache_y, mesh, config=cfg)
        self.n_train = _gen_examples(train_gen)
        self._augment = bool(C.get(cfg, "AUGMENT", False))
        self._masks = bool(getattr(train_gen, "masks", True))
        self._build_train_step()

        self.val = None
        if val_gen is not None and (self.per_host or
                                    getattr(val_gen, "_cache_x", None)
                                    is not None):
            self.n_val = _gen_examples(val_gen)
            self._val_masks = bool(getattr(val_gen, "masks", True))
            if self.per_host:
                self.x_val, self.y_val, n_val_padded = \
                    upload_cache_sharded_per_host(
                        lambda ids: _fixed_rows_of(val_gen, ids),
                        self.n_val, mesh, config=cfg)
                self._plan_sharded_eval(val_gen, n_val_padded, cfg, mesh)
            elif self.sharded:
                self.x_val, self.y_val, n_val_padded = upload_cache_sharded(
                    val_gen._cache_x, val_gen._cache_y, mesh, config=cfg)
                self._plan_sharded_eval(val_gen, n_val_padded, cfg, mesh)
            else:
                self.x_val, self.y_val = upload_cache(
                    val_gen._cache_x, val_gen._cache_y, mesh, config=cfg)
            self._eval_step = make_cached_eval_step(
                trainer.model, trainer.loss_fn, trainer.metrics, cfg, mesh,
                masks=self._val_masks, cache_sharded=self.sharded)
            self._eval_step_partial = None  # compiled on first remainder use
            self.val = True
        self._idx_sharding = NamedSharding(mesh, P(DATA_AXIS))
        logging.info(
            "device cache: %d train / %s val examples resident in HBM (%s)",
            self.n_train, self.n_val if self.val else "no",
            f"example-sharded over {self.n_shards} devices"
            + (", per-host row loading" if self.per_host else "")
            if self.sharded else "replicated")

    def _plan_sharded_eval(self, val_gen, n_val_padded: int, cfg,
                           mesh: Mesh) -> None:
        """Eval coverage plan for an example-sharded val cache: full batches
        walk the same local-row range on every shard; every REAL example not
        covered that way (per-shard leftovers + wrap-padding displacing real
        rows) forms ONE host-prepared tail batch, uploaded replicated once
        (it is deterministic) and evaluated by the replicated-index twin.
        Each real example is counted exactly once; padding rows never are."""
        steps, tail_global = sharded_eval_plan(
            self.n_val, n_val_padded, self.n_shards, self.local_batch)
        self._val_steps = steps
        self._val_tail_n = len(tail_global)
        if tail_global:
            # the tail is replicated: every process prepares the same rows
            # (fixed_rows is deterministic and falls back to the in-memory
            # cache when present)
            x_rows, y_rows = _fixed_rows_of(val_gen, np.asarray(tail_global))
            x_tail, y_tail = _pack_arrays(x_rows, y_rows, cfg)
            repl = NamedSharding(mesh, P())
            self._val_tail = (put_global(x_tail, repl),
                              put_global(y_tail, repl))

    def _build_train_step(self) -> None:
        t = self.trainer
        self._step_optimizer = t.optimizer
        if C.get(t.config, "GRAD_ALLREDUCE_DTYPE", None):
            # explicit-collectives variant: gradient all-reduce in the
            # configured dtype (bf16 halves ICI bytes on a pod) — see
            # cmrtpu/train/manual_collectives.py for the semantics deltas
            from cmrtpu.train.manual_collectives import make_manual_train_step
            self._train_step = make_manual_train_step(
                t.model, t.optimizer, t.loss_fn, t.metrics, t.config, t.mesh,
                self._augment, masks=self._masks, cache_sharded=self.sharded)
        else:
            self._train_step = make_cached_train_step(
                t.model, t.optimizer, t.loss_fn, t.metrics, t.config, t.mesh,
                self._augment, masks=self._masks, cache_sharded=self.sharded)

    def _epoch_indices(self, n: int, shuffle: bool) -> np.ndarray:
        idxs = self.rng.permutation(n) if shuffle else np.arange(n)
        n_batches = n // self.batch
        return idxs[:n_batches * self.batch].reshape(n_batches, self.batch)

    def _epoch_indices_sharded(self) -> np.ndarray:
        """[steps, BATCH] matrix of LOCAL row ids: each shard's column block
        is an independent per-epoch permutation of its local rows, so every
        example is visited exactly once per epoch (stratified batches:
        B/n_shards examples per shard per step)."""
        steps = self._local_n_train // self.local_batch
        cols = [self.rng.permutation(self._local_n_train)
                [:steps * self.local_batch].reshape(steps, self.local_batch)
                for _ in range(self.n_shards)]
        return np.concatenate(cols, axis=1)

    def _maybe_reshuffle(self) -> None:
        """CACHE_RESHUFFLE_EPOCHS=k: every k epochs re-randomize the
        example->shard assignment with one donated permutation gather
        (ICI collectives) — decorrelates batch composition across epochs."""
        if (not self.sharded or not self._reshuffle_epochs
                or self._epochs_run == 0
                or self._epochs_run % self._reshuffle_epochs):
            return
        if self._reshuffler is None:
            self._reshuffler = make_cache_reshuffler(self.trainer.mesh)
        perm = put_global(
            self.rng.permutation(self._n_train_padded).astype(np.int32),
            NamedSharding(self.trainer.mesh, P()))
        self.x_train, self.y_train = self._reshuffler(
            self.x_train, self.y_train, perm)

    def run_train_epoch(self) -> Dict[str, float]:
        t = self.trainer
        if self._step_optimizer is not t.optimizer:
            # optimizer swapped mid-training (OptimizerChanger callback path,
            # ref: src/utils/KerasCallbacks.py:245-306) — the compiled step
            # closes over the old optax transform, so rebuild it before the
            # stale update hits the fresh opt_state
            self._build_train_step()
        if self.sharded:
            self._maybe_reshuffle()
            self._epochs_run += 1
            batches = self._epoch_indices_sharded()
        else:
            batches = self._epoch_indices(self.n_train, shuffle=True)
        if len(batches) == 0:
            raise ValueError(
                f"device-cached epoch is empty: {self.n_train} examples < "
                f"BATCHSIZE {self.batch}")
        step_logs = []
        for idxs in batches:
            idxs_dev = put_global(idxs.astype(np.int32), self._idx_sharding)
            t.state, logs = self._train_step(t.state, self.x_train,
                                             self.y_train, idxs_dev, t.rng)
            step_logs.append(logs)  # device scalars — no transfer yet
        # epoch logs are the mean over all steps (parity with fit()/keras
        # epoch averaging, ref: src/models/train_model.py:105-112 semantics)
        # but still only ONE host sync per epoch: stack+mean on device, then
        # a single device_get of the scalar dict
        mean_logs = jax.tree_util.tree_map(
            lambda *xs: jnp.mean(jnp.stack(xs)), *step_logs)
        return {k: float(v) for k, v in jax.device_get(mean_logs).items()}

    def _eval_tail_twin(self, step_logs, weights) -> None:
        """Evaluate the leftover examples through the replicated-index twin
        (no batch-divides-mesh constraint; redundant on every device, free
        at remainder size)."""
        t = self.trainer
        if self.sharded:
            n_tail = self._val_tail_n
            if not n_tail:
                return
            x_tail, y_tail = self._val_tail
            idxs = np.arange(n_tail, dtype=np.int32)
        else:
            n_tail = self.n_val % self.batch
            if not n_tail:
                return
            x_tail, y_tail = self.x_val, self.y_val
            idxs = np.arange(self.n_val - n_tail, self.n_val, dtype=np.int32)
        if self._eval_step_partial is None:
            self._eval_step_partial = make_cached_eval_step(
                t.model, t.loss_fn, t.metrics, t.config, t.mesh,
                masks=self._val_masks, shard_batch_axis=False)
        step_logs.append(self._eval_step_partial(
            t.state, x_tail, y_tail,
            put_global(idxs, NamedSharding(t.mesh, P()))))
        weights.append(float(n_tail))

    def run_eval_epoch(self) -> Dict[str, float]:
        """Evaluate ALL validation examples. Full batches run through the
        batch-sharded eval program; the remainder (which keras/reference
        floor semantics would silently drop — with n_val < BATCHSIZE that
        means NO val metrics at all) runs through a replicated-index twin
        with no batch-divides-mesh constraint. The epoch value is the exact
        example-weighted mean, still one host sync per epoch."""
        t = self.trainer
        step_logs, weights = [], []
        if self.sharded:
            covered = self._val_steps * self.local_batch
            batches = [np.tile(np.arange(s * self.local_batch,
                                         (s + 1) * self.local_batch,
                                         dtype=np.int32), self.n_shards)
                       for s in range(self._val_steps)] if covered else []
        else:
            batches = list(self._epoch_indices(self.n_val, shuffle=False))
        for idxs in batches:
            idxs_dev = put_global(np.asarray(idxs, np.int32),
                                  self._idx_sharding)
            step_logs.append(self._eval_step(t.state, self.x_val,
                                             self.y_val, idxs_dev))
            weights.append(float(len(idxs)))
        self._eval_tail_twin(step_logs, weights)
        if not step_logs:
            return {}
        w = jnp.asarray(weights)
        mean_logs = jax.tree_util.tree_map(
            lambda *xs: jnp.sum(jnp.stack(xs) * w) / jnp.sum(w), *step_logs)
        return {k: float(v) for k, v in jax.device_get(mean_logs).items()}
