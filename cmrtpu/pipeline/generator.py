"""Batch generation: host decode + cached deterministic preprocessing + fused
on-device stochastic stage.

Rebuild of the reference's DataGenerator (ref: src/data/Generators.py:26-424)
with the same two-stage split:

  1. deterministic "fix" stage (load -> resample -> clip -> normalise), run
     once per file in a thread pool and cached in RAM
     (ref: __fix_preprocessing__ :283-344, in_memory :275-281);
  2. stochastic per-batch stage — hist-matching (10% of cases), augmentation,
     pad/crop, re-normalise, label->channel masks, optional Gaussian heatmap
     targets (ref: __preprocess_one_image__ :346-398).

TPU-native differences:
  * stage 2's augment + normalise + mask/heatmap synthesis is ONE jitted XLA
    program over the whole batch (static [B, *DIM] shapes) instead of
    per-element OpenCV in worker threads;
  * pad/crop to DIM happens *before* augmentation so shapes are static under
    jit; warps use reflect101 borders so the boundary behaviour matches;
  * randomness is PRNG-key-threaded and reproducible from SEED (fixes the
    reference's unseeded worker-thread RNG, SURVEY.md §5);
  * a failed preprocess raises instead of leaving stale batch memory
    (fixes the np.empty_like hazard, ref: Generators.py:186-221).
"""

from __future__ import annotations

import logging
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cmrtpu import config as C
from cmrtpu.io import MedicalImage, read_image
from cmrtpu.ops import resample as R
from cmrtpu.ops.gaussian import smooth_heatmap_targets
from cmrtpu.pipeline import transforms as T
from cmrtpu.pipeline.augment import make_batch_augmenter
from cmrtpu.pipeline.histmatch import match_2d_on_nd
from cmrtpu.utils.profiling import GLOBAL_TIMER


def load_masked_img(img_path: str, mask: bool = False,
                    masking_values: Sequence[int] = (1, 2, 3),
                    replace: Tuple[str, str] = ("img", "msk"),
                    mask_labels: Sequence[int] = (0, 1, 2, 3)) -> MedicalImage:
    """Load an image, optionally zeroing everything outside given mask labels
    (ref: load_masked_img, src/data/Preprocess.py:137-179)."""
    img = read_image(img_path, dtype=np.float32)
    if mask:
        msk = read_image(img_path.replace(replace[0], replace[1]))
        channels = T.transform_to_binary_mask(msk.array, mask_labels)
        keep = np.zeros(img.array.shape, dtype=np.float32)
        for c in masking_values:
            keep += img.array * channels[..., c]
        img = img.with_array(keep)
    return img


def _jax_normalise(img, scaler: str):
    scaler = scaler.lower()
    x = img.astype(jnp.float32)
    eps = jnp.finfo(jnp.float32).eps
    if scaler == "standard":
        return (x - jnp.mean(x)) / (jnp.std(x) + eps)
    if scaler == "robust":
        med = jnp.median(x)
        q0 = jnp.min(x)
        q95 = jnp.quantile(x, 0.95)
        return (x - med) / (q95 - q0 + eps)
    return (x - jnp.min(x)) / (jnp.max(x) - jnp.min(x) + eps)


def finalize_batch(imgs, msks, config: Dict, masks: bool = True):
    """The fused tail of the stochastic stage: per-example re-normalise,
    label->binary channels, optional Gaussian heatmap targets
    (ref: __preprocess_one_image__, src/data/Generators.py:371-395).
    Un-jitted for composition into larger programs.

    Multi-head configs (HEADS, BASELINE config 4 — a rebuild extension, the
    reference is single-head only): ``msks`` carries one label map per head
    stacked on axis 1 ([B, n_heads, *spatial]); per head, sigmoid heads get
    binary channels for labels 1..C (+ optional Gaussian heatmaps), softmax
    heads get a one-hot of labels 0..C-1; y is the channel concatenation in
    HEADS spec order (the layout multi_head_loss consumes)."""
    scaler = C.get(config, "SCALER", "MinMax")
    mask_values = tuple(C.get(config, "MASK_VALUES", [0, 1, 2, 3]))
    gaus = C.get(config, "GAUS", False)
    sigma = float(C.get(config, "SIGMA", 1))
    heads = tuple(tuple(h) for h in C.get(config, "HEADS", ()) or ())

    x = jax.vmap(lambda im: _jax_normalise(im, scaler))(imgs)
    if masks and heads:
        parts = []
        for i, (name, channels, act) in enumerate(heads):
            m = msks[:, i]
            if str(act) == "softmax":
                part = jax.nn.one_hot(m.astype(jnp.int32), int(channels),
                                      dtype=jnp.float32)
            else:
                part = jnp.stack([m == v for v in range(1, int(channels) + 1)],
                                 axis=-1).astype(jnp.float32)
                if gaus:  # heatmap smoothing applies to landmark heads only
                    part = jax.vmap(
                        lambda mm: smooth_heatmap_targets(mm, sigma))(part)
            parts.append(part)
        y = jnp.concatenate(parts, axis=-1)
    elif masks:
        channels = jnp.stack([msks == v for v in mask_values],
                             axis=-1).astype(jnp.float32)
        if gaus:
            channels = jax.vmap(
                lambda m: smooth_heatmap_targets(m, sigma))(channels)
        y = channels
    else:
        y = jax.vmap(lambda im: _jax_normalise(im, scaler))(msks)[..., None]
    return x[..., None], y


class DataGenerator:
    """Yields (X, Y) float32 batches for 2D/3D U-Net training.

    X: [B, *DIM, 1]; Y: [B, *DIM, len(MASK_VALUES)] (or the normalised image
    again when no masks are given — autoencoder mode, ref: Generators.py:338).
    """

    def __init__(self, x: Sequence[str], y: Optional[Sequence[str]] = None,
                 config: Optional[Dict] = None, in_memory: Optional[bool] = None):
        config = config or {}
        if y is not None:
            assert len(x) == len(y), "len(X) != len(Y)"
        self.images = list(x)
        self.labels = list(y) if y is not None else None
        self.masks = y is not None
        self.config = config

        self.scaler = C.get(config, "SCALER", "MinMax")
        self.augment = C.get(config, "AUGMENT", False)
        self.shuffle = C.get(config, "SHUFFLE", True)
        self.resample = C.get(config, "RESAMPLE", False)
        self.spacing = list(C.get(config, "SPACING", [1.25, 1.25]))
        self.seed = C.get(config, "SEED", 42)
        self.dim = tuple(C.get(config, "DIM", [256, 256]))
        self.batchsize = C.get(config, "BATCHSIZE", 32)
        self.mask_values = list(C.get(config, "MASK_VALUES", [0, 1, 2, 3]))
        self.hist_matching = C.get(config, "HIST_MATCHING", False)
        self.img_interpolation = C.get(config, "IMG_INTERPOLATION", R.LINEAR)
        self.msk_interpolation = C.get(config, "MSK_INTERPOLATION", R.NEAREST)
        self.gaus = C.get(config, "GAUS", False)
        self.sigma = C.get(config, "SIGMA", 1)
        self.masking_image = C.get(config, "MASKING_IMAGE", False)
        self.masking_values = C.get(config, "MASKING_VALUES", [1, 2, 3])
        self.max_workers = min(32, C.get(config, "GENERATOR_WORKER", self.batchsize))
        self.in_memory = C.get(config, "CACHE_IN_MEMORY", True) \
            if in_memory is None else in_memory

        # img->msk path rule (ref: Generators.py:254-263)
        self.replace_wildcard = ((".nii.gz", "_gt.nii.gz")
                                 if x and "ACDC" in x[0] else ("img", "msk"))

        # multi-head target sources (HEADS, BASELINE config 4): head 0 reads
        # the y file list itself; each further head derives its mask path
        # from the y path by a [find, replace] rule — HEAD_MASK_RULES
        # overrides, default replaces 'msk' with the head's name (e.g.
        # patient001__t01_z03_msk.nrrd -> ..._seg.nrrd for a head named
        # 'seg'). One label map per head, stacked on a leading head axis so
        # augmentation warps broadcast over it like the z/t axes.
        self.heads = tuple(tuple(h) for h in C.get(config, "HEADS", ()) or ())
        rules = C.get(config, "HEAD_MASK_RULES", None)
        if self.heads:
            if rules:
                self.head_mask_rules = [tuple(r) for r in rules]
            else:
                self.head_mask_rules = [None] + [("msk", str(name))
                                                 for name, _, _ in self.heads[1:]]
            assert len(self.head_mask_rules) == len(self.heads), (
                "HEAD_MASK_RULES must have one [find, replace] entry per head")

        self._rng = np.random.default_rng(self.seed)
        # typed key: carries its PRNG impl, immune to later global
        # jax_default_prng_impl flips (e.g. Trainer setting PRNG_IMPL=rbg)
        self._aug_key = jax.random.key(self.seed)
        self._batch_counter = 0
        self.indices = np.arange(len(self.images))
        self._cache: Optional[List] = None
        self._augment_batch = make_batch_augmenter(config) if self.augment else None
        self._finalize = self._build_finalize()

        self._cache_x = self._cache_y = None  # padded, batch-gatherable cache
        self._raw_y_uint8 = None  # lazily-probed packability for raw_batch
        self._warned_u8 = False   # one-shot STREAM_DTYPE=uint8 border check
        if self.in_memory and self.images:
            with ThreadPoolExecutor(max_workers=self.max_workers) as pool:
                self._cache = list(pool.map(self._fix_preprocessing,
                                            range(len(self.images))))
            # pad/crop to DIM is deterministic -> precompute once and keep the
            # stack in two contiguous arrays; batch assembly then is a single
            # vectorized gather instead of a per-element python loop
            self._cache_x = np.stack([T.pad_and_crop(img.astype(np.float32), self.dim)
                                      for img, _ in self._cache])
            self._cache_y = np.stack([self._pad_y(msk) for _, msk in self._cache])
        self.on_epoch_end()

    # ------------------------------------------------------------------
    # stage 1: deterministic (cacheable) preprocessing
    # ------------------------------------------------------------------
    def _fix_preprocessing(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        with GLOBAL_TIMER.stage("generator/fix_preprocess"):
            return self._fix_preprocessing_impl(idx)

    def _fix_preprocessing_impl(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        img = load_masked_img(self.images[idx], mask=self.masking_image,
                              masking_values=self.masking_values,
                              replace=self.replace_wildcard)
        if self.masks and self.heads:
            msks = []
            for rule in self.head_mask_rules:
                # rule applies to the FILENAME only: a 'msk' substring in a
                # directory or patient component must not be rewritten
                # (e.g. /data/cmr_msk_cohort/..._msk.nrrd)
                head, base = os.path.split(self.labels[idx])
                path = self.labels[idx] if rule is None \
                    else os.path.join(head, base.replace(rule[0], rule[1]))
                msks.append(read_image(path))
        elif self.masks:
            msks = [read_image(self.labels[idx])]
        else:
            msks = [img]

        if self.resample and img.ndim in (2, 3):
            target_spacing = list(reversed(self.spacing))  # numpy -> sitk order
            new_size = T.calc_resampled_size(img.size[:len(target_spacing)],
                                             img.spacing[:len(target_spacing)],
                                             target_spacing)
            img = R.resample_image(img, new_size, target_spacing,
                                   self.img_interpolation)
            msks = [R.resample_image(m, new_size, target_spacing,
                                     self.msk_interpolation) for m in msks]

        img_nda = T.clip_quantile(img.array, 0.999)
        img_nda = T.normalise_image(img_nda, self.scaler)
        if not self.masks:  # autoencoder mode: image twice
            msk_nda = T.normalise_image(
                T.clip_quantile(msks[0].array, 0.999), self.scaler)
        elif self.heads:
            msk_nda = np.stack([m.array for m in msks])  # [n_heads, *spatial]
        else:
            msk_nda = msks[0].array
        return img_nda.astype(np.float32), msk_nda.astype(np.float32)

    # ------------------------------------------------------------------
    # stage 2: fused stochastic stage (jit)
    # ------------------------------------------------------------------
    def _build_finalize(self):
        cfg = dict(self.config)
        masks = self.masks

        @jax.jit
        def finalize(imgs, msks):
            return finalize_batch(imgs, msks, cfg, masks=masks)

        return finalize

    # ------------------------------------------------------------------
    # keras Sequence-style protocol (ref: BaseGenerator :136-173)
    # ------------------------------------------------------------------
    def __len__(self) -> int:
        return max(1, len(self.indices) // self.batchsize) \
            if len(self.indices) >= self.batchsize else 0

    def on_epoch_end(self) -> None:
        self.indices = np.arange(len(self.images))
        if self.shuffle:
            self._rng.shuffle(self.indices)

    def _get_fixed(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        if self._cache is not None:
            return self._cache[idx]
        return self._fix_preprocessing(idx)

    def fixed_rows(self, idxs) -> Tuple[np.ndarray, np.ndarray]:
        """Deterministic-stage padded rows for the given GLOBAL example ids
        — exactly the rows the in-memory cache holds at those positions,
        computed on demand (thread-pool fan-out) when the cache is not
        materialized. The multi-controller sharded device cache uses this so
        each host preprocesses only the rows its own devices hold
        (cmrtpu/train/device_cache.py upload_cache_sharded_per_host)."""
        idxs = np.asarray(idxs, dtype=int)
        if self._cache_x is not None:
            return self._cache_x[idxs], self._cache_y[idxs]
        with ThreadPoolExecutor(max_workers=self.max_workers) as pool:
            pairs = list(pool.map(self._get_fixed, idxs.tolist()))
        x = np.stack([T.pad_and_crop(img.astype(np.float32), self.dim)
                      for img, _ in pairs])
        y = np.stack([self._pad_y(msk) for _, msk in pairs])
        return x, y

    def _pad_y(self, msk: np.ndarray) -> np.ndarray:
        """pad/crop a target to DIM; multi-head label stacks pad per head
        (the leading head axis is not a spatial axis)."""
        msk = msk.astype(np.float32)
        if self.masks and self.heads and msk.ndim == len(self.dim) + 1:
            return np.stack([T.pad_and_crop(m, self.dim) for m in msk])
        return T.pad_and_crop(msk, self.dim)

    def __getitem__(self, index: int) -> Tuple[np.ndarray, np.ndarray]:
        with GLOBAL_TIMER.stage("generator/batch"):
            return self._getitem_impl(index)

    def _hist_match_element(self, idx: int) -> np.ndarray:
        """hist-matching for one element (ref: Generators.py:350-358),
        computed on the unpadded cached image against a random reference."""
        img_nda, _ = self._get_fixed(idx)
        ref_idx = int(self._rng.integers(len(self.images)))
        ref2d, _ = self._get_fixed(ref_idx)
        if ref2d.ndim == 3 and ref2d.shape[0] > 4:
            border = 2
            ref2d = ref2d[int(self._rng.integers(border, ref2d.shape[0] - border))]
        elif ref2d.ndim == 3:
            ref2d = ref2d[ref2d.shape[0] // 2]
        matched = match_2d_on_nd(img_nda, ref2d)
        return T.pad_and_crop(matched.astype(np.float32), self.dim)

    def _getitem_impl(self, index: int) -> Tuple[np.ndarray, np.ndarray]:
        idxs = self.indices[index * self.batchsize:(index + 1) * self.batchsize]
        hist_on = self.augment and self.hist_matching
        if self._cache_x is not None:
            # vectorized gather over the padded cache (hot path)
            imgs_b = self._cache_x[idxs]
            msks_b = self._cache_y[idxs]
            if hist_on:
                hits = self._rng.random(len(idxs)) < 0.1
                imgs_b = np.array(imgs_b) if hits.any() else imgs_b
                for pos in np.nonzero(hits)[0]:
                    imgs_b[pos] = self._hist_match_element(int(idxs[pos]))
        else:
            imgs, msks = [], []
            for idx in idxs:
                img_nda, msk_nda = self._get_fixed(int(idx))
                # hist-matching in <10% of cases (ref: Generators.py:350-358)
                if hist_on and self._rng.random() < 0.1:
                    imgs.append(self._hist_match_element(int(idx)))
                else:
                    imgs.append(T.pad_and_crop(img_nda.astype(np.float32), self.dim))
                msks.append(self._pad_y(msk_nda))
            imgs_b = np.stack(imgs)
            msks_b = np.stack(msks)

        if self.augment:
            self._batch_counter += 1
            key = jax.random.fold_in(self._aug_key, self._batch_counter)
            imgs_b, msks_b = self._augment_batch(key, imgs_b, msks_b)

        # returned as device arrays: on TPU the stochastic stage's output
        # already lives in HBM, so the train step consumes it without a
        # host round-trip (np.asarray(...) still works for numpy consumers)
        return self._finalize(jnp.asarray(imgs_b), jnp.asarray(msks_b))

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]

    # ------------------------------------------------------------------
    # packed raw batches (the streamed fused-step path)
    # ------------------------------------------------------------------
    def raw_batch(self, index: int) -> Tuple[np.ndarray, np.ndarray]:
        """Deterministic-stage batch in PACKED storage dtypes (images bf16,
        exact-small-integer masks uint8) for the streamed fused train step:
        the stochastic stage (hist-match / augment / finalize) runs inside
        the train step on device, so the host link moves 4x fewer bytes than
        streaming finalized float32 tensors — the difference between the
        25-50 MB/s interleaved-upload regime and a usable streaming path
        (docs/ARCHITECTURE.md; ref queue model: src/models/
        train_model.py:105-112)."""
        idxs = self.indices[index * self.batchsize:(index + 1) * self.batchsize]
        if self._cache_x is not None:
            imgs_b = self._cache_x[idxs]
            msks_b = self._cache_y[idxs]
        else:
            imgs, msks = [], []
            for idx in idxs:
                img_nda, msk_nda = self._get_fixed(int(idx))
                imgs.append(T.pad_and_crop(img_nda.astype(np.float32), self.dim))
                msks.append(self._pad_y(msk_nda))
            imgs_b = np.stack(imgs)
            msks_b = np.stack(msks)
        stream_dtype = str(C.get(self.config, "STREAM_DTYPE",
                                 "bfloat16")).lower()
        if stream_dtype in ("bfloat16", "bf16"):
            import ml_dtypes
            imgs_b = imgs_b.astype(ml_dtypes.bfloat16)
        elif stream_dtype in ("uint8", "u8"):
            # per-example affine quantization: 2x fewer image bytes than
            # bf16 on the link-bound streaming path, transparent through
            # the affine-invariant scalers (see quantize_images_uint8)
            from cmrtpu.train.device_cache import (_warn_if_uint8_unsafe,
                                                   quantize_images_uint8)
            if not self._warned_u8:
                _warn_if_uint8_unsafe(self.config, "STREAM_DTYPE")
                self._warned_u8 = True
            imgs_b = quantize_images_uint8(imgs_b)
        from cmrtpu.train.device_cache import _uint8_packable
        if self._raw_y_uint8 is None:
            # the packing decision is a dtype CONTRACT with the compiled
            # streamed step, so it is made once (from the full cache when
            # available, else the first-requested batch) and held for the
            # generator's lifetime
            src = self._cache_y if self._cache_y is not None else msks_b
            self._raw_y_uint8 = _uint8_packable(np.asarray(src))
        if self._raw_y_uint8:
            if self._cache_y is None and not _uint8_packable(msks_b,
                                                             memoize=False):
                # no cache to probe globally: a later batch that is NOT
                # losslessly uint8-packable must fail loudly — silently
                # truncating float/large-valued targets would corrupt
                # training on exactly the beyond-RAM streaming path
                raise ValueError(
                    f"raw_batch({index}): mask values do not pack "
                    "losslessly to uint8 but an earlier batch did — the "
                    "dataset mixes exact-small-integer and float targets. "
                    "Keep targets integer-valued, or use "
                    "CACHE_IN_MEMORY=True so the packing decision sees "
                    "the whole dataset")
            msks_b = msks_b.astype(np.uint8)
        return imgs_b, msks_b


def sliceable(generator_cls, x: Sequence[str], y=None, config: Optional[Dict] = None,
              temp_path: str = "data/interim") -> List[DataGenerator]:
    """Per-4D-file 2D generators for running a 2D model over cine stacks
    (ref: sliceable, src/data/Generators.py:401-424)."""
    from cmrtpu.data.dataset import create_2d_slices_from_4d_volume_file

    cfg = dict(config or {})
    cfg["BATCHSIZE"] = 1
    generators = []
    for img_f in x:
        sliced = create_2d_slices_from_4d_volume_file(img_f, temp_path)
        logging.info("x_sliced: %d, example: %s", len(sliced), sliced[0])
        generators.append(generator_cls(x=sliced, y=None, config=cfg))
    return generators
