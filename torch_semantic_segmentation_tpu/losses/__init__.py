"""Losses (T4 in SURVEY.md §1): class-weighted cross-entropy and OHEM
cross-entropy, both with `ignore_index` — the reference's loss surface
(BASELINE.json north_star; SURVEY.md §2.2).

Everything runs on-device inside the step program: no host sync, static
shapes. The OHEM hard-example threshold is computed either exactly
(`lax.top_k`) for small pixel counts or via an on-device value-range
bisection for full-resolution maps — both stay inside the compiled step
(SURVEY.md §7 "OHEM on device").

Numeric conventions match torch `F.cross_entropy(weight=..., ignore_index=...)`:
the mean is weighted by the per-pixel class weight (sum(w_i * l_i) / sum(w_i)),
and ignored pixels contribute to neither numerator nor denominator.
"""

from __future__ import annotations

import dataclasses
import math
import typing as tp

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SegLoss:
    """First-class per-output segmentation loss with an explicit resize
    contract (VERDICT r2 next #6 — replaces the `handles_resize`
    attribute monkeypatched onto CLI lambdas).

    `fn(logits, labels) -> scalar` computes the loss for ONE output head;
    `handles_resize=True` declares that `fn` upsamples low-res logits to
    the label grid itself (the fused lane-major `resize_*` losses), so
    `aux_weighted_loss` must NOT pre-resize mixed-resolution heads.
    """

    fn: tp.Callable[[jax.Array, jax.Array], jax.Array]
    handles_resize: bool = False
    name: str = "loss"

    def __call__(self, logits: jax.Array, labels: jax.Array) -> jax.Array:
        return self.fn(logits, labels)


def _per_pixel_ce(logits: jax.Array, labels: jax.Array, ignore_index: int
                  ) -> tuple[jax.Array, jax.Array]:
    """Per-pixel CE loss and validity mask.

    logits: (..., C) float; labels: (...) int. fp32 log-softmax for stability
    regardless of compute dtype (bf16 logits are upcast).

    The true-class logit is extracted with a one-hot multiply-reduce rather
    than `take_along_axis`: lane-dim gathers defeat XLA:TPU fusion and
    materialize full-res fp32 intermediates (measured: 3× the step's HBM
    bytes), while the one-hot form fuses into the surrounding elementwise
    pass.
    """
    logits = logits.astype(jnp.float32)
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0).astype(jnp.int32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    onehot = jax.nn.one_hot(safe, logits.shape[-1], dtype=jnp.float32)
    true_logit = jnp.sum(logits * onehot, axis=-1)
    loss = logz - true_logit
    return jnp.where(valid, loss, 0.0), valid


def _pixel_weights(labels: jax.Array, valid: jax.Array, num_classes: int,
                   class_weights) -> jax.Array:
    """Per-pixel weight = class weight (or 1) over valid pixels; one-hot
    contraction instead of a table gather (same fusion argument as above)."""
    if class_weights is None:
        return valid.astype(jnp.float32)
    cw = jnp.asarray(class_weights, dtype=jnp.float32)
    safe = jnp.where(valid, labels, 0).astype(jnp.int32)
    onehot = jax.nn.one_hot(safe, num_classes, dtype=jnp.float32)
    return jnp.where(valid, jnp.sum(onehot * cw, axis=-1), 0.0)


def cross_entropy_loss(
    logits: jax.Array,
    labels: jax.Array,
    *,
    ignore_index: int = 255,
    class_weights: jax.Array | None = None,
) -> jax.Array:
    """Class-weighted CE with ignore_index (torch F.cross_entropy parity).

    logits NHWC (C = num classes), labels NHW int. Returns scalar fp32.
    """
    from torch_semantic_segmentation_tpu.ops import packed_ops

    if isinstance(logits, packed_ops.PackedLogits):
        # packed-head models (ops/packed_ops.py): compute the loss in the
        # W-packed layout so the full-res (…, C)-minor logits — which TPU
        # tiling would lane-pad up to 128/C× — never materialize.
        return packed_ops.packed_cross_entropy(
            logits.data, labels, logits.c, ignore_index=ignore_index,
            class_weights=class_weights)
    loss, valid = _per_pixel_ce(logits, labels, ignore_index)
    w = _pixel_weights(labels, valid, logits.shape[-1], class_weights)
    denom = jnp.maximum(jnp.sum(w), 1e-12)
    return jnp.sum(loss * w) / denom


def _threshold_topk_exact(losses: jax.Array, k: int) -> jax.Array:
    """Exact k-th largest of a 1-D array via lax.top_k."""
    vals, _ = jax.lax.top_k(losses, k)
    return vals[-1]


def _threshold_topk_histogram(losses: jax.Array, valid: jax.Array, k: int,
                              iters: int = 26) -> jax.Array:
    """k-th largest via bisection on the value range — O(iters·n) fused
    compare-count reductions, no sort and no scatter. (The previous
    512-bin scatter-add histogram measured ~300 ms for a 33M-pixel map
    on v5e — the whole OHEM tail's budget — because TPU scatter
    serializes; 26 fused reductions stream the map at HBM bandwidth.)

    Returns a threshold t ≤ exact k-th largest with count(loss ≥ t) ≥ k,
    so at least k pixels are kept (OHEM keeps >= min_kept, matching
    common reference impls); after `iters` halvings of [0, max] the gap
    to the exact k-th largest is below f32 noise — strictly tighter than
    the old one-bin resolution.
    """
    lossv = jnp.where(valid, losses.astype(jnp.float32), -1.0)
    mx = jnp.maximum(jnp.max(lossv), 1e-6)
    kf = jnp.float32(k)

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum((lossv >= mid).astype(jnp.float32))
        ge = cnt >= kf
        return jnp.where(ge, mid, lo), jnp.where(ge, hi, mid)

    lo, _ = jax.lax.fori_loop(
        0, iters, body, (jnp.float32(0.0), mx + jnp.float32(1e-3)))
    return lo


def ohem_cross_entropy(
    logits: jax.Array,
    labels: jax.Array,
    *,
    ignore_index: int = 255,
    thresh: float = 0.7,
    min_kept: int = 10_000,
    class_weights: jax.Array | None = None,
    exact: bool | None = None,
) -> jax.Array:
    """Online Hard Example Mining CE (SURVEY.md §2.2 "OHEM CE").

    Keeps pixels whose true-class probability < `thresh`; if fewer than
    `min_kept` qualify, keeps the `min_kept` hardest. Mean of kept losses
    (weighted by class_weights when given). `min_kept` is per *global* batch.

    Packed-head logits (`PackedLogits`) are consumed IN packed layout:
    the per-pixel loss map comes from `packed_ops.packed_per_pixel_ce`
    (the full-res (…,C)-minor logits never materialize — VERDICT r3
    next #7 removed the silent unpack), and because top-k / threshold /
    weighted mean are permutation-invariant over pixels, the loss value
    is identical to the NHWC computation (tests/test_packed_ops.py).

    exact=None auto-selects: exact top_k below 2^20 pixels, bisection
    quantile above (keeps the step free of giant sorts at 1024×2048).
    """
    from torch_semantic_segmentation_tpu.ops import packed_ops

    if isinstance(logits, packed_ops.PackedLogits):
        loss, cw_px, valid = packed_ops.packed_per_pixel_ce(
            logits.data, labels, logits.c, ignore_index=ignore_index,
            class_weights=class_weights)
        wmap = cw_px.reshape(-1)
    else:
        loss, valid = _per_pixel_ce(logits, labels, ignore_index)
        wmap = None
    flat = loss.reshape(-1)
    vflat = valid.reshape(-1)
    n = flat.shape[0]
    k = min(int(min_kept), n)
    loss_thresh = -math.log(thresh)

    if exact is None:
        exact = n <= (1 << 20)
    if k > 0:
        if exact:
            kth = _threshold_topk_exact(jnp.where(vflat, flat, -jnp.inf), k)
        else:
            kth = _threshold_topk_histogram(flat, vflat, k)
        threshold = jnp.minimum(jnp.asarray(loss_thresh, jnp.float32), kth)
    else:
        threshold = jnp.asarray(loss_thresh, jnp.float32)

    keep = vflat & (flat >= threshold)
    if wmap is not None:
        w = jnp.where(keep, wmap, 0.0)
    else:
        w = _pixel_weights(labels.reshape(-1), keep, logits.shape[-1],
                           class_weights)
    denom = jnp.maximum(jnp.sum(w), 1e-12)
    return jnp.sum(flat * w) / denom


def resize_cross_entropy_loss(
    logits: jax.Array,
    labels: jax.Array,
    *,
    ignore_index: int = 255,
    class_weights: jax.Array | None = None,
    align_corners: bool = False,
) -> jax.Array:
    """CE between LOW-RES logits bilinearly upsampled to the label grid and
    full-res labels — the training tail of every model whose head ends in a
    ×k bilinear upsample (FastSCNN ×8, DeepLab ×8/16, BiSeNet ×8, ...).

    Numerically identical to
    `cross_entropy_loss(resize_bilinear(logits, labels.shape[1:3]), labels)`
    but the upsampled logits are kept in an N,H,C,W layout: with C classes
    (19) in the minor dimension the full-res tensor wastes 109/128 lanes of
    every TPU vector op and the resize matmuls run at ~15% efficiency;
    emitting the resize einsums as 'n h c w' puts W (≥1024) in the lanes
    instead. Measured ~4× on the FastSCNN classifier+loss tail.
    """
    from torch_semantic_segmentation_tpu.ops import pallas_resize_ce
    from torch_semantic_segmentation_tpu.ops.upsample import (
        resize_bilinear_nhcw)

    # single-chip TPU: the whole resize+CE chain runs as one Pallas kernel
    # whose full-res intermediates never leave VMEM (~22 GB/step less HBM
    # traffic at the bench shape; ops/pallas_resize_ce.py)
    if (pallas_resize_ce.enabled()
            and pallas_resize_ce.supports(logits.shape, labels.shape,
                                          logits.dtype, ignore_index)
            # the fused kernel's VJP treats class weights as constants
            # (zero cotangent). Dataset class weights ARE constants
            # (data/class_weights.py), but if a caller passes a traced
            # array — e.g. differentiating wrt learned weights — keep
            # the XLA path, whose cw gradient is real.
            and not isinstance(class_weights, jax.core.Tracer)):
        return pallas_resize_ce.resize_cross_entropy(
            logits, labels, class_weights,
            align_corners=align_corners, ignore_index=ignore_index)

    c = logits.shape[-1]
    oh, ow = labels.shape[1], labels.shape[2]
    # operands stay in the model's compute dtype (bf16-native MXU mode,
    # fp32 accumulate) — this is a loss, not the logit-parity path; the
    # out_dtype cast keeps the full-res intermediate out of fp32 (4× HBM)
    x = resize_bilinear_nhcw(logits, (oh, ow), align_corners=align_corners,
                             out_dtype=logits.dtype)
    # x: (N, OH, C, OW); CE over axis 2, everything lane-major in OW.
    # fp32 upcasts happen inside the fused reduction epilogues.
    valid = labels != ignore_index                              # (N, OH, OW)
    safe = jnp.where(valid, labels, 0).astype(jnp.int32)
    xf = x.astype(jnp.float32)
    logz = jax.nn.logsumexp(xf, axis=2)                         # (N, OH, OW)
    onehot = (safe[:, :, None, :]
              == jnp.arange(c, dtype=jnp.int32)[None, None, :, None])
    true_logit = jnp.sum(xf * onehot.astype(jnp.float32), axis=2)
    loss = jnp.where(valid, logz - true_logit, 0.0)
    if class_weights is not None:
        cw = jnp.asarray(class_weights, dtype=jnp.float32)
        wts = jnp.where(
            valid,
            jnp.sum(onehot.astype(jnp.float32) * cw[None, None, :, None],
                    axis=2),
            0.0)
    else:
        wts = valid.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(wts), 1e-12)
    return jnp.sum(loss * wts) / denom


resize_cross_entropy_loss.handles_resize = True  # aux_weighted_loss skips its pre-resize


def resize_ohem_cross_entropy(
    logits: jax.Array,
    labels: jax.Array,
    *,
    ignore_index: int = 255,
    thresh: float = 0.7,
    min_kept: int = 10_000,
    class_weights: jax.Array | None = None,
    align_corners: bool = False,
) -> jax.Array:
    """OHEM CE on low-res logits upsampled inside the loss — the fused
    (lane-major) counterpart of `ohem_cross_entropy`, pairing
    `upsample_logits=False` models with the config-4/5 OHEM recipe.

    The per-pixel loss map is produced by the same N,H,C,W machinery as
    `resize_cross_entropy_loss` — or, on single-chip TPU, by the fused
    Pallas map kernel (`ops/pallas_resize_ce.per_pixel_resize_ce`: the
    full-res upsampled logits never leave VMEM; only the loss map and its
    keep-weighted cotangent cross HBM) — and the hard-example threshold
    then reuses the bisection-quantile selector (full-res maps are always
    > 2^20 pixels).
    """
    from torch_semantic_segmentation_tpu.ops import pallas_resize_ce
    from torch_semantic_segmentation_tpu.ops.upsample import (
        resize_bilinear_nhcw)

    c = logits.shape[-1]
    oh, ow = labels.shape[1], labels.shape[2]
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0).astype(jnp.int32)

    if (pallas_resize_ce.enabled()
            and pallas_resize_ce.supports(logits.shape, labels.shape,
                                          logits.dtype, ignore_index)):
        loss = pallas_resize_ce.per_pixel_resize_ce(
            logits, labels, align_corners=align_corners)     # (N, OH, OW)
        wmap_full = None
    else:
        x = resize_bilinear_nhcw(logits, (oh, ow),
                                 align_corners=align_corners,
                                 out_dtype=logits.dtype)
        xf = x.astype(jnp.float32)
        logz = jax.nn.logsumexp(xf, axis=2)
        onehot = (safe[:, :, None, :]
                  == jnp.arange(c, dtype=jnp.int32)[None, None, :, None])
        true_logit = jnp.sum(xf * onehot.astype(jnp.float32), axis=2)
        loss = jnp.where(valid, logz - true_logit, 0.0)      # (N, OH, OW)
        wmap_full = onehot  # reused below to avoid a second gather

    flat = loss.reshape(-1)
    vflat = valid.reshape(-1)
    k = min(int(min_kept), flat.shape[0])
    loss_thresh = -math.log(thresh)
    if k > 0:
        if flat.shape[0] <= (1 << 20):
            kth = _threshold_topk_exact(jnp.where(vflat, flat, -jnp.inf), k)
        else:
            kth = _threshold_topk_histogram(flat, vflat, k)
        threshold = jnp.minimum(jnp.asarray(loss_thresh, jnp.float32), kth)
    else:
        threshold = jnp.asarray(loss_thresh, jnp.float32)
    keep = vflat & (flat >= threshold)
    if class_weights is not None:
        cw = jnp.asarray(class_weights, dtype=jnp.float32)
        if wmap_full is not None:
            wmap = jnp.sum(wmap_full.astype(jnp.float32)
                           * cw[None, None, :, None], axis=2).reshape(-1)
        else:
            wmap = cw[safe].reshape(-1)
        wts = jnp.where(keep, wmap, 0.0)
    else:
        wts = keep.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(wts), 1e-12)
    return jnp.sum(flat * wts) / denom


resize_ohem_cross_entropy.handles_resize = True


def aux_weighted_loss(
    main_and_aux_logits: tp.Sequence[jax.Array],
    labels: jax.Array,
    *,
    loss_fn: tp.Callable[..., jax.Array] = cross_entropy_loss,
    aux_weight: float = 0.4,
    label_size_match: str = "resize_logits",
    align_corners: bool = False,
    **loss_kwargs,
) -> jax.Array:
    """main + aux_weight * sum(aux) — BiSeNet/ICNet aux-head training
    (SURVEY.md §2.1 "BiSeNet"/"ICNet"). Logits whose spatial size differs
    from the labels are bilinearly resized to the label grid first."""
    from torch_semantic_segmentation_tpu.ops.upsample import resize_bilinear

    lh, lw = labels.shape[1], labels.shape[2]
    handles_resize = getattr(loss_fn, "handles_resize", False)
    total = jnp.asarray(0.0, jnp.float32)
    for i, lg in enumerate(main_and_aux_logits):
        if lg.shape[1:3] != (lh, lw) and not handles_resize:
            from torch_semantic_segmentation_tpu.ops import packed_ops

            lg = resize_bilinear(packed_ops.as_nhwc(lg), (lh, lw),
                                 align_corners=align_corners)
        li = loss_fn(lg, labels, **loss_kwargs)
        total = total + (li if i == 0 else aux_weight * li)
    return total


__all__ = [
    "SegLoss",
    "cross_entropy_loss",
    "ohem_cross_entropy",
    "resize_cross_entropy_loss",
    "resize_ohem_cross_entropy",
    "aux_weighted_loss",
]
