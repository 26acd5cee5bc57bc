"""Fused bilinear-upsample + cross-entropy as ONE Pallas kernel.

The training tail of every ×k-upsample head (FastSCNN ×8, DeepLab ×8/16,
BiSeNet ×8 — SURVEY.md §2.2 "Weighted CE", §2.6 engine row) is, in the
XLA path (`losses.resize_cross_entropy_loss`), a chain that materialises
the full-resolution upsampled logits in HBM: at b40 1024×2048×19 that is
~3.2 GB bf16 written + re-read in forward, and the same again for its
cotangent in backward — ~23 GB/step of HBM traffic measured by
`scripts/diag_step_bytes.py` against a ~0.5 GB information-theoretic
floor (the 1/8-res logits are only 50 MB).

This kernel never lets the full-res tensor leave VMEM. Grid (N, OH/To):
for each batch item the (1, h, C, w) low-res logit block stays resident
in VMEM across all row tiles (Pallas skips the re-fetch when the block
index is unchanged); each grid step upsamples one (To, OW) row tile of
one class at a time via two small MXU matmuls (H-resize then W-resize,
exact `ops.upsample._interp_matrix` weights, both align_corners
conventions) and folds it into an online logsumexp — the flash-attention
trick applied to class logits. Per-tile loss/weight partials exit
through SMEM scalars; the caller sums them and divides.

Backward (custom VJP) re-runs the same recompute with the saved global
weight-denominator: pass 1 rebuilds logz online, pass 2 forms the
softmax cotangent per class and backs it through the transposed resize
matmuls, accumulating d(logits) into an f32 VMEM scratch that is
flushed once per batch item. Total HBM traffic fwd+bwd ≈ logits + labels
+ d(logits) ≈ 1 GB — a ~22 GB/step reduction at the bench shape.

Unlike the depthwise kernels (docs/FULLRES_ROOFLINE.md), the operand
boundary here is tiny (50 MB logits, labels, scalars), so the
XLA↔Mosaic relayout-copy tax that made model-interior routing a net
loss cannot bite: the big tensor is *generated inside* the kernel.

Routing: `enabled()` is on for single-device TPU only — under GSPMD the
batch axis is sharded and a pallas_call would force a gather; multi-chip
training keeps the lane-major XLA path. `supports()` guards shapes.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from torch_semantic_segmentation_tpu.ops.upsample import _interp_matrix

# the resident low-res logit block (1, h, C, w) must fit VMEM comfortably
_X_BLOCK_VMEM_LIMIT = 4 * 1024 * 1024
# (To, OW) f32 state tiles (s/tl/wv/yc) plus double-buffered label/logz
# blocks must fit the 16 MB VMEM alongside the resident logits block;
# empirically To=128 at OW=2048 overflows (25 MB scoped), To=64 fits.
_STATE_VMEM_LIMIT = 2 * 1024 * 1024


def _tile_rows(oh: int, ow: int) -> int:
    """Largest output-row tile that divides OH and keeps VMEM state sane.

    To=128 fills the MXU's M dimension on the per-class W-resize matmul
    (the FLOP bulk of the kernel); smaller tiles trade MXU utilization
    for VMEM when OW is very wide."""
    for to in (128, 64, 32, 16, 8):
        if oh % to == 0 and 4 * to * ow * 4 <= _STATE_VMEM_LIMIT:
            return to
    return 0


# Direct-sum logsumexp bound: logits are clipped to ±_CLIP before
# exp/sum, which makes `log(sum(exp(y)))` exact without the max-subtract
# pass (and its second exp per class) whenever |logits| <= _CLIP.
# f32 holds sum(exp(85)) for any C <= 32 without overflow, and C·exp(-80)
# stays normal, so only |logit| > 80 deviates — far outside the range a
# non-diverged bf16 segmentation head produces.
_CLIP = 80.0


def enabled() -> bool:
    """On for single-device TPU; TPU_SEG_PALLAS_CE=1/0 overrides (tests).

    Multi-device stays on the XLA path: inside a GSPMD program a
    pallas_call is an opaque custom call, so the sharded batch would be
    gathered onto every chip first.
    """
    env = os.environ.get("TPU_SEG_PALLAS_CE")
    if env is not None:
        return env != "0"
    return jax.default_backend() == "tpu" and jax.device_count() == 1


def supports(logits_shape: tuple, labels_shape: tuple, dtype,
             ignore_index: int = 255) -> bool:
    """Shape/dtype guard for the fused kernel (bench + serving shapes)."""
    if len(logits_shape) != 4 or len(labels_shape) != 3:
        return False
    n, h, w, c = logits_shape
    ln, oh, ow = labels_shape
    if ln != n or dtype != jnp.bfloat16:
        return False
    if (oh, ow) == (h, w):       # no resize: plain CE path is already lean
        return False
    if ow % 128 or not _tile_rows(oh, ow):
        return False
    if c > 32 or ignore_index < c:   # class loop is unrolled; ignore must
        return False                 # stay outside [0, C) for the wv trick
    if h * c * w * 2 > _X_BLOCK_VMEM_LIMIT:
        return False
    return True


def _upsampled_class(x_ref, wh, ww_ref, cc):
    """One class plane of the upsampled logits tile: two MXU matmuls
    (H-resize then W-resize), clipped for the direct-sum logsumexp."""
    xc = x_ref[0, :, cc, :]                            # (h, w) bf16
    t1 = jnp.dot(wh, xc, preferred_element_type=jnp.float32)
    yc = jnp.dot(t1.astype(jnp.bfloat16), ww_ref[:],
                 preferred_element_type=jnp.float32)   # (To, OW) f32
    return jnp.clip(yc, -_CLIP, _CLIP)


def _upsampled_pair(x_ref, wh, ww_ref, c0, c1):
    """Two class planes upsampled with a sublane-stacked W pass — fills
    the MXU's M dimension (2·To=128) on the FLOP-dominant W-resize
    matmul. The H passes stay separate: Mosaic cannot concatenate ref
    slices taken at different sublane offsets ('result/input offset
    mismatch on non-concat dimension'), but stacking the freshly
    computed (offset-0) H results is fine."""
    to = wh.shape[0]
    t1a = jnp.dot(wh, x_ref[0, :, c0, :],
                  preferred_element_type=jnp.float32)
    t1b = jnp.dot(wh, x_ref[0, :, c1, :],
                  preferred_element_type=jnp.float32)
    t2 = jnp.concatenate([t1a, t1b], axis=0).astype(jnp.bfloat16)  # (2To, w)
    y2 = jnp.dot(t2, ww_ref[:],
                 preferred_element_type=jnp.float32)   # (2To, OW)
    return (jnp.clip(y2[:to], -_CLIP, _CLIP),
            jnp.clip(y2[to:], -_CLIP, _CLIP))


def _class_pairs(c):
    """[(c0, c1), ...] pairs plus an odd singleton tail (or None)."""
    return ([(c0, c0 + 1) for c0 in range(0, c - 1, 2)],
            c - 1 if c % 2 else None)


def _fwd_kernel(c, wh_ref, ww_ref, x_ref, lab_ref, cw_ref,
                loss_ref, wt_ref, logz_ref):
    lab = lab_ref[0]                                   # (To, OW) int32
    wh = wh_ref[:]                                     # (To, h) bf16
    to, ow = lab.shape
    s = jnp.zeros((to, ow), jnp.float32)
    tl = jnp.zeros((to, ow), jnp.float32)
    wv = jnp.zeros((to, ow), jnp.float32)

    def fold(yc, cc):
        nonlocal s, tl, wv
        s += jnp.exp(yc)
        hit = lab == cc
        tl = jnp.where(hit, yc, tl)
        wv = jnp.where(hit, cw_ref[cc], wv)

    pairs, odd = _class_pairs(c)
    for c0, c1 in pairs:
        ya, yb = _upsampled_pair(x_ref, wh, ww_ref, c0, c1)
        fold(ya, c0)
        fold(yb, c1)
    if odd is not None:
        fold(_upsampled_class(x_ref, wh, ww_ref, odd), odd)
    logz = jnp.log(s)
    # residual for the VJP (skips a full recompute pass there); stored
    # bf16 — logz is O(logits), so the 2^-9 relative rounding perturbs
    # the backward's softmax by <1%, inside bf16-gradient noise, and
    # halves the residual's HBM footprint/traffic
    logz_ref[0] = logz.astype(logz_ref.dtype)
    # ignore_index never matches any cc, so wv (and the pixel's loss) is 0.
    # scalar outputs are whole-array SMEM refs (Mosaic requires sub-blocks
    # be (8,128)-divisible, so (1,1) blocks are out); index by grid position.
    loss_ref[pl.program_id(0), pl.program_id(1)] = jnp.sum(wv * (logz - tl))
    wt_ref[pl.program_id(0), pl.program_id(1)] = jnp.sum(wv)


def _map_fwd_kernel(c, wh_ref, ww_ref, x_ref, lab_ref, loss_ref, logz_ref):
    """Per-pixel variant of `_fwd_kernel`: emits the (To, OW) loss-map
    tile instead of SMEM scalar partials. The caller (OHEM) selects hard
    pixels from the map and re-reduces outside the kernel — the selection
    threshold is a global order statistic, so it cannot live in a row
    tile. Loss at ignored pixels is 0 (no class matches, so tl and the
    valid mask stay 0)."""
    lab = lab_ref[0]                                   # (To, OW) int32
    wh = wh_ref[:]                                     # (To, h) bf16
    to, ow = lab.shape
    s = jnp.zeros((to, ow), jnp.float32)
    tl = jnp.zeros((to, ow), jnp.float32)
    valid = jnp.zeros((to, ow), jnp.float32)

    def fold(yc, cc):
        nonlocal s, tl, valid
        s += jnp.exp(yc)
        hit = lab == cc
        tl = jnp.where(hit, yc, tl)
        valid = jnp.where(hit, 1.0, valid)

    pairs, odd = _class_pairs(c)
    for c0, c1 in pairs:
        ya, yb = _upsampled_pair(x_ref, wh, ww_ref, c0, c1)
        fold(ya, c0)
        fold(yb, c1)
    if odd is not None:
        fold(_upsampled_class(x_ref, wh, ww_ref, odd), odd)
    logz = jnp.log(s)
    logz_ref[0] = logz.astype(logz_ref.dtype)
    # f32 map: the OHEM threshold is an order statistic of these values,
    # so rounding the map would move pixels across the keep boundary
    loss_ref[0] = valid * (logz - tl)


def _bwd_accumulate(c, wh, ww_ref, wwt_ref, x_ref, lab, logz, gw, acc_ref):
    """Shared VJP body: per-pixel-weight map `gw` times the softmax
    cotangent, back through the transposed resize matmuls (sublane-
    stacked so the W pass runs at M=2·To), accumulated at 1/k²
    resolution in the f32 scratch."""
    to = lab.shape[0]

    def cotangent(yc, cc):
        p = jnp.exp(yc - logz)
        return gw * (p - (lab == cc).astype(jnp.float32))

    def transpose_resize(dyc):
        """(To, OW) cotangent → (h, w): W then H transposed passes.
        The H pass contracts the To dim of both operands directly via
        dot_general (a (h, To) sliced block would violate Mosaic's
        128-lane block-divisibility rule when To < 128)."""
        dw = jnp.dot(dyc.astype(jnp.bfloat16), wwt_ref[:],
                     preferred_element_type=jnp.float32)       # (To, w)
        return jax.lax.dot_general(
            wh, dw.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # (h, w)

    pairs, odd = _class_pairs(c)
    for c0, c1 in pairs:
        ya, yb = _upsampled_pair(x_ref, wh, ww_ref, c0, c1)
        d2 = jnp.concatenate([cotangent(ya, c0), cotangent(yb, c1)],
                             axis=0).astype(jnp.bfloat16)      # (2To, OW)
        dw2 = jnp.dot(d2, wwt_ref[:],
                      preferred_element_type=jnp.float32)      # (2To, w)
        for cc, dw in ((c0, dw2[:to]), (c1, dw2[to:])):
            dxc = jax.lax.dot_general(
                wh, dw.astype(jnp.bfloat16),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)            # (h, w)
            acc_ref[:, cc, :] += dxc
    if odd is not None:
        dyc = cotangent(_upsampled_class(x_ref, wh, ww_ref, odd), odd)
        acc_ref[:, odd, :] += transpose_resize(dyc)


def _bwd_kernel(c, wh_ref, ww_ref, wwt_ref, x_ref, lab_ref, logz_ref,
                cw_ref, scale_ref, dx_ref, acc_ref):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    lab = lab_ref[0]
    wh = wh_ref[:]
    to, ow = lab.shape
    logz = logz_ref[0].astype(jnp.float32)             # saved by forward
    wv = jnp.zeros((to, ow), jnp.float32)
    for cc in range(c):
        wv = jnp.where(lab == cc, cw_ref[cc], wv)
    gw = wv * scale_ref[0, 0]                          # g/S2 folded in
    _bwd_accumulate(c, wh, ww_ref, wwt_ref, x_ref, lab, logz, gw, acc_ref)

    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        dx_ref[0] = acc_ref[:].astype(dx_ref.dtype)


def _map_bwd_kernel(c, wh_ref, ww_ref, wwt_ref, x_ref, lab_ref, logz_ref,
                    ct_ref, dx_ref, acc_ref):
    """VJP of the per-pixel loss map: the cotangent arrives as an
    arbitrary (To, OW) map (for OHEM: g·keep·class_weight/denominator,
    zero at dropped pixels) instead of the scalar-CE kernel's
    cw[label]·scale. The in-kernel valid mask re-zeros ignored pixels so
    the op's own gradient is exact even for cotangents that are nonzero
    there."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    lab = lab_ref[0]
    wh = wh_ref[:]
    to, ow = lab.shape
    logz = logz_ref[0].astype(jnp.float32)
    valid = jnp.zeros((to, ow), jnp.float32)
    for cc in range(c):
        valid = jnp.where(lab == cc, 1.0, valid)
    gw = valid * ct_ref[0]
    _bwd_accumulate(c, wh, ww_ref, wwt_ref, x_ref, lab, logz, gw, acc_ref)

    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        dx_ref[0] = acc_ref[:].astype(dx_ref.dtype)


def _matrices(h, w, oh, ow, align_corners):
    wh = jnp.asarray(_interp_matrix(h, oh, align_corners), jnp.bfloat16)
    ww_np = _interp_matrix(w, ow, align_corners)                 # (OW, w)
    ww = jnp.asarray(np.ascontiguousarray(ww_np.T), jnp.bfloat16)  # (w, OW)
    wwt = jnp.asarray(ww_np, jnp.bfloat16)                       # (OW, w)
    return wh, ww, wwt


def _primal(logits, labels, cw, align_corners, interpret):
    n, h, w, c = logits.shape
    _, oh, ow = labels.shape
    to = _tile_rows(oh, ow)
    t = oh // to
    x = jnp.transpose(logits, (0, 1, 3, 2))            # (N, h, C, w)
    wh, ww, _ = _matrices(h, w, oh, ow, align_corners)
    lab = labels.astype(jnp.int32)
    lp, wp, logz = pl.pallas_call(
        functools.partial(_fwd_kernel, c),
        grid=(n, t),
        in_specs=[
            pl.BlockSpec((to, h), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, ow), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, c, w), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, to, ow), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, to, ow), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, t), jnp.float32),
            jax.ShapeDtypeStruct((n, t), jnp.float32),
            jax.ShapeDtypeStruct((n, oh, ow), jnp.bfloat16),
        ),
        interpret=interpret,
    )(wh, ww, x, lab, cw)
    s2 = jnp.maximum(jnp.sum(wp), 1e-12)
    return jnp.sum(lp) / s2, s2, logz


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_resize_ce(logits, labels, cw, align_corners, interpret):
    loss, _, _ = _primal(logits, labels, cw, align_corners, interpret)
    return loss


def _fused_fwd(logits, labels, cw, align_corners, interpret):
    loss, s2, logz = _primal(logits, labels, cw, align_corners, interpret)
    return loss, (logits, labels, cw, s2, logz)


def _fused_bwd(align_corners, interpret, res, g):
    logits, labels, cw, s2, logz = res
    n, h, w, c = logits.shape
    _, oh, ow = labels.shape
    to = _tile_rows(oh, ow)
    t = oh // to
    x = jnp.transpose(logits, (0, 1, 3, 2))
    wh, ww, wwt = _matrices(h, w, oh, ow, align_corners)
    lab = labels.astype(jnp.int32)
    scale = jnp.reshape((g / s2).astype(jnp.float32), (1, 1))
    dx = pl.pallas_call(
        functools.partial(_bwd_kernel, c),
        grid=(n, t),
        in_specs=[
            pl.BlockSpec((to, h), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, ow), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ow, w), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, c, w), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, to, ow), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, to, ow), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, h, c, w), lambda i, j: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, c, w), logits.dtype),
        scratch_shapes=[pltpu.VMEM((h, c, w), jnp.float32)],
        interpret=interpret,
    )(wh, ww, wwt, x, lab, logz, cw, scale)
    dlogits = jnp.transpose(dx, (0, 1, 3, 2))
    # class weights are treated as CONSTANTS (zero cotangent): computing
    # the true dcw needs per-class loss partials the kernel doesn't emit.
    # The routing layer (losses.resize_cross_entropy_loss) keeps traced
    # class_weights on the XLA path, so a real cw gradient is never
    # requested through this kernel.
    return (dlogits,
            np.zeros(labels.shape, dtype=jax.dtypes.float0),
            jnp.zeros_like(cw))


_fused_resize_ce.defvjp(_fused_fwd, _fused_bwd)


def resize_cross_entropy(logits, labels, class_weights=None, *,
                         align_corners: bool = False,
                         ignore_index: int = 255,
                         interpret: bool = False):
    """Fused-kernel counterpart of `losses.resize_cross_entropy_loss`.

    Callers must check `supports(logits.shape, labels.shape, logits.dtype,
    ignore_index)` first. `ignore_index` has no in-kernel branch: any label
    outside [0, C) contributes zero weight by construction (supports()
    rejects ignore_index < C).
    """
    c = logits.shape[-1]
    cw = (jnp.ones((c,), jnp.float32) if class_weights is None
          else jnp.asarray(class_weights, jnp.float32))
    return _fused_resize_ce(logits, labels.astype(jnp.int32), cw,
                            bool(align_corners), bool(interpret))


def _map_primal(logits, labels, align_corners, interpret):
    n, h, w, c = logits.shape
    _, oh, ow = labels.shape
    to = _tile_rows(oh, ow)
    t = oh // to
    x = jnp.transpose(logits, (0, 1, 3, 2))            # (N, h, C, w)
    wh, ww, _ = _matrices(h, w, oh, ow, align_corners)
    lab = labels.astype(jnp.int32)
    loss_map, logz = pl.pallas_call(
        functools.partial(_map_fwd_kernel, c),
        grid=(n, t),
        in_specs=[
            pl.BlockSpec((to, h), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, ow), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, c, w), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, to, ow), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, to, ow), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, to, ow), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, oh, ow), jnp.float32),
            jax.ShapeDtypeStruct((n, oh, ow), jnp.bfloat16),
        ),
        interpret=interpret,
    )(wh, ww, x, lab)
    return loss_map, logz


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _fused_resize_ce_map(logits, labels, align_corners, interpret):
    loss_map, _ = _map_primal(logits, labels, align_corners, interpret)
    return loss_map


def _map_fwd(logits, labels, align_corners, interpret):
    loss_map, logz = _map_primal(logits, labels, align_corners, interpret)
    return loss_map, (logits, labels, logz)


def _map_bwd(align_corners, interpret, res, ct):
    logits, labels, logz = res
    n, h, w, c = logits.shape
    _, oh, ow = labels.shape
    to = _tile_rows(oh, ow)
    t = oh // to
    x = jnp.transpose(logits, (0, 1, 3, 2))
    wh, ww, wwt = _matrices(h, w, oh, ow, align_corners)
    lab = labels.astype(jnp.int32)
    dx = pl.pallas_call(
        functools.partial(_map_bwd_kernel, c),
        grid=(n, t),
        in_specs=[
            pl.BlockSpec((to, h), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, ow), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ow, w), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, c, w), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, to, ow), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, to, ow), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, to, ow), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, c, w), lambda i, j: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, c, w), logits.dtype),
        scratch_shapes=[pltpu.VMEM((h, c, w), jnp.float32)],
        interpret=interpret,
    )(wh, ww, wwt, x, lab, logz, ct.astype(jnp.float32))
    dlogits = jnp.transpose(dx, (0, 1, 3, 2))
    return (dlogits, np.zeros(labels.shape, dtype=jax.dtypes.float0))


_fused_resize_ce_map.defvjp(_map_fwd, _map_bwd)


def per_pixel_resize_ce(logits, labels, *,
                        align_corners: bool = False,
                        interpret: bool = False):
    """Per-pixel fused upsample+CE loss MAP (N, OH, OW) f32 — the OHEM
    building block (`losses.resize_ohem_cross_entropy`): the hard-example
    threshold is a global order statistic over all pixels, so selection
    and re-reduction happen in plain XLA around this op while the
    full-res logits still never leave VMEM. Loss is 0 at ignored pixels
    (any label outside [0, C)). Callers must check `supports()` first
    (same guard: ignore_index must be >= C)."""
    return _fused_resize_ce_map(logits, labels.astype(jnp.int32),
                                bool(align_corners), bool(interpret))
