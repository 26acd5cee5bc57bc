"""Generic W-packed layout toolkit (round-3 zoo perf work).

`ops/packed_lds.py` fixed FastSCNN's lane-padding pathology with a
model-specific W-packed `(N, H, W/P, P·C)` region of plain XLA convs.
This module generalizes the machinery so OTHER small-channel models can
run packed regions too — motivated by the measured ENet attribution
(`scripts/diag_enet_parts.py`, b32 768²): the plain-CE tail on full-res
C=19 logits is 115 ms of a 456 ms step, because every full-resolution
tensor with C < 128 is lane-padded up to 128 in TPU tiled layout
(logits 6.7×, C=16 stages 8×, ENet's C=4 mid tensors 32×).

Pieces (all plain XLA — structured kernels scatter-built from the real
weights so autodiff flows; no Mosaic custom calls, no layout pinning):

- `plan_packed_conv`   stride-1/2, dilated, asymmetric, grouped conv in
                       packed layout: ONE `lax.conv_general_dilated`
                       over (H, W/P) with a (kh, Δpacks) window.
- `plan_packed_deconv` torch-parity ConvTranspose2d emitting PACKED
                       output from packed (p_in>1) or plain NHWC
                       (p_in=1) input — lets a model's final
                       full-res logit layer skip the padded layout
                       entirely.
- `packed_cross_entropy`  class-weighted CE with ignore_index computed
                       directly on packed logits (matmul group-reduce
                       logsumexp; no (…,C)-minor tensor is ever
                       materialized). Numerics note in the docstring.
- `PackedLogits`       pytree wrapper a model returns instead of NHWC
                       logits when a packed head is routed; the losses
                       consume it natively and `as_nhwc` unpacks it at
                       any consumer that needs plain NHWC.
- selection/placement matmuls for max-pool/unpool, channel concat and
  channel pad — pooling windows and encoder→decoder index forwarding
  without leaving the packed layout (ENet InitialBlock / down / up
  bottlenecks).

The reference counterpart of everything here is ordinary cuDNN NCHW
convs + F.cross_entropy (SURVEY.md §2.2 op rows); the packed layout is
purely a TPU lane-utilization strategy and is bit-compatible with the
NHWC path up to float reassociation (see tests/test_packed_ops.py).
"""

from __future__ import annotations

import dataclasses
import os
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from torch_semantic_segmentation_tpu.ops.packed_lds import (  # noqa: F401
    pack, repack, unpack)

# ---------------------------------------------------------------------------
# generic structured-kernel conv plans


@dataclasses.dataclass(frozen=True)
class _Plan:
    """A packed conv as one standard XLA conv: build plan + call params."""

    kernel_shape: tuple[int, int, int, int]      # (kh, win, in_lanes, out_lanes)
    th: np.ndarray                               # scatter indices (flat)
    dd: np.ndarray
    rows: np.ndarray
    cols: np.ndarray
    k_th: np.ndarray                             # gather indices into k (flat)
    k_tw: np.ndarray
    k_ci: np.ndarray
    k_co: np.ndarray
    window_strides: tuple[int, int]
    padding: tuple[tuple[int, int], tuple[int, int]]
    rhs_dilation: tuple[int, int]
    lhs_dilation: tuple[int, int]
    # structured-build metadata (round 5): the gather/scatter indices
    # above are BLOCKWISE — every (q, t) pair places one whole
    # (kh, c_in, c_out) slab at static offsets — so the kernel can be
    # assembled from static-slice adds instead of flat gathers.
    entries: tuple[tuple[int, int, int, int], ...] = ()   # (t, dd, r, q)
    flip_h: bool = False
    c_in: int = 0
    c_out: int = 0
    groups: int = 1

    def _dense4(self, k: jax.Array) -> jax.Array:
        """Dense (kh, kw, c_in, c_out) expansion of a grouped HWIO
        kernel — group g owns input block [g·cig, (g+1)·cig) and output
        block [g·cog, (g+1)·cog); built by an eye-mask broadcast (no
        scatter; fuses into the placement adds)."""
        if self.groups == 1:
            return k
        kh, kw = k.shape[0], k.shape[1]
        g = self.groups
        cig, cog = self.c_in // g, self.c_out // g
        kg = k.reshape(kh, kw, 1, cig, g, cog)
        eye = jnp.eye(g, dtype=k.dtype)[:, None, :, None]   # (g,1,g,1)
        return (kg * eye).reshape(kh, kw, self.c_in, self.c_out)

    def kernel(self, k: jax.Array) -> jax.Array:
        """Build the packed kernel from the layer's real HWIO weights.
        Traced: grads flow back to `k` through the build.

        Default path (round 5): static-slice slab placement. The
        original flat gather + scatter-add is kept behind
        TPU_SEG_STRUCTURED_KERNEL_BUILD=0 — measured on-chip it lowers
        to s32 index unpack + gather/scatter pairs in a [n,1] layout
        using 1 of 128 lanes (~11.7 ms/step across the UNet b8 rim,
        scripts/diag_hlo_attr.py round-5 trace); the static form lowers
        to pad/add fusions and reverses cleanly in the VJP."""
        if self.entries and os.environ.get(
                "TPU_SEG_STRUCTURED_KERNEL_BUILD", "1") != "0":
            d4 = self._dense4(k)
            if self.flip_h:
                d4 = jnp.flip(d4, 0)
            ci, co = self.c_in, self.c_out
            pk = jnp.zeros(self.kernel_shape, k.dtype)
            for t, dd, r, q in self.entries:
                pk = pk.at[:, dd, r * ci:(r + 1) * ci,
                           q * co:(q + 1) * co].add(d4[:, t])
            return pk
        vals = k[self.k_th, self.k_tw, self.k_ci, self.k_co]
        pk = jnp.zeros(self.kernel_shape, k.dtype)
        return pk.at[self.th, self.dd, self.rows, self.cols].add(vals)

    def apply(self, xp: jax.Array, pk: jax.Array) -> jax.Array:
        return jax.lax.conv_general_dilated(
            xp, pk,
            window_strides=self.window_strides,
            padding=self.padding,
            rhs_dilation=self.rhs_dilation,
            lhs_dilation=self.lhs_dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def __call__(self, xp: jax.Array, k: jax.Array) -> jax.Array:
        return self.apply(xp, self.kernel(k))


def _dense_indices(groups: int, c_in: int, c_out: int
                   ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(ci_full, ci_in_kernel, co) triples of the dense expansion of a
    grouped HWIO kernel (kh, kw, c_in/groups, c_out)."""
    cig = c_in // groups
    cog = c_out // groups
    ci_k, co = np.meshgrid(np.arange(cig), np.arange(c_out), indexing="ij")
    ci_full = (co // cog) * cig + ci_k
    return ci_full.ravel(), ci_k.ravel(), co.ravel()


def plan_packed_conv(
    c_in: int, c_out: int, kernel_size, p_in: int, p_out: int, *,
    stride=(1, 1), dilation=(1, 1), padding=None, groups: int = 1,
) -> _Plan:
    """Forward conv, packed input (N,H,Wp,p_in·c_in) → packed output
    (N,H_out,Wp,p_out·c_out), Wp constant.

    Requires p_in == p_out·stride_w and W-size-preserving padding
    (pw_l + pw_r == (kw-1)·dw − (sw−1)), which every conv in the zoo's
    'same'-shaped architectures satisfies.
    """
    kh, kw = (kernel_size, kernel_size) if isinstance(kernel_size, int) \
        else kernel_size
    sh, sw = stride if isinstance(stride, tuple) else (stride, stride)
    dh, dw = dilation if isinstance(dilation, tuple) else (dilation, dilation)
    if padding is None:
        padding = (dh * (kh - 1) // 2, dw * (kw - 1) // 2)
    (ph,), (pw,) = ((padding[0],), (padding[1],)) if isinstance(padding, tuple) \
        else ((padding,), (padding,))
    if p_in != p_out * sw:
        raise ValueError(f"p_in={p_in} must equal p_out*stride_w={p_out * sw}")
    # NHWC floor arithmetic must give W_out == W/sw (the packed form's
    # output count by construction), and every packed tap beyond the
    # image edge must land within the NHWC zero-padding. Both reduce to:
    if not 0 < (kw - 1) * dw + 1 - 2 * pw <= sw:
        raise ValueError(
            f"not W-preserving: kw={kw} dw={dw} sw={sw} pw={pw}")

    # W-dim tap plan: output in-pack position q, tap t → input offset m
    # relative to the output pack's aligned input pack start.
    q = np.arange(p_out)
    t = np.arange(kw)
    qq, tt = np.meshgrid(q, t, indexing="ij")
    m = sw * qq + dw * tt - pw                     # (p_out, kw)
    delta = np.floor_divide(m, p_in)
    r = m - delta * p_in
    d_min, d_max = int(delta.min()), int(delta.max())
    win = d_max - d_min + 1

    ci_full, ci_k, co = _dense_indices(groups, c_in, c_out)
    nch = ci_full.size
    # outer product of the (q, t) plan with the channel triples
    qt_n = qq.size
    dd_w = (delta - d_min).ravel()
    r_w = r.ravel()
    t_w = tt.ravel()
    q_w = qq.ravel()
    dd = np.repeat(dd_w, nch)
    rows = np.repeat(r_w, nch) * c_in + np.tile(ci_full, qt_n)
    cols = np.repeat(q_w, nch) * c_out + np.tile(co, qt_n)
    k_tw = np.repeat(t_w, nch)
    k_ci = np.tile(ci_k, qt_n)
    k_co = np.tile(co, qt_n)
    # replicate across kh
    e = dd.size
    th = np.repeat(np.arange(kh), e)
    entries = tuple(
        (int(tt_), int(dd_), int(r_), int(q_))
        for q_, tt_, dd_, r_ in zip(q_w, t_w, dd_w, r_w))
    return _Plan(
        kernel_shape=(kh, win, p_in * c_in, p_out * c_out),
        th=th, dd=np.tile(dd, kh), rows=np.tile(rows, kh),
        cols=np.tile(cols, kh),
        k_th=th, k_tw=np.tile(k_tw, kh), k_ci=np.tile(k_ci, kh),
        k_co=np.tile(k_co, kh),
        window_strides=(sh, 1),
        padding=((ph, ph), (-d_min, d_max)),
        rhs_dilation=(dh, 1),
        lhs_dilation=(1, 1),
        entries=entries, flip_h=False, c_in=c_in, c_out=c_out,
        groups=groups,
    )


def plan_packed_deconv(
    c_in: int, c_out: int, kernel_size, p_in: int, p_out: int, *,
    stride=(2, 2), padding=(1, 1), output_padding=(1, 1),
) -> _Plan:
    """torch ConvTranspose2d (exact parameterization of ops.conv
    .ConvTranspose2d) emitting PACKED output.

    p_in = 1 accepts plain NHWC input (the 'packed head' case: the
    layer's input is an ordinary tensor but its full-res output goes
    straight to the packed loss); p_in > 1 chains inside a packed
    region with p_out == p_in·stride_w.
    """
    kh, kw = (kernel_size, kernel_size) if isinstance(kernel_size, int) \
        else kernel_size
    sh, sw = stride
    ph, pw = padding
    oph, opw = output_padding
    if opw != sw + 2 * pw - kw:
        raise ValueError(
            f"not W-doubling-exact: opw={opw} != sw+2pw-kw={sw + 2 * pw - kw}")
    if p_in > 1 and p_out != p_in * sw:
        raise ValueError(f"p_out={p_out} must equal p_in*stride_w={p_in * sw}")
    # torch relation: w_out = s*w_in - p + t  ⇒  w_in = (w_out + p - t)/s.
    entries = []                                    # (q_out, t, m)
    for qo in range(p_out):
        for tap in range(kw):
            num = qo + pw - tap
            if num % sw:
                continue
            entries.append((qo, tap, num // sw))
    q_w = np.array([e[0] for e in entries])
    t_w = np.array([e[1] for e in entries])
    m = np.array([e[2] for e in entries])
    if p_in == 1:
        # NHWC input: conv windows stride over W by p_out/sw positions
        w_step = p_out // sw
        delta = m                                   # each position its own pack
        d_min, d_max = int(delta.min()), int(delta.max())
        win = d_max - d_min + 1
        r = np.zeros_like(delta)
        eff_p_in = 1
        w_stride = w_step
        w_pad = (-d_min, d_max - (w_step - 1))
    else:
        delta = np.floor_divide(m, p_in)
        r = m - delta * p_in
        d_min, d_max = int(delta.min()), int(delta.max())
        win = d_max - d_min + 1
        eff_p_in = p_in
        w_stride = 1
        w_pad = (-d_min, d_max)

    ci = np.arange(c_in)
    co = np.arange(c_out)
    cc_i, cc_o = np.meshgrid(ci, co, indexing="ij")
    ci_f, co_f = cc_i.ravel(), cc_o.ravel()
    nch = ci_f.size
    e = q_w.size
    dd = np.repeat(delta - d_min, nch)
    rows = np.repeat(r, nch) * c_in + np.tile(ci_f, e)
    cols = np.repeat(q_w, nch) * c_out + np.tile(co_f, e)
    k_tw = np.repeat(t_w, nch)
    k_ci = np.tile(ci_f, e)
    k_co = np.tile(co_f, e)
    n = dd.size
    # H: lhs-dilated conv with the H-flipped kernel (mirrors
    # ops.conv.ConvTranspose2d's padding (kh-1-ph, kh-1-ph+oph)).
    th_scatter = np.repeat(np.arange(kh), n)
    th_gather = np.repeat(kh - 1 - np.arange(kh), n)
    entries = tuple(
        (int(t_), int(d_) - d_min, int(r_), int(q_))
        for (q_, t_, _), d_, r_ in zip(entries, delta, r))
    return _Plan(
        kernel_shape=(kh, win, eff_p_in * c_in, p_out * c_out),
        th=th_scatter, dd=np.tile(dd, kh), rows=np.tile(rows, kh),
        cols=np.tile(cols, kh),
        k_th=th_gather, k_tw=np.tile(k_tw, kh), k_ci=np.tile(k_ci, kh),
        k_co=np.tile(k_co, kh),
        window_strides=(1, w_stride),
        padding=((kh - 1 - ph, kh - 1 - ph + oph), w_pad),
        rhs_dilation=(1, 1),
        lhs_dilation=(sh, 1),
        entries=entries, flip_h=True, c_in=c_in, c_out=c_out, groups=1,
    )


# ---------------------------------------------------------------------------
# selection / placement matmuls (pool, unpool, concat, channel pad)


def selection_matrix(c: int, p_in: int, positions: tp.Sequence[int],
                     dtype=np.float32) -> np.ndarray:
    """(p_in·c, len(positions)·c) 0/1 matrix extracting the given in-pack
    W positions (a LINEAR op — rides the MXU instead of strided lane
    slices, which relayout)."""
    sel = np.zeros((p_in * c, len(positions) * c), dtype)
    for j, p in enumerate(positions):
        sel[p * c:(p + 1) * c, j * c:(j + 1) * c] = np.eye(c, dtype=dtype)
    return sel


def placement_matrix(c_from: int, c_to: int, offset: int, p: int,
                     dtype=np.float32) -> np.ndarray:
    """(p·c_from, p·c_to) matrix placing a c_from-channel packed tensor
    into channel slot [offset, offset+c_from) of a c_to-channel packed
    tensor — channel concat and zero-pad as one matmul each."""
    m = np.zeros((p * c_from, p * c_to), dtype)
    for j in range(p):
        m[j * c_from:(j + 1) * c_from,
          j * c_to + offset:j * c_to + offset + c_from] = np.eye(
              c_from, dtype=dtype)
    return m


def packed_channel_concat(parts: tp.Sequence[tuple[jax.Array, int]],
                          p: int) -> jax.Array:
    """Concat packed tensors along the logical channel dim."""
    c_to = sum(c for _, c in parts)
    out = None
    off = 0
    for x, c in parts:
        mat = jnp.asarray(placement_matrix(c, c_to, off, p), x.dtype)
        y = x @ mat
        out = y if out is None else out + y
        off += c
    return out


def packed_max_pool2x2_indices(x: jax.Array, c: int
                               ) -> tuple[jax.Array, jax.Array]:
    """2×2/s2 max pool with window-argmax on a packed tensor.

    Input (N,H,Wp,p·c) → (pooled (N,H/2,Wp,(p/2)·c), idx uint8 ∈ [0,4)).
    Index ordering matches ops.pool.max_pool2x2_with_indices (row-major
    within the window, ties → first), so indices round-trip through
    `packed_max_unpool2x2` exactly like the NHWC pair — including
    cross-tensor forwarding (ENet encoder→decoder).
    """
    n, h, wp, pc = x.shape
    p = pc // c
    ev = jnp.asarray(selection_matrix(c, p, range(0, p, 2)), x.dtype)
    od = jnp.asarray(selection_matrix(c, p, range(1, p, 2)), x.dtype)
    r0, r1 = x[:, 0::2], x[:, 1::2]
    cand = (r0 @ ev, r0 @ od, r1 @ ev, r1 @ od)     # torch window order
    best = cand[0]
    idx = jnp.zeros(best.shape, jnp.uint8)
    for k in (1, 2, 3):
        take = cand[k] > best                        # strict: ties keep first
        best = jnp.where(take, cand[k], best)
        idx = jnp.where(take, jnp.uint8(k), idx)
    return best, idx


def packed_max_unpool2x2(x: jax.Array, idx: jax.Array, c: int) -> jax.Array:
    """Inverse of `packed_max_pool2x2_indices`: place each value at its
    recorded 2×2 window position. (N,H2,Wp,p·c) → (N,2·H2,Wp,2p·c)."""
    n, h2, wp, pc = x.shape
    p = pc // c
    ev_t = jnp.asarray(selection_matrix(c, 2 * p, range(0, 2 * p, 2)).T,
                       x.dtype)
    od_t = jnp.asarray(selection_matrix(c, 2 * p, range(1, 2 * p, 2)).T,
                       x.dtype)
    rows = []
    for h_off, mats in ((0, (ev_t, od_t)), (1, (ev_t, od_t))):
        contrib = None
        for w_par, mat in enumerate(mats):
            k = 2 * h_off + w_par
            v = jnp.where(idx == k, x, jnp.zeros_like(x)) @ mat
            contrib = v if contrib is None else contrib + v
        rows.append(contrib)
    # interleave H: (N, H2, 2, Wp, 2p·c) → (N, 2·H2, Wp, 2p·c)
    y = jnp.stack(rows, axis=2)
    return y.reshape(n, 2 * h2, wp, 2 * pc)


def packed_prelu(alpha: jax.Array, x: jax.Array, c: int) -> jax.Array:
    """PReLU with per-channel slope on a packed tensor."""
    p = x.shape[-1] // c
    a = jnp.tile(alpha, p).astype(x.dtype) if alpha.shape[0] == c \
        else alpha.astype(x.dtype)
    return jnp.where(x >= 0, x, a * x)


# ---------------------------------------------------------------------------
# packed cross-entropy


def packed_per_pixel_ce(
    logits: jax.Array, labels: jax.Array, c: int, *,
    ignore_index: int = 255, class_weights=None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Per-pixel CE on PACKED logits (N,H,Wp,P·C); labels (N,H,W) int.

    Returns (loss_px, cw_px, valid), each (N,H,Wp,P): the per-pixel
    loss (0 at ignored pixels), the per-pixel class weight over valid
    pixels (1s when class_weights is None), and the validity mask —
    the shared building block of `packed_cross_entropy` (weighted mean)
    and the packed OHEM tail (losses.ohem_cross_entropy consumes the
    map directly: top-k/threshold/mean are permutation-invariant, so
    selection over this map equals selection over the NHWC map).

    The per-pixel logsumexp is stabilized by the PER-PACK max (max over
    the P pixels × C classes sharing a lane row) instead of the
    per-pixel max: exact unless exp(l − M_pack) underflows f32, i.e.
    unless adjacent-pixel logit spread exceeds ~85 nats — far beyond any
    trained or trainable network (and the failure mode is a visible
    inf loss, not silent corruption). Everything is elementwise + two
    (P·C, P)-shaped matmuls, so no (…, C)-minor tensor — which TPU
    tiling would pad to 128 lanes — is ever materialized.
    """
    n, h, wp, pc = logits.shape
    p = pc // c
    lp = logits.astype(jnp.float32)
    lab = labels.reshape(n, h, wp, p)
    valid = lab != ignore_index
    safe = jnp.where(valid, lab, 0).astype(jnp.int32)

    m = jax.lax.stop_gradient(jnp.max(lp, axis=-1, keepdims=True))
    e = jnp.exp(lp - m)
    gsum = jnp.asarray(np.kron(np.eye(p, dtype=np.float32),
                               np.ones((c, 1), np.float32)))
    s = e @ gsum                                     # (n,h,wp,p)
    lse = jnp.log(s) + m                             # per-pixel logsumexp

    lane_class = jnp.asarray(np.tile(np.arange(c), p))
    lab_rep = jnp.broadcast_to(safe[..., None],
                               (n, h, wp, p, c)).reshape(n, h, wp, pc)
    onehot = (lane_class[None, None, None] == lab_rep).astype(jnp.float32)
    true_logit = (lp * onehot) @ gsum                # (n,h,wp,p)

    loss_px = jnp.where(valid, lse - true_logit, 0.0)
    if class_weights is None:
        cw_px = valid.astype(jnp.float32)
    else:
        cw = jnp.tile(jnp.asarray(class_weights, jnp.float32), p)
        cw_px = jnp.where(valid, (onehot * cw) @ gsum, 0.0)
    return loss_px, cw_px, valid


def packed_cross_entropy(
    logits: jax.Array, labels: jax.Array, c: int, *,
    ignore_index: int = 255, class_weights=None,
) -> jax.Array:
    """Class-weighted CE with ignore_index on PACKED logits
    (N,H,Wp,P·C); labels (N,H,W) int. torch F.cross_entropy semantics
    (weighted mean over non-ignored pixels), matching
    losses.cross_entropy_loss. See `packed_per_pixel_ce` for the
    numerics."""
    loss_px, w, _ = packed_per_pixel_ce(
        logits, labels, c, ignore_index=ignore_index,
        class_weights=class_weights)
    denom = jnp.maximum(jnp.sum(w), 1e-12)
    return jnp.sum(loss_px * w) / denom


# ---------------------------------------------------------------------------
# PackedLogits: the model→loss contract for packed heads


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PackedLogits:
    """Full-resolution logits kept in packed layout between a model's
    packed head and the loss. `.shape` reports the LOGICAL NHWC shape so
    size checks (aux_weighted_loss) work unchanged; `unpack()` realizes
    the plain NHWC tensor (one relayout — only consumers that truly
    need NHWC, e.g. eval argmax off the packed path, should call it,
    via `as_nhwc`)."""

    data: jax.Array          # (N, H, Wp, P·C)
    c: int                   # static: logical channel count

    @property
    def shape(self) -> tuple[int, int, int, int]:
        n, h, wp, pc = self.data.shape
        return (n, h, wp * (pc // self.c), self.c)

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def ndim(self) -> int:
        return 4

    def unpack(self) -> jax.Array:
        return unpack(self.data, self.c)

    def tree_flatten(self):
        return (self.data,), self.c

    @classmethod
    def tree_unflatten(cls, c, children):
        return cls(children[0], c)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PackedImages(PackedLogits):
    """W-packed network INPUT — the packed-input aug API (round 4).

    `data.transforms.augment_batch` with `cfg.pack=P` emits the
    normalized images already reshaped to (N, H, W/P, P·C), so the
    NHWC→packed relayout copy at the packed-LDS entry (6.9 ms of the
    b48 full-res step, docs/FULLRES_ROOFLINE.md) moves into the aug's
    own output write instead of being a separate pass. Models that run
    a packed region consume `.data` directly when the pack factor
    matches; every other consumer calls `.unpack()` (a reshape XLA
    cancels against the model's own `pack`). Same container contract as
    PackedLogits (`.shape` reports the logical NHWC shape)."""

    def tree_flatten(self):
        return (self.data,), self.c

    @classmethod
    def tree_unflatten(cls, c, children):
        return cls(children[0], c)


def as_nhwc(logits) -> jax.Array:
    """Coerce a model output (array or PackedLogits) to plain NHWC."""
    if isinstance(logits, PackedLogits):
        return logits.unpack()
    return logits


def pick_head_pack(c_out: int, w_in: int, stride_w: int,
                   max_lanes: int = 1280) -> int | None:
    """Output pack factor for a packed deconv head: best lane utilization
    of P·C among powers of two whose W-window step (P/stride_w) divides
    the input width. None when no factor fits (odd widths, huge C)."""
    best, best_util = None, 0.0
    for p in (8, 16, 32, 64):
        step = p // stride_w
        if step == 0 or w_in % step or p * c_out > max_lanes:
            continue
        util = (p * c_out) / (-(-p * c_out // 128) * 128)
        if util > best_util + 1e-9:
            best, best_util = p, util
    return best


def route_packed_head(env_var: str, train_mode: bool,
                      default_on: bool = True) -> bool:
    """Shared routing rule for packed full-res heads: on by default on
    TPU in TRAINING mode only (eval consumers want NHWC and would pay an
    unpack relayout); `<env_var>=1` forces routing in any mode — the CPU
    parity-test hook — and `<env_var>=0` (or TPU_SEG_PACKED=0) kills it.

    `default_on=False` is the MEASURED-NEGATIVE position: the path stays
    available behind an explicit `<env_var>=1` but never routes by
    default. Round 5 status: the packed RESIZE heads hold this position
    in every measured context — plain CE (BiSeNet 207.2 → 160.3 b32,
    FastSCNN −25%, round-4 table), OHEM (FastSCNN 559.2 → 513.8 b32)
    and OHEM+aux (BiSeNet 201.4 → 190.8 b32), all 2026-08-20 v5lite —
    a closed dead end, not a pending A/B (docs/FULLRES_ROOFLINE.md
    round-5). The round-4 ERFNet packed-BODY negative (72.3 → 63.4)
    was by contrast an artifact of the gather/scatter kernel build and
    flipped to +97% default-ON with the structured build."""
    env = os.environ.get(env_var)
    if env == "0" or not enabled(env_var):
        return False
    if not default_on:
        return env == "1"
    return train_mode or env == "1"


def apply_packed_deconv_head(fc, x: jax.Array) -> "PackedLogits | None":
    """Run an `ops.conv.ConvTranspose2d` head on plain NHWC input,
    emitting PackedLogits (the p_in=1 deconv plan). Returns None when no
    pack factor fits the input width — callers fall back to the plain
    layer. Shared by the ENet/ERFNet/ESNet packed heads."""
    p_out = pick_head_pack(fc.out_features, x.shape[2], fc.stride[1])
    if p_out is None:
        return None
    plan = plan_packed_deconv(
        fc.in_features, fc.out_features, tuple(fc.kernel.shape[:2]),
        1, p_out, stride=fc.stride, padding=fc.padding,
        output_padding=fc.output_padding)
    k = fc.kernel[...]
    if fc.dtype is not None:
        x = x.astype(fc.dtype)
        k = k.astype(fc.dtype)
    else:
        k = k.astype(x.dtype)
    y = plan(x, k)
    if fc.bias is not None:
        y = y + jnp.tile(fc.bias[...], p_out).astype(y.dtype)
    return PackedLogits(y, fc.out_features)


def module_train_mode(module) -> bool:
    """The shared routing signal for packed heads: True in training
    mode (eval consumers want plain NHWC).

    Explicit contract: models that route packed heads declare
    `self.use_running_average: bool` in their constructor — a plain
    attribute that nnx's `train()`/`eval()` (via `set_attributes`)
    flips together with every BatchNorm/Dropout, so the flag can never
    disagree with the modules unless the caller deliberately targets a
    subset with a `set_attributes` filter. Works for BN-free models
    (tests/test_packed_resize_head.py::test_bn_free_model_routing).

    Fallback for modules without the flag: the first BatchNorm found
    (legacy heuristic; returns False for a BN-free module)."""
    ura = getattr(module, "use_running_average", None)
    if isinstance(ura, bool):
        return not ura
    from flax import nnx

    for _, sub in nnx.iter_modules(module):
        if isinstance(sub, nnx.BatchNorm):
            return not sub.use_running_average
    return False


_RESIZE_PLANS: dict = {}


def plan_packed_resize_w(w: int, ow: int, p: int, c: int,
                         align_corners: bool):
    """The ×k bilinear W-resize as ONE structured-kernel 1-D conv
    emitting packed lanes directly — the same trick that makes the
    packed DECONV heads win where the einsum resize head measured a
    loss (docs/FULLRES_ROOFLINE.md round-4 table): the conv's channel
    dim IS the packed lane row, so no (…, C)-minor intermediate and no
    merge relayout ever exist.

    Returns (kernel (1, win, c, p·c), w_stride, (pl, pr), left_corr,
    right_corr) — all static numpy — or None when the interpolation
    pattern is not pack-periodic (non-integer P·w/ow). The kernel is
    built FROM `_interp_matrix` rows and verified against them exactly
    (reconstruction assert), so the conv form is bit-identical in
    weights to the einsum form; `left/right_corr` (c, p·c) add back the
    border-clamp mass that zero-padding drops at the first/last pack.
    """
    from torch_semantic_segmentation_tpu.ops.upsample import _interp_matrix

    if (p * w) % ow or ow < w:
        # downsampling (ow < w) would need dmin > 0 handling — the conv
        # geometry below assumes dmin <= 0 (pl = -dmin); the head only
        # ever upsamples, so reject rather than shift the window
        return None
    s = (p * w) // ow                       # source step per output pack
    key = (w, ow, p, c, align_corners)
    if key in _RESIZE_PLANS:
        return _RESIZE_PLANS[key]
    m = np.asarray(_interp_matrix(w, ow, align_corners), np.float64)
    k_packs = ow // p
    # per-pack tap table relative to the pack anchor a_k = k·s
    rel = []                                # list of (p, w)-shaped blocks
    for k in range(k_packs):
        block = np.zeros((p, 2 * s + 2), np.float64)
        ok = True
        for q in range(p):
            row = m[k * p + q]
            for src in np.nonzero(row)[0]:
                d = src - k * s + s         # shift by +s so d >= 0 slots
                if not 0 <= d < 2 * s + 2:
                    ok = False
                    break
                block[q, d] += row[src]
            if not ok:
                break
        rel.append(block if ok else None)
    interior = [b for b in rel[1:-1] if b is not None]
    if not interior:
        # fewer than 3 packs: no interior to anchor the kernel on
        _RESIZE_PLANS[key] = None
        return None
    kb = interior[0]
    if any(b is None or not np.array_equal(b, kb) for b in interior):
        _RESIZE_PLANS[key] = None
        return None
    dnz = np.nonzero(kb.any(axis=0))[0]
    dmin, dmax = int(dnz.min()) - s, int(dnz.max()) - s
    if dmin > 0:
        # conv geometry below assumes dmin <= 0 (left pad = -dmin maps
        # tap t to source k·s + dmin + t); a positive dmin would read
        # shifted sources. Unreachable for upsampling (guarded above),
        # kept as defense in depth.
        _RESIZE_PLANS[key] = None
        return None
    win = dmax - dmin + 1
    # conv geometry: output pack k reads input [k·s + dmin, k·s + dmax];
    # with stride s over W, padding pl on the left and enough on the
    # right to cover the last pack's dmax
    pl = -dmin
    pr = max(0, (k_packs - 1) * s + dmax - (w - 1))
    # dense kernel (1, win, c, p·c): tap t ↦ d = dmin + t, per-channel
    # diagonal (the resize mixes W, never channels)
    kern = np.zeros((1, win, c, p * c), np.float32)
    for q in range(p):
        for d in range(2 * s + 2):
            val = kb[q, d]
            if val:
                t = (d - s) - dmin
                for j in range(c):
                    kern[0, t, j, q * c + j] += val
    # implied edge-pack weights under zero padding, vs the true clamped
    # rows: the difference is the border mass → correction matmuls
    def implied(k):
        blk = np.zeros((p, w), np.float64)
        for q in range(p):
            for t in range(win):
                src = k * s + dmin + t
                if 0 <= src < w:
                    blk[q, src] += kern[0, t, 0, q * c].astype(np.float64)
        return blk

    left_d = m[0:p, :] - implied(0)
    right_d = m[(k_packs - 1) * p:, :] - implied(k_packs - 1)
    # corrections must be confined to the border columns
    if (np.abs(left_d[:, 1:]).max() > 1e-12
            or np.abs(right_d[:, :-1]).max() > 1e-12):
        _RESIZE_PLANS[key] = None
        return None
    lc = np.zeros((c, p * c), np.float32)
    rc = np.zeros((c, p * c), np.float32)
    for q in range(p):
        for j in range(c):
            lc[j, q * c + j] = left_d[q, 0]
            rc[j, q * c + j] = right_d[q, w - 1]
    plan = (kern, s, (pl, pr), lc, rc)
    _RESIZE_PLANS[key] = plan
    return plan


def apply_packed_resize_conv_head(y: jax.Array, size: tuple[int, int],
                                  align_corners: bool = False
                                  ) -> "PackedLogits | None":
    """Bilinear-upsample low-res logits to full-res `size` as PackedLogits
    via the structured-conv W pass + an H einsum on the packed (lane-
    clean) form. Exact same interpolation weights as `resize_bilinear`
    (kernel scatter-built from `_interp_matrix` and verified against it);
    same precision contract (fp32/HIGHEST, bf16/DEFAULT). Returns None
    when no pack fits or the W pattern is not pack-periodic."""
    from torch_semantic_segmentation_tpu.ops.upsample import _interp_matrix

    n, h, w, c = y.shape
    oh, ow = size
    p = pick_head_pack(c, ow, 1)
    if p is None or (oh, ow) == (h, w):
        return None
    plan = plan_packed_resize_w(w, ow, p, c, align_corners)
    if plan is None:
        return None
    kern, s, (pl, pr), lc, rc = plan
    dtype = y.dtype
    if dtype == jnp.float32:
        acc, prec = jnp.float32, jax.lax.Precision.HIGHEST
    else:
        acc, prec = dtype, jax.lax.Precision.DEFAULT
    yy = y.astype(acc)
    out = jax.lax.conv_general_dilated(
        yy, jnp.asarray(kern, acc),
        window_strides=(1, s), padding=((0, 0), (pl, pr)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=prec)                      # (n, h, ow/p, p·c)
    lcj = jnp.asarray(lc, acc)
    rcj = jnp.asarray(rc, acc)
    # precision=prec on the border contractions too: at fp32 the whole
    # head must run HIGHEST or the first/last pack breaks the documented
    # checkpoint-parity exactness (TPU DEFAULT decomposes through bf16)
    out = out.at[:, :, 0, :].add(
        jnp.matmul(yy[:, :, 0, :], lcj, precision=prec))
    out = out.at[:, :, -1, :].add(
        jnp.matmul(yy[:, :, -1, :], rcj, precision=prec))
    # H pass on the packed form: minor dim is P·C (95% lane util)
    wh = jnp.asarray(_interp_matrix(h, oh, align_corners), acc)
    out = jnp.einsum("nhkm,oh->nokm", out, wh,
                     preferred_element_type=acc, precision=prec)
    return PackedLogits(out.astype(dtype), c)


def apply_packed_resize_head(y: jax.Array, size: tuple[int, int],
                             align_corners: bool = False
                             ) -> "PackedLogits | None":
    """Bilinear-upsample low-res logits (N, h, w, C) to full-res `size`,
    emitting PackedLogits — the shared head for every model whose final
    layer is `resize_bilinear(logits, (H, W))` (LEDNet APN, BiSeNet,
    ContextNet, DeepLab, ICNet; SURVEY.md §2.2 "Bilinear upsample").

    TPU tiling lane-pads the plain full-res (…, C=19) output 6.7×; here
    the H pass is `ops.resize_bilinear`'s own einsum (the intermediate
    is full-H but still low-W — 1/8th of the padded full-res tensor) and
    the W pass contracts against the interpolation matrix RESHAPED to
    (Wp, P, w), so the padded full-res tensor never exists.

    Numerics: fp32 inputs contract at fp32/HIGHEST and match
    `resize_bilinear` exactly (the checkpoint-parity contract). bf16
    inputs accumulate in bf16 at DEFAULT precision and are APPROXIMATE
    vs resize_bilinear's fp32 accumulation — bounded by ~2 bf16 ulps,
    because each 2-hot interpolation row sums at most two terms (the
    same trade `resize_bilinear_nhcw` documents). Returns None when no
    pack factor fits the output width."""
    from torch_semantic_segmentation_tpu.ops.upsample import _interp_matrix

    n, h, w, c = y.shape
    oh, ow = size
    p = pick_head_pack(c, ow, 1)
    if p is None or (oh, ow) == (h, w):
        return None
    dtype = y.dtype
    if dtype == jnp.float32:
        acc, prec = jnp.float32, jax.lax.Precision.HIGHEST
    else:
        acc, prec = dtype, jax.lax.Precision.DEFAULT
    wh = jnp.asarray(_interp_matrix(h, oh, align_corners), acc)
    ww = jnp.asarray(_interp_matrix(w, ow, align_corners), acc)
    yy = jnp.einsum("nhwc,oh->nowc", y.astype(acc), wh,
                    preferred_element_type=acc, precision=prec)
    ww_r = ww.reshape(ow // p, p, w)
    out = jnp.einsum("nhwc,kqw->nhkqc", yy, ww_r,
                     preferred_element_type=acc, precision=prec)
    out = out.reshape(n, oh, ow // p, p * c).astype(dtype)
    return PackedLogits(out, c)


def maybe_packed_resize(y: jax.Array, size: tuple[int, int], *,
                        align_corners: bool, env_var: str,
                        train_mode: bool, default_on: bool = True):
    """The `upsample_logits` tail shared by the zoo models: route the
    packed resize head when forced, falling back to the plain
    `ops.resize_bilinear` when unrouted or when no pack factor fits.

    RETIRED DEAD END (round 5): every caller passes default_on=False
    and no measured context favors these heads — plain CE fuses the
    resize matmul into the loss so the padded full-res tensor never
    reaches HBM (the heads' premise), and the contexts that break that
    fusion ALSO lose (OHEM −8%, OHEM+aux −5%, 2026-08-20 A/Bs —
    docs/FULLRES_ROOFLINE.md round-5). Both head forms stay behind
    `<env_var>=1` purely as tested infrastructure (the parity tests
    force them); nothing routes them by default."""
    if route_packed_head(env_var, train_mode, default_on):
        py = apply_packed_resize_conv_head(y, size, align_corners)
        if py is None:
            py = apply_packed_resize_head(y, size, align_corners)
        if py is not None:
            return py
    from torch_semantic_segmentation_tpu.ops.upsample import resize_bilinear

    return resize_bilinear(y, size, align_corners=align_corners)


def enabled(var: str = "TPU_SEG_PACKED") -> bool:
    """Routing default for packed regions/heads: on for TPU backends;
    `TPU_SEG_PACKED=1/0` (or a model-specific var) overrides."""
    env = os.environ.get(var)
    if env is not None:
        return env != "0"
    env = os.environ.get("TPU_SEG_PACKED")
    if env is not None:
        return env != "0"
    return jax.default_backend() == "tpu"
