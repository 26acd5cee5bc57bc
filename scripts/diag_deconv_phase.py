"""Prototype: phase-decomposed transposed conv vs lhs-dilated formulation.

Forward value parity + fwd/bwd timing at ENet's final-layer shape.
Phase rule (stride s, kernel k, torch padding p, output_padding op):
  y[n, s*h0+u, s*w0+v, o] for u,v in [0,s) gathers taps (a,b) of the
  FLIPPED kernel K where (u + pl_h - a) % s == 0, reading
  x[h0 + (u + pl_h - a)//s - ?]. Implement by building, for each phase,
  a stride-1 conv of x with the sub-kernel of K at taps congruent to
  that phase, then interleaving phases.
"""
import time
import jax, jax.numpy as jnp
import numpy as np


def convt_ref(x, k, s, p, op):
    kh, kw = k.shape[0], k.shape[1]
    kk = k[::-1, ::-1, :, :]
    return jax.lax.conv_general_dilated(
        x, kk, window_strides=(1, 1),
        padding=((kh - 1 - p, kh - 1 - p + op), (kw - 1 - p, kw - 1 - p + op)),
        lhs_dilation=(s, s), dimension_numbers=("NHWC", "HWIO", "NHWC"))


def convt_phased(x, k, s, p, op):
    """Exact phase decomposition of convt_ref."""
    n, h, w, ci = x.shape
    kh, kw, _, co = k.shape
    kk = k[::-1, ::-1, :, :]
    pl = kh - 1 - p   # left pad in the dilated formulation (square kernel)
    oh = (h - 1) * s + kh - 2 * p + op
    ow = (w - 1) * s + kw - 2 * p + op
    # Output row ho reads dilated-input rows ho + a - pl for taps a.
    # Dilated row d corresponds to real x row d // s when d % s == 0.
    # Phase u = ho % s: taps a with (ho + a - pl) % s == 0, i.e.
    # a ≡ (u - pl) mod s. x row index = (ho + a - pl) // s.
    phases = []
    for u in range(s):
        a_taps = [a for a in range(kh) if (u + a - pl) % s == 0]
        phases.append(a_taps)
    # per phase pair: stride-1 conv with sub-kernel; output (n, h_u, w_v, co)
    # where h_u = count of ho in [0, oh) with ho % s == u.
    outs = {}
    for u in range(s):
        for v in range(s):
            ats, bts = phases[u], phases[v]
            sub = jnp.stack([jnp.stack([kk[a, b] for b in bts], 0)
                             for a in ats], 0)  # (len_a, len_b, ci, co)
            # x row needed for smallest output row of this phase (ho=u):
            # r0 = (u + a - pl) // s for each tap a — varies per tap; conv
            # with padding handles it: row index = (ho + a - pl)//s
            #   = h0 + (u + a - pl)//s  where ho = s*h0 + u.
            # So sub-tap j (tap a=ats[j]) reads x[h0 + off_a[j]] with
            # off_a[j] = (u + ats[j] - pl)//s; consecutive j differ by 1
            # (taps congruent mod s step by s). Conv with left pad
            # -off_a[0] gives the alignment.
            off_a0 = (u + ats[0] - pl) // s
            off_b0 = (v + bts[0] - pl) // s
            h_u = len(range(u, oh, s))
            w_v = len(range(v, ow, s))
            # stride-1 conv: out[h0] = sum_j sub[j] x[h0 + off_a0 + j]
            # => padding lo = -off_a0, hi = (h_u - 1 + off_a0 + len-1) - (h-1)
            pl_h, ph_h = -off_a0, (h_u - 1 + off_a0 + len(ats) - 1) - (h - 1)
            pl_w, ph_w = -off_b0, (w_v - 1 + off_b0 + len(bts) - 1) - (w - 1)
            o = jax.lax.conv_general_dilated(
                x, sub, window_strides=(1, 1),
                padding=((pl_h, ph_h), (pl_w, ph_w)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            outs[(u, v)] = o
    # interleave: rows of equal phase counts only when oh % s == 0; handle
    # general case by padding phase outputs to ceil and slicing after.
    import math
    hu_max = math.ceil(oh / s)
    wv_max = math.ceil(ow / s)
    grid = []
    for u in range(s):
        row = []
        for v in range(s):
            o = outs[(u, v)]
            o = jnp.pad(o, ((0, 0), (0, hu_max - o.shape[1]),
                            (0, wv_max - o.shape[2]), (0, 0)))
            row.append(o)
        grid.append(jnp.stack(row, 3))          # (n, hu, wv, s, co)
    y = jnp.stack(grid, 2)                      # (n, hu, s, wv, s, co)
    y = y.reshape(x.shape[0], hu_max * s, wv_max * s, -1)
    return y[:, :oh, :ow, :]


def fetch(x):
    return float(jnp.asarray(x).ravel()[0])


def timeit(f, *args, iters=8):
    y = f(*args); fetch(y)
    t0 = time.perf_counter()
    for _ in range(iters):
        y = f(*args)
    fetch(y)
    return (time.perf_counter() - t0) / iters * 1e3


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    for (shape, cfg) in [
        (((16, 384, 384, 16), (3, 3, 16, 19)), (2, 1, 1)),   # ENet final
        (((16, 96, 96, 128), (2, 2, 128, 64)), (2, 0, 0)),   # UNet decoder
    ]:
        (xs, ks), (s, p, op) = shape, cfg
        x = jnp.asarray(rng.normal(size=xs), jnp.float32)
        k = jnp.asarray(rng.normal(size=ks), jnp.float32) * 0.1
        ref = convt_ref(x, k, s, p, op)
        got = convt_phased(x, k, s, p, op)
        err = float(jnp.max(jnp.abs(ref - got)))
        print(f"{xs}x{ks} s{s}p{p}op{op}: shape {got.shape} vs {ref.shape}, "
              f"max err {err:.2e}")
        xb, kb = x.astype(jnp.bfloat16), k.astype(jnp.bfloat16)
        jr = jax.jit(lambda a, b: convt_ref(a, b, s, p, op))
        jp = jax.jit(lambda a, b: convt_phased(a, b, s, p, op))
        print(f"  fwd ms: ref {timeit(jr, xb, kb):.2f}  phased {timeit(jp, xb, kb):.2f}")
        gr = jax.jit(jax.grad(lambda a, b: jnp.sum(convt_ref(a, b, s, p, op) ** 2), (0, 1)))
        gp = jax.jit(jax.grad(lambda a, b: jnp.sum(convt_phased(a, b, s, p, op) ** 2), (0, 1)))
        print(f"  fwd+bwd ms: ref {timeit(lambda a, b: gr(a, b)[0], xb, kb):.2f}  "
              f"phased {timeit(lambda a, b: gp(a, b)[0], xb, kb):.2f}")
