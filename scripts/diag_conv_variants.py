"""Diagnostic: alternative lowerings for the two byte-inflated full-res ops —
the 3->32 stem conv (XLA picks a batch-minor layout, padding N to 128 lanes)
and the 3x3 depthwise conv. Candidates: space-to-depth stem, shift-and-add
depthwise. Checks numerics vs lax reference, then times at bench scale."""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

B, H, W = (int(sys.argv[1]) if len(sys.argv) > 1 else 32), 1024, 2048


def _fetch(out):
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))


def report(name, f, *args, n=4):
    c = jax.jit(f).lower(*args).compile()
    by = c.cost_analysis().get("bytes accessed", 0.0)
    out = c(*args)
    _fetch(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = c(*args)
    _fetch(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt*1e3:7.1f} ms  {by/1e9:6.2f} GB  {by/dt/1e9:4.0f} GB/s",
          flush=True)
    return out


def conv_ref(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_s2d(x, w):
    """3x3 s2 pad1 conv via space-to-depth: x (N,H,W,3) -> (N,H/2,W/2,12),
    kernel remapped to 2x2 over block space, 12 input channels."""
    n, h, wd, c = x.shape
    xb = x.reshape(n, h // 2, 2, wd // 2, 2, c)
    xsd = xb.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, wd // 2, 4 * c)
    # w: (3,3,C,O) -> wsd (2,2,4C,O): block tap (A,B), intra (a,b):
    # original row = 2A+a-1, col = 2B+b-1
    kh = jnp.zeros((2, 2, 2, 2, c, w.shape[-1]), dtype=w.dtype)
    for A in range(2):
        for a in range(2):
            r = 2 * A + a - 1
            if not 0 <= r < 3:
                continue
            for Bb in range(2):
                for b in range(2):
                    cc = 2 * Bb + b - 1
                    if not 0 <= cc < 3:
                        continue
                    kh = kh.at[A, Bb, a, b].set(w[r, cc])
    wsd = kh.reshape(2, 2, 4 * c, w.shape[-1]).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        xsd, wsd, (1, 1), ((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def dw_ref(x, w):
    # depthwise 3x3 s2 pad1: w (3,3,1,C) feature_group_count=C
    return jax.lax.conv_general_dilated(
        x, w, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1])


def dw_shift(x, w):
    """Depthwise 3x3 s2 pad1 as 9 shifted elementwise multiply-adds."""
    n, h, wd, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = None
    for dh in range(3):
        for dw_ in range(3):
            sl = jax.lax.slice(
                xp, (0, dh, dw_, 0), (n, dh + h, dw_ + wd, c), (1, 2, 2, 1))
            term = sl * w[dh, dw_, 0]
            out = term if out is None else out + term
    return out


rng = np.random.default_rng(0)
xs = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
ws = jnp.asarray(rng.normal(size=(3, 3, 3, 32)), jnp.float32)
err = float(jnp.max(jnp.abs(conv_ref(xs, ws) - conv_s2d(xs, ws))))
print(f"s2d stem max err: {err:.2e}", flush=True)

xd = jnp.asarray(rng.normal(size=(2, 64, 64, 32)), jnp.float32)
wd_ = jnp.asarray(rng.normal(size=(3, 3, 1, 32)), jnp.float32)
errd = float(jnp.max(jnp.abs(dw_ref(xd, wd_) - dw_shift(xd, wd_))))
print(f"shift dw max err: {errd:.2e}", flush=True)

# bench at full scale, bf16
x = jnp.asarray(rng.normal(size=(B, H, W, 3)), jnp.bfloat16)
w = jnp.asarray(rng.normal(size=(3, 3, 3, 32)), jnp.bfloat16)
report("stem lax       ", conv_ref, x, w)
report("stem s2d       ", conv_s2d, x, w)

xdw = jnp.asarray(rng.normal(size=(B, 512, 1024, 32)), jnp.bfloat16)
wdw = jnp.asarray(rng.normal(size=(3, 3, 1, 32)), jnp.bfloat16)
report("dw lax         ", dw_ref, xdw, wdw)
report("dw shift-add   ", dw_shift, xdw, wdw)

# grads
def g(f):
    return lambda x_, w_: jax.grad(
        lambda a, b: jnp.sum(f(a, b).astype(jnp.float32)), argnums=(0, 1)
    )(x_, w_)

report("stem lax  f+b  ", g(conv_ref), x, w)
report("stem s2d  f+b  ", g(conv_s2d), x, w)
report("dw lax    f+b  ", g(dw_ref), xdw, wdw)
report("dw shift  f+b  ", g(dw_shift), xdw, wdw)
