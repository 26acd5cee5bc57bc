"""Subprocess worker for the on-chip (`-m tpu`) kernel parity tier.

Runs OUTSIDE the pytest process because tests/conftest.py pins the suite
to CPU before any test imports. Probes for a real TPU first and exits 42
(→ pytest skip) when none is attached, so the tier is safe to invoke on
CPU-only hosts.

One kernel FAMILY per invocation (`python tpu_kernel_worker.py <family>`,
VERDICT r3 next #5 — a Mosaic regression names its kernel instead of
failing one monolithic blob), all against plain-XLA oracles ON THE REAL
CHIP (the interpret-mode CPU tests in test_pallas_*.py cannot exercise
Mosaic lowering — round-3's compile bugs were all Mosaic-only: negative
ref indices, bf16 cmpf, 32-bit strided-load rules):

  mbconv    — fused expand→relu→dw3×3 fwd + VJP (strides 1/2)
  dw        — packed depthwise-3×3 fwd + VJP (stride 2)
  resize_ce — fused resize+CE loss value + grad vs the XLA lane-major
              tail, AND the per-pixel OHEM loss-map variant
  upsample  — fused ×2 bilinear upsample+concat fwd + VJP
  sepconv   — fused folded-BN separable conv (inference path)

Exit codes: 0 ok, 42 no-TPU skip, 1 failure, 2 unknown family.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/root/.jax_cache"))

import jax.numpy as jnp
import numpy as np


def rel_err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.max(np.abs(a - b))) / (float(np.max(np.abs(b))) + 1e-9)


def check_mbconv(rng, failures):
    from torch_semantic_segmentation_tpu.ops import pallas_mbconv as mb

    for stride in (1, 2):
        x = jnp.asarray(rng.normal(size=(2, 16, 64, 64)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(64, 384)) * 0.2, jnp.float32)
        b = jnp.asarray(rng.normal(size=(384,)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(3, 3, 384)), jnp.float32)
        y = jax.jit(lambda *a: mb.fused_expand_dw(*a, stride))(x, w, b, k)
        ref = jax.jit(lambda *a: mb.expand_dw_reference(*a, stride))(x, w, b, k)
        fe = rel_err(y, ref)
        ok = fe < 1e-6   # same bf16 rounding points ⇒ bit-exact forward
        print(f"mbconv s{stride} fwd rel {fe:.2e} {'OK' if ok else 'FAIL'}")
        if not ok:
            failures.append(f"mbconv s{stride} fwd {fe}")

        def loss(fn):
            return lambda *a: jnp.sum(
                fn(*a, stride).astype(jnp.float32) ** 2)

        g1 = jax.jit(jax.grad(loss(mb.fused_expand_dw),
                              argnums=(0, 1, 2, 3)))(x, w, b, k)
        g2 = jax.jit(jax.grad(loss(mb.expand_dw_reference),
                              argnums=(0, 1, 2, 3)))(x, w, b, k)
        for a, r, nm in zip(g1, g2, ["dx", "dw", "db", "dk"]):
            e = rel_err(a, r)
            ok = e < 2e-2   # bf16 reassociation noise
            print(f"mbconv s{stride} {nm} rel {e:.2e} {'OK' if ok else 'FAIL'}")
            if not ok:
                failures.append(f"mbconv s{stride} {nm} {e}")


def check_dw(rng, failures):
    from torch_semantic_segmentation_tpu.ops import pallas_dw as dw

    x = jnp.asarray(rng.normal(size=(2, 32, 64, 32)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(3, 3, 32)), jnp.bfloat16)
    if not dw.supports(x.shape, 2, dtype=x.dtype):
        print("dw: supports() False at probe shapes — adjust worker")
        failures.append("dw supports probe")
        return
    y = jax.jit(lambda a, b: dw.depthwise_conv3x3(a, b, stride=2))(x, k)
    ref = dw.depthwise_conv3x3_reference(x, k, stride=2)
    e = rel_err(y, ref)
    ok = e < 2e-2
    print(f"dw s2 fwd rel {e:.2e} {'OK' if ok else 'FAIL'}")
    if not ok:
        failures.append(f"dw fwd {e}")
    g1 = jax.jit(jax.grad(lambda a, b: jnp.sum(
        dw.depthwise_conv3x3(a, b, stride=2).astype(jnp.float32) ** 2),
        argnums=(0, 1)))(x, k)
    g2 = jax.jit(jax.grad(lambda a, b: jnp.sum(
        dw.depthwise_conv3x3_reference(a, b, stride=2
                                       ).astype(jnp.float32) ** 2),
        argnums=(0, 1)))(x, k)
    for a, r, nm in zip(g1, g2, ["dx", "dk"]):
        e = rel_err(a, r)
        ok = e < 3e-2
        print(f"dw s2 {nm} rel {e:.2e} {'OK' if ok else 'FAIL'}")
        if not ok:
            failures.append(f"dw {nm} {e}")


def check_resize_ce(rng, failures):
    from torch_semantic_segmentation_tpu.losses import cross_entropy_loss
    from torch_semantic_segmentation_tpu.ops import pallas_resize_ce as rc
    from torch_semantic_segmentation_tpu.ops.upsample import resize_bilinear

    logits = jnp.asarray(rng.normal(size=(2, 32, 64, 19)), jnp.bfloat16)
    labels = np.asarray(rng.integers(0, 19, size=(2, 128, 256)), np.int32)
    labels[0, :8] = 255
    labels = jnp.asarray(labels)
    if not rc.supports(logits.shape, labels.shape, logits.dtype, 255):
        print("resize_ce: supports() False at probe shapes — adjust worker")
        failures.append("resize_ce supports probe")
        return

    def v_fused(lg):
        return rc.resize_cross_entropy(lg, labels, ignore_index=255)

    def v_ref(lg):
        up = resize_bilinear(lg.astype(jnp.float32), (128, 256))
        return cross_entropy_loss(up, labels, ignore_index=255)

    l1, g1 = jax.jit(jax.value_and_grad(v_fused))(logits)
    l2, g2 = jax.jit(jax.value_and_grad(v_ref))(logits)
    ev = abs(float(l1) - float(l2)) / (abs(float(l2)) + 1e-9)
    eg = rel_err(g1, g2)
    ok = ev < 1e-2 and eg < 5e-2   # fused path computes in bf16
    print(f"resize_ce value rel {ev:.2e} grad rel {eg:.2e} "
          f"{'OK' if ok else 'FAIL'}")
    if not ok:
        failures.append(f"resize_ce {ev} {eg}")

    # per-pixel loss-map variant (the OHEM building block): sum of the
    # map over valid pixels must match the fused mean × valid count, and
    # a masked-sum grad must match the XLA tail's
    def m_fused(lg):
        lm = rc.per_pixel_resize_ce(lg, labels)
        return jnp.sum(lm) / jnp.sum(labels != 255)

    def m_ref(lg):
        up = resize_bilinear(lg.astype(jnp.float32), (128, 256))
        return cross_entropy_loss(up, labels, ignore_index=255)

    l1, g1 = jax.jit(jax.value_and_grad(m_fused))(logits)
    l2, g2 = jax.jit(jax.value_and_grad(m_ref))(logits)
    ev = abs(float(l1) - float(l2)) / (abs(float(l2)) + 1e-9)
    eg = rel_err(g1, g2)
    ok = ev < 1e-2 and eg < 5e-2
    print(f"resize_ce map value rel {ev:.2e} grad rel {eg:.2e} "
          f"{'OK' if ok else 'FAIL'}")
    if not ok:
        failures.append(f"resize_ce map {ev} {eg}")


def check_upsample(rng, failures):
    from torch_semantic_segmentation_tpu.ops import pallas_upsample as pu

    low = jnp.asarray(rng.normal(size=(2, 16, 32, 128)), jnp.float32)
    skip = jnp.asarray(rng.normal(size=(2, 32, 64, 128)), jnp.float32)
    y = jax.jit(lambda a, b: pu.upsample2x_concat(a, b, use_pallas=True))(
        low, skip)
    ref = pu._reference(low, skip)
    e = rel_err(y, ref)
    ok = e < 1e-5
    print(f"upsample fwd rel {e:.2e} {'OK' if ok else 'FAIL'}")
    if not ok:
        failures.append(f"upsample fwd {e}")

    def loss(fn):
        return lambda a, b: jnp.sum(fn(a, b).astype(jnp.float32) ** 2)

    g1 = jax.jit(jax.grad(
        loss(lambda a, b: pu.upsample2x_concat(a, b, use_pallas=True)),
        argnums=(0, 1)))(low, skip)
    g2 = jax.jit(jax.grad(loss(pu._reference), argnums=(0, 1)))(low, skip)
    for a, r, nm in zip(g1, g2, ["dlow", "dskip"]):
        e = rel_err(a, r)
        ok = e < 1e-4
        print(f"upsample {nm} rel {e:.2e} {'OK' if ok else 'FAIL'}")
        if not ok:
            failures.append(f"upsample {nm} {e}")


def check_sepconv(rng, failures):
    from torch_semantic_segmentation_tpu.ops import pallas_sepconv as sc

    # inference-only kernel (folded BN); C must be a whole 128-lane tile
    x = jnp.asarray(rng.normal(size=(2, 32, 64, 128)), jnp.bfloat16)
    dwk = jnp.asarray(rng.normal(size=(3, 3, 128)), jnp.float32)
    dwb = jnp.asarray(rng.normal(size=(128,)), jnp.float32)
    pwk = jnp.asarray(rng.normal(size=(128, 128)) * 0.1, jnp.bfloat16)
    pwb = jnp.asarray(rng.normal(size=(128,)), jnp.float32)
    for dilation in (1, 2):
        y = jax.jit(lambda *a: sc.fused_separable_conv(
            *a, stride=1, dilation=dilation, use_pallas=True))(
                x, dwk, dwb, pwk, pwb)
        ref = sc._reference(x, dwk, dwb, pwk, pwb, stride=1,
                            dilation=dilation, relu_mid=True, relu_out=True)
        e = rel_err(y, ref)
        ok = e < 2e-2   # bf16 accumulation differences
        print(f"sepconv d{dilation} fwd rel {e:.2e} {'OK' if ok else 'FAIL'}")
        if not ok:
            failures.append(f"sepconv d{dilation} {e}")


FAMILIES = {
    "mbconv": check_mbconv,
    "dw": check_dw,
    "resize_ce": check_resize_ce,
    "upsample": check_upsample,
    "sepconv": check_sepconv,
}


def main(argv) -> int:
    if len(argv) != 1 or argv[0] not in FAMILIES:
        print(f"usage: tpu_kernel_worker.py {{{'|'.join(FAMILIES)}}}")
        return 2
    try:
        backend = jax.default_backend()
        devs = jax.devices()
    except Exception as e:  # no usable backend at all
        print(f"no backend: {e}")
        return 42
    if backend not in ("tpu", "axon") or not devs:
        print(f"backend {backend!r} is not a TPU — skipping")
        return 42
    print(f"device: {devs[0]}")

    rng = np.random.default_rng(0)
    failures = []
    FAMILIES[argv[0]](rng, failures)
    if failures:
        print("FAILURES:", failures)
        return 1
    print(f"TPU KERNEL CHECKS OK: {argv[0]}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
