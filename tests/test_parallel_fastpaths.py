"""Forced-route sharded-mesh proofs for the default-on TPU fast paths
(VERDICT r3 next #1).

The plain-XLA fast paths — the packed LDS region, the packed
bodies/heads, training-mode folded BN, and hw-RNG dropout — route on ANY
TPU backend (`enabled()` has no device-count guard, unlike the Pallas
kernels, which self-gate to single-device), so on a real multi-chip TPU
they are ON inside the GSPMD-sharded train step. These tests force each
route on the CPU fake-8-device mesh via its env var and assert the
sharded step reproduces the single-device step (same forced routing on
both sides, isolating sharding behavior from routing behavior).

The specific interactions under test are the ones a v5e-8 run would hit
first: W-packed reshapes under a data-sharded batch, the packed-label
`reshape(n, h, wp, p)` under a spatial-sharded H, the folded-BN moment
matmuls under a sharded batch (sync-BN equivalence), and the documented
threefry dropout fallback's sharding invariance.

Reference counterpart: DDP all-reduce semantics (SURVEY.md §2.4 DP row)
and apex sync-BN (§2.2 BatchNorm row) — the reference's fast paths are
cuDNN kernels that behave identically under DDP; ours must behave
identically under GSPMD.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx
from jax.sharding import NamedSharding, PartitionSpec as P

from torch_semantic_segmentation_tpu.data.synthetic import synthetic_batch
from torch_semantic_segmentation_tpu.models import get_model
from torch_semantic_segmentation_tpu.parallel import (
    batch_sharding,
    data_parallel_mesh,
    replicate,
    shard_batch,
)
from torch_semantic_segmentation_tpu.train import (
    OptimizerConfig,
    create_train_state,
    make_train_step,
)

# (model, forced env vars, input H×W, param atol) — each case covers one
# family of default-on fast paths end-to-end through a real train step.
# atol calibration: fp32 reassociation noise amplifies backward through
# chained BN-over-batch-stat layers (the same effect test_packed_erf.py
# measures at ~2% of max kernel-grad magnitude) — ERFNet's ~20-BN
# encoder with active dropout needs the looser bar; an actual sharding
# bug shows up as O(1) divergence, far above either bar (measured in
# f64: the sharded-vs-unsharded grad gap is 5e-8 absolute).
FORCED_CASES = [
    # (model, env, hw, atol, model_kwargs)
    # packed LDS region + packed resize head + folded BN + mbconv-free
    # (pallas kernels self-gate off on CPU; these are the plain-XLA paths)
    ("fastscnn", {"FASTSCNN_PACKED_LDS": "1", "TPU_SEG_PACKED_FASTSCNN": "1",
                  "TPU_SEG_FOLDED_BN": "1"}, (64, 64), 2e-4, {}),
    # whole-network packed body (W-packed convs, selection-matmul
    # pool/unpool, packed BN, packed deconv head, packed CE)
    ("enet", {"TPU_SEG_PACKED_ENET_BODY": "1"}, (32, 32), 2e-4, {}),
    # ERFNet-family packed body with ACTIVE per-element dropout
    # (threefry path on CPU — the documented multi-chip fallback)
    ("erfnet", {"TPU_SEG_PACKED_ERFNET_BODY": "1"}, (32, 32), 2e-3, {}),
    # ESNet whole-network packed body (default ON on TPU, +19% measured;
    # round-4 VERDICT next #3 — the missing sharded proof)
    ("esnet", {"TPU_SEG_PACKED_ESNET_BODY": "1"}, (32, 32), 2e-3, {}),
    # UNet full-res W-packed rim (default ON on TPU): packed deconv
    # re-entry + concat placement matmul + head repack under a
    # data-sharded batch. base_ch=16 keeps the 1-core-CPU compile sane —
    # the packed program family is identical to the default width.
    ("unet", {"TPU_SEG_PACKED_UNET_BODY": "1"}, (32, 32), 2e-4,
     {"base_ch": 16}),
]
# LEDNet's packed body (default ON on TPU, +201% measured round 5) is
# NOT in FORCED_CASES: its APN head MULTIPLIES a pixel-attention map
# into the features, so fp32 reassociation noise amplifies through the
# deep 17-BN encoder to ~0.037 on one-step params — measured the SAME
# for single-device packed-vs-plain as for DP-8-vs-single, i.e. the
# fp32 param compare cannot separate noise from a sharding bug for this
# model. Its sharded proof is the f64 gradient-equality test below
# (the spatial test's approach), where the measured DP-8 gap is 1.5e-11.


def _forced_setup(name, env, monkeypatch, num_classes=5, **model_kwargs):
    model_kwargs.pop("loss_rtol", None)
    for var, val in env.items():
        monkeypatch.setenv(var, val)
    model = get_model(name, num_classes=num_classes, rngs=nnx.Rngs(0),
                      **model_kwargs)
    tx = OptimizerConfig(lr=0.05, max_steps=100).make()
    gd_train, gd_eval, state = create_train_state(model, tx)
    return gd_train, gd_eval, state, tx


@pytest.mark.slow
@pytest.mark.parametrize("name,env,hw,atol,mkw", FORCED_CASES)
def test_forced_fastpath_dp8_matches_single_device(name, env, hw, atol, mkw,
                                                   monkeypatch):
    """DP-8 train step with the fast path FORCE-routed == single-device
    step: loss identical, updated params within reassociation tolerance
    (the same bars as the unrouted DP-8 test in test_parallel.py)."""
    assert jax.device_count() == 8
    gd_train, _, state, tx = _forced_setup(name, env, monkeypatch, **mkw)
    step = make_train_step(gd_train, tx, donate=False)

    h, w = hw
    images, labels = synthetic_batch(8, h, w, num_classes=5, seed=21)
    images, labels = jnp.asarray(images), jnp.asarray(labels)

    ref_state, ref_metrics = step(state, images, labels)

    mesh = data_parallel_mesh()
    dp_state = replicate(state, mesh)
    dp_images, dp_labels = shard_batch((images, labels), mesh)
    dp_state, dp_metrics = step(dp_state, dp_images, dp_labels)

    np.testing.assert_allclose(float(dp_metrics["loss"]),
                               float(ref_metrics["loss"]),
                               rtol=mkw.get("loss_rtol", 1e-5))
    for a, b in zip(jax.tree.leaves(ref_state.params),
                    jax.tree.leaves(dp_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=atol, rtol=1e-2)
    # BN running stats (incl. packed/folded BN updates) must also agree
    # (skip non-float leaves: dropout RngKey state can't be compared)
    for a, b in zip(jax.tree.leaves(ref_state.rest),
                    jax.tree.leaves(dp_state.rest)):
        if not jnp.issubdtype(a.dtype, jnp.floating):
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=atol, rtol=1e-2)


@pytest.mark.slow
def test_forced_lednet_body_dp8_grads_match_f64(monkeypatch):
    """DP-8 proof for the LEDNet packed encoder (split/shuffle selection
    matmuls + dilated factorized packed convs, ACTIVE threefry dropout):
    loss and every training-mode gradient match the single-device
    computation in float64 (see the FORCED_CASES note above for why the
    fp32 one-step param compare is unusable for this model)."""
    from torch_semantic_segmentation_tpu.losses import cross_entropy_loss

    monkeypatch.setenv("TPU_SEG_PACKED_LEDNET_BODY", "1")
    monkeypatch.setenv("TPU_SEG_PACKED_LEDNET", "0")
    jax.config.update("jax_enable_x64", True)
    try:
        model = get_model("lednet", num_classes=5,
                          param_dtype=jnp.float64, rngs=nnx.Rngs(0))
        model.train()
        gd, state = nnx.split(model)
        images, labels = synthetic_batch(8, 32, 32, num_classes=5, seed=21)
        images = jnp.asarray(images, jnp.float64)
        labels = jnp.asarray(labels)

        def loss_of(state, x, y):
            return cross_entropy_loss(nnx.merge(gd, state)(x), y)

        grad_fn = jax.jit(jax.value_and_grad(loss_of, allow_int=True))
        ref_loss, g_ref = grad_fn(state, images, labels)

        mesh = data_parallel_mesh()
        dp_state = replicate(state, mesh)
        dp_images, dp_labels = shard_batch((images, labels), mesh)
        dp_loss, g_dp = grad_fn(dp_state, dp_images, dp_labels)

        # the loss's internal fp32 cast bounds agreement at ~1e-6 rel
        np.testing.assert_allclose(float(dp_loss), float(ref_loss),
                                   rtol=3e-6)
        checked = 0
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_dp)):
            if not jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating):
                continue
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0, atol=1e-6)
            checked += 1
        assert checked > 50
    finally:
        jax.config.update("jax_enable_x64", False)


@pytest.mark.slow
def test_forced_fastpath_spatial_mesh_matches_single_device(monkeypatch):
    """data×spatial mesh with every FastSCNN fast path force-routed: the
    packed-label reshape(n, h, wp, p) sits under a spatial-sharded H and
    a W-packed logits layout — the exact interaction VERDICT r3 flagged.

    Loss AND training-mode gradients must match the single-device
    computation. Gradients are compared in float64 with an ABSOLUTE bar:
    spatial sharding changes the accumulation order at every conv halo
    and BN batch-stat reduction, so fp32 noise amplifies to ~1e-2 on
    params through the ~20 chained BNs (measured while building this
    test — an fp32 one-step param compare cannot separate that from a
    real bug), while in f64 the sharded-vs-unsharded gap is ≤5e-8
    absolute on O(1)-magnitude grads. Relative compares are wrong here
    too: BN bias grads cancel to ~0 by construction (Σx̂ = 0), making
    per-leaf relative error meaningless on those leaves."""
    from torch_semantic_segmentation_tpu.losses import cross_entropy_loss
    from torch_semantic_segmentation_tpu.parallel import check_spatial_extent

    monkeypatch.setenv("FASTSCNN_PACKED_LDS", "1")
    monkeypatch.setenv("TPU_SEG_PACKED_FASTSCNN", "1")
    monkeypatch.setenv("TPU_SEG_FOLDED_BN", "1")
    jax.config.update("jax_enable_x64", True)
    try:
        model = get_model("fastscnn", num_classes=5, rngs=nnx.Rngs(0),
                          param_dtype=jnp.float64)
        model.train()
        gd, state = nnx.split(model)
        # H=128: the 1/32 stage keeps ≥1 row per spatial shard — the
        # degenerate-shard guard below is load-bearing (see its test)
        check_spatial_extent(128, 4)
        images, labels = synthetic_batch(2, 128, 64, num_classes=5, seed=23)
        images = jnp.asarray(images, jnp.float64)
        labels = jnp.asarray(labels)

        def loss_of(state, x, y):
            m = nnx.merge(gd, state)
            return cross_entropy_loss(m(x), y)

        grad_fn = jax.jit(jax.value_and_grad(loss_of, allow_int=True))
        ref_loss, g_ref = grad_fn(state, images, labels)

        mesh = data_parallel_mesh(num_data=2, num_spatial=4)
        sp_state = replicate(state, mesh)
        sp_images = jax.device_put(
            images, batch_sharding(mesh, spatial_dim=1,
                                   input_extent=images.shape[1]))
        sp_labels = jax.device_put(
            labels, NamedSharding(mesh, P("data", "spatial")))
        sp_loss, g_sp = grad_fn(sp_state, sp_images, sp_labels)

        # the loss's internal fp32 cast bounds agreement at ~1e-7 rel
        np.testing.assert_allclose(float(sp_loss), float(ref_loss),
                                   rtol=1e-6)
        checked = 0
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_sp)):
            if not jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating):
                continue
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0, atol=1e-5)
            checked += 1
        assert checked > 50       # the whole parameter tree was compared
    finally:
        jax.config.update("jax_enable_x64", False)


def test_folded_bn_sharded_batch_matches_unsharded(monkeypatch):
    """Folded BN's moment matmuls under a GSPMD-sharded batch: the
    Cin×Cin second-moment and mean reductions must reduce over the
    GLOBAL batch (sync-BN equivalence, SURVEY.md §2.2 BatchNorm row) —
    output AND updated running stats equal the unsharded call."""
    from torch_semantic_segmentation_tpu.ops import ConvBNAct

    monkeypatch.setenv("TPU_SEG_FOLDED_BN", "1")
    # 6× expansion: fold_wins(8, 48) holds, so the fold MUST route
    cba = ConvBNAct(8, 48, 1, act="relu", rngs=nnx.Rngs(0))
    cba.train()
    rng = np.random.default_rng(31)
    x = jnp.asarray(rng.normal(size=(8, 8, 8, 8)), jnp.float32)

    gd, st = nnx.split(cba)

    def fwd(st, x):
        m = nnx.merge(gd, st)
        y = m(x)
        _, st2 = nnx.split(m)
        return y, st2

    want_y, want_st = jax.jit(fwd)(st, x)

    mesh = data_parallel_mesh()
    xs = jax.device_put(x, batch_sharding(mesh))
    st_r = replicate(st, mesh)
    got_y, got_st = jax.jit(fwd)(st_r, xs)

    np.testing.assert_allclose(np.asarray(got_y), np.asarray(want_y),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree.leaves(want_st), jax.tree.leaves(got_st)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_threefry_dropout_sharding_invariant(monkeypatch):
    """The documented multi-chip dropout story (ops/dropout.py): with
    TPU_SEG_RBG_DROPOUT=0 the threefry mask is sharding-INVARIANT — the
    DP-8 output must be bitwise equal to the single-device output."""
    from torch_semantic_segmentation_tpu.ops.dropout import Dropout

    monkeypatch.setenv("TPU_SEG_RBG_DROPOUT", "0")
    x = jnp.ones((8, 32, 32, 64), jnp.float32)   # 512K mask elements

    def run(xs):
        drop = Dropout(0.3, rngs=nnx.Rngs(5))
        drop.train()
        return np.asarray(drop(xs))

    want = run(x)
    assert 0.25 < float((want == 0).mean()) < 0.35
    mesh = data_parallel_mesh()
    got = run(jax.device_put(x, batch_sharding(mesh)))
    np.testing.assert_array_equal(got, want)


def test_rbg_dropout_under_mesh_unbiased(monkeypatch):
    """The hw-RNG path under a sharded batch: masks are documented
    shape/backend-dependent (NOT bitwise stable across shardings), but
    the realized drop rate and the unbiased rescale must hold — the
    statistical contract a multi-chip training run relies on."""
    from torch_semantic_segmentation_tpu.ops.dropout import Dropout

    monkeypatch.setenv("TPU_SEG_RBG_DROPOUT", "1")
    x = jnp.ones((8, 32, 32, 64), jnp.float32)
    mesh = data_parallel_mesh()

    drop = Dropout(0.1, rngs=nnx.Rngs(7))
    drop.train()
    y = np.asarray(drop(jax.device_put(x, batch_sharding(mesh))))
    assert np.all(np.isfinite(y))
    zero_frac = float((y == 0).mean())
    assert 0.08 < zero_frac < 0.13, zero_frac      # realized rate ≈ 0.1016
    # unbiased rescale: kept values are 1/realized_keep
    kept = y[y != 0]
    np.testing.assert_allclose(kept, 1.0 / (230 / 256), rtol=1e-6)
    np.testing.assert_allclose(y.mean(), 1.0, rtol=0.02)


def test_degenerate_spatial_sharding_guard():
    """check_spatial_extent pins the round-4 finding: with the deepest
    feature map smaller than the spatial axis (e.g. 64-px input → H=2 at
    1/32, sharded over 4 — some shards all-padding), XLA GSPMD keeps the
    forward correct but overcounts that stage's conv-kernel/BN gradients
    by EXACTLY the axis size (measured 4.000×/2.000× in an f64 sweep,
    poisoning every upstream gradient). The guard must reject exactly
    that configuration."""
    from torch_semantic_segmentation_tpu.parallel import check_spatial_extent

    check_spatial_extent(128, 4)            # 4 rows at 1/32 → fine
    check_spatial_extent(128, 4, max_stride=32)
    with pytest.raises(ValueError, match="degenerate spatial sharding"):
        check_spatial_extent(64, 4)         # 2 rows over 4 shards
    with pytest.raises(ValueError, match="degenerate"):
        check_spatial_extent(64, 4, max_stride=32)
    check_spatial_extent(64, 2)             # 1 row per shard → exact


def test_spatial_guard_unavoidable_through_public_helpers():
    """The guard is STRUCTURAL, not advisory (round-4 VERDICT missing
    #4): composing the blessed helpers — data_parallel_mesh(num_spatial=4)
    + batch_sharding(spatial_dim=1) / shard_batch(spatial=True) — with a
    degenerate extent raises at the helper; it cannot silently produce
    the corrupting sharding. batch_sharding also refuses to shard a
    spatial dim without knowing the extent at all."""
    mesh = data_parallel_mesh(num_data=2, num_spatial=4)

    # extent unknown → refuse outright
    with pytest.raises(ValueError, match="requires input_extent"):
        batch_sharding(mesh, spatial_dim=1)
    # degenerate extent → the round-4 corruption config raises here
    with pytest.raises(ValueError, match="degenerate spatial sharding"):
        batch_sharding(mesh, spatial_dim=1, input_extent=64)
    # shard_batch reads the extent off the array itself
    images = jnp.zeros((8, 64, 64, 3), jnp.float32)
    labels = jnp.zeros((8, 64, 64), jnp.int32)
    with pytest.raises(ValueError, match="degenerate spatial sharding"):
        shard_batch((images, labels), mesh, spatial=True)
    # non-degenerate passes through both helpers
    sh = batch_sharding(mesh, spatial_dim=1, input_extent=128)
    assert sh.spec == P("data", "spatial", None, None)
    ok_images = jnp.zeros((8, 128, 64, 3), jnp.float32)
    ok_labels = jnp.zeros((8, 128, 64), jnp.int32)
    si, sl = shard_batch((ok_images, ok_labels), mesh, spatial=True)
    assert si.sharding.spec == P("data", "spatial", None, None)
    # a 1-sized (or absent) spatial axis never needs the extent
    dp = data_parallel_mesh(num_data=8, num_spatial=1)
    batch_sharding(dp, spatial_dim=1)
