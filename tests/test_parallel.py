"""Distributed-without-a-cluster tests (SURVEY.md §4.4): 8 fake CPU devices;
GSPMD data-parallel step must equal the single-device big-batch step, and
the multi-scale evaluator must agree with single-scale argmax in the
1-scale/no-flip configuration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import nnx

from torch_semantic_segmentation_tpu.data.synthetic import synthetic_batch
from torch_semantic_segmentation_tpu.eval import make_multiscale_eval_step
from torch_semantic_segmentation_tpu.metrics import new_confusion_matrix
from torch_semantic_segmentation_tpu.models import enet
from torch_semantic_segmentation_tpu.parallel import (
    data_parallel_mesh,
    replicate,
    shard_batch,
)
from torch_semantic_segmentation_tpu.train import (
    OptimizerConfig,
    create_train_state,
    make_eval_step,
    make_train_step,
)


def _setup(num_classes=5, lr=0.05):
    model = enet(num_classes=num_classes, rngs=nnx.Rngs(0))
    tx = OptimizerConfig(lr=lr, max_steps=100).make()
    gd_train, gd_eval, state = create_train_state(model, tx)
    return gd_train, gd_eval, state, tx


@pytest.mark.slow
def test_dp8_loss_and_params_match_single_device():
    assert jax.device_count() == 8
    gd_train, _, state, tx = _setup()
    step = make_train_step(gd_train, tx, donate=False)

    images, labels = synthetic_batch(8, 16, 16, num_classes=5, seed=3)
    images, labels = jnp.asarray(images), jnp.asarray(labels)

    # single device reference
    ref_state, ref_metrics = step(state, images, labels)

    # DP-8: params replicated, batch sharded over 'data'
    mesh = data_parallel_mesh()
    assert mesh.shape["data"] == 8
    dp_state = replicate(state, mesh)
    dp_images, dp_labels = shard_batch((images, labels), mesh)
    dp_state, dp_metrics = step(dp_state, dp_images, dp_labels)

    np.testing.assert_allclose(float(dp_metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=1e-5)
    # updated params identical => gradient all-reduce is exact
    flat_ref = jax.tree.leaves(ref_state.params)
    flat_dp = jax.tree.leaves(dp_state.params)
    # tolerance: sharded reductions (grad psum, global BN stats) legally
    # reorder f32 sums vs the single-device reduction
    for a, b in zip(flat_ref, flat_dp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-2)


@pytest.mark.slow
def test_dp8_second_step_keeps_sharding():
    gd_train, _, state, tx = _setup()
    step = make_train_step(gd_train, tx, donate=False)
    mesh = data_parallel_mesh()
    state = replicate(state, mesh)
    images, labels = synthetic_batch(8, 16, 16, num_classes=5, seed=4)
    batch = shard_batch((jnp.asarray(images), jnp.asarray(labels)), mesh)
    state, m1 = step(state, *batch)
    state, m2 = step(state, *batch)
    assert float(m2["loss"]) < float(m1["loss"])  # still learning
    # loss is replicated scalar; params stay replicated
    p0 = jax.tree.leaves(state.params)[0]
    assert p0.sharding.is_fully_replicated


def test_multiscale_eval_single_scale_matches_plain_eval():
    _, gd_eval, state, _ = _setup(num_classes=5)
    images, labels = synthetic_batch(2, 32, 32, num_classes=5, seed=5)
    images, labels = jnp.asarray(images), jnp.asarray(labels)

    plain = make_eval_step(gd_eval, num_classes=5)
    ms = make_multiscale_eval_step(gd_eval, num_classes=5, scales=(1.0,),
                                   flip=False, size_divisor=8)
    cm_a = plain(state.params, state.rest, new_confusion_matrix(5), images, labels)
    cm_b = ms(state.params, state.rest, new_confusion_matrix(5), images, labels)
    np.testing.assert_array_equal(np.asarray(cm_a), np.asarray(cm_b))


@pytest.mark.slow
def test_multiscale_eval_with_flip_runs():
    _, gd_eval, state, _ = _setup(num_classes=5)
    images, labels = synthetic_batch(1, 32, 32, num_classes=5, seed=6)
    ms = make_multiscale_eval_step(gd_eval, num_classes=5,
                                   scales=(0.5, 1.0), flip=True,
                                   size_divisor=8)
    cm = ms(state.params, state.rest, new_confusion_matrix(5),
            jnp.asarray(images), jnp.asarray(labels))
    total = float(np.asarray(cm).sum())
    assert total == float((np.asarray(labels) != 255).sum())


def test_spatial_sharding_matches_unsharded_forward():
    """H-dimension (spatial) partitioning — the image analog of context
    parallelism (SURVEY.md §2.4/§5): GSPMD inserts conv halo exchanges and
    global-pool all-reduces; outputs must equal the unsharded forward."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from torch_semantic_segmentation_tpu.models import get_model
    from torch_semantic_segmentation_tpu.parallel import batch_sharding

    model = get_model("fastscnn", num_classes=5)
    model.eval()
    gd, st = nnx.split(model)
    # H=128: ≥1 row per spatial shard at 1/32 — the helper-level
    # degenerate-shard guard (batch_sharding input_extent) rejects less
    x = jnp.asarray(synthetic_batch(2, 128, 64, 5, seed=7)[0])

    fwd = jax.jit(lambda st, x: nnx.merge(gd, st)(x))
    want = fwd(st, x)

    mesh = data_parallel_mesh(num_data=2, num_spatial=4)
    xs = jax.device_put(
        x, batch_sharding(mesh, spatial_dim=1, input_extent=x.shape[1]))
    st_r = replicate(st, mesh)
    got = fwd(st_r, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_hybrid_dcn_mesh_matches_single_device():
    """Hybrid ('dcn_data','data') two-level mesh — the multi-slice scaling
    path (ICI within a slice, DCN across): batch sharded over both axes
    must reproduce the single-device step exactly."""
    from torch_semantic_segmentation_tpu.parallel import (
        hybrid_batch_sharding, hybrid_data_parallel_mesh)

    gd_train, _, state, tx = _setup()
    step = make_train_step(gd_train, tx, donate=False)
    images, labels = synthetic_batch(8, 16, 16, num_classes=5, seed=9)
    images, labels = jnp.asarray(images), jnp.asarray(labels)
    ref_state, ref_metrics = step(state, images, labels)

    mesh = hybrid_data_parallel_mesh(num_slices=2)   # 2 "slices" x 4 devices
    assert mesh.shape == {"dcn_data": 2, "data": 4}
    sh = hybrid_batch_sharding(mesh)
    h_state = replicate(state, mesh)
    h_images = jax.device_put(images, sh)
    h_labels = jax.device_put(labels, sh)
    h_state2, h_metrics = step(h_state, h_images, h_labels)
    np.testing.assert_allclose(float(h_metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(ref_state.params),
                    jax.tree.leaves(h_state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_ohem_dp8_matches_single_device():
    """OHEM's `min_kept` is documented per *global* batch (losses docstring)
    — under GSPMD data sharding the selector must see the global pixel pool,
    so the DP-8 train step must reproduce the single-device loss for BOTH
    selector variants (exact lax.top_k and histogram quantile).
    VERDICT r1 weak #8 / next #7."""
    from torch_semantic_segmentation_tpu.losses import ohem_cross_entropy

    images, labels = synthetic_batch(8, 16, 16, num_classes=5, seed=11)
    images, labels = jnp.asarray(images), jnp.asarray(labels)
    mesh = data_parallel_mesh()

    for exact in (True, False):
        def loss_fn(lg, lb, _exact=exact):
            return ohem_cross_entropy(lg, lb, ignore_index=255, thresh=0.7,
                                      min_kept=300, exact=_exact)

        gd_train, _, state, tx = _setup()
        step = make_train_step(gd_train, tx, loss_fn, donate=False)
        ref_state, ref_metrics = step(state, images, labels)

        dp_state = replicate(state, mesh)
        dp_images, dp_labels = shard_batch((images, labels), mesh)
        dp_state, dp_metrics = step(dp_state, dp_images, dp_labels)

        np.testing.assert_allclose(float(dp_metrics["loss"]),
                                   float(ref_metrics["loss"]), rtol=1e-5,
                                   err_msg=f"exact={exact}")
        for a, b in zip(jax.tree.leaves(ref_state.params),
                        jax.tree.leaves(dp_state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4, rtol=1e-2)


def test_sharded_resize_loss_matches_single_device():
    """resize_cross_entropy_loss (the fused lane-major NHCW tail) under a
    data-sharded batch equals the unsharded value — sharded-loss coverage
    from VERDICT r1 next #7."""
    from torch_semantic_segmentation_tpu.losses import (
        resize_cross_entropy_loss)
    from torch_semantic_segmentation_tpu.parallel import batch_sharding

    rng = np.random.default_rng(12)
    logits = jnp.asarray(rng.normal(size=(8, 8, 8, 5)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 5, (8, 16, 16)), jnp.int32)
    labels = labels.at[:, :2, :2].set(255)
    cw = jnp.asarray(rng.uniform(0.5, 2.0, 5), jnp.float32)

    f = jax.jit(lambda lg, lb: resize_cross_entropy_loss(
        lg, lb, ignore_index=255, class_weights=cw))
    want = float(f(logits, labels))

    mesh = data_parallel_mesh()
    sh = batch_sharding(mesh)
    got = float(f(jax.device_put(logits, sh), jax.device_put(labels, sh)))
    np.testing.assert_allclose(got, want, rtol=1e-5)
