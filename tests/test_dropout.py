"""ops.dropout — the hardware-RNG (rbg) dropout fast path.

Reference semantics: torch.nn.Dropout / Dropout2d as used by the
reference models (SURVEY.md §2.1); nnx.Dropout is the behavioral
baseline, the fast path must preserve its contract: eval-mode
identity, unbiased rescale, per-call mask refresh, broadcast_dims.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from torch_semantic_segmentation_tpu.ops import dropout as hw_dropout


@pytest.fixture
def force_on(monkeypatch):
    monkeypatch.setenv("TPU_SEG_RBG_DROPOUT", "1")
    monkeypatch.setattr(hw_dropout, "_MIN_MASK_ELEMENTS", 1)


def test_quantized_threshold_picks_width():
    d8, t8, k8 = hw_dropout._quantized_threshold(0.9)
    assert d8 == jnp.uint8 and t8 == 230
    # small rates need the fine grid: 0.01 at u8 would realize 0.0117
    d16, t16, k16 = hw_dropout._quantized_threshold(0.99)
    assert d16 == jnp.uint16
    assert abs((1 - t16 / 65536) - 0.01) <= 0.02 * 0.01
    for rate in (0.01, 0.03, 0.1, 0.2, 0.3, 0.5):
        _, _, keep = hw_dropout._quantized_threshold(1 - rate)
        assert abs((1 - keep) - rate) <= 0.02 * rate


def test_eval_mode_identity(force_on):
    d = hw_dropout.Dropout(rate=0.5, rngs=nnx.Rngs(0))
    d.eval()
    x = jnp.arange(12.0).reshape(3, 4)
    np.testing.assert_array_equal(np.asarray(d(x)), np.asarray(x))


def test_mask_statistics_and_unbiasedness(force_on):
    d = hw_dropout.Dropout(rate=0.1, rngs=nnx.Rngs(0))
    d.train()
    x = jnp.ones((64, 64, 64), jnp.float32)
    y = np.asarray(d(x))
    kept = y > 0
    realized_keep = 230 / 256
    assert abs(kept.mean() - realized_keep) < 3e-3
    # surviving values rescaled by 1/realized_keep -> exact zero bias
    np.testing.assert_allclose(y[kept], 1.0 / realized_keep, rtol=1e-6)
    assert abs(y.mean() - 1.0) < 5e-3


def test_same_seed_same_sequence_distinct_calls(force_on):
    def seq(seed):
        d = hw_dropout.Dropout(rate=0.5, rngs=nnx.Rngs(seed))
        d.train()
        x = jnp.ones((4, 128, 128), jnp.float32)
        return [np.asarray(d(x)) for _ in range(2)]

    a1, a2 = seq(7)
    b1, b2 = seq(7)
    c1, _ = seq(8)
    np.testing.assert_array_equal(a1, b1)   # reproducible
    np.testing.assert_array_equal(a2, b2)
    assert (a1 != a2).any()                 # stream advances per call
    assert (a1 != c1).any()                 # seed separation


def test_broadcast_dims_share_mask(force_on):
    d = hw_dropout.Dropout(rate=0.5, broadcast_dims=(1, 2), rngs=nnx.Rngs(0))
    d.train()
    x = jnp.ones((8, 16, 16, 512), jnp.float32)
    y = np.asarray(d(x))
    # whole feature maps dropped or kept together (torch Dropout2d)
    per_map = y.reshape(8, -1, 512)
    assert ((per_map == per_map[:, :1, :]).all())


def test_gradient_is_mask_times_scale(force_on):
    d = hw_dropout.Dropout(rate=0.1, rngs=nnx.Rngs(3))
    d.train()
    x = jnp.ones((64, 64, 32), jnp.float32)
    key = jax.random.key(3)  # explicit key: same mask across calls

    g = jax.grad(lambda x: jnp.sum(d(x, rngs=key)))(x)
    y = d(x, rngs=key)  # x is all-ones, so y IS mask*scale
    np.testing.assert_allclose(np.asarray(g), np.asarray(y), rtol=1e-6)


def test_kill_switch_restores_threefry(monkeypatch):
    monkeypatch.setenv("TPU_SEG_RBG_DROPOUT", "0")
    d = hw_dropout.Dropout(rate=0.1, rngs=nnx.Rngs(0))
    d.train()
    x = jnp.ones((4, 64, 64, 32), jnp.float32)
    ref = nnx.Dropout(rate=0.1, rngs=nnx.Rngs(0))
    ref.train()
    np.testing.assert_array_equal(np.asarray(d(x)), np.asarray(ref(x)))


def test_small_masks_stay_on_parent_path(monkeypatch):
    monkeypatch.setenv("TPU_SEG_RBG_DROPOUT", "1")
    # ENet-style spatial dropout: mask is (N,1,1,C), far below the floor
    d = hw_dropout.Dropout(rate=0.1, broadcast_dims=(1, 2), rngs=nnx.Rngs(0))
    d.train()
    x = jnp.ones((2, 32, 32, 16), jnp.float32)
    ref = nnx.Dropout(rate=0.1, broadcast_dims=(1, 2), rngs=nnx.Rngs(0))
    ref.train()
    np.testing.assert_array_equal(np.asarray(d(x)), np.asarray(ref(x)))


def test_sharded_mask_not_replicated(monkeypatch):
    """GSPMD partitioning of RngBitGenerator must give each data shard
    DIFFERENT bits — replicated per-shard masks would silently repeat
    the same dropout pattern across the global batch (correlated
    regularization). Pinned on the 8-device CPU mesh."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    monkeypatch.setenv("TPU_SEG_RBG_DROPOUT", "1")
    monkeypatch.setattr(hw_dropout, "_MIN_MASK_ELEMENTS", 1)
    mesh = Mesh(np.array(jax.devices("cpu")[:8]).reshape(8), ("data",))
    sh = NamedSharding(mesh, P("data"))

    def mask(key):
        return hw_dropout._hw_mask(key, (16, 64, 128), jnp.uint8, 230)

    out = jax.jit(mask, out_shardings=sh)(jax.random.key(0))
    shards = np.asarray(out).reshape(8, 2, 64, 128)
    assert len({shards[i].tobytes() for i in range(8)}) == 8
