"""Checkpoint-compat parity tests (SURVEY.md §4.2): import torch
state_dicts, assert per-pixel logit agreement with a torch-cpu oracle within
fp32 tolerance (the BASELINE.json north_star contract), and round-trip
export→import.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax.numpy as jnp
from flax import nnx

from torch_semantic_segmentation_tpu.compat import (
    export_torch_state_dict, import_torch_state_dict)
from torch_semantic_segmentation_tpu.ops import (
    ConvBNAct, ConvTranspose2d, PReLU, make_conv)

TOL = dict(rtol=1e-5, atol=1e-5)


def _run_jax(model, x_nchw):
    model.eval()
    x = jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))
    y = model(x)
    return np.transpose(np.asarray(y), (0, 3, 1, 2))


def _run_torch(model, x_nchw):
    model.eval()
    with torch.no_grad():
        return model(torch.from_numpy(x_nchw)).numpy()


class TorchStack(tnn.Module):
    """Oracle mirroring a ConvBNAct(PReLU) → dilated ConvBNAct → deconv
    chain with the canonical attribute names the loader expects."""

    def __init__(self):
        super().__init__()
        self.block1 = tnn.Module()
        self.block1.conv = tnn.Conv2d(3, 8, 3, stride=2, padding=1, bias=False)
        self.block1.bn = tnn.BatchNorm2d(8)
        self.block1.act = tnn.PReLU(8)
        self.block2 = tnn.Module()
        self.block2.conv = tnn.Conv2d(8, 8, 3, padding=2, dilation=2,
                                      groups=8, bias=False)
        self.block2.bn = tnn.BatchNorm2d(8)
        self.block2.act = tnn.PReLU(8)
        self.up = tnn.ConvTranspose2d(8, 5, 3, stride=2, padding=1,
                                      output_padding=1)

    def forward(self, x):
        x = self.block1.act(self.block1.bn(self.block1.conv(x)))
        x = self.block2.act(self.block2.bn(self.block2.conv(x)))
        return self.up(x)


class JaxStack(nnx.Module):
    def __init__(self, *, rngs: nnx.Rngs):
        self.block1 = ConvBNAct(3, 8, 3, stride=2, prelu=True, rngs=rngs)
        self.block2 = ConvBNAct(8, 8, 3, dilation=2, groups=8, prelu=True,
                                rngs=rngs)
        self.up = ConvTranspose2d(8, 5, 3, stride=2, padding=1,
                                  output_padding=1, rngs=rngs)

    def __call__(self, x):
        return self.up(self.block2(self.block1(x)))


def _randomize_bn_stats(tmodel):
    """Make running stats non-trivial so eval-mode parity actually tests them."""
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)


def test_stack_logit_parity():
    tmodel = TorchStack()
    _randomize_bn_stats(tmodel)
    jmodel = JaxStack(rngs=nnx.Rngs(0))
    import_torch_state_dict(jmodel, tmodel.state_dict())

    x = np.random.RandomState(0).randn(2, 3, 16, 16).astype(np.float32)
    np.testing.assert_allclose(_run_jax(jmodel, x), _run_torch(tmodel, x), **TOL)


def test_strict_mode_reports_mismatches():
    jmodel = JaxStack(rngs=nnx.Rngs(0))
    sd = TorchStack().state_dict()
    sd.pop("up.bias")
    sd["extra.weight"] = torch.zeros(1)
    with pytest.raises(KeyError):
        import_torch_state_dict(jmodel, sd)
    leftover = import_torch_state_dict(jmodel, sd, strict=False)
    assert leftover == ["extra.weight"]


def test_shape_mismatch_raises():
    jmodel = JaxStack(rngs=nnx.Rngs(0))
    sd = TorchStack().state_dict()
    sd["block1.conv.weight"] = torch.zeros(8, 3, 5, 5)
    with pytest.raises(ValueError, match="shape mismatch"):
        import_torch_state_dict(jmodel, sd)


def test_export_round_trip():
    jmodel = JaxStack(rngs=nnx.Rngs(1))
    sd = export_torch_state_dict(jmodel)
    # export must be loadable by the torch oracle (same keys/shapes) ...
    tmodel = TorchStack()
    tmodel.load_state_dict({k: torch.from_numpy(v.copy()) for k, v in sd.items()},
                           strict=False)
    # ... and produce identical outputs both ways
    x = np.random.RandomState(1).randn(1, 3, 16, 16).astype(np.float32)
    np.testing.assert_allclose(_run_jax(jmodel, x), _run_torch(tmodel, x), **TOL)


class TorchMiniUNet(tnn.Module):
    """Oracle for the UNet up-block path: pool/deconv/concat semantics."""

    def __init__(self):
        super().__init__()
        def double(i, o):
            m = tnn.Module()
            m.conv1 = tnn.Module()
            m.conv1.conv = tnn.Conv2d(i, o, 3, padding=1, bias=False)
            m.conv1.bn = tnn.BatchNorm2d(o)
            m.conv2 = tnn.Module()
            m.conv2.conv = tnn.Conv2d(o, o, 3, padding=1, bias=False)
            m.conv2.bn = tnn.BatchNorm2d(o)
            return m
        self.enc1 = double(3, 4)
        self.enc2 = double(4, 8)
        self.up1 = tnn.Module()
        self.up1.up = tnn.ConvTranspose2d(8, 4, 2, stride=2)
        self.up1.conv = double(8, 4)
        self.head = tnn.Conv2d(4, 5, 1)

    @staticmethod
    def _double(m, x):
        x = tnn.functional.relu(m.conv1.bn(m.conv1.conv(x)))
        return tnn.functional.relu(m.conv2.bn(m.conv2.conv(x)))

    def forward(self, x):
        s1 = self._double(self.enc1, x)
        y = self._double(self.enc2, tnn.functional.max_pool2d(s1, 2))
        y = self.up1.up(y)
        y = self._double(self.up1.conv, torch.cat([y, s1], dim=1))
        return self.head(y)


@pytest.mark.slow
def test_mini_unet_parity():
    from torch_semantic_segmentation_tpu.models.unet import DoubleConv, UpBlock

    class JaxMiniUNet(nnx.Module):
        def __init__(self, *, rngs):
            self.enc1 = DoubleConv(3, 4, rngs=rngs)
            self.enc2 = DoubleConv(4, 8, rngs=rngs)
            self.up1 = UpBlock(8, 4, 4, rngs=rngs)
            self.head = make_conv(4, 5, 1, use_bias=True, rngs=rngs)

        def __call__(self, x):
            from torch_semantic_segmentation_tpu.ops import max_pool2d
            s1 = self.enc1(x)
            y = self.enc2(max_pool2d(s1, 2))
            return self.head(self.up1(y, s1))

    tmodel = TorchMiniUNet()
    _randomize_bn_stats(tmodel)
    jmodel = JaxMiniUNet(rngs=nnx.Rngs(0))
    # UNet concat order is (upsampled, skip) in both implementations
    import_torch_state_dict(jmodel, tmodel.state_dict())
    x = np.random.RandomState(2).randn(1, 3, 16, 16).astype(np.float32)
    np.testing.assert_allclose(_run_jax(jmodel, x), _run_torch(tmodel, x), **TOL)


@pytest.mark.slow
def test_enet_full_model_parity():
    """Whole-model per-pixel logit parity under an imported torch checkpoint
    (the BASELINE.json north_star contract), incl. max-pool index
    forwarding / max-unpool and PReLU semantics."""
    from tests.torch_oracles import TorchENet
    from torch_semantic_segmentation_tpu.models import enet

    torch.manual_seed(0)
    tmodel = TorchENet(num_classes=12)
    _randomize_bn_stats(tmodel)
    jmodel = enet(12)
    import_torch_state_dict(jmodel, tmodel.state_dict())

    x = np.random.RandomState(3).randn(2, 3, 32, 64).astype(np.float32)
    got, want = _run_jax(jmodel, x), _run_torch(tmodel, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_fastscnn_full_model_parity():
    """Flagship-model parity: FastSCNN per-pixel logits under an imported
    torch checkpoint (ds-separable/inverted-residual/PPM/FFM semantics +
    adaptive-pool and bilinear-resize conventions)."""
    from tests.torch_oracles import TorchFastSCNN
    from torch_semantic_segmentation_tpu.models.fastscnn import fastscnn

    torch.manual_seed(1)
    tmodel = TorchFastSCNN(num_classes=9)
    _randomize_bn_stats(tmodel)
    jmodel = fastscnn(9)
    import_torch_state_dict(jmodel, tmodel.state_dict())

    x = np.random.RandomState(4).randn(2, 3, 64, 96).astype(np.float32)
    got, want = _run_jax(jmodel, x), _run_torch(tmodel, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_deeplab_full_model_parity():
    """DeepLabV3-ResNet18 parity: dilated-backbone + multi-grid + ASPP
    (image-level pooling broadcast) + bilinear head."""
    from tests.torch_oracles import TorchDeepLabV3R18
    from torch_semantic_segmentation_tpu.models.deeplab import deeplabv3_resnet18

    torch.manual_seed(2)
    tmodel = TorchDeepLabV3R18(num_classes=7)
    _randomize_bn_stats(tmodel)
    jmodel = deeplabv3_resnet18(7)
    import_torch_state_dict(jmodel, tmodel.state_dict())

    x = np.random.RandomState(5).randn(1, 3, 64, 64).astype(np.float32)
    got, want = _run_jax(jmodel, x), _run_torch(tmodel, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_bisenet_full_model_parity():
    """BiSeNet parity under an imported torch checkpoint: spatial path,
    ResNet-18 context path with ARM global-pool gates, FFM SE attention,
    main + two aux heads, all at full input resolution."""
    from tests.torch_oracles import TorchBiSeNet
    from torch_semantic_segmentation_tpu.models.bisenet import bisenet

    torch.manual_seed(3)
    tmodel = TorchBiSeNet(num_classes=6)
    _randomize_bn_stats(tmodel)
    jmodel = bisenet(6)
    import_torch_state_dict(jmodel, tmodel.state_dict())

    x = np.random.RandomState(6).randn(2, 3, 64, 96).astype(np.float32)
    jmodel.eval()
    tmodel.eval()
    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    got = [np.transpose(np.asarray(y), (0, 3, 1, 2)) for y in jmodel(xj)]
    with torch.no_grad():
        want = [t.numpy() for t in tmodel(torch.from_numpy(x))]
    assert len(got) == len(want) == 3
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_icnet_full_model_parity():
    """ICNet-ResNet50 parity: three-resolution cascade (shared dilated
    bottleneck trunk + PPM), cascade feature fusion, cascade-label-guidance
    aux classifiers. Also the only whole-model BottleneckBlock import test."""
    from tests.torch_oracles import TorchICNet
    from torch_semantic_segmentation_tpu.models.icnet import icnet

    torch.manual_seed(4)
    tmodel = TorchICNet(num_classes=5, depth=50)
    _randomize_bn_stats(tmodel)
    jmodel = icnet(5, depth=50)
    import_torch_state_dict(jmodel, tmodel.state_dict())

    x = np.random.RandomState(7).randn(1, 3, 192, 192).astype(np.float32)
    jmodel.eval()
    tmodel.eval()
    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    got = [np.transpose(np.asarray(y), (0, 3, 1, 2)) for y in jmodel(xj)]
    with torch.no_grad():
        want = [t.numpy() for t in tmodel(torch.from_numpy(x))]
    assert len(got) == len(want) == 3
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_unet_full_model_parity():
    """Full UNet parity (deconv decoder, base_ch=16 to keep CPU time down):
    4-stage encoder/decoder, skip concats, transposed-conv upsampling."""
    from tests.torch_oracles import TorchUNet
    from torch_semantic_segmentation_tpu.models.unet import unet

    torch.manual_seed(5)
    tmodel = TorchUNet(num_classes=4, base_ch=16)
    _randomize_bn_stats(tmodel)
    jmodel = unet(4, base_ch=16)
    import_torch_state_dict(jmodel, tmodel.state_dict())

    x = np.random.RandomState(8).randn(1, 3, 48, 64).astype(np.float32)
    got, want = _run_jax(jmodel, x), _run_torch(tmodel, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_contextnet_full_model_parity():
    """ContextNet (stretch tier) parity: ds-separable detail branch +
    quarter-res MobileNetV2 context trunk (incl. expand_ratio=1 blocks) +
    FFM fusion with equal-width branches."""
    from tests.torch_oracles import TorchContextNet
    from torch_semantic_segmentation_tpu.models.contextnet import contextnet

    torch.manual_seed(6)
    tmodel = TorchContextNet(num_classes=6)
    _randomize_bn_stats(tmodel)
    jmodel = contextnet(6)
    import_torch_state_dict(jmodel, tmodel.state_dict())

    x = np.random.RandomState(9).randn(1, 3, 64, 96).astype(np.float32)
    got, want = _run_jax(jmodel, x), _run_torch(tmodel, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_erfnet_full_model_parity():
    """ERFNet (stretch tier) parity: ENet-style downsamplers and the
    factorized 3×1/1×3 non-bottleneck-1d blocks with dilated second pairs,
    deconv decoder."""
    from tests.torch_oracles import TorchERFNet
    from torch_semantic_segmentation_tpu.models.erfnet import erfnet

    torch.manual_seed(7)
    tmodel = TorchERFNet(num_classes=5)
    _randomize_bn_stats(tmodel)
    jmodel = erfnet(5)
    import_torch_state_dict(jmodel, tmodel.state_dict())

    x = np.random.RandomState(10).randn(1, 3, 64, 64).astype(np.float32)
    got, want = _run_jax(jmodel, x), _run_torch(tmodel, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_lednet_full_model_parity():
    """LEDNet (stretch tier) parity: split-shuffle non-bottleneck encoder
    (channel split/shuffle, transposed right-branch conv order) + attention
    pyramid decoder with global-pool context branch."""
    from tests.torch_oracles import TorchLEDNet
    from torch_semantic_segmentation_tpu.models.lednet import lednet

    torch.manual_seed(8)
    tmodel = TorchLEDNet(num_classes=6)
    _randomize_bn_stats(tmodel)
    jmodel = lednet(6)
    import_torch_state_dict(jmodel, tmodel.state_dict())

    x = np.random.RandomState(11).randn(1, 3, 64, 64).astype(np.float32)
    got, want = _run_jax(jmodel, x), _run_torch(tmodel, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_esnet_full_model_parity():
    """ESNet (stretch tier) parity: factorized conv units (K=3/5) and
    parallel dilated FCUs with a shared stem, deconv decoder."""
    from tests.torch_oracles import TorchESNet
    from torch_semantic_segmentation_tpu.models.esnet import esnet

    torch.manual_seed(9)
    tmodel = TorchESNet(num_classes=5)
    _randomize_bn_stats(tmodel)
    jmodel = esnet(5)
    import_torch_state_dict(jmodel, tmodel.state_dict())

    x = np.random.RandomState(12).randn(1, 3, 64, 64).astype(np.float32)
    got, want = _run_jax(jmodel, x), _run_torch(tmodel, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_deeplab_r101_os8_aux_parity():
    """DeepLabV3-ResNet101 at output-stride 8 with the FCN aux head — the
    reference's classic heavy config: 23-block dilated stage 3, multi-grid
    stage 4 at rate 4·(1,2,4), doubled ASPP rates (12,24,36)."""
    from tests.torch_oracles import TorchDeepLabV3
    from torch_semantic_segmentation_tpu.models.deeplab import (
        deeplabv3_resnet101)

    torch.manual_seed(10)
    tmodel = TorchDeepLabV3(num_classes=4, depth=101, output_stride=8,
                            aux=True)
    _randomize_bn_stats(tmodel)
    jmodel = deeplabv3_resnet101(4, output_stride=8, aux=True)
    import_torch_state_dict(jmodel, tmodel.state_dict())

    x = np.random.RandomState(13).randn(1, 3, 64, 64).astype(np.float32)
    jmodel.eval()
    tmodel.eval()
    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    got = [np.transpose(np.asarray(y), (0, 3, 1, 2)) for y in jmodel(xj)]
    with torch.no_grad():
        want = [t.numpy() for t in tmodel(torch.from_numpy(x))]
    assert len(got) == len(want) == 2
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# Key-name robustness (compat.key_maps; VERDICT r1 next #6): the public
# repo's actual state_dict key strings are unverifiable (reference mount
# empty), so the import path must survive ARBITRARY renames that preserve
# torch registration order. These fuzz the renaming adversarially.
# ---------------------------------------------------------------------------


class TestKeyMaps:
    def _parity(self, jmodel, tmodel):
        x = np.random.RandomState(7).randn(1, 3, 16, 16).astype(np.float32)
        np.testing.assert_allclose(_run_jax(jmodel, x),
                                   _run_torch(tmodel, x), **TOL)

    def test_auto_map_opaque_rename(self):
        """Every key renamed to an opaque token — only order+shape survive."""
        from torch_semantic_segmentation_tpu.compat.key_maps import (
            load_with_auto_map)

        tmodel = TorchStack()
        _randomize_bn_stats(tmodel)
        sd = {f"layer_{i:03d}.t": v
              for i, (k, v) in enumerate(tmodel.state_dict().items())}
        jmodel = JaxStack(rngs=nnx.Rngs(0))
        leftover = load_with_auto_map(jmodel, sd)
        assert leftover == []
        self._parity(jmodel, tmodel)

    def test_auto_map_sequential_integer_paths(self):
        """nn.Sequential-style integer paths (features.0.weight, ...)."""
        from torch_semantic_segmentation_tpu.compat.key_maps import (
            load_with_auto_map)

        tmodel = TorchStack()
        _randomize_bn_stats(tmodel)
        renamed = {}
        for k, v in tmodel.state_dict().items():
            parts = k.split(".")
            blk = {"block1": "0", "block2": "1", "up": "2"}[parts[0]]
            sub = {"conv": "0", "bn": "1", "act": "2"}.get(parts[1], None)
            mid = [blk] if sub is None else [blk, sub]
            renamed["features." + ".".join(mid + [parts[-1]])] = v
        jmodel = JaxStack(rngs=nnx.Rngs(0))
        load_with_auto_map(jmodel, renamed)
        self._parity(jmodel, tmodel)

    def test_auto_map_ddp_prefix(self):
        from torch_semantic_segmentation_tpu.compat.key_maps import (
            load_with_auto_map)

        tmodel = TorchStack()
        sd = {"module." + k: v for k, v in tmodel.state_dict().items()}
        jmodel = JaxStack(rngs=nnx.Rngs(0))
        load_with_auto_map(jmodel, sd)
        self._parity(jmodel, tmodel)

    def test_auto_map_rejects_wrong_architecture(self):
        from torch_semantic_segmentation_tpu.compat.key_maps import (
            auto_key_map)

        jmodel = JaxStack(rngs=nnx.Rngs(0))
        sd = dict(TorchStack().state_dict())
        sd.pop("up.bias")
        with pytest.raises(ValueError, match="count mismatch"):
            auto_key_map(jmodel, sd)
        sd = dict(TorchStack().state_dict())
        sd["block1.conv.weight"] = torch.zeros(8, 3, 5, 5)
        with pytest.raises(ValueError, match="shape mismatch at position"):
            auto_key_map(jmodel, sd)

    def test_auto_map_warns_on_order_divergence_same_shapes(self):
        """VERDICT r2 weak #6: same-shape tensors in a diverged order zip
        cleanly — auto_key_map must at least warn when the checkpoint uses
        the model's own key names at different positions."""
        import warnings

        from torch_semantic_segmentation_tpu.compat.key_maps import (
            auto_key_map)

        jmodel = JaxStack(rngs=nnx.Rngs(0))
        sd = dict(TorchStack().state_dict())
        # swap two same-shape BN params (scale/bias within one BN): order
        # diverges, shapes still zip
        items = list(sd.items())
        keys = [k for k, _ in items]
        i = keys.index("block1.bn.weight")
        j = keys.index("block1.bn.bias")
        items[i], items[j] = items[j], items[i]
        with pytest.warns(UserWarning, match="different position"):
            auto_key_map(jmodel, dict(items))
        # clean order: silent
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            auto_key_map(jmodel, sd)

    def test_alias_key_map_segments_and_prefixes(self):
        """Declarative table: checkpoint names blocks stage1/stage2/deconv."""
        from torch_semantic_segmentation_tpu.compat.key_maps import (
            alias_key_map)

        tmodel = TorchStack()
        _randomize_bn_stats(tmodel)
        ren = {"block1": "stage1", "block2": "stage2", "up": "deconv"}
        sd = {".".join(ren.get(s, s) for s in k.split(".")): v
              for k, v in tmodel.state_dict().items()}
        jmodel = JaxStack(rngs=nnx.Rngs(0))
        import_torch_state_dict(jmodel, sd, key_map=alias_key_map(ren))
        self._parity(jmodel, tmodel)

    def test_get_model_pretrained_path_and_dir(self, tmp_path):
        """get_model(name, pretrained=...) mirrors the reference's
        pretrained= constructor ergonomics (SURVEY.md §3.2)."""
        from torch_semantic_segmentation_tpu.models import get_model

        src = get_model("enet", num_classes=5, rngs=nnx.Rngs(3))
        sd = export_torch_state_dict(src)
        torch.save({k: torch.from_numpy(v.copy()) for k, v in sd.items()},
                   tmp_path / "enet.pth")

        for target in (tmp_path / "enet.pth", tmp_path):  # file, then dir
            dst = get_model("enet", num_classes=5, pretrained=str(target),
                            rngs=nnx.Rngs(4))
            src.eval(), dst.eval()
            x = jnp.asarray(
                np.random.RandomState(5).randn(1, 32, 32, 3), jnp.float32)
            np.testing.assert_allclose(np.asarray(dst(x)),
                                       np.asarray(src(x)), **TOL)
