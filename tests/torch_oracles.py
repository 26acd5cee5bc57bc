"""Torch-cpu oracle implementations for whole-model parity tests.

These are independent PyTorch implementations written from the papers
(NOT copied from the reference repo — /root/reference is empty, SURVEY.md
provenance notice), with module attribute names mirroring the TPU-native
models so `compat.import_torch_state_dict` maps keys 1:1. They serve as the
per-pixel-logit oracle the BASELINE.json north_star demands.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


class TConvBNAct(nn.Module):
    """Mirror of ops.ConvBNAct: conv → bn → (PReLU | named act | none)."""

    def __init__(self, in_ch, out_ch, k=3, *, stride=1, padding=None,
                 dilation=1, groups=1, act="relu", use_bias=False,
                 prelu=False):
        super().__init__()
        kh = k if isinstance(k, int) else k[0]
        kw = k if isinstance(k, int) else k[1]
        if padding is None:
            padding = (dilation * (kh - 1) // 2, dilation * (kw - 1) // 2)
        self.conv = nn.Conv2d(in_ch, out_ch, k, stride=stride, padding=padding,
                              dilation=dilation, groups=groups, bias=use_bias)
        self.bn = nn.BatchNorm2d(out_ch)
        if prelu:
            self.act = nn.PReLU(out_ch)
            self._act_name = None
        else:
            self.act = None
            self._act_name = act

    def forward(self, x):
        y = self.bn(self.conv(x))
        if self.act is not None:
            return self.act(y)
        if self._act_name == "relu":
            return F.relu(y)
        return y


class TInitialBlock(nn.Module):
    def __init__(self, in_ch=3, out_ch=16):
        super().__init__()
        self.conv = nn.Conv2d(in_ch, out_ch - in_ch, 3, stride=2, padding=1,
                              bias=False)
        self.bn = nn.BatchNorm2d(out_ch)
        self.act = nn.PReLU(out_ch)

    def forward(self, x):
        y = torch.cat([self.conv(x), F.max_pool2d(x, 2)], dim=1)
        return self.act(self.bn(y))


class TBottleneck(nn.Module):
    """Mirror of models.enet.Bottleneck (Paszke 2016)."""

    def __init__(self, in_ch, out_ch, *, kind="regular", dilation=1,
                 dropout=0.1, projection_ratio=4):
        super().__init__()
        self.kind = kind
        self.in_ch, self.out_ch = in_ch, out_ch
        mid = in_ch // projection_ratio

        if kind == "down":
            self.proj = TConvBNAct(in_ch, mid, 2, stride=2, padding=0, prelu=True)
        else:
            self.proj = TConvBNAct(in_ch, mid, 1, prelu=True)

        if kind == "asymmetric":
            self.mid_a = TConvBNAct(mid, mid, (5, 1), padding=(2, 0), prelu=True)
            self.mid_b = TConvBNAct(mid, mid, (1, 5), padding=(0, 2), prelu=True)
        elif kind == "up":
            self.mid_deconv = nn.ConvTranspose2d(mid, mid, 3, stride=2,
                                                 padding=1, output_padding=1,
                                                 bias=False)
            self.mid_bn = nn.BatchNorm2d(mid)
            self.mid_act = nn.PReLU(mid)
        else:
            self.mid = TConvBNAct(mid, mid, 3, dilation=dilation, prelu=True)

        self.expand = TConvBNAct(mid, out_ch, 1, act=None)
        self.dropout = nn.Dropout2d(dropout)
        if kind == "up":
            self.skip_conv = TConvBNAct(in_ch, out_ch, 1, act=None)
        self.out_act = nn.PReLU(out_ch)

    def forward(self, x, indices=None):
        y = self.proj(x)
        if self.kind == "asymmetric":
            y = self.mid_b(self.mid_a(y))
        elif self.kind == "up":
            y = self.mid_act(self.mid_bn(self.mid_deconv(y)))
        else:
            y = self.mid(y)
        y = self.dropout(self.expand(y))

        if self.kind == "down":
            skip, idx = F.max_pool2d(x, 2, return_indices=True)
            if self.out_ch > self.in_ch:
                pad = self.out_ch - self.in_ch
                skip = F.pad(skip, (0, 0, 0, 0, 0, pad))
            return self.out_act(y + skip), idx
        elif self.kind == "up":
            skip = F.max_unpool2d(self.skip_conv(x), indices,
                                  kernel_size=2, stride=2)
            return self.out_act(y + skip)
        return self.out_act(y + x)


class TorchENet(nn.Module):
    """ENet oracle (Paszke 2016), attribute-parallel to models.enet.ENet."""

    def __init__(self, num_classes=19, in_ch=3):
        super().__init__()
        self.initial = TInitialBlock(in_ch, 16)
        self.down1 = TBottleneck(16, 64, kind="down", dropout=0.01)
        self.stage1 = nn.ModuleList(
            [TBottleneck(64, 64, dropout=0.01) for _ in range(4)])
        self.down2 = TBottleneck(64, 128, kind="down")

        def s2():
            return nn.ModuleList([
                TBottleneck(128, 128),
                TBottleneck(128, 128, kind="dilated", dilation=2),
                TBottleneck(128, 128, kind="asymmetric"),
                TBottleneck(128, 128, kind="dilated", dilation=4),
                TBottleneck(128, 128),
                TBottleneck(128, 128, kind="dilated", dilation=8),
                TBottleneck(128, 128, kind="asymmetric"),
                TBottleneck(128, 128, kind="dilated", dilation=16),
            ])

        self.stage2 = s2()
        self.stage3 = s2()
        self.up4 = TBottleneck(128, 64, kind="up")
        self.stage4 = nn.ModuleList([TBottleneck(64, 64) for _ in range(2)])
        self.up5 = TBottleneck(64, 16, kind="up")
        self.stage5 = nn.ModuleList([TBottleneck(16, 16)])
        self.fullconv = nn.ConvTranspose2d(16, num_classes, 3, stride=2,
                                           padding=1, output_padding=1)

    def forward(self, x):
        x = self.initial(x)
        x, idx1 = self.down1(x)
        for b in self.stage1:
            x = b(x)
        x, idx2 = self.down2(x)
        for b in self.stage2:
            x = b(x)
        for b in self.stage3:
            x = b(x)
        x = self.up4(x, idx2)
        for b in self.stage4:
            x = b(x)
        x = self.up5(x, idx1)
        for b in self.stage5:
            x = b(x)
        return self.fullconv(x)


# ---------------- FastSCNN oracle (Poudel 2019) ----------------

class TSeparableConv(nn.Module):
    """Mirror of ops.SeparableConv: dw ConvBNAct + pw ConvBNAct."""

    def __init__(self, in_ch, out_ch, k=3, *, stride=1, dilation=1):
        super().__init__()
        self.dw = TConvBNAct(in_ch, in_ch, k, stride=stride,
                             dilation=dilation, groups=in_ch)
        self.pw = TConvBNAct(in_ch, out_ch, 1)

    def forward(self, x):
        return self.pw(self.dw(x))


class TInvertedResidual(nn.Module):
    def __init__(self, in_ch, out_ch, *, stride=1, expand_ratio=6):
        super().__init__()
        hidden = in_ch * expand_ratio
        self.use_res = stride == 1 and in_ch == out_ch
        self.expand = TConvBNAct(in_ch, hidden, 1)
        self.dw = TConvBNAct(hidden, hidden, 3, stride=stride, groups=hidden)
        self.project = TConvBNAct(hidden, out_ch, 1, act=None)

    def forward(self, x):
        y = self.project(self.dw(self.expand(x)))
        return x + y if self.use_res else y


class TPyramidPooling(nn.Module):
    def __init__(self, in_ch, out_ch, bins=(1, 2, 3, 6)):
        super().__init__()
        self.bins = bins
        branch_ch = in_ch // len(bins)
        self.branches = nn.ModuleList(
            [TConvBNAct(in_ch, branch_ch, 1) for _ in bins])
        self.fuse = TConvBNAct(in_ch + branch_ch * len(bins), out_ch, 1)

    def forward(self, x):
        h, w = x.shape[2], x.shape[3]
        feats = [x]
        for b, conv in zip(self.bins, self.branches):
            y = conv(F.adaptive_avg_pool2d(x, b))
            feats.append(F.interpolate(y, (h, w), mode="bilinear",
                                       align_corners=False))
        return self.fuse(torch.cat(feats, dim=1))


class TLearningToDownsample(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv = TConvBNAct(3, 32, 3, stride=2)
        self.ds1 = TSeparableConv(32, 48, stride=2)
        self.ds2 = TSeparableConv(48, 64, stride=2)

    def forward(self, x):
        return self.ds2(self.ds1(self.conv(x)))


class TGlobalFeatureExtractor(nn.Module):
    def __init__(self):
        super().__init__()
        def stage(cin, cout, n, s):
            mods = [TInvertedResidual(cin, cout, stride=s)]
            mods += [TInvertedResidual(cout, cout) for _ in range(n - 1)]
            return nn.ModuleList(mods)
        self.stage1 = stage(64, 64, 3, 2)
        self.stage2 = stage(64, 96, 3, 2)
        self.stage3 = stage(96, 128, 3, 1)
        self.ppm = TPyramidPooling(128, 128)

    def forward(self, x):
        for st in (self.stage1, self.stage2, self.stage3):
            for blk in st:
                x = blk(x)
        return self.ppm(x)


class TFeatureFusion(nn.Module):
    """Mirror of models.fastscnn.FeatureFusion (also used by ContextNet)."""

    def __init__(self, high_ch=64, low_ch=128, out_ch=128, scale=4):
        super().__init__()
        self.scale = scale
        self.dwconv = TConvBNAct(low_ch, out_ch, 3, dilation=scale,
                                 groups=low_ch if low_ch == out_ch else 1)
        self.low_proj = TConvBNAct(out_ch, out_ch, 1, act=None, use_bias=True)
        self.high_proj = TConvBNAct(high_ch, out_ch, 1, act=None, use_bias=True)

    def forward(self, high, low):
        low = F.interpolate(low, high.shape[2:], mode="bilinear",
                            align_corners=False)
        return F.relu(self.low_proj(self.dwconv(low)) + self.high_proj(high))


class TClassifier(nn.Module):
    def __init__(self, num_classes):
        super().__init__()
        self.ds1 = TSeparableConv(128, 128)
        self.ds2 = TSeparableConv(128, 128)
        self.dropout = nn.Dropout(0.1)
        self.conv = nn.Conv2d(128, num_classes, 1)

    def forward(self, x):
        return self.conv(self.dropout(self.ds2(self.ds1(x))))


class TorchFastSCNN(nn.Module):
    """FastSCNN oracle, attribute-parallel to models.fastscnn.FastSCNN."""

    def __init__(self, num_classes=19):
        super().__init__()
        self.lds = TLearningToDownsample()
        self.gfe = TGlobalFeatureExtractor()
        self.ffm = TFeatureFusion()
        self.classifier = TClassifier(num_classes)

    def forward(self, x):
        hi = self.lds(x)
        lo = self.gfe(hi)
        y = self.classifier(self.ffm(hi, lo))
        return F.interpolate(y, x.shape[2:], mode="bilinear",
                             align_corners=False)


# ---------------- DeepLabV3 oracle (Chen 2017) ----------------

class TBasicBlock(nn.Module):
    def __init__(self, in_ch, ch, *, stride=1, dilation=1):
        super().__init__()
        self.conv1 = TConvBNAct(in_ch, ch, 3, stride=stride, dilation=dilation)
        self.conv2 = TConvBNAct(ch, ch, 3, dilation=dilation, act=None)
        self.down = (TConvBNAct(in_ch, ch, 1, stride=stride, act=None,
                                padding=0)
                     if stride != 1 or in_ch != ch else None)

    def forward(self, x):
        y = self.conv2(self.conv1(x))
        skip = self.down(x) if self.down is not None else x
        return F.relu(y + skip)


class TBottleneckBlock(nn.Module):
    """Mirror of models.resnet.BottleneckBlock (1×1 → 3×3 → 1×1 ×4)."""

    expansion = 4

    def __init__(self, in_ch, ch, *, stride=1, dilation=1):
        super().__init__()
        out_ch = ch * self.expansion
        self.conv1 = TConvBNAct(in_ch, ch, 1)
        self.conv2 = TConvBNAct(ch, ch, 3, stride=stride, dilation=dilation)
        self.conv3 = TConvBNAct(ch, out_ch, 1, act=None)
        self.down = (TConvBNAct(in_ch, out_ch, 1, stride=stride, act=None,
                                padding=0)
                     if stride != 1 or in_ch != out_ch else None)

    def forward(self, x):
        y = self.conv3(self.conv2(self.conv1(x)))
        skip = self.down(x) if self.down is not None else x
        return F.relu(y + skip)


_T_LAYOUTS = {
    18: (TBasicBlock, 1, (2, 2, 2, 2)),
    34: (TBasicBlock, 1, (3, 4, 6, 3)),
    50: (TBottleneckBlock, 4, (3, 4, 6, 3)),
    101: (TBottleneckBlock, 4, (3, 4, 23, 3)),
}


class TResNet(nn.Module):
    """Dilated ResNet (18/34/50/101), attribute-parallel to
    models.resnet.ResNet (BasicBlock and BottleneckBlock layouts)."""

    def __init__(self, depth=18, output_stride=16, multi_grid=(1, 2, 4)):
        super().__init__()
        block, expansion, counts = _T_LAYOUTS[depth]
        self.stem = TConvBNAct(3, 64, 7, stride=2, padding=3)
        if output_stride == 8:
            strides, dils = (1, 2, 1, 1), (1, 1, 2, 4)
        elif output_stride == 16:
            strides, dils = (1, 2, 2, 1), (1, 1, 1, 2)
        else:
            strides, dils = (1, 2, 2, 2), (1, 1, 1, 1)
        chans = (64, 128, 256, 512)
        in_c = 64
        stages = []
        for si, (ch, n, st, dl) in enumerate(zip(chans, counts, strides, dils)):
            blocks = []
            for bi in range(n):
                mg = multi_grid[min(bi, len(multi_grid) - 1)] \
                    if (si == 3 and dl > 1) else 1
                blocks.append(block(in_c, ch,
                                    stride=st if bi == 0 else 1,
                                    dilation=dl * mg))
                in_c = ch * expansion
            stages.append(nn.ModuleList(blocks))
        self.stage1, self.stage2, self.stage3, self.stage4 = stages
        self.out_channels = in_c
        self.stage_channels = tuple(c * expansion for c in chans)

    def forward(self, x):
        x = self.stem(x)
        x = F.max_pool2d(x, 3, stride=2, padding=1)
        feats = []
        for stage in (self.stage1, self.stage2, self.stage3, self.stage4):
            for blk in stage:
                x = blk(x)
            feats.append(x)
        return feats


class TResNet18(TResNet):
    def __init__(self, output_stride=16, multi_grid=(1, 2, 4)):
        super().__init__(18, output_stride, multi_grid)


class TASPP(nn.Module):
    def __init__(self, in_ch, out_ch=256, rates=(6, 12, 18)):
        super().__init__()
        self.conv1 = TConvBNAct(in_ch, out_ch, 1)
        self.atrous = nn.ModuleList(
            [TConvBNAct(in_ch, out_ch, 3, dilation=r) for r in rates])
        self.image_pool = TConvBNAct(in_ch, out_ch, 1)
        self.project = TConvBNAct(out_ch * (2 + len(rates)), out_ch, 1)

    def forward(self, x):
        n, c, h, w = x.shape
        feats = [self.conv1(x)] + [conv(x) for conv in self.atrous]
        gp = self.image_pool(x.mean(dim=(2, 3), keepdim=True))
        feats.append(gp.expand(n, gp.shape[1], h, w))
        return self.project(torch.cat(feats, dim=1))


class TorchDeepLabV3R18(nn.Module):
    """DeepLabV3+ResNet18 oracle, attribute-parallel to models.deeplab."""

    def __init__(self, num_classes=19, output_stride=16):
        super().__init__()
        self.backbone = TResNet18(output_stride)
        rates = (12, 24, 36) if output_stride == 8 else (6, 12, 18)
        self.aspp = TASPP(512, 256, rates)
        self.dropout = nn.Dropout(0.1)
        self.classifier = nn.Conv2d(256, num_classes, 1)

    def forward(self, x):
        feats = self.backbone(x)
        y = self.classifier(self.dropout(self.aspp(feats[-1])))
        return F.interpolate(y, x.shape[2:], mode="bilinear",
                             align_corners=False)


# ---------------- BiSeNet oracle (Yu 2018) ----------------

class TAttentionRefinement(nn.Module):
    """Mirror of models.bisenet.AttentionRefinement."""

    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.conv = TConvBNAct(in_ch, out_ch, 3)
        self.gate_conv = nn.Conv2d(out_ch, out_ch, 1, bias=False)
        self.gate_bn = nn.BatchNorm2d(out_ch)

    def forward(self, x):
        x = self.conv(x)
        g = self.gate_bn(self.gate_conv(x.mean(dim=(2, 3), keepdim=True)))
        return x * torch.sigmoid(g)


class TSpatialPath(nn.Module):
    def __init__(self, in_ch=3, out_ch=128):
        super().__init__()
        self.conv1 = TConvBNAct(in_ch, 64, 7, stride=2, padding=3)
        self.conv2 = TConvBNAct(64, 64, 3, stride=2)
        self.conv3 = TConvBNAct(64, 64, 3, stride=2)
        self.conv4 = TConvBNAct(64, out_ch, 1)

    def forward(self, x):
        return self.conv4(self.conv3(self.conv2(self.conv1(x))))


class TContextPath(nn.Module):
    def __init__(self, depth=18, out_ch=128):
        super().__init__()
        self.backbone = TResNet(depth, output_stride=32)
        _, _, c16, c32 = self.backbone.stage_channels
        self.tail = TConvBNAct(c32, out_ch, 1)
        self.arm32 = TAttentionRefinement(c32, out_ch)
        self.refine32 = TConvBNAct(out_ch, out_ch, 3)
        self.arm16 = TAttentionRefinement(c16, out_ch)
        self.refine16 = TConvBNAct(out_ch, out_ch, 3)

    def forward(self, x):
        _, _, f16, f32 = self.backbone(x)
        tail = self.tail(f32.mean(dim=(2, 3), keepdim=True))
        y32 = self.arm32(f32) + tail
        y32 = self.refine32(F.interpolate(y32, f16.shape[2:], mode="bilinear",
                                          align_corners=False))
        y16 = self.arm16(f16) + y32
        y16 = self.refine16(F.interpolate(
            y16, (f16.shape[2] * 2, f16.shape[3] * 2), mode="bilinear",
            align_corners=False))
        return y16, y32


class TFeatureFusionModule(nn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.conv = TConvBNAct(in_ch, out_ch, 1)
        self.se1 = nn.Conv2d(out_ch, out_ch // 4, 1)
        self.se2 = nn.Conv2d(out_ch // 4, out_ch, 1)

    def forward(self, sp, cp):
        x = self.conv(torch.cat([sp, cp], dim=1))
        g = x.mean(dim=(2, 3), keepdim=True)
        g = torch.sigmoid(self.se2(F.relu(self.se1(g))))
        return x + x * g


class TBiSeNetHead(nn.Module):
    def __init__(self, in_ch, mid_ch, num_classes):
        super().__init__()
        self.conv = TConvBNAct(in_ch, mid_ch, 3)
        self.cls = nn.Conv2d(mid_ch, num_classes, 1)

    def forward(self, x):
        return self.cls(self.conv(x))


class TorchBiSeNet(nn.Module):
    """BiSeNet oracle, attribute-parallel to models.bisenet.BiSeNet
    (aux=True, upsample_logits=True)."""

    def __init__(self, num_classes=19, depth=18):
        super().__init__()
        ch = 128
        self.spatial = TSpatialPath(3, ch)
        self.context = TContextPath(depth, ch)
        self.ffm = TFeatureFusionModule(ch * 2, ch * 2)
        self.head = TBiSeNetHead(ch * 2, ch * 2, num_classes)
        self.aux_head16 = TBiSeNetHead(ch, 64, num_classes)
        self.aux_head32 = TBiSeNetHead(ch, 64, num_classes)

    def forward(self, x):
        size = x.shape[2:]
        def up(y):
            return F.interpolate(y, size, mode="bilinear", align_corners=False)
        sp = self.spatial(x)
        cp8, cp16 = self.context(x)
        y = up(self.head(self.ffm(sp, cp8)))
        return y, up(self.aux_head16(cp8)), up(self.aux_head32(cp16))


# ---------------- ICNet oracle (Zhao 2018) ----------------

class TCascadeFeatureFusion(nn.Module):
    """Mirror of models.icnet.CascadeFeatureFusion."""

    def __init__(self, low_ch, high_ch, out_ch):
        super().__init__()
        self.low_conv = TConvBNAct(low_ch, out_ch, 3, dilation=2, act=None)
        self.high_conv = TConvBNAct(high_ch, out_ch, 1, act=None)

    def forward(self, low, high):
        low_up = F.interpolate(low, high.shape[2:], mode="bilinear",
                               align_corners=False)
        fused = F.relu(self.low_conv(low_up) + self.high_conv(high))
        return fused, low_up


class TorchICNet(nn.Module):
    """ICNet oracle, attribute-parallel to models.icnet.ICNet
    (aux=True, upsample_logits=True; aux logits stay at their grids)."""

    def __init__(self, num_classes=19, depth=50):
        super().__init__()
        self.sub1 = nn.ModuleList([
            TConvBNAct(3, 32, 3, stride=2),
            TConvBNAct(32, 32, 3, stride=2),
            TConvBNAct(32, 64, 3, stride=2),
        ])
        self.backbone = TResNet(depth, output_stride=8)
        c2_ch = self.backbone.stage_channels[1]
        self.ppm = TPyramidPooling(self.backbone.out_channels, 256)
        self.cff24 = TCascadeFeatureFusion(256, c2_ch, 128)
        self.cff12 = TCascadeFeatureFusion(128, 64, 128)
        self.classifier = nn.Conv2d(128, num_classes, 1)
        self.aux_cls2 = nn.Conv2d(256, num_classes, 1)
        self.aux_cls1 = nn.Conv2d(128, num_classes, 1)

    def forward(self, x):
        h, w = x.shape[2:]
        def interp(y, size):
            return F.interpolate(y, size, mode="bilinear", align_corners=False)
        bb = self.backbone

        f1 = x
        for blk in self.sub1:
            f1 = blk(f1)

        x2 = interp(x, (h // 2, w // 2))
        f2 = F.max_pool2d(bb.stem(x2), 3, stride=2, padding=1)
        for blk in bb.stage1:
            f2 = blk(f2)
        for blk in bb.stage2:
            f2 = blk(f2)

        f4 = interp(f2, (f2.shape[2] // 2, f2.shape[3] // 2))
        for blk in bb.stage3:
            f4 = blk(f4)
        for blk in bb.stage4:
            f4 = blk(f4)
        f4 = self.ppm(f4)

        fused2, low_up2 = self.cff24(f4, f2)
        fused1, low_up1 = self.cff12(fused2, f1)

        y = self.classifier(interp(fused1, (h // 4, w // 4)))
        y = interp(y, (h, w))
        return y, self.aux_cls1(low_up1), self.aux_cls2(low_up2)


# ---------------- UNet oracle (Ronneberger 2015) ----------------

class TDoubleConv(nn.Module):
    """Mirror of models.unet.DoubleConv."""

    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.conv1 = TConvBNAct(in_ch, out_ch, 3)
        self.conv2 = TConvBNAct(out_ch, out_ch, 3)

    def forward(self, x):
        return self.conv2(self.conv1(x))


class TUpBlock(nn.Module):
    """Mirror of models.unet.UpBlock (deconv variant)."""

    def __init__(self, in_ch, skip_ch, out_ch):
        super().__init__()
        self.up = nn.ConvTranspose2d(in_ch, out_ch, 2, stride=2)
        self.conv = TDoubleConv(out_ch + skip_ch, out_ch)

    def forward(self, x, skip):
        return self.conv(torch.cat([self.up(x), skip], dim=1))


class TorchUNet(nn.Module):
    """UNet oracle, attribute-parallel to models.unet.UNet
    (upsample='deconv')."""

    def __init__(self, num_classes=19, in_ch=3, base_ch=64):
        super().__init__()
        b = base_ch
        self.enc1 = TDoubleConv(in_ch, b)
        self.enc2 = TDoubleConv(b, 2 * b)
        self.enc3 = TDoubleConv(2 * b, 4 * b)
        self.enc4 = TDoubleConv(4 * b, 8 * b)
        self.bottom = TDoubleConv(8 * b, 16 * b)
        self.up4 = TUpBlock(16 * b, 8 * b, 8 * b)
        self.up3 = TUpBlock(8 * b, 4 * b, 4 * b)
        self.up2 = TUpBlock(4 * b, 2 * b, 2 * b)
        self.up1 = TUpBlock(2 * b, b, b)
        self.head = nn.Conv2d(b, num_classes, 1)

    def forward(self, x):
        s1 = self.enc1(x)
        s2 = self.enc2(F.max_pool2d(s1, 2))
        s3 = self.enc3(F.max_pool2d(s2, 2))
        s4 = self.enc4(F.max_pool2d(s3, 2))
        y = self.bottom(F.max_pool2d(s4, 2))
        y = self.up4(y, s4)
        y = self.up3(y, s3)
        y = self.up2(y, s2)
        y = self.up1(y, s1)
        return self.head(y)


# ---------------- ContextNet oracle (Poudel 2018) ----------------

class TDetailBranch(nn.Module):
    """Mirror of models.contextnet.DetailBranch."""

    def __init__(self):
        super().__init__()
        self.conv = TConvBNAct(3, 32, 3, stride=2)
        self.ds1 = TSeparableConv(32, 64, stride=2)
        self.ds2 = TSeparableConv(64, 128, stride=2)
        self.ds3 = TSeparableConv(128, 128, stride=1)

    def forward(self, x):
        return self.ds3(self.ds2(self.ds1(self.conv(x))))


class TContextBranch(nn.Module):
    """Mirror of models.contextnet.ContextBranch (MobileNetV2-style trunk)."""

    def __init__(self, out_ch=128):
        super().__init__()
        self.conv = TConvBNAct(3, 32, 3, stride=2)

        def stage(cin, cout, n, stride, t):
            blocks = [TInvertedResidual(cin, cout, stride=stride,
                                        expand_ratio=t)]
            blocks += [TInvertedResidual(cout, cout, expand_ratio=t)
                       for _ in range(n - 1)]
            return blocks

        body = []
        body += stage(32, 32, 1, 1, 1)
        body += stage(32, 32, 1, 1, 6)
        body += stage(32, 48, 3, 2, 6)
        body += stage(48, 64, 3, 2, 6)
        body += stage(64, 96, 2, 1, 6)
        body += stage(96, 128, 2, 1, 6)
        self.body = nn.ModuleList(body)
        self.tail = TConvBNAct(128, out_ch, 3)

    def forward(self, x):
        x = self.conv(x)
        for blk in self.body:
            x = blk(x)
        return self.tail(x)


class TorchContextNet(nn.Module):
    """ContextNet oracle, attribute-parallel to models.contextnet.ContextNet
    (aux=False, upsample_logits=True)."""

    def __init__(self, num_classes=19):
        super().__init__()
        self.detail = TDetailBranch()
        self.context = TContextBranch(128)
        self.ffm = TFeatureFusion(high_ch=128, low_ch=128, out_ch=128)
        self.classifier = TClassifier(num_classes)

    def forward(self, x):
        h, w = x.shape[2:]
        detail = self.detail(x)
        x4 = F.interpolate(x, (h // 4, w // 4), mode="bilinear",
                           align_corners=False)
        context = self.context(x4)
        y = self.classifier(self.ffm(detail, context))
        return F.interpolate(y, (h, w), mode="bilinear", align_corners=False)


# ---------------- ERFNet oracle (Romera 2017) ----------------

class TDownsamplerBlock(nn.Module):
    """Mirror of models.erfnet.DownsamplerBlock."""

    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.conv = nn.Conv2d(in_ch, out_ch - in_ch, 3, stride=2, padding=1)
        self.bn = nn.BatchNorm2d(out_ch)

    def forward(self, x):
        y = torch.cat([self.conv(x), F.max_pool2d(x, 2)], dim=1)
        return F.relu(self.bn(y))


class TNonBottleneck1d(nn.Module):
    """Mirror of models.erfnet.NonBottleneck1d (eval mode: dropout off)."""

    def __init__(self, ch, dilation=1):
        super().__init__()
        d = dilation
        self.conv3x1_1 = nn.Conv2d(ch, ch, (3, 1), padding=(1, 0))
        self.conv1x3_1 = nn.Conv2d(ch, ch, (1, 3), padding=(0, 1))
        self.bn1 = nn.BatchNorm2d(ch)
        self.conv3x1_2 = nn.Conv2d(ch, ch, (3, 1), padding=(d, 0),
                                   dilation=(d, 1))
        self.conv1x3_2 = nn.Conv2d(ch, ch, (1, 3), padding=(0, d),
                                   dilation=(1, d))
        self.bn2 = nn.BatchNorm2d(ch)

    def forward(self, x):
        y = F.relu(self.conv3x1_1(x))
        y = F.relu(self.bn1(self.conv1x3_1(y)))
        y = F.relu(self.conv3x1_2(y))
        y = self.bn2(self.conv1x3_2(y))
        return F.relu(y + x)


class TUpsamplerBlock(nn.Module):
    """Mirror of models.erfnet.UpsamplerBlock."""

    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.conv = nn.ConvTranspose2d(in_ch, out_ch, 3, stride=2, padding=1,
                                       output_padding=1)
        self.bn = nn.BatchNorm2d(out_ch)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class TorchERFNet(nn.Module):
    """ERFNet oracle, attribute-parallel to models.erfnet.ERFNet."""

    def __init__(self, num_classes=19, in_ch=3):
        super().__init__()
        enc = [TDownsamplerBlock(in_ch, 16), TDownsamplerBlock(16, 64)]
        enc += [TNonBottleneck1d(64) for _ in range(5)]
        enc.append(TDownsamplerBlock(64, 128))
        for _ in range(2):
            for d in (2, 4, 8, 16):
                enc.append(TNonBottleneck1d(128, dilation=d))
        self.encoder = nn.ModuleList(enc)
        self.decoder = nn.ModuleList([
            TUpsamplerBlock(128, 64),
            TNonBottleneck1d(64), TNonBottleneck1d(64),
            TUpsamplerBlock(64, 16),
            TNonBottleneck1d(16), TNonBottleneck1d(16),
        ])
        self.output_conv = nn.ConvTranspose2d(16, num_classes, 2, stride=2)

    def forward(self, x):
        for blk in self.encoder:
            x = blk(x)
        for blk in self.decoder:
            x = blk(x)
        return self.output_conv(x)


# ---------------- LEDNet oracle (Wang 2019a) ----------------

def t_channel_shuffle(x, groups=2):
    n, c, h, w = x.shape
    return (x.reshape(n, groups, c // groups, h, w)
            .transpose(1, 2).reshape(n, c, h, w))


class TSSnbt(nn.Module):
    """Mirror of models.lednet.SSnbt (split-shuffle non-bottleneck)."""

    def __init__(self, ch, dilation=1):
        super().__init__()
        half, d = ch // 2, dilation

        def branch():
            return nn.ModuleList([
                nn.Conv2d(half, half, (3, 1), padding=(1, 0)),
                nn.Conv2d(half, half, (1, 3), padding=(0, 1)),
                nn.Conv2d(half, half, (3, 1), padding=(d, 0), dilation=(d, 1)),
                nn.Conv2d(half, half, (1, 3), padding=(0, d), dilation=(1, d)),
            ])

        self.left = branch()
        self.right = branch()
        self.bn_left1 = nn.BatchNorm2d(half)
        self.bn_left2 = nn.BatchNorm2d(half)
        self.bn_right1 = nn.BatchNorm2d(half)
        self.bn_right2 = nn.BatchNorm2d(half)

    @staticmethod
    def _run(branch, bn1, bn2, x, transposed):
        c1, c2, c3, c4 = branch
        order = (c2, c1, c4, c3) if transposed else (c1, c2, c3, c4)
        y = F.relu(order[0](x))
        y = F.relu(bn1(order[1](y)))
        y = F.relu(order[2](y))
        return bn2(order[3](y))

    def forward(self, x):
        half = x.shape[1] // 2
        yl = self._run(self.left, self.bn_left1, self.bn_left2,
                       x[:, :half], False)
        yr = self._run(self.right, self.bn_right1, self.bn_right2,
                       x[:, half:], True)
        y = torch.cat([yl, yr], dim=1)
        return t_channel_shuffle(F.relu(y + x), 2)


class TAPN(nn.Module):
    """Mirror of models.lednet.APN (attention pyramid decoder)."""

    def __init__(self, in_ch, num_classes):
        super().__init__()
        self.down1 = TConvBNAct(in_ch, in_ch, 3, stride=2)
        self.down2 = TConvBNAct(in_ch, in_ch, 5, stride=2, padding=2)
        self.down3 = TConvBNAct(in_ch, in_ch, 7, stride=2, padding=3)
        self.level1 = TConvBNAct(in_ch, num_classes, 1, act=None)
        self.level2 = TConvBNAct(in_ch, num_classes, 1, act=None)
        self.level3 = TConvBNAct(in_ch, num_classes, 1, act=None)
        self.main = TConvBNAct(in_ch, num_classes, 1, act=None)
        self.pool_proj = TConvBNAct(in_ch, num_classes, 1, act=None)

    def forward(self, x):
        def up(y, size):
            return F.interpolate(y, size, mode="bilinear", align_corners=False)
        d1 = self.down1(x)
        d2 = self.down2(d1)
        d3 = self.down3(d2)
        a = up(self.level3(d3), d2.shape[2:]) + self.level2(d2)
        a = up(a, d1.shape[2:]) + self.level1(d1)
        a = up(a, x.shape[2:])
        g = self.pool_proj(x.mean(dim=(2, 3), keepdim=True))
        return self.main(x) * a + g


class TorchLEDNet(nn.Module):
    """LEDNet oracle, attribute-parallel to models.lednet.LEDNet
    (upsample_logits=True)."""

    def __init__(self, num_classes=19, in_ch=3):
        super().__init__()
        self.encoder = nn.ModuleList(
            [TDownsamplerBlock(in_ch, 32)]
            + [TSSnbt(32) for _ in range(3)]
            + [TDownsamplerBlock(32, 64)]
            + [TSSnbt(64) for _ in range(2)]
            + [TDownsamplerBlock(64, 128)]
            + [TSSnbt(128, dilation=d) for d in (1, 2, 5, 9, 2, 5, 9, 17)]
        )
        self.apn = TAPN(128, num_classes)

    def forward(self, x):
        size = x.shape[2:]
        for blk in self.encoder:
            x = blk(x)
        y = self.apn(x)
        return F.interpolate(y, size, mode="bilinear", align_corners=False)


# ---------------- ESNet oracle (Wang 2019b) ----------------

class TFCU(nn.Module):
    """Mirror of models.esnet.FCU."""

    def __init__(self, ch, k=3):
        super().__init__()
        p = (k - 1) // 2
        self.conv_a1 = nn.Conv2d(ch, ch, (k, 1), padding=(p, 0))
        self.conv_a2 = nn.Conv2d(ch, ch, (1, k), padding=(0, p))
        self.bn1 = nn.BatchNorm2d(ch)
        self.conv_b1 = nn.Conv2d(ch, ch, (k, 1), padding=(p, 0))
        self.conv_b2 = nn.Conv2d(ch, ch, (1, k), padding=(0, p))
        self.bn2 = nn.BatchNorm2d(ch)

    def forward(self, x):
        y = F.relu(self.conv_a1(x))
        y = F.relu(self.bn1(self.conv_a2(y)))
        y = F.relu(self.conv_b1(y))
        y = self.bn2(self.conv_b2(y))
        return F.relu(y + x)


class TPFCU(nn.Module):
    """Mirror of models.esnet.PFCU (shared stem, 3 dilated branches)."""

    def __init__(self, ch, rates=(2, 5, 9)):
        super().__init__()
        self.stem1 = nn.Conv2d(ch, ch, (3, 1), padding=(1, 0))
        self.stem2 = nn.Conv2d(ch, ch, (1, 3), padding=(0, 1))
        self.bn_stem = nn.BatchNorm2d(ch)
        self.branch_a = nn.ModuleList([
            nn.Conv2d(ch, ch, (3, 1), padding=(r, 0), dilation=(r, 1))
            for r in rates])
        self.branch_b = nn.ModuleList([
            nn.Conv2d(ch, ch, (1, 3), padding=(0, r), dilation=(1, r))
            for r in rates])
        self.branch_bn = nn.ModuleList([nn.BatchNorm2d(ch) for _ in rates])

    def forward(self, x):
        y = F.relu(self.stem1(x))
        y = F.relu(self.bn_stem(self.stem2(y)))
        out = x
        for ca, cb, bn in zip(self.branch_a, self.branch_b, self.branch_bn):
            out = out + bn(cb(F.relu(ca(y))))
        return F.relu(out)


class TorchESNet(nn.Module):
    """ESNet oracle, attribute-parallel to models.esnet.ESNet."""

    def __init__(self, num_classes=19, in_ch=3):
        super().__init__()
        self.encoder = nn.ModuleList(
            [TDownsamplerBlock(in_ch, 16)]
            + [TFCU(16, 3) for _ in range(3)]
            + [TDownsamplerBlock(16, 64)]
            + [TFCU(64, 5) for _ in range(2)]
            + [TDownsamplerBlock(64, 128)]
            + [TPFCU(128) for _ in range(3)]
        )
        self.decoder = nn.ModuleList([
            TUpsamplerBlock(128, 64),
            TFCU(64, 5), TFCU(64, 5),
            TUpsamplerBlock(64, 16),
            TFCU(16, 3), TFCU(16, 3),
        ])
        self.output_conv = nn.ConvTranspose2d(16, num_classes, 2, stride=2)

    def forward(self, x):
        for blk in self.encoder:
            x = blk(x)
        for blk in self.decoder:
            x = blk(x)
        return self.output_conv(x)


class TSegHead(nn.Module):
    """Mirror of ops.blocks.SegHead (3×3 conv-BN-ReLU → dropout → 1×1)."""

    def __init__(self, in_ch, mid_ch, num_classes):
        super().__init__()
        self.conv = TConvBNAct(in_ch, mid_ch, 3)
        self.classifier = nn.Conv2d(mid_ch, num_classes, 1)

    def forward(self, x):
        return self.classifier(self.conv(x))


class TorchDeepLabV3(nn.Module):
    """Generic DeepLabV3 oracle (any ResNet depth / output stride / aux),
    attribute-parallel to models.deeplab.DeepLabV3."""

    def __init__(self, num_classes=19, depth=50, output_stride=16, aux=False):
        super().__init__()
        self.backbone = TResNet(depth, output_stride)
        rates = (12, 24, 36) if output_stride == 8 else (6, 12, 18)
        self.aspp = TASPP(self.backbone.out_channels, 256, rates)
        self.dropout = nn.Dropout(0.1)
        self.classifier = nn.Conv2d(256, num_classes, 1)
        self.aux = aux
        if aux:
            self.aux_head = TSegHead(self.backbone.stage_channels[2], 128,
                                     num_classes)

    def forward(self, x):
        feats = self.backbone(x)
        y = self.classifier(self.dropout(self.aspp(feats[-1])))
        y = F.interpolate(y, x.shape[2:], mode="bilinear",
                          align_corners=False)
        if self.aux:
            return y, self.aux_head(feats[2])
        return y
