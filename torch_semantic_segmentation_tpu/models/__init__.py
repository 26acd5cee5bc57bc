"""Model zoo (T2 in SURVEY.md §1): constructors mirroring the reference API.

Contract models (BASELINE.json configs / SURVEY.md §2.1): ENet, FastSCNN,
UNet, DeepLabV3 (ResNet + dilated backbone + ASPP), BiSeNet, ICNet.
Stretch tier: ContextNet, LEDNet, ERFNet, ESNet.
"""

from torch_semantic_segmentation_tpu.models.enet import ENet, enet

_REGISTRY = {}


def register(name):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn
    return deco


def get_model(name: str, num_classes: int = 19, *, pretrained=None, **kwargs):
    """Build a zoo model by name (the reference CLI's `--model` flag).

    `pretrained` mirrors the reference constructors' `pretrained=` argument
    (SURVEY.md §3.2): a torch `.pth`/`.pt` checkpoint path, or a directory
    containing `<name>.pth`. Keys that don't match our canonical attribute
    paths are recovered by structural alignment (compat.key_maps).
    """
    _ensure_registry()
    if name not in _REGISTRY:
        raise KeyError(f"unknown model '{name}'; available: {sorted(_REGISTRY)}")
    model = _REGISTRY[name](num_classes, **kwargs)
    if pretrained:
        import os

        from torch_semantic_segmentation_tpu.compat.torch_loader import (
            load_torch_checkpoint)
        path = pretrained
        if os.path.isdir(path):
            path = os.path.join(path, f"{name}.pth")
            if not os.path.exists(path):
                path = path[:-4] + ".pt"
            if not os.path.exists(path):
                raise FileNotFoundError(
                    f"no {name}.pth / {name}.pt under '{pretrained}'")
        try:
            load_torch_checkpoint(model, path)
        except (KeyError, ValueError):
            # naming-scheme mismatch: fall back to structural alignment
            load_torch_checkpoint(model, path, auto_map=True)
    return model


def available_models():
    _ensure_registry()
    return sorted(_REGISTRY)


def _ensure_registry():
    if _REGISTRY:
        return
    from torch_semantic_segmentation_tpu.models import enet as _enet_mod  # noqa
    _REGISTRY["enet"] = enet
    # Populated lazily as model families land; keeps import light.
    try:
        from torch_semantic_segmentation_tpu.models.fastscnn import fastscnn
        _REGISTRY["fastscnn"] = fastscnn
    except ImportError:
        pass
    try:
        from torch_semantic_segmentation_tpu.models.unet import unet
        _REGISTRY["unet"] = unet
    except ImportError:
        pass
    try:
        from torch_semantic_segmentation_tpu.models.deeplab import (
            deeplabv3_resnet18, deeplabv3_resnet34, deeplabv3_resnet50,
            deeplabv3_resnet101)
        _REGISTRY["deeplabv3_resnet18"] = deeplabv3_resnet18
        _REGISTRY["deeplabv3_resnet34"] = deeplabv3_resnet34
        _REGISTRY["deeplabv3_resnet50"] = deeplabv3_resnet50
        _REGISTRY["deeplabv3_resnet101"] = deeplabv3_resnet101
    except ImportError:
        pass
    try:
        from torch_semantic_segmentation_tpu.models.bisenet import bisenet
        _REGISTRY["bisenet"] = bisenet
    except ImportError:
        pass
    try:
        from torch_semantic_segmentation_tpu.models.icnet import icnet
        _REGISTRY["icnet"] = icnet
    except ImportError:
        pass
    try:
        from torch_semantic_segmentation_tpu.models.contextnet import contextnet
        _REGISTRY["contextnet"] = contextnet
    except ImportError:
        pass
    try:
        from torch_semantic_segmentation_tpu.models.lednet import lednet
        _REGISTRY["lednet"] = lednet
    except ImportError:
        pass
    try:
        from torch_semantic_segmentation_tpu.models.erfnet import erfnet
        _REGISTRY["erfnet"] = erfnet
    except ImportError:
        pass
    try:
        from torch_semantic_segmentation_tpu.models.esnet import esnet
        _REGISTRY["esnet"] = esnet
    except ImportError:
        pass


__all__ = ["ENet", "enet", "get_model", "available_models", "register"]
