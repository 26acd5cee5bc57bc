"""torch `state_dict` ⇄ nnx state converter.

The judged checkpoint contract (BASELINE.json north_star; SURVEY.md §3.2)
requires loading reference PyTorch weights and reproducing per-pixel logits
within fp32 tolerance. Because every model in this zoo was written with
attribute names that mirror a torch implementation (conv/bn/act composition,
nnx.List ↔ nn.Sequential indices), the key spaces align structurally; what
differs is the *layout* per parameter kind:

| torch module            | torch tensor        | nnx target  | transform |
|-------------------------|---------------------|-------------|-----------|
| Conv2d.weight           | (O, I/g, kh, kw)    | Conv.kernel (kh, kw, I/g, O)      | transpose(2,3,1,0) |
| ConvTranspose2d.weight  | (I, O/g, kh, kw)    | ConvTranspose2d.kernel (kh,kw,I,O)| transpose(2,3,0,1) |
| Linear.weight           | (O, I)              | Linear.kernel (I, O)              | transpose(1,0) |
| BatchNorm2d.weight/bias | (C,)                | BatchNorm.scale/.bias             | copy |
| BatchNorm2d.running_*   | (C,)                | BatchNorm.mean/.var               | copy |
| PReLU.weight            | (C,) or (1,)        | PReLU.alpha                       | copy |
| num_batches_tracked     | scalar              | —                                 | dropped |

Leaf-name translation: weight→kernel for convs/linears, weight→scale for
norms, weight→alpha for PReLU, running_mean→mean, running_var→var. Module
paths are identical module-attribute paths ("backbone.stage1.0.conv1.conv").

`import_torch_state_dict` walks the *live module tree* (so each leaf knows
its owning module type — required to pick the transposed-conv layout) and
mutates parameters in place. `export_torch_state_dict` is the inverse, so
TPU-trained weights round-trip back to torch users of the reference API.
"""

from __future__ import annotations

import typing as tp

import jax.numpy as jnp
import numpy as np
from flax import nnx

from torch_semantic_segmentation_tpu.ops.conv import ConvTranspose2d, PReLU

# torch leaf name → (nnx attribute, needs-layout-transform kind)
_NORM_LEAVES = {"weight": "scale", "bias": "bias",
                "running_mean": "mean", "running_var": "var"}


def _is_param_leaf(v) -> bool:
    return isinstance(v, nnx.Variable)


def _children(module: nnx.Module) -> tp.Iterator[tuple[str, tp.Any]]:
    for name, value in vars(module).items():
        if name.startswith("_"):
            continue
        yield name, value


def _iter_modules(module: nnx.Module, prefix: str = ""
                  ) -> tp.Iterator[tuple[str, nnx.Module]]:
    """Yield (torch_path, module) for the module and all descendants."""
    yield prefix, module
    for name, value in _children(module):
        path = f"{prefix}.{name}" if prefix else name
        if isinstance(value, nnx.Module) and not isinstance(value, nnx.List):
            yield from _iter_modules(value, path)
        elif isinstance(value, (nnx.List, list, tuple)):
            for i, item in enumerate(value):
                if isinstance(item, nnx.Module):
                    yield from _iter_modules(item, f"{path}.{i}")


def _conv_to_torch(kernel: np.ndarray) -> np.ndarray:
    return np.transpose(kernel, (3, 2, 0, 1))        # HWIO -> OIHW


def _conv_from_torch(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))             # OIHW -> HWIO


def _deconv_to_torch(kernel: np.ndarray) -> np.ndarray:
    return np.transpose(kernel, (2, 3, 0, 1))        # HWIO -> IOHW


def _deconv_from_torch(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 0, 1))             # IOHW -> HWIO


def _module_entries(mod: nnx.Module
                    ) -> list[tuple[str, str, tp.Callable, tp.Callable]]:
    """(torch_leaf, nnx_attr, from_torch, to_torch) for this module's own
    (non-child) parameters."""
    ident = lambda a: a
    if isinstance(mod, nnx.Conv):
        out = [("weight", "kernel", _conv_from_torch, _conv_to_torch)]
        if getattr(mod, "bias", None) is not None:
            out.append(("bias", "bias", ident, ident))
        return out
    if isinstance(mod, ConvTranspose2d):
        out = [("weight", "kernel", _deconv_from_torch, _deconv_to_torch)]
        if mod.bias is not None:
            out.append(("bias", "bias", ident, ident))
        return out
    if isinstance(mod, nnx.Linear):
        out = [("weight", "kernel", lambda a: a.T, lambda a: a.T)]
        if getattr(mod, "bias", None) is not None:
            out.append(("bias", "bias", ident, ident))
        return out
    if isinstance(mod, nnx.BatchNorm):
        return [(t, n, ident, ident) for t, n in _NORM_LEAVES.items()]
    if isinstance(mod, PReLU):
        return [("weight", "alpha", ident, ident)]
    return []


def import_torch_state_dict(
    model: nnx.Module,
    state_dict: tp.Mapping[str, tp.Any],
    *,
    key_map: tp.Callable[[str], str] | None = None,
    strict: bool = True,
) -> list[str]:
    """Load a torch `state_dict` (tensors or numpy arrays) into `model`
    in place. `key_map` rewrites our canonical torch key before lookup (for
    reference checkpoints with different attribute names). Returns the list
    of state_dict keys that were not consumed.

    With `strict=True`, raises if a model parameter has no matching key or
    any non-`num_batches_tracked` checkpoint key is left over.
    """
    sd = {k: _to_numpy(v) for k, v in state_dict.items()}
    used: set[str] = set()
    missing: list[str] = []

    for path, mod in _iter_modules(model):
        for torch_leaf, attr, from_torch, _ in _module_entries(mod):
            key = f"{path}.{torch_leaf}" if path else torch_leaf
            if key_map is not None:
                key = key_map(key)
            if key not in sd:
                missing.append(key)
                continue
            var: nnx.Variable = getattr(mod, attr)
            value = from_torch(sd[key])
            if tuple(value.shape) != tuple(var.shape):
                raise ValueError(
                    f"shape mismatch for '{key}': checkpoint "
                    f"{value.shape} vs model {tuple(var.shape)}")
            var[...] = jnp.asarray(value, dtype=var[...].dtype)
            used.add(key)

    leftover = [k for k in sd if k not in used
                and not k.endswith("num_batches_tracked")]
    if strict and (missing or leftover):
        raise KeyError(
            f"state_dict mismatch; missing={missing[:8]}"
            f"{'...' if len(missing) > 8 else ''} "
            f"leftover={leftover[:8]}{'...' if len(leftover) > 8 else ''}")
    return leftover


def export_torch_state_dict(model: nnx.Module) -> dict[str, np.ndarray]:
    """Inverse of `import_torch_state_dict`: canonical torch-format dict."""
    out: dict[str, np.ndarray] = {}
    for path, mod in _iter_modules(model):
        for torch_leaf, attr, _, to_torch in _module_entries(mod):
            key = f"{path}.{torch_leaf}" if path else torch_leaf
            out[key] = to_torch(np.asarray(getattr(mod, attr)[...]))
    return out


def _to_numpy(v) -> np.ndarray:
    if isinstance(v, np.ndarray):
        return v
    # torch tensor without importing torch at module scope
    detach = getattr(v, "detach", None)
    if detach is not None:
        return detach().cpu().numpy()
    return np.asarray(v)


def load_torch_checkpoint(model: nnx.Module, path: str, *,
                          auto_map: bool = False, **kwargs) -> list[str]:
    """Load a `.pth`/`.pt` file saved by torch (the reference's pretrained
    format, SURVEY.md §3.2 "load_state_dict_from_url").

    `auto_map=True` tolerates arbitrarily renamed keys via structural
    order+shape alignment (compat.key_maps.load_with_auto_map) — use when
    the checkpoint's naming scheme differs from our canonical attribute
    paths; DDP `module.` prefixes are stripped automatically there."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    if auto_map:
        from torch_semantic_segmentation_tpu.compat.key_maps import (
            load_with_auto_map)
        return load_with_auto_map(model, sd, **kwargs)
    return import_torch_state_dict(model, sd, **kwargs)
