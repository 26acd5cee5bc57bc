"""torch_semantic_segmentation_tpu — a TPU-native semantic-segmentation framework.

A ground-up JAX/XLA/Pallas rebuild of the capability surface of the PyTorch
reference `bernardomig/torch_semantic_segmentation` (see SURVEY.md): a
semantic-segmentation model zoo (ENet, FastSCNN, UNet, DeepLabV3, BiSeNet,
ICNet, ContextNet, LEDNet, ERFNet, ESNet) with Cityscapes/CamVid data
pipelines, class-weighted / OHEM cross-entropy losses, confusion-matrix mIoU
evaluation, and data-parallel training — all designed TPU-first:

- NHWC layout everywhere; HWIO conv kernels; bf16 compute / fp32 params.
- The whole train step (fwd + bwd + optimizer + collectives) is ONE compiled
  XLA program; data-parallelism via `jax.sharding.Mesh` + GSPMD (collectives
  over ICI inserted by XLA), not hand-written comm.
- The augmentation hot path (scale/crop/flip/jitter/normalize) is a single
  fused on-device transform with static shapes (inverse-warp sampling), fed
  by a double-buffered HBM prefetch iterator.
- Pallas kernels for the fusion targets XLA does not already handle
  (upsample+concat skip fusion).

Reference provenance: /root/reference was empty at build time (mount failure,
see SURVEY.md "PROVENANCE NOTICE"); capabilities are built to the restated
contract in SURVEY.md §0–§6 / BASELINE.json.
"""

__version__ = "0.1.0"

from torch_semantic_segmentation_tpu import ops  # noqa: F401
from torch_semantic_segmentation_tpu import losses  # noqa: F401
from torch_semantic_segmentation_tpu import metrics  # noqa: F401
from torch_semantic_segmentation_tpu import models  # noqa: F401
