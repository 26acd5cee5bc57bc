"""Cross-framework checkpoint compatibility (SURVEY.md §3.2, §5
"Checkpoint/resume"): import reference PyTorch `state_dict`s into the
TPU-native models with per-pixel logit parity (BASELINE.json north_star:
"same checkpoint-loadable weights, per-pixel logits matching within fp32
tolerance").
"""

from torch_semantic_segmentation_tpu.compat.torch_loader import (
    export_torch_state_dict,
    import_torch_state_dict,
)

__all__ = ["import_torch_state_dict", "export_torch_state_dict"]
