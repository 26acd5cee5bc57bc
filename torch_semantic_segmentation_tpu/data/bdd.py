"""BDD100K / DeepDrive segmentation dataset (SURVEY.md §2.5 stretch tier;
the public reference repo ships a BDD loader — uncitable, mount empty).

Layout (official BDD100K seg release):
  <root>/images/10k/{train,val,test}/<name>.jpg
  <root>/labels/sem_seg/masks/{train,val}/<name>.png   (train-id masks)
Older drivable/seg releases use <root>/seg/images/<split> +
<root>/seg/labels/<split>; both are probed.

Masks are already Cityscapes-train-id encoded (19 classes, 255 = void), so
no LUT is needed — the label space matches `data.cityscapes`.
"""

from __future__ import annotations

import dataclasses
import glob
import os

import numpy as np

from torch_semantic_segmentation_tpu.data.cityscapes import (
    CLASS_NAMES, IGNORE_INDEX, NUM_CLASSES)

__all__ = ["BDDDataset", "NUM_CLASSES", "IGNORE_INDEX", "CLASS_NAMES"]


@dataclasses.dataclass
class BDDDataset:
    root: str
    split: str = "train"

    def __post_init__(self):
        candidates = [
            (os.path.join(self.root, "images", "10k", self.split),
             os.path.join(self.root, "labels", "sem_seg", "masks", self.split)),
            (os.path.join(self.root, "seg", "images", self.split),
             os.path.join(self.root, "seg", "labels", self.split)),
        ]
        for img_dir, lbl_dir in candidates:
            imgs = sorted(glob.glob(os.path.join(img_dir, "*.jpg")))
            if imgs:
                break
        else:
            raise FileNotFoundError(
                f"no BDD images under {self.root} (tried "
                f"{[c[0] for c in candidates]})")
        self.image_paths = imgs
        self.label_paths = []
        for p in imgs:
            name = os.path.splitext(os.path.basename(p))[0]
            for suffix in (".png", "_train_id.png"):
                lp = os.path.join(lbl_dir, name + suffix)
                if os.path.exists(lp):
                    self.label_paths.append(lp)
                    break
            else:
                raise FileNotFoundError(f"no mask for {p} in {lbl_dir}")

    def __len__(self) -> int:
        return len(self.image_paths)

    def __getitem__(self, i: int) -> tuple[np.ndarray, np.ndarray]:
        """(image uint8 HWC RGB, train-id mask uint8 HW)."""
        import cv2
        img = cv2.cvtColor(cv2.imread(self.image_paths[i], cv2.IMREAD_COLOR),
                           cv2.COLOR_BGR2RGB)
        lbl = cv2.imread(self.label_paths[i], cv2.IMREAD_GRAYSCALE)
        return img, lbl
