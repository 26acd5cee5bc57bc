"""Mapillary Vistas dataset (SURVEY.md §2.5 stretch tier; the public
reference repo ships a Vistas loader — uncitable, mount empty).

Layout (Vistas v1.x/v2.0 research release):
  <root>/{training,validation,testing}/images/<name>.jpg
  <root>/{training,validation}/{labels,v2.0/labels}/<name>.png
  <root>/config.json  (or config_v2.0.json): {"labels": [{"name", "color",
                       "readable", "evaluate"}, ...]}

Masks store the label id in the PNG palette index (readable directly as a
grayscale index image). The class table is read from config.json, so
`num_classes` and `class_names` adapt to the release version (66 for v1.2,
124 for v2.0); non-`evaluate` classes map to `IGNORE_INDEX` through
`label_lookup_table()` — the same on-device LUT-gather mechanism as
Cityscapes' 33→19 mapping.
"""

from __future__ import annotations

import dataclasses
import glob
import json
import os

import numpy as np

IGNORE_INDEX = 255

_SPLIT_DIRS = {"train": "training", "val": "validation", "test": "testing"}


@dataclasses.dataclass
class MapillaryDataset:
    root: str
    split: str = "train"
    version: str = ""          # "" = v1.x layout, "v2.0" = v2 labels

    def __post_init__(self):
        cfg_name = ("config.json" if not self.version
                    else f"config_{self.version}.json")
        cfg_path = os.path.join(self.root, cfg_name)
        with open(cfg_path) as f:
            cfg = json.load(f)
        labels = cfg["labels"]
        # evaluated classes keep their order; the rest become ignore
        self.class_names = tuple(
            l["readable"] for l in labels if l.get("evaluate", True))
        self._eval_ids = [i for i, l in enumerate(labels)
                          if l.get("evaluate", True)]
        self.num_classes = len(self._eval_ids)

        sdir = _SPLIT_DIRS[self.split]
        img_dir = os.path.join(self.root, sdir, "images")
        lbl_sub = os.path.join(self.version, "labels") if self.version else "labels"
        lbl_dir = os.path.join(self.root, sdir, lbl_sub)
        self.image_paths = sorted(glob.glob(os.path.join(img_dir, "*.jpg")))
        if not self.image_paths:
            raise FileNotFoundError(f"no images under {img_dir}")
        self.label_paths = [
            os.path.join(lbl_dir,
                         os.path.splitext(os.path.basename(p))[0] + ".png")
            for p in self.image_paths
        ]

    def label_lookup_table(self) -> np.ndarray:
        """(256,) uint8 LUT raw-id → train-id (255 = ignore); applied as an
        on-device gather in the input pipeline."""
        lut = np.full((256,), IGNORE_INDEX, dtype=np.uint8)
        for train_id, raw_id in enumerate(self._eval_ids):
            lut[raw_id] = train_id
        return lut

    def __len__(self) -> int:
        return len(self.image_paths)

    def __getitem__(self, i: int) -> tuple[np.ndarray, np.ndarray]:
        """(image uint8 HWC RGB, raw label-id mask uint8 HW)."""
        import cv2
        img = cv2.cvtColor(cv2.imread(self.image_paths[i], cv2.IMREAD_COLOR),
                           cv2.COLOR_BGR2RGB)
        # Masks are palette-indexed PNGs where the palette INDEX is the label
        # id. cv2.IMREAD_GRAYSCALE would expand the palette to RGB and take
        # luma, destroying the ids — PIL keeps mode-'P' palette indices raw
        # (matching the native C++ decoder's png_set_packing path).
        from PIL import Image
        lbl = np.asarray(Image.open(self.label_paths[i]))
        if lbl.ndim == 3:          # non-palette RGB(A) mask: collapse to ids
            lbl = lbl[..., 0]
        return img, lbl.astype(np.uint8, copy=False)
