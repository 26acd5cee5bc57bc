"""Data layer (T3 in SURVEY.md §1): dataset loaders (Cityscapes, CamVid),
fused on-device augmentation, and double-buffered HBM prefetch."""
