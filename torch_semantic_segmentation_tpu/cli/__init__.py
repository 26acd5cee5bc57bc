"""Command-line interface (T6 in SURVEY.md §1): config-driven train/eval
entry points whose flag names mirror the reference's per-script argparse
surface (SURVEY.md §2.6 "CLI": --model, --dataset-dir, --batch-size, --lr,
--crop-size, ...). One CLI for the whole zoo instead of one script per
model; distribution needs no flag — the mesh covers all visible devices.
"""
