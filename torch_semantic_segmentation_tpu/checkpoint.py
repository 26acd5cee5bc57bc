"""Checkpoint/resume (SURVEY.md §5 "Failure detection / Checkpoint"):
orbax-backed periodic async checkpoints of the full train state (params,
BN stats/RNG counts, optimizer state, step, data-PRNG key) with
auto-resume-from-latest — replacing the reference's `torch.save` + ignite
ModelCheckpoint (SURVEY.md §2.6 "Checkpointing").

Async saves overlap the next train steps (the reference blocks on
torch.save); preemption-safe because orbax finalises atomically — a killed
run resumes from the last complete step directory.
"""

from __future__ import annotations

import os
import typing as tp

import jax
import orbax.checkpoint as ocp

from torch_semantic_segmentation_tpu.train import TrainState


class CheckpointManager:
    """Thin orbax CheckpointManager wrapper bound to our TrainState."""

    def __init__(self, directory: str, *, max_to_keep: int = 3,
                 save_interval_steps: int = 1000):
        self._dir = os.path.abspath(directory)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval_steps,
                enable_async_checkpointing=True,
            ),
        )

    @property
    def directory(self) -> str:
        return self._dir

    def save(self, step: int, state: TrainState, *,
             data_key: jax.Array | None = None, force: bool = False) -> bool:
        """Queue an async save; returns True if a save was started."""
        items: dict[str, tp.Any] = {"state": ocp.args.StandardSave(
            state._asdict())}
        if data_key is not None:
            items["data_key"] = ocp.args.ArraySave(
                jax.random.key_data(data_key))
        return self._mgr.save(step, args=ocp.args.Composite(**items),
                              force=force)

    def latest_step(self) -> int | None:
        """Newest saved step, or None if the directory holds no checkpoint."""
        return self._mgr.latest_step()

    def restore_latest(self, state: TrainState, *,
                       data_key: jax.Array | None = None
                       ) -> tuple[TrainState, jax.Array | None, int] | None:
        """Restore the newest checkpoint into the given abstract/concrete
        state template. Returns (state, data_key, step) or None if no
        checkpoint exists."""
        step = self._mgr.latest_step()
        if step is None:
            return None
        targets: dict[str, tp.Any] = {"state": ocp.args.StandardRestore(
            state._asdict())}
        if data_key is not None:
            targets["data_key"] = ocp.args.ArrayRestore(
                jax.random.key_data(data_key))
        out = self._mgr.restore(step, args=ocp.args.Composite(**targets))
        new_state = TrainState(**out["state"])
        new_key = (jax.random.wrap_key_data(out["data_key"])
                   if data_key is not None else None)
        return new_state, new_key, step

    def restore_params_rest(self, params, rest
                            ) -> tuple[tp.Any, tp.Any, int] | None:
        """Restore only (params, rest) from the newest checkpoint, ignoring
        the on-disk optimizer state.

        Evaluation must not need to reconstruct the training run's exact
        optax chain (SGD-with-decay saves a 3-element chain state; a naive
        sgd template has 2 — orbax StandardRestore refuses the structure
        mismatch). We restore the saved 'state' item template-free (orbax
        rebuilds it from its own metadata) and refit the params/rest
        subtrees onto the caller's nnx.State templates, checking per-leaf
        shapes so a silently reordered tree cannot slip through.
        """
        step = self._mgr.latest_step()
        if step is None:
            return None
        raw = self._mgr.restore(
            step, args=ocp.args.Composite(
                state=ocp.args.StandardRestore()))["state"]

        def refit(template, raw_tree, name):
            treedef = jax.tree.structure(template)
            leaves = jax.tree.leaves(raw_tree)
            t_leaves = jax.tree.leaves(template)
            if len(leaves) != len(t_leaves):
                raise ValueError(
                    f"checkpoint '{name}' has {len(leaves)} leaves, "
                    f"template has {len(t_leaves)} — wrong model?")
            for i, (a, b) in enumerate(zip(leaves, t_leaves)):
                if getattr(a, "shape", None) != getattr(b, "shape", None):
                    raise ValueError(
                        f"checkpoint '{name}' leaf {i} shape "
                        f"{getattr(a, 'shape', None)} != template "
                        f"{getattr(b, 'shape', None)} — wrong model?")
            return jax.tree.unflatten(treedef, leaves)

        return (refit(params, raw["params"], "params"),
                refit(rest, raw["rest"], "rest"), step)

    def wait(self):
        """Block until queued async saves are durable (call before exit)."""
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
