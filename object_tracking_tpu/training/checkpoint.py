"""Orbax checkpointing with explicit step metadata.

Replaces the reference's HDF5-per-epoch files with the epoch/val_loss
embedded in the *filename* and parsed back with string surgery on resume
(/root/reference/models_tracking/MultiObjDetTracker.py:104-106, 253-259,
291-293). Here: orbax `CheckpointManager` with `keep` policy, step ints as
first-class metadata, and async-capable atomic saves — the TPU-native
failure-recovery story (SURVEY.md §5 'failure detection').
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Save/restore the serializable slice of a TrainState.

    Only array leaves (step/params/batch_stats/opt_state) are stored;
    the static apply_fn/tx are re-attached from the caller's template —
    checkpoints stay framework-version-portable.
    """

    def __init__(self, directory: str, max_to_keep: int = 5,
                 best_mode: bool = False):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            best_fn=(lambda m: m['val_loss']) if best_mode else None,
            best_mode='min' if best_mode else 'max',
            create=True)
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state, metrics: Optional[dict] = None
             ) -> None:
        payload = {'step': state.step, 'params': state.params,
                   'opt_state': state.opt_state}
        if state.batch_stats is not None:
            payload['batch_stats'] = state.batch_stats
        self._mgr.save(step, args=ocp.args.StandardSave(payload),
                       metrics={k: float(v) for k, v in
                                (metrics or {}).items()})

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template, step: Optional[int] = None,
                sharding: Optional[Any] = None,
                variables_only: bool = False):
        """Restore into the template TrainState; returns (state, step).

        `sharding` (e.g. `parallel.mesh.replicated_sharding(mesh)`)
        re-places the restored arrays: orbax restores them COMMITTED to
        one device, and a later jitted step whose batch is sharded over
        the mesh rejects the mixed placement. Fresh-initialized arrays
        are uncommitted (freely movable), which is why only the resume
        path needs this.

        `variables_only=True` restores just step/params/batch_stats and
        keeps the template's fresh opt_state — for eval/inference, where
        the optimizer is irrelevant. This also makes eval robust to
        optimizer-config drift: a checkpoint trained with a chained
        optimizer (e.g. grad-clip + Adam) restores fine into an eval
        state built with any optimizer, where a full restore would fail
        on the opt_state tree-structure mismatch.
        """
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            return state_template, None
        payload = {'step': state_template.step,
                   'params': state_template.params}
        if not variables_only:
            payload['opt_state'] = state_template.opt_state
        if state_template.batch_stats is not None:
            payload['batch_stats'] = state_template.batch_stats
        abstract = jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct, payload)
        if variables_only:
            # partial restore: the on-disk tree has opt_state too
            restored = self._mgr.restore(
                step, args=ocp.args.PyTreeRestore(abstract,
                                                  partial_restore=True))
        else:
            restored = self._mgr.restore(
                step, args=ocp.args.StandardRestore(abstract))
        if sharding is not None:
            restored = jax.device_put(restored, sharding)
        state = state_template.replace(
            step=restored['step'], params=restored['params'],
            opt_state=(state_template.opt_state if variables_only
                       else restored['opt_state']),
            batch_stats=restored.get('batch_stats',
                                     state_template.batch_stats))
        return state, step

    def close(self) -> None:
        self._mgr.close()
