"""The generic fit loop: epochs × (train steps, val steps, callbacks).

Functional replacement for Keras `fit_generator` + callback stack
(/root/reference/models_tracking/BaseTracker.py:104-112,
MultiObjDetTracker.py:279-288): the loop owns nothing but a TrainState and
pure step functions; checkpointing, early-stop, plateau-LR, and metric
logging are explicit components wired here.
"""

from __future__ import annotations

import time
from typing import Callable, Iterable, Optional

import numpy as np

from object_tracking_tpu.training.callbacks import (
    EarlyStopping, ReduceLROnPlateau)
from object_tracking_tpu.training.checkpoint import CheckpointManager
from object_tracking_tpu.training.metrics import MetricLogger


class _MetricHistory:
    """Per-step metrics with ZERO per-step device work.

    The previous loop called `float(v)` per metric per step — one
    device→host round-trip EACH (~0.1 s over the axon tunnel), so a
    step returning ~11 scalars paid ~1 s of pulls: real training runs
    crawled 10-20x below the isolated step rate while the chip idled.
    Now `add` only stashes the step's lazy device scalars (no dispatch,
    no transfer) and `materialize` performs ONE stack + ONE pull for
    the whole epoch, serving both the per-step log records and the
    epoch mean."""

    def __init__(self):
        self._rows = []
        self._steps = []
        self._keys = None

    def add(self, metrics, step: int = 0) -> None:
        if self._keys is None:
            self._keys = list(metrics)
        self._rows.append([metrics[k] for k in self._keys])
        self._steps.append(step)

    def __len__(self):
        return len(self._rows)

    def materialize(self):
        """→ (per-step [(step, dict)], mean dict) via one pull."""
        if not self._rows:
            return [], {}
        import jax.numpy as jnp
        flat = [v for row in self._rows for v in row]
        mat = np.asarray(jnp.stack(flat), np.float32).reshape(
            len(self._rows), len(self._keys))
        rows = [(s, dict(zip(self._keys, map(float, r))))
                for s, r in zip(self._steps, mat)]
        mean = dict(zip(self._keys, map(float, mat.mean(axis=0))))
        return rows, mean


def _prefetch(make_iter, depth: int):
    """Run the batch pipeline (host decode + device_put) in a background
    thread, `depth` batches ahead of the consumer — the framework-native
    replacement for Keras fit_generator's worker queue
    (reference BaseTracker.py:112 max_queue_size=3). The C decode path
    releases the GIL, so prep genuinely overlaps the device step even on
    one host core. depth <= 0 disables."""
    if depth <= 0:
        yield from make_iter()
        return
    import queue
    import threading
    q: 'queue.Queue' = queue.Queue(maxsize=depth)
    sentinel = object()
    failure = []

    def worker():
        try:
            for item in make_iter():
                q.put(item)
        except BaseException as e:          # re-raised on the main thread
            failure.append(e)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            t.join()
            if failure:
                raise failure[0]
            return
        yield item


def fit(state,
        train_step: Callable,
        train_batches: Callable[[], Iterable],
        *,
        eval_step: Optional[Callable] = None,
        val_batches: Optional[Callable[[], Iterable]] = None,
        epochs: int = 100,
        initial_epoch: int = 0,
        shard_fn: Optional[Callable] = None,
        logger: Optional[MetricLogger] = None,
        checkpoints: Optional[CheckpointManager] = None,
        early_stopping: Optional[EarlyStopping] = None,
        reduce_lr: Optional[ReduceLROnPlateau] = None,
        log_every_steps: int = 10,
        prefetch: int = 2,
        checkpoint_every: int = 1,
        on_epoch_end: Optional[Callable] = None):
    """Run the training loop; returns the final TrainState.

    Args:
      train_batches / val_batches: zero-arg callables returning a fresh
        iterator of host batches each epoch (the generator contract of the
        reference's Sequence classes, re-shuffled per epoch).
      shard_fn: host batch → device layout (parallel.mesh.shard_batch
        bound to the mesh); identity if None.
      on_epoch_end: optional hook (epoch, state, train_metrics,
        val_metrics) for debug dumps etc.
    """
    shard = shard_fn or (lambda b: b)
    step_count = int(state.step)
    for epoch in range(initial_epoch, epochs):
        t0 = time.time()
        train_hist = _MetricHistory()
        for batch in _prefetch(
                lambda: (shard(b) for b in train_batches()), prefetch):
            state, metrics = train_step(state, batch)
            step_count += 1
            train_hist.add(metrics, step_count)
        # One pull for the whole epoch; per-step records flush to the
        # logger here (epoch-deferred) instead of stalling the device
        # loop on a transfer every log_every_steps.
        train_rows, train_metrics = train_hist.materialize()
        if logger:
            for s, row in train_rows:
                if s % log_every_steps == 0:
                    logger.log(s, row, prefix='train')

        val_metrics = {}
        if eval_step is not None and val_batches is not None:
            val_hist = _MetricHistory()
            for b in _prefetch(
                    lambda: (shard(b) for b in val_batches()), prefetch):
                val_hist.add(eval_step(state, b))
            _, val_metrics = val_hist.materialize()
            if logger and val_metrics:
                logger.log(step_count, val_metrics, prefix='val')

        dt = time.time() - t0
        print(f'epoch {epoch + 1}/{epochs} '
              f'loss={train_metrics.get("loss", float("nan")):.4f} '
              + (f'val_loss={val_metrics.get("loss", float("nan")):.4f} '
                 if val_metrics else '')
              + f'({dt:.1f}s, {len(train_hist)} steps)')

        monitored = val_metrics.get('loss', train_metrics.get('loss'))
        if checkpoints is not None and (
                (epoch + 1) % max(checkpoint_every, 1) == 0
                or epoch + 1 == epochs):
            # checkpoint_every > 1 trades resume granularity for wall
            # clock: each save ships the full state device→host (~12 s
            # for the 51M-param joint model over the axon tunnel),
            # which dominated epochs once the step loop got fast.
            # Default 1 = the reference's checkpoint-per-epoch
            # (MultiObjDetTracker.py:253-259); the final epoch always
            # saves.
            checkpoints.save(epoch + 1, state,
                             metrics={'val_loss': float(monitored)})
        if reduce_lr is not None and monitored is not None:
            new_lr = reduce_lr.update(float(monitored),
                                      state.learning_rate)
            if new_lr != state.learning_rate:
                print(f'  reducing lr → {new_lr:.2e}')
                state = state.with_learning_rate(new_lr)
        if on_epoch_end is not None:
            on_epoch_end(epoch, state, train_metrics, val_metrics)
        if early_stopping is not None and monitored is not None:
            if early_stopping.update(float(monitored)):
                print(f'  early stopping at epoch {epoch + 1}')
                break
    if checkpoints is not None:
        checkpoints.wait()
    return state
