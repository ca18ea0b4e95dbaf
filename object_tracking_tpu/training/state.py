"""Train state as a single pytree + optax optimizer factory.

The reference's training state is implicit in Keras (`model.fit` owns
weights, optimizer slots, the stateful `seen` warm-up variable
KerasYOLO.py:93-94, and the resume epoch parsed from checkpoint filenames
MultiObjDetTracker.py:291-293). Here it is one explicit, shardable,
orbax-serializable pytree: params, batch_stats, opt_state, step.

The learning rate lives in `opt_state.hyperparams` (optax
inject_hyperparams) so ReduceLROnPlateau is a pure update of the state —
no optimizer rebuild, no recompile.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray                      # global step; drives loss warm-up
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    apply_fn: Callable = flax.struct.field(pytree_node=False)

    @property
    def variables(self):
        if self.batch_stats is None:
            return {'params': self.params}
        return {'params': self.params, 'batch_stats': self.batch_stats}

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, opt_state = self.tx.update(grads, self.opt_state,
                                            self.params)
        params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=params, opt_state=opt_state,
            batch_stats=(new_batch_stats if new_batch_stats is not None
                         else self.batch_stats))

    @property
    def learning_rate(self) -> float:
        return float(_find_hyperparams(self.opt_state)['learning_rate'])

    def with_learning_rate(self, lr: float) -> 'TrainState':
        """Pure LR override — the ReduceLROnPlateau mechanism."""
        _find_hyperparams(self.opt_state)  # raise early if not injectable

        def repl(path, leaf):
            for p in path:
                key = getattr(p, 'key', getattr(p, 'name', None))
                if key == 'learning_rate':
                    return jnp.asarray(lr, jnp.asarray(leaf).dtype)
            return leaf

        opt_state = jax.tree_util.tree_map_with_path(repl, self.opt_state)
        return self.replace(opt_state=opt_state)

    @classmethod
    def create(cls, apply_fn: Callable, variables, tx):
        params = variables['params']
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=variables.get('batch_stats'),
                   opt_state=tx.init(params), tx=tx, apply_fn=apply_fn)


def _find_hyperparams(opt_state):
    """Locate the InjectHyperparamsState dict inside a (possibly chained)
    optax state tree."""
    if hasattr(opt_state, 'hyperparams'):
        return opt_state.hyperparams
    if isinstance(opt_state, (tuple, list)):
        for sub in opt_state:
            try:
                return _find_hyperparams(sub)
            except ValueError:
                continue
    raise ValueError('no inject_hyperparams state found; build the '
                     'optimizer with make_optimizer()')


def make_optimizer(learning_rate: float = 1e-4,
                   grad_clip_norm: Optional[float] = None
                   ) -> optax.GradientTransformation:
    """Adam with a runtime-adjustable learning rate.

    Reference optimizers: Adam(1e-4) joint/detector
    (MultiObjDetTracker.py:274, KerasYOLO.py:494), Adam(1e-3)
    single-object (TinyTracker.py:40) — Keras Adam defaults
    (b1=0.9, b2=0.999, eps=1e-7).
    """
    adam = optax.inject_hyperparams(optax.adam)(
        learning_rate=learning_rate, b1=0.9, b2=0.999, eps=1e-7)
    if grad_clip_norm is not None:
        return optax.chain(optax.clip_by_global_norm(grad_clip_norm), adam)
    return adam
