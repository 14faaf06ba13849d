"""Train state: params + batch_stats + optimizer, built on flax TrainState."""

from __future__ import annotations

from typing import Any

import flax
import jax
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def create_train_state(model, rng, sample_batch, optimizer,
                       jit_init: bool = False) -> TrainState:
    """Initialise model variables from a sample batch and wrap in TrainState.

    ``jit_init`` compiles the init as ONE XLA program instead of tracing
    it eagerly — same result, but the program lands in the persistent
    compilation cache, which is what keeps repeat ``dryrun_multichip``
    runs inside the driver budget on the CPU backend.
    """
    left, right = sample_batch["left"], sample_batch["right"]
    init = model.init
    if jit_init:
        init = jax.jit(model.init, static_argnames=("train",))
    variables = init(rng, left, right, train=False)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", flax.core.freeze({})),
        tx=optimizer,
    )


def make_optimizer(name: str, lr_fn, weight_decay: float = 0.01):
    """AdamW (SceneFlow recipe, ``train_sceneflow.py:94``) or Adam
    (KITTI finetune, ``train_kitti.py:79``)."""
    if name == "adamw":
        return optax.adamw(lr_fn, b1=0.9, b2=0.999, weight_decay=weight_decay)
    if name == "adam":
        return optax.adam(lr_fn, b1=0.9, b2=0.999)
    raise ValueError(name)


def count_params(params) -> int:
    import numpy as np
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
