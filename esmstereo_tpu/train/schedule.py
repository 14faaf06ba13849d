"""Learning-rate schedule: the reference's ``lrepochs`` string DSL.

``"20,32,40,48,56:2"`` means: divide the base LR by 2 at each listed epoch
(cumulatively). Reference: ``/root/reference/utils/experiment.py:103-125``.
"""

from __future__ import annotations

import jax.numpy as jnp


def parse_lrepochs(spec: str) -> tuple[list[int], float]:
    head, rate = spec.split(":")
    return [int(e) for e in head.split(",")], float(rate)


def lr_for_epoch(base_lr: float, epoch: int, spec: str) -> float:
    """Python-side LR lookup (matches the reference's loop exactly)."""
    epochs, rate = parse_lrepochs(spec)
    lr = base_lr
    for eid in epochs:
        if epoch >= eid:
            lr /= rate
        else:
            break
    return lr


def lr_schedule_fn(base_lr: float, spec: str, steps_per_epoch: int):
    """A jit-traceable step -> lr function for optax."""
    epochs, rate = parse_lrepochs(spec)

    def fn(step):
        epoch = step // steps_per_epoch
        decays = jnp.sum(jnp.asarray(
            [epoch >= e for e in epochs], dtype=jnp.float32))
        return base_lr / (rate ** decays)

    return fn
