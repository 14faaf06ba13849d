"""Checkpointing: epoch-indexed orbax checkpoints with resume + warm-start.

Reference semantics (``train_sceneflow.py:96-112,156-158``):

  * save ``{epoch, model, optimizer}`` every ``save_freq`` epochs as
    ``checkpoint_{epoch:06d}``;
  * ``--resume``: restore the newest checkpoint in the logdir (params +
    optimizer + epoch);
  * ``--loadckpt``: warm-start by key intersection (used to seed the KITTI
    finetune from the SceneFlow checkpoint).
"""

from __future__ import annotations

import os
import re
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

_CKPT_RE = re.compile(r"checkpoint_(\d+)$")


def checkpoint_path(logdir: str, epoch: int) -> str:
    return os.path.join(os.path.abspath(logdir), f"checkpoint_{epoch:06d}")


def latest_checkpoint(logdir: str) -> str | None:
    if not os.path.isdir(logdir):
        return None
    best, best_epoch = None, -1
    for name in os.listdir(logdir):
        m = _CKPT_RE.match(name)
        if m and int(m.group(1)) > best_epoch:
            best_epoch = int(m.group(1))
            best = os.path.join(os.path.abspath(logdir), name)
    return best


def _state_to_tree(state, epoch: int) -> dict:
    return {
        "epoch": np.asarray(epoch),
        "step": np.asarray(state.step),
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }


def save_checkpoint(logdir: str, state, epoch: int) -> str:
    path = checkpoint_path(logdir, epoch)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, _state_to_tree(state, epoch), force=True)
    return path


def restore_variables(path: str) -> dict:
    """Restore a raw variables tree (e.g. ``{'params', 'batch_stats'}``)
    saved by ``StandardCheckpointer`` on ANY backend.

    The checkpoint records the SAVING device's shardings, so a naive
    ``restore(path)`` on a different backend fails with "Device TPU v5
    lite0 was not found" (e.g. a TPU-trained scoreboard checkpoint
    restored inside a ``--cpu`` export). Restoring against an abstract
    metadata-derived target places the arrays on the default device
    instead.
    """
    sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
    with ocp.StandardCheckpointer() as ckptr:
        meta = ckptr.metadata(path).item_metadata
        abstract = jax.tree_util.tree_map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype,
                                           sharding=sharding), meta)
        return ckptr.restore(path, abstract)


def restore_checkpoint(path: str, state):
    """Full restore (resume): returns ``(state, next_epoch)``."""
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                      _state_to_tree(state, 0))
    with ocp.StandardCheckpointer() as ckptr:
        tree = ckptr.restore(path, abstract)
    new_state = state.replace(
        step=int(tree["step"]),
        params=tree["params"],
        batch_stats=tree["batch_stats"],
        opt_state=tree["opt_state"],
    )
    return new_state, int(tree["epoch"]) + 1


def warm_start(path: str, state):
    """Partial load by flattened-key intersection (``train_sceneflow.py:106-112``).

    Restores params/batch_stats entries whose path and shape match; leaves
    the optimizer fresh.
    """
    with ocp.StandardCheckpointer() as ckptr:
        tree = ckptr.restore(path)

    def merge(current: Any, loaded: Any, label: str) -> Any:
        cur_flat = dict(jax.tree_util.tree_flatten_with_path(current)[0])
        loaded_flat = dict(jax.tree_util.tree_flatten_with_path(loaded)[0])
        hits = 0
        out = {}
        for k, v in cur_flat.items():
            lv = loaded_flat.get(k)
            if lv is not None and tuple(lv.shape) == tuple(v.shape):
                out[k] = jax.numpy.asarray(lv, dtype=v.dtype)
                hits += 1
            else:
                out[k] = v
        treedef = jax.tree_util.tree_flatten_with_path(current)[1]
        print(f"warm_start: {label}: matched {hits}/{len(cur_flat)} tensors")
        return jax.tree_util.tree_unflatten(
            treedef, [out[k] for k in cur_flat])

    new_params = merge(state.params, tree.get("params", {}), "params")
    new_bs = merge(state.batch_stats, tree.get("batch_stats", {}),
                   "batch_stats")
    return state.replace(params=new_params, batch_stats=new_bs)
