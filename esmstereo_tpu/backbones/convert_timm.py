"""Convert timm ImageNet checkpoints into FeaturePyramid parameters.

The reference trains from timm-pretrained stems (``ESMStereo.py:44-66``,
``pretrained=True``); accuracy parity therefore needs the same ImageNet
initialisation. This maps a torch ``state_dict`` (from
``timm.create_model('<arch>', pretrained=True).state_dict()`` saved with
``torch.save``) onto the Flax parameter tree.

Key mapping (timm -> flax module path under the backbone):
  conv_stem.weight                -> conv_stem/Conv_0/kernel   (OIHW->HWIO)
  bn1.{weight,bias}               -> bn1/{scale,bias}
  bn1.running_{mean,var}          -> [batch_stats] bn1/{mean,var}
  blocks.{s}.{i}.conv_pw.weight   -> blocks_{s}_{i}/conv_pw/Conv_0/kernel
  ... conv_dw / conv_pwl / se.conv_reduce / se.conv_expand likewise
  ... bn1/bn2/bn3 likewise

Grouped (depthwise) conv weights transpose identically: torch
``(O, I/g, kh, kw)`` -> flax ``(kh, kw, I/g, O)``.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _conv(w) -> np.ndarray:
    return np.transpose(np.asarray(w, dtype=np.float32), (2, 3, 1, 0))


def _vec(w) -> np.ndarray:
    return np.asarray(w, dtype=np.float32)


def convert_backbone_state_dict(
    state_dict: Mapping[str, Any]
) -> tuple[dict, dict]:
    """timm state_dict -> (params subtree, batch_stats subtree).

    Unknown keys (classifier head, blocks.6.* — the stage ESMStereo never
    runs) are skipped.
    """
    params: dict = {}
    stats: dict = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    for key, value in state_dict.items():
        parts = key.split(".")
        if parts[0] == "conv_stem":
            put(params, ("conv_stem", "Conv_0", "kernel"), _conv(value))
        elif parts[0] == "bn1":
            _put_bn(params, stats, ("bn1",), parts[1], value, put)
        elif parts[0] == "blocks":
            stage, idx = int(parts[1]), int(parts[2])
            if stage >= 6:
                continue  # stage 6 is never executed (ESMStereo.py:62-66)
            mod = f"blocks_{stage}_{idx}"
            sub = parts[3]
            if sub in ("conv_pw", "conv_dw", "conv_pwl"):
                put(params, (mod, sub, "Conv_0", "kernel"), _conv(value))
            elif sub == "se":
                leaf = "kernel" if parts[5] == "weight" else "bias"
                val = _conv(value) if leaf == "kernel" else _vec(value)
                put(params, (mod, "se", parts[4], "Conv_0", leaf), val)
            elif sub in ("bn1", "bn2", "bn3"):
                _put_bn(params, stats, (mod, sub), parts[4], value, put)
        # classifier / conv_head etc: skip

    return params, stats


def _put_bn(params, stats, path, leaf, value, put):
    if leaf == "weight":
        put(params, (*path, "scale"), _vec(value))
    elif leaf == "bias":
        put(params, (*path, "bias"), _vec(value))
    elif leaf == "running_mean":
        put(stats, (*path, "mean"), _vec(value))
    elif leaf == "running_var":
        put(stats, (*path, "var"), _vec(value))
    # num_batches_tracked: skip


def _merge(dst: dict, src: dict, path=()) -> int:
    """Recursively copy matching-shape leaves of src into dst; returns count."""
    n = 0
    for k, v in src.items():
        if k not in dst:
            raise KeyError(f"converted key {'/'.join((*path, k))} "
                           "missing from model tree")
        if isinstance(v, dict):
            n += _merge(dst[k], v, (*path, k))
        else:
            want = dst[k].shape
            assert tuple(v.shape) == tuple(want), (path, k, v.shape, want)
            dst[k] = v.astype(dst[k].dtype)
            n += 1
    return n


def load_timm_backbone(variables: dict, state_dict: Mapping[str, Any],
                       prefix: str = "feature") -> dict:
    """Return a copy of ``variables`` with backbone weights replaced.

    ``prefix``: the backbone submodule name inside the model tree
    (``"feature"`` for ESMStereo; ``""`` for a bare FeaturePyramid).
    """
    import jax

    variables = jax.tree_util.tree_map(np.asarray, variables)
    conv_params, bn_stats = convert_backbone_state_dict(state_dict)

    p_root = variables["params"][prefix] if prefix else variables["params"]
    s_root = (variables["batch_stats"][prefix] if prefix
              else variables["batch_stats"])
    n_p = _merge(p_root, conv_params)
    n_s = _merge(s_root, bn_stats)
    print(f"load_timm_backbone: loaded {n_p} param + {n_s} stat tensors")
    return jax.tree_util.tree_map(np.asarray, variables)


def load_timm_checkpoint_file(variables: dict, path: str,
                              prefix: str = "feature") -> dict:
    """Load from a ``torch.save``d state_dict file (CPU torch required)."""
    import torch

    state_dict = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in state_dict:
        state_dict = state_dict["state_dict"]
    state_dict = {k: v.numpy() if hasattr(v, "numpy") else v
                  for k, v in state_dict.items()}
    return load_timm_backbone(variables, state_dict, prefix)
