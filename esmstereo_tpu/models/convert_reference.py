"""Transplant a torch reference ESMStereo state_dict into the Flax model.

Maps every tensor of ``/root/reference/models/ESMStereo.py``'s
``state_dict()`` (and its _trt twin, whose tree is identical) onto this
framework's parameter/batch-stats tree, so full-model numeric parity can be
asserted against the actual reference network (see
``tests/test_reference_parity.py``).

The Flax tree was designed path-compatible across the TPU fast paths
(folded 3-D convs, phased upsamplers, fused Pallas head all read the same
tree), so one transplant covers every execution mode.

Weight layout transforms:
  * Conv2d      (O, I, kh, kw)        -> (kh, kw, I, O)
  * Conv3d      (O, I, kd, kh, kw)    -> (kd, kh, kw, I, O)
  * ConvTranspose2d (I, O, kh, kw)    -> (kh, kw, I, O)
  * ConvTranspose3d (I, O, kd, kh, kw)-> (kd, kh, kw, I, O)
  * BatchNorm   weight/bias -> scale/bias; running stats -> batch_stats

Reference module -> flax module naming (structural rename only; the
reference nests Sequentials, this tree names each member):
  dm{s}.{i} -> stage{s}/dm/conv{i};  spx_{s}.{0,1,2} -> stage{s}/spx/...
  blocks.{i}.net.{0,1} -> block{i}/sm{1,2};  mlp.fc.{0,2} -> fc{1,2}
  aggregation/up_refinement conv1.0 -> conv1_0 etc.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from esmstereo_tpu.backbones import ARCHS

# block{g}.{j} Sequential-of-Sequentials -> timm stage index
# (layers=[1,2,3,5,6] slicing, ESMStereo.py:62-66)
_BLOCK_GROUPS = ((0,), (1,), (2,), (3, 4), (5,))


def _conv2(w):
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _conv3(w):
    return np.ascontiguousarray(np.transpose(w, (2, 3, 4, 1, 0)))


def _deconv2(w):
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1)))


def _deconv3(w):
    return np.ascontiguousarray(np.transpose(w, (2, 3, 4, 0, 1)))


def _rules(cv_scale: int, cost_volume: str, backbone: str) -> dict:
    """torch module prefix -> (flax path, kind).

    Kinds: ``conv`` (plain torch conv, bias optional), ``bn``, ``ln``
    (LayerNorm weight), ``basic2``/``basic3`` (BasicConv = conv+bn),
    ``deconv2``/``deconv3`` (BasicConv with ConvTranspose).
    """
    R: dict[str, tuple[tuple, str]] = {}

    def basic(tp, path, kind="basic2"):
        R[tp] = (tuple(path), kind)

    # --- backbone ----------------------------------------------------
    R["feature.conv_stem"] = (("feature", "conv_stem"), "conv")
    R["feature.bn1"] = (("feature", "bn1"), "bn")
    arch = ARCHS[backbone]
    for g, stages in enumerate(_BLOCK_GROUPS):
        for j, s in enumerate(stages):
            for i, bcfg in enumerate(arch.stages[s]):
                tp = f"feature.block{g}.{j}.{i}"
                fp = ("feature", f"blocks_{s}_{i}")
                subs = (("conv_dw", "conv_pw") if bcfg.kind == "ds"
                        else ("conv_pw", "conv_dw", "conv_pwl"))
                for sub in subs:
                    R[f"{tp}.{sub}"] = ((*fp, sub), "conv")
                nbn = 2 if bcfg.kind == "ds" else 3
                for b in range(1, nbn + 1):
                    R[f"{tp}.bn{b}"] = ((*fp, f"bn{b}"), "bn")
                if bcfg.se_ratio > 0:
                    for se in ("conv_reduce", "conv_expand"):
                        R[f"{tp}.se.{se}"] = ((*fp, "se", se), "conv")

    # --- FeatUp ------------------------------------------------------
    if cv_scale in (4, 8):
        def conv2x(tname, fname):
            basic(f"feature_up.{tname}.conv1",
                  ("feature_up", fname, "conv1"), "deconv2")
            basic(f"feature_up.{tname}.conv2",
                  ("feature_up", fname, "conv2"))

        conv2x("deconv32_16", "deconv32_16")
        conv2x("deconv16_8", "deconv16_8")
        if cv_scale == 8:
            basic("feature_up.conv8", ("feature_up", "conv8"))
        else:
            conv2x("deconv8_4", "deconv8_4")
            basic("feature_up.conv4", ("feature_up", "conv4"))

    # --- stems + descriptors ------------------------------------------
    n_stems = {4: 2, 8: 3, 16: 4}[cv_scale]
    for i in range(n_stems):
        name = f"stem_{2 ** (i + 1)}"
        basic(f"{name}.0", (name, "conv_down"))
        R[f"{name}.1"] = ((name, "conv"), "conv")
        R[f"{name}.2"] = ((name, "bn"), "bn")
    basic("conv", ("conv",))
    R["desc"] = (("desc",), "conv")

    # --- cost volume stems / semantic attention -----------------------
    if cost_volume == "norm_correlation":
        basic("corr_stem", ("corr_stem",), "basic3")
    else:
        basic("group_stem", ("group_stem",), "basic3")
    if cv_scale == 16:
        basic("semantic.0", ("semantic_0",))
        R["semantic.1"] = (("semantic_1",), "conv")
        basic("conv_f2", ("conv_f2",))
        basic("conv_f0", ("conv_f0",))
    basic("agg", ("agg",), "basic3")

    # --- hourglasses ---------------------------------------------------
    def hourglass(tp, fpath, dims):
        b = "basic3" if dims == 3 else "basic2"
        d = "deconv3" if dims == 3 else "deconv2"
        for nm in ("conv1", "conv2", "conv3", "agg_0", "agg_1"):
            for i in (0, 1):
                basic(f"{tp}.{nm}.{i}", (*fpath, f"{nm}_{i}"), b)
        for nm in ("conv3_up", "conv2_up"):
            basic(f"{tp}.{nm}", (*fpath, nm), d)
        # conv1_up is BasicConv(..., bn=False): the reference still
        # CONSTRUCTS its nn.BatchNorm (submodule.py:24,30 — only forward
        # skips it), so the state_dict carries dead BN tensors to drop.
        basic(f"{tp}.conv1_up", (*fpath, "conv1_up"), d + "_deadbn")

    hourglass("aggregation_out", ("aggregation_out",), 3)

    # --- ESM upsampler -------------------------------------------------
    def fmblock(tp, fpath):
        for tnet, fsm in (("net.0", "sm1"), ("net.1", "sm2")):
            for nrm in ("norm1", "norm2"):
                R[f"{tp}.{tnet}.{nrm}.body"] = ((*fpath, fsm, nrm), "ln")
            for mlp in ("mlp1", "mlp2"):
                R[f"{tp}.{tnet}.{mlp}.fc.0"] = ((*fpath, fsm, mlp, "fc1"),
                                                "conv")
                R[f"{tp}.{tnet}.{mlp}.fc.2"] = ((*fpath, fsm, mlp, "fc2"),
                                                "conv")
            R[f"{tp}.{tnet}.spatial"] = ((*fpath, fsm, "spatial"), "conv")
        R[f"{tp}.conv.0"] = ((*fpath, "conv_expand"), "conv")
        R[f"{tp}.conv.2"] = ((*fpath, "conv_project"), "conv")

    def upstage(sfx, fstage, use_mixer):
        U = "upsample_module"
        for i in range(4):
            basic(f"{U}.dm{sfx}.{i}", (U, fstage, "dm", f"conv{i}"))
        basic(f"{U}.spx_{sfx}.0", (U, fstage, "spx", "conv0"))
        R[f"{U}.spx_{sfx}.1"] = ((U, fstage, "spx", "conv1"), "conv")
        R[f"{U}.spx_{sfx}.2"] = ((U, fstage, "spx", "bn"), "bn")
        if use_mixer:
            R[f"{U}.to_feat"] = ((U, fstage, "to_feat"), "conv")
            for b in range(2):
                fmblock(f"{U}.blocks.{b}", (U, fstage, f"block{b}"))
        R[f"{U}.upsampling{sfx[:-1]}.0"] = ((U, fstage, "up", "conv"), "conv")
        R[f"{U}.tail{sfx}"] = ((U, fstage, "tail"), "conv")
        hourglass(f"{U}.ref{sfx}", (U, fstage, "ref"), 2)

    stage_sfx = {4: ("2x", "4x"), 8: ("2x", "4x", "8x"), 16: ("2x", "4x")}
    for k, sfx in enumerate(stage_sfx[cv_scale]):
        upstage(sfx, f"stage{sfx}", use_mixer=(k == 0))

    return R


def _confidence_rules(cost_volume: str, backbone: str) -> dict:
    """Rules for ``ESMStereo_confidence`` (cv16-only, ``:746-976``): the
    base network under the flax ``stereo`` submodule plus the LAFNet head
    and the two conf_upsample stages under ``confidence_net``."""
    R = {tp: (("stereo", *path), kind)
         for tp, (path, kind) in _rules(16, cost_volume, backbone).items()}
    C = "confidence_net"

    def conv(tp, path):
        R[tp] = ((C, *path), "conv")

    def bn(tp, path):
        R[tp] = ((C, *path), "bn")

    for feat in ("cost", "disp", "imag"):
        for i in (1, 2, 3):
            conv(f"{C}.{feat}_conv{i}", (f"{feat}_feat", f"conv{i}"))
            bn(f"{C}.{feat}_bn{i}", (f"{feat}_feat", f"bn{i}"))
        for i in (1, 2):
            conv(f"{C}.{feat}_att_conv{i}", (f"{feat}_att", f"conv{i}"))
            bn(f"{C}.{feat}_att_bn{i}", (f"{feat}_att", f"bn{i}"))
    for i in (1, 2, 3):
        conv(f"{C}.scale_conv{i}", (f"scale_conv{i}",))
        bn(f"{C}.scale_bn{i}", (f"scale_bn{i}",))
    for i in (1, 2):
        conv(f"{C}.embed_conv{i}", (f"embed_conv{i}",))
        bn(f"{C}.embed_bn{i}", (f"embed_bn{i}",))
    for i in (1, 2, 3):
        conv(f"{C}.fusion_conv{i}", (f"fusion_conv{i}",))
        for it in (1, 2, 3):
            bn(f"{C}.fusion_bn{i}_iter{it}", (f"fusion_bn{i}_iter{it}",))
    for up in ("conf_up4", "conf_up1"):
        base = f"{C}.{up}"
        R[f"{base}.conv1"] = ((C, up, "conv1"), "basic2")
        R[f"{base}.conv2"] = ((C, up, "conv2"), "basic2")
        R[f"{base}.conv1_up"] = ((C, up, "conv1_up"), "deconv2")
        for i in range(4):
            R[f"{base}.cm.{i}"] = ((C, up, f"cm{i}"), "basic2")
        R[f"{base}.conf_spx_4.0"] = ((C, up, "spx4_0"), "basic2")
        R[f"{base}.conf_spx_4.1"] = ((C, up, "spx4_1"), "conv")
        R[f"{base}.conf_spx_4.2"] = ((C, up, "spx4_bn"), "bn")
        # plain nn.ConvTranspose2d (bias=True); flax TorchConvTranspose
        # owns kernel/bias directly
        R[f"{base}.conf_spx"] = ((C, up, "spx"), "deconv_plain")
    return R


def convert_reference_state_dict(
        state_dict: Mapping[str, Any], *, cv_scale: int, cost_volume: str,
        backbone: str, confidence: bool = False) -> tuple[dict, dict]:
    """Reference ``state_dict`` -> (params tree, batch_stats tree).

    Raises on any state_dict tensor it does not know how to place (so
    reference-surface drift is loud, not silent). ``confidence`` selects
    the ESMStereo_confidence layout (base net under ``stereo`` + LAFNet
    head under ``confidence_net``).
    """
    if confidence:
        assert cv_scale == 16, "confidence head is cv16-only (:868-871)"
        rules = _confidence_rules(cost_volume, backbone)
    else:
        rules = _rules(cv_scale, cost_volume, backbone)
    params: dict = {}
    stats: dict = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        assert path[-1] not in node, f"duplicate {path}"
        node[path[-1]] = np.asarray(value, np.float32)

    for key, value in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue
        value = np.asarray(value.detach().cpu().numpy()
                           if hasattr(value, "detach") else value)
        # longest matching registered prefix
        parts = key.split(".")
        hit = None
        for cut in range(len(parts) - 1, 0, -1):
            prefix = ".".join(parts[:cut])
            if prefix in rules:
                hit = (rules[prefix], ".".join(parts[cut:]))
                break
        if hit is None:
            raise KeyError(f"no transplant rule for reference key {key!r}")
        (fpath, kind), leaf = hit

        if kind == "deconv_plain":
            if leaf == "weight":
                put(params, (*fpath, "kernel"), _deconv2(value))
            elif leaf == "bias":
                put(params, (*fpath, "bias"), value)
            else:
                raise KeyError(f"{key}: unexpected deconv leaf {leaf}")
        elif kind == "conv":
            if leaf == "weight":
                put(params, (*fpath, "Conv_0", "kernel"), _conv2(value))
            elif leaf == "bias":
                put(params, (*fpath, "Conv_0", "bias"), value)
            else:
                raise KeyError(f"{key}: unexpected conv leaf {leaf}")
        elif kind == "bn":
            _put_bn(params, stats, fpath, leaf, value, put, key)
        elif kind == "ln":
            assert leaf == "weight", key
            put(params, (*fpath, "weight"), value)
        elif kind.endswith("_deadbn") and leaf.startswith("bn."):
            continue  # dead BN of a bn=False BasicConv (never executed)
        elif kind.split("_")[0] in ("basic2", "basic3", "deconv2", "deconv3"):
            kind = kind.split("_")[0]
            if leaf == "conv.weight":
                tr = {"basic2": _conv2, "basic3": _conv3,
                      "deconv2": _deconv2, "deconv3": _deconv3}[kind]
                if kind.startswith("deconv"):
                    # TorchConvTranspose owns its kernel directly
                    put(params, (*fpath, "conv", "kernel"), tr(value))
                else:
                    put(params, (*fpath, "conv", "Conv_0", "kernel"),
                        tr(value))
            elif leaf.startswith("bn."):
                _put_bn(params, stats, (*fpath, "bn"), leaf[3:], value, put,
                        key)
            else:
                raise KeyError(f"{key}: unexpected BasicConv leaf {leaf}")
        else:
            raise AssertionError(kind)

    return params, stats


def _put_bn(params, stats, path, leaf, value, put, key):
    if leaf == "weight":
        put(params, (*path, "scale"), value)
    elif leaf == "bias":
        put(params, (*path, "bias"), value)
    elif leaf == "running_mean":
        put(stats, (*path, "mean"), value)
    elif leaf == "running_var":
        put(stats, (*path, "var"), value)
    else:
        raise KeyError(f"{key}: unexpected BN leaf {leaf}")


def _merge(dst: dict, src: dict, path=()) -> int:
    n = 0
    for k, v in src.items():
        if k not in dst:
            raise KeyError(
                f"transplanted key {'/'.join(map(str, (*path, k)))} missing "
                f"from the flax tree (have: {sorted(dst)})")
        if isinstance(v, dict):
            n += _merge(dst[k], v, (*path, k))
        else:
            want = dst[k].shape
            assert tuple(v.shape) == tuple(want), \
                ((*path, k), v.shape, want)
            dst[k] = v.astype(dst[k].dtype)
            n += 1
    return n


def load_reference_weights(variables: dict, state_dict: Mapping[str, Any],
                           *, cv_scale: int, cost_volume: str,
                           backbone: str, confidence: bool = False,
                           require_full: bool = True) -> dict:
    """Return ``variables`` with every leaf replaced from the reference
    ``state_dict``. With ``require_full`` every flax leaf must be covered."""
    import jax

    variables = jax.tree_util.tree_map(np.asarray, variables)
    params, stats = convert_reference_state_dict(
        state_dict, cv_scale=cv_scale, cost_volume=cost_volume,
        backbone=backbone, confidence=confidence)
    n_p = _merge(variables["params"], params)
    n_s = _merge(variables["batch_stats"], stats)
    if require_full:
        total_p = len(jax.tree_util.tree_leaves(variables["params"]))
        total_s = len(jax.tree_util.tree_leaves(variables["batch_stats"]))
        assert n_p == total_p, (
            f"transplant covered {n_p}/{total_p} param leaves — flax tree "
            "has parameters the reference does not")
        assert n_s == total_s, (n_s, total_s)
    return variables
