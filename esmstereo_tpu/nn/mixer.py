"""Plain-XLA lowering of the ESM upsampler's ShuffleMixer section.

Counterpart of the reference's ``to_feat -> FMBlock x2 -> PixelShuffle``
chain inside ``upsample4`` (``/root/reference/models/ESMStereo.py:242-318``,
blocks from ``models/shufflemixer.py:23-132``), evaluated directly from
the parameter subtree that ``_UpStage``/``PhUpStage2x`` declare. This is
the DEFAULT eval path of the phased upsampler's stage2x; the fused Pallas
form and the W-phase form live in ``esmstereo_tpu.attic`` (both retired
after measured losses — see the attic package docstring).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_C = 16          # mixer channel width (n_feats of upsample4's stage2x)
_LN_EPS = 1e-5


def _shuffle_p(groups: int = 8, c: int = _C) -> np.ndarray:
    """(c, c) matrix P with ``out = in @ P`` == channel_shuffle(in, groups)
    (``shufflemixer.py:37`` rearrange ``(g d) -> (d g)``)."""
    d = c // groups
    perm = np.empty((c,), np.int64)
    for j in range(c):
        dd, g = divmod(j, groups)
        perm[j] = g * d + dd
    p = np.zeros((c, c), np.float32)
    p[perm, np.arange(c)] = 1.0
    return p


def _up_perm_idx() -> np.ndarray:
    """Output-lane permutation of PhPixelShuffleUp(16, 16, p_in=1): torch
    pixel-shuffle channel order (c, ry, rx) -> phase-major ((qy qx), c)."""
    from esmstereo_tpu.models.phased_upsample import _shuffle_perm_idx
    return _shuffle_perm_idx(_C, 2, 1)


def mixer_reference(x: Array, params: dict, dtype=None) -> Array:
    """Pure-jnp eval of the mixer section (the shipped stage2x path).

    Bit-compatible with ``TorchConv(to_feat) -> FMBlock x2 ->
    PhPixelShuffleUp`` — same lax ops in the same order; verified against
    the plain modules in tests/test_fused_mixer.py.
    """
    dt = dtype or x.dtype

    def conv(v, k, groups=1):
        dn = jax.lax.conv_dimension_numbers(v.shape, k.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        pad = (k.shape[0] - 1) // 2
        return jax.lax.conv_general_dilated(
            v.astype(dt), k.astype(dt), (1, 1), [(pad, pad)] * 2,
            dimension_numbers=dn, feature_group_count=groups)

    def ln(v, weight):
        vf = v.astype(jnp.float32)
        mu = jnp.mean(vf, axis=-1, keepdims=True)
        var = jnp.var(vf, axis=-1, keepdims=True)
        return ((vf - mu) / jnp.sqrt(var + _LN_EPS) * weight).astype(v.dtype)

    shuffle = jnp.asarray(_shuffle_p(), jnp.float32)

    def mlp(t, mp):
        half = _C // 2
        t1, t2 = t[..., :half], t[..., half:]
        # 1x1s as lax convs (not einsums): the module path lowers them as
        # convs, and matching the lowering keeps the partitioned (spatial
        # mesh) reassociation identical to the pre-kernel formulation
        h1 = jax.nn.silu(conv(t1, mp["fc1"]["Conv_0"]["kernel"])
                         + mp["fc1"]["Conv_0"]["bias"].astype(dt))
        y1 = (conv(h1, mp["fc2"]["Conv_0"]["kernel"])
              + mp["fc2"]["Conv_0"]["bias"].astype(dt))
        cat = jnp.concatenate([y1, t2], axis=-1)
        return jnp.einsum("...i,ij->...j", cat, shuffle.astype(cat.dtype))

    def sm(v, smp):
        v = v + mlp(ln(v, smp["norm1"]["weight"]), smp["mlp1"])
        v = conv(v, smp["spatial"]["Conv_0"]["kernel"], groups=_C) \
            + smp["spatial"]["Conv_0"]["bias"].astype(dt)
        return v + mlp(ln(v, smp["norm2"]["weight"]), smp["mlp2"])

    v = conv(x, params["to_feat"]["Conv_0"]["kernel"])
    for bi in (0, 1):
        blk = params[f"block{bi}"]
        y = sm(sm(v, blk["sm1"]), blk["sm2"])
        x2 = y + v
        z = jax.nn.silu(conv(x2, blk["conv_expand"]["Conv_0"]["kernel"])
                        + blk["conv_expand"]["Conv_0"]["bias"].astype(dt))
        z = (conv(z, blk["conv_project"]["Conv_0"]["kernel"])
             + blk["conv_project"]["Conv_0"]["bias"].astype(dt))
        v = z + x2
    uk = params["up"]["conv"]["Conv_0"]["kernel"]
    ub = params["up"]["conv"]["Conv_0"]["bias"]
    idx = _up_perm_idx()
    y = conv(v, uk[:, :, :, idx])
    return jax.nn.silu(y + ub[idx].astype(dt))
