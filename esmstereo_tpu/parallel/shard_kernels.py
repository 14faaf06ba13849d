"""Spatially-sharded execution of the Pallas fast-path kernels.

A ``pallas_call`` cannot be partitioned by XLA's SPMD pass, so rounds 1-4
simply disabled every kernel under a spatial (H-sharded) mesh
(``mesh.spatial_safe_config``) and sharded inference ran the plain XLA
formulation — the single-chip kernel wins (volume 3.9 -> 0.33 ms, stem+agg
2.8 -> 0.5 ms at 544x960 L) vanished on >1 chip. This module restores them
with ``jax.shard_map``: each device runs the unchanged single-chip kernel
on its own H-slab.

  * ``correlation_volume_folded`` is row-local (every output row depends
    only on the same input row), so the shard_map wrap is exact with no
    communication at all.
  * ``folded_stem_agg_apply`` chains two 3x3 convs (2 halo rows per
    side). The halos are exchanged explicitly over the mesh
    (``lax.ppermute`` — the collective rides ICI), and the kernel's
    boundary masking runs in GLOBAL row coordinates (``halo/row0/
    h_global``, see the kernel docstring) so per-shard outputs
    concatenate to exactly the monolithic result; shards at the global
    top/bottom zero-mask their unfilled halo exactly like the
    single-device zero padding.

Equivalence vs the single-device kernels is tested on the 8-device CPU
interpret mesh in tests/test_shard_kernels.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

Array = jax.Array

_SPATIAL = "spatial"
_BATCH_SPEC = P("data", _SPATIAL)

# consts entries that are arrays (must be shard_map inputs, replicated);
# the rest (ints, bools, block metadata) are static and close over.
_CONST_ARRAY_KEYS = ("w0", "s0", "t0", "w1", "s1", "t1")


def _exchange_rows(x: Array, n_shards: int, halo: int) -> Array:
    """Extend the local H-slab with ``halo`` rows from each H-neighbor.

    Shards with no neighbor (global top/bottom) receive zeros — which the
    kernel's global-coordinate masking zeroes again anyway, so the fill
    value is immaterial.
    """
    if n_shards == 1:
        z = jnp.zeros_like(x[:, :halo])
        return jnp.concatenate([z, x, z], axis=1)
    fwd = [(i, i + 1) for i in range(n_shards - 1)]
    bwd = [(i + 1, i) for i in range(n_shards - 1)]
    from_above = jax.lax.ppermute(x[:, -halo:], _SPATIAL, fwd)
    from_below = jax.lax.ppermute(x[:, :halo], _SPATIAL, bwd)
    return jnp.concatenate([from_above, x, from_below], axis=1)


def sharded_correlation_volume_folded(ref: Array, tgt: Array,
                                      max_disp: int, num_groups: int,
                                      mesh: Mesh, *,
                                      normalize: bool = False,
                                      interpret: bool = False) -> Array:
    """H-sharded twin of ``ops.pallas.correlation.correlation_volume_folded``."""
    from esmstereo_tpu.ops.pallas import correlation as _pk

    def body(r, t):
        return _pk.correlation_volume_folded(
            r, t, max_disp, num_groups, normalize=normalize,
            interpret=interpret)

    # check_vma=False: pallas_call out_shapes carry no vma annotation
    return jax.shard_map(body, mesh=mesh,
                         in_specs=(_BATCH_SPEC, _BATCH_SPEC),
                         out_specs=_BATCH_SPEC, check_vma=False)(ref, tgt)


def sharded_folded_stem_agg(vol: Array, consts: dict, mesh: Mesh, *,
                            out_dtype=None,
                            interpret: bool = False) -> Array:
    """H-sharded twin of ``ops.pallas.fused_agg_stem.folded_stem_agg_apply``."""
    from esmstereo_tpu.ops.pallas import fused_agg_stem as _fas

    n = mesh.shape[_SPATIAL]
    h_global = vol.shape[1]
    halo = 2
    static = {k: v for k, v in consts.items()
              if k not in _CONST_ARRAY_KEYS}
    arrays = {k: consts[k] for k in _CONST_ARRAY_KEYS}

    def body(v, a):
        idx = jax.lax.axis_index(_SPATIAL)
        h_loc = v.shape[1]
        slab = _exchange_rows(v, n, halo)
        return _fas.folded_stem_agg_apply(
            slab, {**static, **a}, out_dtype=out_dtype,
            interpret=interpret, halo=halo, row0=idx * h_loc,
            h_global=h_global)

    return jax.shard_map(body, mesh=mesh,
                         in_specs=(_BATCH_SPEC, P()),
                         out_specs=_BATCH_SPEC, check_vma=False)(vol, arrays)
