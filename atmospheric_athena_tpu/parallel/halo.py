"""Explicit shard_map halo exchange with jax.lax.ppermute.

The baseline distribution (parallel/mesh.py) keeps one logical padded
array sharded with NamedSharding and lets GSPMD insert the halo
collectives for every stencil shift.  This module provides the
hand-scheduled equivalent of the reference's MPI ghost-zone exchange
(bvals_mhd.c:199-276): each device holds its block plus nghost-deep skins
of its neighbors, refreshed with one `ppermute` pair per mesh axis in the
fixed x1 -> x2 -> x3 order so edge/corner ghosts compose correctly
(bvals_mhd.c:170-171).

Two uses:
  - `exchange` inside any shard_map region: refresh the ghost skins of a
    locally-padded block from the neighbors (periodic ring; true domain
    edges receive wrapped data that physical BCs then overwrite, exactly
    like the reference's no-neighbor ranks).
  - `gather_halos`: build the locally-padded blocks from an unpadded
    sharded array — the explicit analogue of what GSPMD does implicitly
    for one stencil op, and the building block for an
    interior/skin-overlapped step (SURVEY.md §5.8 item 2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _ring(mesh: Mesh, name: str):
    n = mesh.shape[name]
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [((i + 1) % n, i) for i in range(n)]
    return fwd, bwd


def exchange(block, mesh: Mesh, ng: int, axis_names=("z", "y", "x"),
             dims=(-3, -2, -1)):
    """Refresh the ng-deep ghost skins of a locally padded block.

    block: per-device array whose `dims` carry ng ghost layers per side.
    Must run inside shard_map over `mesh` with the matching axis names.
    """
    for name, d in zip(axis_names, dims):
        if mesh.shape[name] == 1:
            # single device along this axis: periodic wrap locally
            src_lo = jax.lax.slice_in_dim(block, ng, 2 * ng, axis=d)
            src_hi = jax.lax.slice_in_dim(
                block, block.shape[d] - 2 * ng, block.shape[d] - ng, axis=d)
            block = _set(block, d, "hi", src_lo)
            block = _set(block, d, "lo", src_hi)
            continue
        fwd, bwd = _ring(mesh, name)
        # my high skin -> neighbor's low ghost
        skin_hi = jax.lax.slice_in_dim(
            block, block.shape[d] - 2 * ng, block.shape[d] - ng, axis=d)
        recv_lo = jax.lax.ppermute(skin_hi, name, fwd)
        skin_lo = jax.lax.slice_in_dim(block, ng, 2 * ng, axis=d)
        recv_hi = jax.lax.ppermute(skin_lo, name, bwd)
        block = _set(block, d, "lo", recv_lo)
        block = _set(block, d, "hi", recv_hi)
    return block


def _set(block, d, side, val):
    ng = val.shape[d]
    idx = [slice(None)] * block.ndim
    idx[d] = slice(0, ng) if side == "lo" else \
        slice(block.shape[d] - ng, None)
    return block.at[tuple(idx)].set(val)


def gather_halos(x, mesh: Mesh, ng: int, spec=P(None, "z", "y", "x")):
    """Sharded unpadded array -> per-device blocks with ng-deep neighbor
    skins along the sharded spatial dims, via shard_map + ppermute.
    Returns a (global-shape + 2*ng-per-sharded-dim) array sharded the same
    way — i.e. each device's local block is its shard plus halos."""
    from jax.experimental.shard_map import shard_map

    dims = tuple(i for i, n in enumerate(spec) if n is not None)
    names = tuple(n for n in spec if n is not None)

    def body(blk):
        pad = [(0, 0)] * blk.ndim
        for d in dims:
            pad[d] = (ng, ng)
        blk = jnp.pad(blk, pad)
        return exchange(blk, mesh, ng, axis_names=names, dims=dims)

    return shard_map(body, mesh=mesh, in_specs=(spec,), out_specs=spec)(x)
