"""Boundary conditions on the cell-centered state (reference: src/bvals_mhd.c).

Physical BCs fill the nghost ghost layers per axis, in the fixed order
x1 → x2 → x3 so that edge/corner ghosts are filled correctly
(bvals_mhd.c:170-171).  Flags (bvals_mhd.c:540-637):

  1 reflect   — mirror cells, negate the normal momentum; normal interface
                field reflected (reflecting boundary, B_normal continuous=0)
  2 outflow   — zero-gradient copy of the edge active plane
  4 periodic  — wrap-around copy (serial analogue of the MPI wraparound)
  5 conductor — like reflect but B_normal is kept (MHD; reflect_* in this
                fork per SURVEY Appendix A)
  0 user      — problem-enrolled function (bvals_mhd_fun, bvals_mhd.c:917)

The sharded version (parallel/halo.py) replaces interior faces with
`ppermute` halo exchange; these physical BCs then apply only on true domain
edges, exactly like the reference applies them only on ranks with no
neighbor (bvals_mhd.c:199-276).
"""

from __future__ import annotations

import jax.numpy as jnp

from .config import (BC_CONDUCTOR, BC_OUTFLOW, BC_PERIODIC, BC_REFLECT,
                     BC_USER, GridConfig, SimConfig)
from .defs import IM1
from .state import State


def _adim(axis: int) -> int:
    return 2 - axis


def _fill(arr, axis_dim, ng, side, block):
    """Write `block` into the ghost slab on `side` ('lo'/'hi') of axis_dim."""
    idx = [slice(None)] * arr.ndim
    idx[axis_dim] = slice(0, ng) if side == "lo" else slice(-ng, None)
    return arr.at[tuple(idx)].set(block)


def _take(arr, axis_dim, sl):
    idx = [slice(None)] * arr.ndim
    idx[axis_dim] = sl
    return arr[tuple(idx)]


def _ghost_block(arr, axis_dim, ng, side, flag, negate_comp=None):
    """Build the ghost slab for one array/side from the active cells."""
    n = arr.shape[axis_dim]
    if flag == BC_PERIODIC:
        src = slice(n - 2 * ng, n - ng) if side == "lo" else slice(ng, 2 * ng)
        return _take(arr, axis_dim, src)
    if flag == BC_OUTFLOW:
        src = slice(ng, ng + 1) if side == "lo" else slice(n - ng - 1, n - ng)
        edge = _take(arr, axis_dim, src)
        reps = [1] * arr.ndim
        reps[axis_dim] = ng
        return jnp.tile(edge, reps)
    if flag in (BC_REFLECT, BC_CONDUCTOR):
        src = slice(ng, 2 * ng) if side == "lo" else slice(n - 2 * ng, n - ng)
        return jnp.flip(_take(arr, axis_dim, src), axis=axis_dim)
    raise NotImplementedError(f"BC flag {flag}")


def apply_bc(state: State, grid: GridConfig, sim: SimConfig,
             problem=None) -> State:
    """Fill all ghost zones of U (and Bcc/B*i for MHD)."""
    ng = grid.nghost
    U = state.U
    Bcc = state.Bcc
    Bi = [state.B1i, state.B2i, state.B3i] if sim.mhd else None

    for axis in (0, 1, 2):
        if not grid.active(axis):
            continue
        ad_U = _adim(axis) + 1      # +1 for variable axis of U / Bcc
        ad = _adim(axis)
        for side, flag in zip(("lo", "hi"), grid.bc[axis]):
            if flag == BC_USER:
                name = f"bc_{'i' if side == 'lo' else 'o'}x{axis + 1}"
                fn = getattr(problem, name, None)
                if fn is None:
                    raise ValueError(
                        f"BC flag 0 on axis {axis} ({side}) but problem "
                        "enrolls no user BC function")
                state = state.replace(U=U, Bcc=Bcc) if sim.mhd \
                    else state.replace(U=U)
                state = fn(state, grid, sim)
                U = state.U
                Bcc = state.Bcc
                continue
            blk = _ghost_block(U, ad_U, ng, side, flag)
            if flag in (BC_REFLECT, BC_CONDUCTOR):
                blk = blk.at[IM1 + axis].multiply(-1.0)
            U = _fill(U, ad_U, ng, side, blk)
            if sim.mhd:
                bblk = _ghost_block(Bcc, ad_U, ng, side, flag)
                if flag == BC_REFLECT:
                    bblk = bblk.at[axis].multiply(-1.0)
                Bcc = _fill(Bcc, ad_U, ng, side, bblk)
                for b in range(3):
                    fblk = _ghost_block(Bi[b], ad, ng, side, flag)
                    if flag == BC_REFLECT and b == axis:
                        fblk = -fblk
                    Bi[b] = _fill(Bi[b], ad, ng, side, fblk)

    kw = dict(U=U)
    if sim.mhd:
        kw.update(Bcc=Bcc, B1i=Bi[0], B2i=Bi[1], B3i=Bi[2])
    return state.replace(**kw)
