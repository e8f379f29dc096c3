"""Sweep-direction gather/scatter between the 3D state and 1D-slice stacking.

The reference integrators load per-pencil 1D vectors U1d with cyclically
permuted momentum/field components per sweep direction
(integrate_3d_ctu.c:202-222 for x1; x2 uses (Mx,My,Mz)=(M2,M3,M1); x3 uses
(M3,M1,M2)), then scatter fluxes back with the inverse permutation
(e.g. the x2-flux of My updates M3: transverse-correction tables at
integrate_3d_ctu.c:984-987, 1028-1031).

Here a "sweep view" is the whole 3D grid at once: stacked arrays
[nvar1d, ..., M] with the sweep direction moved to the last axis.  axis is
the Athena direction 0,1,2 (x1,x2,x3); arrays are stored [nvar, Nz, Ny, Nx]
so Athena axis a is array dimension 3-a (x1 fastest, matching k/j/i loops).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import SimConfig
from ..defs import ID, IM1, IEN


def _adim(axis: int) -> int:
    """Array dimension (of a [Nz,Ny,Nx] block) for Athena axis `axis`."""
    return 2 - axis


def var_perm(axis: int, sim: SimConfig):
    """Index permutation taking the physical cell-centered ordering
    (d, M1, M2, M3, [E], s...) to the sweep ordering (d, Mx, My, Mz, [E],
    s...) for `axis` (cyclic: x2 sweep has (Mx,My,Mz)=(M2,M3,M1))."""
    a1, a2, a3 = axis, (axis + 1) % 3, (axis + 2) % 3
    perm = [ID, IM1 + a1, IM1 + a2, IM1 + a3]
    base = 4
    if sim.adiabatic:
        perm.append(IEN)
        base = 5
    perm.extend(range(base, base + sim.nscalars))
    return perm


def inv_perm(perm):
    out = [0] * len(perm)
    for i, p in enumerate(perm):
        out[p] = i
    return out


def vperm_to_sweep(X, axis: int, sim: SimConfig):
    """Variable permutation ONLY (no spatial transpose): physical-order
    stacked [ncons, Nz, Ny, Nx] -> sweep variable order, axes untouched.
    Consumers then shift along the sweep axis directly — the arithmetic is
    axis-agnostic, so this avoids materializing per-sweep transposes."""
    return X[var_perm(axis, sim), ...]


def vperm_from_sweep(X, axis: int, sim: SimConfig):
    """Inverse of vperm_to_sweep."""
    return X[inv_perm(var_perm(axis, sim)), ...]


def permute_to_sweep(X, axis: int, sim: SimConfig):
    """Physical-order stacked array [ncons, Nz, Ny, Nx] -> sweep order with
    the sweep axis last.  (No B components — hydro/cc fields only.)"""
    X = X[var_perm(axis, sim), ...]
    return jnp.moveaxis(X, _adim(axis) + 1, -1)


def permute_from_sweep(X, axis: int, sim: SimConfig):
    """Inverse of permute_to_sweep (for states or fluxes without B)."""
    X = jnp.moveaxis(X, -1, _adim(axis) + 1)
    return X[inv_perm(var_perm(axis, sim)), ...]


def to_sweep(U, Bcc, axis: int, sim: SimConfig):
    """Gather (U1d, Bxc) in 1D-slice ordering with sweep axis last.

    U1d = (d, Mx, My, Mz, [E], [By, Bz], s...) where (x,y,z) is the cyclic
    permutation starting at `axis`.
    """
    a1, a2, a3 = axis, (axis + 1) % 3, (axis + 2) % 3
    src = _adim(axis) + 1  # +1 for the leading variable axis of U

    comps = [U[ID], U[IM1 + a1], U[IM1 + a2], U[IM1 + a3]]
    if sim.adiabatic:
        comps.append(U[IEN])
    if sim.mhd:
        comps.extend([Bcc[a2], Bcc[a3]])
    iscal = (5 if sim.adiabatic else 4)
    for n in range(sim.nscalars):
        comps.append(U[iscal + n])
    U1d = jnp.stack(comps)
    U1d = jnp.moveaxis(U1d, src, -1)
    Bxc = None
    if sim.mhd:
        Bxc = jnp.moveaxis(Bcc[a1], _adim(axis), -1)
    return U1d, Bxc


def from_sweep_flux(F, axis: int, sim: SimConfig):
    """Scatter a sweep-ordered flux [nvar1d, ..., M] back to state ordering.

    Returns (FU, FByz) where FU is [ncons, Nz, Ny, Nx]-ordered flux of the
    cell-centered U, and FByz = (flux of Bcc[a2], flux of Bcc[a3]) or None.
    """
    a1, a2, a3 = axis, (axis + 1) % 3, (axis + 2) % 3
    F = jnp.moveaxis(F, -1, _adim(axis) + 1)
    nM = [None, None, None]
    nM[a1], nM[a2], nM[a3] = F[1], F[2], F[3]
    out = [F[0], nM[0], nM[1], nM[2]]
    ib = 5 if sim.adiabatic else 4
    if sim.adiabatic:
        out.append(F[4])
    iscal = ib + (2 if sim.mhd else 0)
    for n in range(sim.nscalars):
        out.append(F[iscal + n])
    FU = jnp.stack(out)
    FByz = (F[ib], F[ib + 1]) if sim.mhd else None
    return FU, FByz


def sh(q, k, axis=-1):
    """sh(q,k)[...,i] == q[...,i+k] along `axis` (wrap; invalid at edges)."""
    return jnp.roll(q, -k, axis=axis)
