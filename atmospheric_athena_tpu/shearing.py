"""Shearing-box boundary conditions + EMF remap (reference:
src/bvals_shear.c, 3D / 2D-xy orientation, non-FARGO).

The x1 boundaries of a shearing box are periodic-with-a-twist: after the
ordinary periodic fill, the ghost slabs are shifted in y by the shear
displacement yshear = q*Omega_0*Lx*t, decomposed into an integer cell
offset (a periodic roll over the active y range) and a fractional part
applied as a CONSERVATIVE second-order remap (RemapFlux,
bvals_shear.c:2493-2529, min-mod limited PLM).  The azimuthal momentum of
the wrapped data also jumps by -+ q*Omega_0*Lx (the shear velocity
difference across the box), with the kinetic-energy part of E adjusted so
internal energy is unchanged (bvals_shear.c:183-195).

RemapEy averages the y-EMF on the two x1 boundary faces with the remapped
opposite face so the CT update conserves net Bz exactly
(bvals_shear.c RemapEy_ix1/_ox1; applied by the integrator).

TPU-first notes: joffset/eps are TRACED scalars (functions of t inside
the jitted step); the integer shift is a jnp.roll with a traced shift and
the fractional remap is branch-free PLM arithmetic, so the whole remap
jits into the step.  Serial (single-shard) x1 boundaries; the multichip
version composes with the halo machinery later.
"""

from __future__ import annotations

import jax.numpy as jnp

from .config import GridConfig, SimConfig
from .defs import ID, IEN, IM1


def shear_pars(sim: SimConfig, grid: GridConfig, time):
    """(qomL, joffset, eps_i) from the current time
    (bvals_shear.c:140-171).  eps for ox1 is -eps_i."""
    Lx = grid.xmax[0] - grid.xmin[0]
    Ly = grid.xmax[1] - grid.xmin[1]
    qomL = sim.qshear * sim.omega0 * Lx
    yshear = qomL * time
    deltay = jnp.mod(yshear, Ly)
    joffset = jnp.floor(deltay / grid.dx[1]).astype(jnp.int32)
    eps = jnp.mod(deltay, grid.dx[1]) / grid.dx[1]
    return qomL, joffset, eps


def _dUm(q, ydim):
    """min-mod limited PLM slope along ydim (RemapFlux:2510-2519)."""
    qp = jnp.roll(q, -1, axis=ydim)
    qm = jnp.roll(q, 1, axis=ydim)
    dUc = qp - qm
    dUl = q - qm
    dUr = qp - q
    lim = jnp.minimum(jnp.abs(dUl), jnp.abs(dUr))
    return jnp.where(dUl * dUr > 0.0,
                     jnp.sign(dUc) * jnp.minimum(0.5 * jnp.abs(dUc),
                                                 2.0 * lim),
                     0.0)


def _remap_frac(q, eps, ydim, inner: bool):
    """Conservative fractional remap along y: q[j] - (F[j+1] - F[j]) with
    the upwind flux of RemapFlux (eps >= 0 at ix1, eps <= 0 at ox1)."""
    dUm = _dUm(q, ydim)
    if inner:
        # F[j] = eps*(q[j-1] + 0.5*(1-eps)*dUm[j-1])
        F = eps * (q + 0.5 * (1.0 - eps) * dUm)
        Fj = jnp.roll(F, 1, axis=ydim)          # F at face j
        Fj1 = F                                  # F at face j+1
    else:
        # F[j] = eps*(q[j] - 0.5*(1+eps)*dUm[j]), eps < 0
        F = eps * (q - 0.5 * (1.0 + eps) * dUm)
        Fj = F
        Fj1 = jnp.roll(F, -1, axis=ydim)
    return q - (Fj1 - Fj)


def _roll_active_y(q, shift, grid: GridConfig, ydim):
    """Periodic integer roll over the ACTIVE y range only (ghost rows
    untouched); out[j] = in[j - shift] wrapped."""
    jl, ju = grid.lo(1), grid.hi(1)
    sl = [slice(None)] * q.ndim
    sl[ydim] = slice(jl, ju + 1)
    act = q[tuple(sl)]
    act = jnp.roll(act, shift, axis=ydim)
    return q.at[tuple(sl)].set(act)


def _remap_slab(q, eps, joffset, grid: GridConfig, ydim, inner: bool):
    """Full remap of one x-ghost slab field: fractional (conservative PLM)
    then integer periodic shift, both over active y."""
    qf = _remap_frac(q, eps, ydim, inner)
    jl, ju = grid.lo(1), grid.hi(1)
    sl = [slice(None)] * q.ndim
    sl[ydim] = slice(jl, ju + 1)
    out = q.at[tuple(sl)].set(qf[tuple(sl)])
    shift = joffset if inner else -joffset
    return _roll_active_y(out, shift, grid, ydim)


def shearing_sheet(state, sim: SimConfig, grid: GridConfig, time):
    """Remap both x1 ghost slabs (called AFTER the periodic x1+x2 fills,
    like bvals_mhd.c:390-401; the slab's y ghosts are re-wrapped here as
    in ShearingSheet_ix1 step 8)."""
    ng = grid.nghost
    qomL, joffset, eps = shear_pars(sim, grid, time)
    U = state.U
    mhd = sim.mhd
    Bcc = state.Bcc
    Bi = [state.B1i, state.B2i, state.B3i] if mhd else None

    def do_side(U, Bcc, Bi, inner: bool):
        xs = slice(0, ng) if inner else slice(U.shape[-1] - ng, None)
        sgn = 1.0 if inner else -1.0
        e = eps if inner else -eps
        ydim_u, ydim_f = 2, 1    # y dim of [nv,Nz,Ny,Nx] / [Nz,Ny,Nx]

        slab = U[..., xs]
        M2n = slab[IM1 + 1]
        M2s = M2n + sgn * qomL * slab[ID]
        slab = slab.at[IM1 + 1].set(M2s)
        if sim.adiabatic:
            slab = slab.at[IEN].add(
                (0.5 / slab[ID]) * (M2s ** 2 - M2n ** 2))
        slab = _remap_slab(slab, e, joffset, grid, ydim_u, inner)
        # y-ghost wrap of the slab (step 8)
        Ny = slab.shape[ydim_u]
        jl, ju = grid.lo(1), grid.hi(1)
        idx = [slice(None)] * slab.ndim

        def wrap(sl_arr, ydim):
            lo = [slice(None)] * sl_arr.ndim
            hi = [slice(None)] * sl_arr.ndim
            lo[ydim] = slice(0, jl)
            hi[ydim] = slice(ju + 1, None)
            src_lo = [slice(None)] * sl_arr.ndim
            src_hi = [slice(None)] * sl_arr.ndim
            src_lo[ydim] = slice(ju + 1 - jl, ju + 1)
            src_hi[ydim] = slice(jl, jl + (sl_arr.shape[ydim] - ju - 1))
            sl_arr = sl_arr.at[tuple(lo)].set(sl_arr[tuple(src_lo)])
            sl_arr = sl_arr.at[tuple(hi)].set(sl_arr[tuple(src_hi)])
            return sl_arr

        slab = wrap(slab, ydim_u)
        U = U.at[..., xs].set(slab)

        if mhd:
            bslabs = []
            for arr in (Bcc[0], Bi[0], Bi[1], Bi[2]):
                b = _remap_slab(arr[..., xs], e, joffset, grid, ydim_f,
                                inner)
                b = wrap(b, ydim_f)
                bslabs.append(b)
            Bcc = Bcc.at[0, ..., xs].set(bslabs[0])
            # the ox1 copy-back skips the shared ACTIVE face B1i[ie+1]
            # ("except B1i[ie+1]", ShearingSheet_ox1 step 6) — it is
            # evolved by CT with RemapEy keeping the two boundary faces
            # consistent; overwriting it breaks div(B)
            if inner:
                B1new = Bi[0].at[..., xs].set(bslabs[1])
            else:
                B1new = Bi[0].at[..., U.shape[-1] - ng + 1:].set(
                    bslabs[1][..., 1:])
            Bi = [B1new,
                  Bi[1].at[..., xs].set(bslabs[2]),
                  Bi[2].at[..., xs].set(bslabs[3])]
            # ghost-slab cell-centered B2c/B3c from remapped face
            # averages: compute over active y (step 7), wrap the y
            # ghosts (step 8), then fix rows je and js-1 from the
            # wrapped B2i[je+1] (step 10) — a plain roll would pull the
            # wrong value into the outermost y-ghost row
            b2s, b3s = bslabs[2], bslabs[3]
            B2c = 0.5 * (b2s + jnp.roll(b2s, -1, axis=ydim_f))
            B3c = 0.5 * (b3s + jnp.roll(b3s, -1, axis=0))
            B2c = wrap(B2c, ydim_f)
            B3c = wrap(B3c, ydim_f)
            B2c = B2c.at[:, ju].set(0.5 * (b2s[:, ju + 1] + b2s[:, ju]))
            B2c = B2c.at[:, jl - 1].set(
                0.5 * (b2s[:, jl - 1] + b2s[:, jl]))
            Bcc = Bcc.at[1, ..., xs].set(B2c)
            Bcc = Bcc.at[2, ..., xs].set(B3c)
        return U, Bcc, Bi

    U, Bcc, Bi = do_side(U, Bcc, Bi, True)
    U, Bcc, Bi = do_side(U, Bcc, Bi, False)
    kw = {}
    if mhd:
        kw = dict(Bcc=Bcc, B1i=Bi[0], B2i=Bi[1], B3i=Bi[2])
    return state.replace(U=U, **kw)


def remap_ey(emf2, sim: SimConfig, grid: GridConfig, time):
    """RemapEy_ix1/_ox1: average the y-EMF on each x1 boundary face with
    the remapped opposite face so net Bz is conserved (bvals_shear.c)."""
    qomL, joffset, eps = shear_pars(sim, grid, time)
    ilo, ihi = grid.lo(0), grid.hi(0) + 1   # boundary faces is, ie+1

    jl, ju = grid.lo(1), grid.hi(1)

    def one(face_idx, src_idx, inner: bool):
        tEy = emf2[..., src_idx]             # [Nz, Ny]
        # periodic y-ghost rebuild (RemapEy step 2)
        tEy = tEy.at[:, :jl].set(tEy[:, ju + 1 - jl:ju + 1])
        tEy = tEy.at[:, ju + 1:].set(
            tEy[:, jl:jl + (tEy.shape[1] - ju - 1)])
        e = eps if inner else -eps
        t2 = _remap_frac(tEy, e, 1, inner)
        shift = joffset if inner else -joffset
        act = jnp.roll(t2[:, jl:ju + 1], shift, axis=1)
        face = emf2[..., face_idx]
        return face.at[:, jl:ju + 1].set(
            0.5 * (face[:, jl:ju + 1] + act))

    new_lo = one(ilo, ihi, True)
    new_hi = one(ihi, ilo, False)
    emf2 = emf2.at[..., ilo].set(new_lo)
    emf2 = emf2.at[..., ihi].set(new_hi)
    return emf2
