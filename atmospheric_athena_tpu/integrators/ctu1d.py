"""1D CTU integrator (reference: src/integrators/integrate_1d_ctu.c).

One whole-grid jittable update step.  Step numbering follows the reference
(and its 3D version): 1 (L/R states + fluxes with half-dt sources), 8
(n+1/2 cell-centered states), 11 (full-dt source terms), 12 (conservative
update).  Cartesian only (no CYLINDRICAL terms).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import GridConfig, SimConfig
from ..defs import ID, IM1, IM2, IM3, IEN
from ..eos import cons1d_to_prim1d, prim1d_to_cons1d
from ..ops import reconstruct, riemann
from ..state import State
from .sweep import sh, to_sweep, from_sweep_flux


def step(state: State, dt, sim: SimConfig, grid: GridConfig, problem=None,
         phi=None):   # phi: unused (1D potentials are cheap constants)
    """Advance U by one 1D CTU step along x1.  `dt` is traced."""
    dx1 = grid.dx[0]
    dtodx1 = dt / dx1
    hdtodx1 = 0.5 * dtodx1
    ng = grid.nghost

    U = state.U
    U1d, Bxc = to_sweep(U, state.Bcc, 0, sim)
    Bxi = state.B1i[None] if sim.mhd else None  # face Bx (1D: = Bxc, const)

    # --- Step 1b: primitive states + L/R reconstruction ---------------------
    W = cons1d_to_prim1d(U1d, Bxc, sim)
    Wminus, Wplus = reconstruct.lr_states(W, Bxc, dtodx1, sim)

    # Interface arrays indexed f = between cells f-1 and f:
    #   Wl[f] = Wplus[f-1], Wr[f] = Wminus[f]  (lr_states_plm.c:17-22)
    Wl = sh(Wplus, -1)
    Wr = Wminus

    # --- Step 1c: static gravity source for dt/2 on L/R states --------------
    # (integrate_1d_ctu.c:153-171)
    phi_fn = getattr(problem, "static_grav_pot", None) if problem else None
    if phi_fn is not None:
        x1c = jnp.asarray(grid.cc_coords(0), U.dtype)        # cell centers
        x2 = jnp.asarray(grid.xmin[1] + 0.5 * grid.dx[1], U.dtype)
        x3 = jnp.asarray(grid.xmin[2] + 0.5 * grid.dx[2], U.dtype)
        phic = phi_fn(x1c, x2, x3)
        phif = phi_fn(x1c - 0.5 * dx1, x2, x3)               # left faces
        # at interface f: phicl=phic[f-1], phicr=phic[f], phifc=phif[f]
        dVl = dtodx1 * (phif - sh(phic, -1))
        dVr = dtodx1 * (phic - phif)
        Wl = Wl.at[1].add(-dVl)
        Wr = Wr.at[1].add(-dVr)

    # --- Step 1d: interface fluxes ------------------------------------------
    Bxi_f = Bxi[0] if sim.mhd else None
    Ul = prim1d_to_cons1d(Wl, Bxi_f, sim)
    Ur = prim1d_to_cons1d(Wr, Bxi_f, sim)
    F = riemann.fluxes(Ul, Ur, Wl, Wr, Bxi_f, sim)

    dF = sh(F, 1) - F   # dF[...,i] = F[i+1] - F[i]

    # --- Step 8a: dhalf at n+1/2 (needed with gravity) ----------------------
    Unew = U1d
    if phi_fn is not None:
        dhalf = U1d[0] - hdtodx1 * dF[0]

        # --- Step 11a: full-dt gravity source (integrate_1d_ctu.c:445-465) --
        phir = phi_fn(x1c + 0.5 * dx1, x2, x3)
        phil = phif
        dM1 = dtodx1 * dhalf * (phir - phil)
        dE = dtodx1 * (F[0] * (phic - phil) + sh(F[0], 1) * (phir - phic))
        Unew = Unew.at[1].add(-dM1)
        if sim.adiabatic:
            Unew = Unew.at[4].add(-dE)

    # --- Step 12a: conservative update --------------------------------------
    Unew = Unew - dtodx1 * dF

    # Scatter back into state ordering, splicing only active cells
    Unew3, _ = from_sweep_flux(Unew, 0, sim)
    lo, hi = grid.lo(0), grid.hi(0)
    Uout = U.at[..., lo:hi + 1].set(Unew3[..., lo:hi + 1])

    kw = {}
    if sim.mhd:
        # By/Bz cell-centered updates; B2i/B3i set to cell-centered values
        # for consistency (integrate_1d_ctu.c:546-551)
        ib = 5 if sim.adiabatic else 4
        Bcc = state.Bcc
        Bcc = Bcc.at[1, ..., lo:hi + 1].set(Unew[ib][..., lo:hi + 1])
        Bcc = Bcc.at[2, ..., lo:hi + 1].set(Unew[ib + 1][..., lo:hi + 1])
        kw = dict(Bcc=Bcc,
                  B2i=state.B2i.at[..., lo:hi + 1]
                  .set(Bcc[1, ..., lo:hi + 1]),
                  B3i=state.B3i.at[..., lo:hi + 1]
                  .set(Bcc[2, ..., lo:hi + 1]))

    return state.replace(U=Uout, **kw)
