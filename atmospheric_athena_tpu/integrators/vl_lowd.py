"""1D/2D van Leer (MUSCL-Hancock) integrator — Newtonian and
special-relativistic hydrodynamics.

Reference: src/integrators/integrate_1d_vl.c, integrate_2d_vl.c and the
SR variants integrate_1d_vl_sr.c / integrate_2d_vl_sr.c (identical step
maps; SR differs only in the variable conversions, the solver family, and
the superluminal/positivity guards of :150-230).

Steps: (1) W = Cons->Prim; (2) first-order donor-cell fluxes at t^n per
axis; (3) half-dt conservative update -> Uhalf (+gravity half sources);
(4) Whalf with the SR guard (d<0, P<0 or v^2>1 reverts to W^n,
integrate_1d_vl_sr.c:158-183); (5) second-order primitive L/R states from
Whalf (lr_states non-CTU branch; SR guards superluminal traced states,
:210-224); (6) full fluxes; (7) full-dt update + gravity at n+1/2.
MHD in 1D/2D VL still pending (needs the reduced CT update).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import GridConfig, SimConfig
from ..defs import ID, IEN, IM1
from ..eos import cons1d_to_prim1d, prim1d_to_cons1d
from ..eos_sr import sr_cons1d_to_prim1d, sr_prim1d_to_cons1d
from ..ops import reconstruct, riemann
from ..state import State
from .ctu3d import _phi_arrays, _sh, _shf
from .sweep import vperm_from_sweep, vperm_to_sweep


def step(state: State, dt, sim: SimConfig, grid: GridConfig, problem=None):
    assert sim.gas == "hydro", "1D/2D VL MHD pending"
    axes = [a for a in range(3) if grid.active(a)]
    dtodx = {a: dt / grid.dx[a] for a in axes}
    hq = {a: 0.5 * dtodx[a] for a in axes}
    sr = sim.special_relativity

    def c2p(U1d):
        return sr_cons1d_to_prim1d(U1d, sim) if sr else \
            cons1d_to_prim1d(U1d, None, sim)

    def p2c(W1d):
        return sr_prim1d_to_cons1d(W1d, sim) if sr else \
            prim1d_to_cons1d(W1d, None, sim)

    U = state.U
    phic, phif = _phi_arrays(problem, grid, U.dtype)

    # === steps 1-3: first-order fluxes at t^n, half-dt update ==============
    Uhalf = U
    Fp = {}
    for a in axes:
        U1d = vperm_to_sweep(U, a, sim)
        W1d = c2p(U1d)
        Wl = _sh(W1d, -1, a)
        Ul = _sh(U1d, -1, a)
        F = riemann.fluxes(Ul, U1d, Wl, W1d, None, sim)
        Fp[a] = vperm_from_sweep(F, a, sim)
        Uhalf = Uhalf - hq[a] * (_sh(Fp[a], 1, a) - Fp[a])

    if phic is not None:
        for a in axes:
            phir = _shf(phif[a], 1, a)
            phil = phif[a]
            Uhalf = Uhalf.at[IM1 + a].add(
                -hq[a] * U[ID] * (phir - phil))
            if sim.adiabatic:
                Uhalf = Uhalf.at[IEN].add(
                    -hq[a] * (Fp[a][ID] * (phic - phil) +
                              _shf(Fp[a][ID], 1, a) * (phir - phic)))

    # === step 4: Whalf with the SR positivity/causality guard ==============
    Whalf_s = {}
    for a in axes:
        Uh1d = vperm_to_sweep(Uhalf, a, sim)
        Wh = c2p(Uh1d)
        if sr:
            W0 = c2p(vperm_to_sweep(U, a, sim))
            vsq = Wh[1] ** 2 + Wh[2] ** 2 + Wh[3] ** 2
            bad = (Wh[0] < 0.0) | (Wh[4] < 0.0) | (vsq > 1.0)
            Wh = jnp.where(bad, W0, Wh)
        Whalf_s[a] = Wh

    # === steps 5-7: second-order states, full fluxes, final update =========
    Unew = U
    Fp2 = {}
    for a in axes:
        Wh = Whalf_s[a]
        Wm, Wp_ = reconstruct.lr_states(Wh, None, dtodx[a], sim,
                                        axis=2 - a)
        Wl = _sh(Wp_, -1, a)
        Wr = Wm
        if sr:  # superluminal traced states revert to cell values (:210-224)
            vl = Wl[1] ** 2 + Wl[2] ** 2 + Wl[3] ** 2
            vr = Wr[1] ** 2 + Wr[2] ** 2 + Wr[3] ** 2
            bad = (vl > 1.0) | (vr > 1.0)
            Wl = jnp.where(bad, _sh(Wh, -1, a), Wl)
            Wr = jnp.where(bad, Wh, Wr)
        Ul = p2c(Wl)
        Ur = p2c(Wr)
        F = riemann.fluxes(Ul, Ur, Wl, Wr, None, sim)
        Fp2[a] = vperm_from_sweep(F, a, sim)
        Unew = Unew - dtodx[a] * (_sh(Fp2[a], 1, a) - Fp2[a])

    if phic is not None:
        dhalf = Uhalf[ID]
        for a in axes:
            phir = _shf(phif[a], 1, a)
            phil = phif[a]
            Unew = Unew.at[IM1 + a].add(
                -dtodx[a] * dhalf * (phir - phil))
            if sim.adiabatic:
                Unew = Unew.at[IEN].add(
                    -dtodx[a] * (Fp2[a][ID] * (phic - phil) +
                                 _shf(Fp2[a][ID], 1, a) * (phir - phic)))

    sl = (slice(None),) + grid.interior()
    Uout = U.at[sl].set(Unew[sl])
    return state.replace(U=Uout)
