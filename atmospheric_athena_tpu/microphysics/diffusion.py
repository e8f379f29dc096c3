"""Explicit diffusion operators, vectorized.

Face-flux formulations exactly per the reference:
  - viscosity (viscosity.c:152-330, ViscStress_iso): stress tensor
    T = nu·rho·(∇v + ∇vᵀ − 2/3 ∇·v I) evaluated on faces with the
    centered/4-point averages of the C code; dM/dt = +Div(T),
    dE/dt = +Div(v·T) with face-averaged velocities.
  - conduction (conduction.c:80-190, HeatFlux_iso): Q = kappa ∇T on faces
    with T = Gamma_1·(E − KE [− ME])/d (kappa carries the mbar/k_B factor,
    conduction.c:83); dE/dt = +Div(Q).
  - cooling: dE/dt = −Λ(d, P, dt) via a problem-enrolled CoolingFunc
    (cool.c / CoolingFunc hook, globals.h:25).

diff_dt: dt ≤ CourNo·dx²/(2·fac·(nu+kappa)) with fac = #dims
(diff_dt.c:54-66).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import GridConfig, SimConfig
from ..defs import ID, IEN, IM1
from ..state import State


def _shf(q, k, axis):
    return jnp.roll(q, -k, axis=2 - axis)


def diff_dt(sim: SimConfig, grid: GridConfig, cour_no: float,
            nu_iso=0.0, kappa_iso=0.0, eta_ohm=0.0, eta_ad_max=0.0,
            nu_aniso=0.0, kappa_aniso=0.0) -> float:
    """Explicit-diffusion CFL (diff_dt.c; iso+aniso coefficients summed,
    ambipolar via its effective eta_AD = Q_AD*max(B^2) estimate)."""
    axes = [a for a in range(3) if grid.active(a)]
    dxmin = min(grid.dx[a] for a in axes)
    qa = cour_no * dxmin * dxmin / 2.0 / len(axes)
    dt = float("inf")
    if kappa_iso + kappa_aniso > 0:
        dt = min(dt, qa / (kappa_iso + kappa_aniso))
    if nu_iso + nu_aniso > 0:
        dt = min(dt, qa / (nu_iso + nu_aniso))
    if eta_ohm + eta_ad_max > 0:
        dt = min(dt, qa / (eta_ohm + eta_ad_max))
    return dt


def diff_dt_resistive_state(state: State, sim: SimConfig,
                            grid: GridConfig, cour_no: float,
                            eta_ohm: float, q_ad: float, d_ind: float,
                            q_hall: float = 0.0):
    """State-dependent resistive CFL (diff_dt.c:68-77): separate minima
    qb/eta_Ohm and qb/eta_AD with qb = CourNo dx^2/(2 ndim) at the root
    level (0.25*qa*4), eta_AD = Q_AD B^2/rho^(1+d_ind) maximized over
    active cells +-2 ghost layers (il = is-2 .. ie+2)."""
    axes = [a for a in range(3) if grid.active(a)]
    dxmin = min(grid.dx[a] for a in axes)
    qb = cour_no * dxmin * dxmin / 2.0 / len(axes)
    sl = tuple(
        slice(grid.lo(a) - 2, grid.hi(a) + 3) if grid.active(a)
        else slice(None) for a in (2, 1, 0))
    Bcc = state.Bcc
    Bsq = (Bcc[0] ** 2 + Bcc[1] ** 2 + Bcc[2] ** 2)[sl]
    rho = state.U[(ID,) + sl]
    dt = jnp.asarray(jnp.inf, Bsq.dtype)
    if q_ad > 0.0:
        eta_ad_max = jnp.max(q_ad * Bsq / rho ** (1.0 + d_ind))
        dt = jnp.minimum(dt, qb / eta_ad_max)
    if q_hall > 0.0:
        # diff_dt.c:72-74: 0.5*fac*qb/eta_Hall, fac = ndim
        fac = float(len(axes))
        eta_h_max = jnp.max(q_hall * jnp.sqrt(Bsq) / rho ** d_ind)
        dt = jnp.minimum(dt, 0.5 * fac * qb / eta_h_max)
    if eta_ohm > 0.0:
        dt = jnp.minimum(dt, qb / eta_ohm)
    return dt


def viscosity_iso(state: State, dt, sim: SimConfig, grid: GridConfig,
                  nu_iso: float) -> State:
    """Isotropic NS viscosity (ViscStress_iso)."""
    axes = [a for a in range(3) if grid.active(a)]
    U = state.U
    d = U[ID]
    V = [U[IM1 + c] / d for c in range(3)]
    divv = sum(((_shf(V[a], 1, a) - _shf(V[a], -1, a)) / (2.0 * grid.dx[a]))
               for a in axes)

    dU = jnp.zeros_like(U)
    for a in axes:
        # face a (between cells -1 and 0 along a)
        dm = lambda f: f - _shf(f, -1, a)          # face difference
        av = lambda f: 0.5 * (f + _shf(f, -1, a))  # face average
        S = [None, None, None]
        # normal component: 2 dV_a/dx_a - 2/3 (divv avg)
        S[a] = 2.0 * dm(V[a]) / grid.dx[a] - (1.0 / 3.0) * (divv +
                                                            _shf(divv, -1, a))
        for b in axes:
            if b == a:
                continue
            # shear: dV_b/dx_a + centered dV_a/dx_b averaged across the face
            cen = (_shf(V[a], 1, b) - _shf(V[a], -1, b)) / (4.0 * grid.dx[b])
            S[b] = dm(V[b]) / grid.dx[a] + (cen + _shf(cen, -1, a))
        for c in range(3):
            if S[c] is None:  # transverse inactive axis: plain gradient
                S[c] = dm(V[c]) / grid.dx[a]
        nud = nu_iso * av(d)
        F = [nud * S[c] for c in range(3)]
        dtodx = dt / grid.dx[a]
        for c in range(3):
            dU = dU.at[IM1 + c].add(dtodx * (_shf(F[c], 1, a) - F[c]))
        if sim.adiabatic:
            FE = sum(av(V[c]) * F[c] for c in range(3))
            dU = dU.at[IEN].add(dtodx * (_shf(FE, 1, a) - FE))

    sl = (slice(None),) + grid.interior()
    return state.replace(U=U.at[sl].add(dU[sl]))


def conduction_iso(state: State, dt, sim: SimConfig, grid: GridConfig,
                   kappa_iso: float) -> State:
    """Isotropic thermal conduction (HeatFlux_iso)."""
    assert sim.adiabatic
    axes = [a for a in range(3) if grid.active(a)]
    U = state.U
    d = U[ID]
    T = U[IEN] - 0.5 * (U[IM1] ** 2 + U[IM1 + 1] ** 2 + U[IM1 + 2] ** 2) / d
    if sim.mhd:
        B = state.Bcc
        T = T - 0.5 * (B[0] ** 2 + B[1] ** 2 + B[2] ** 2)
    T = T * sim.gamma_1 / d

    dE = jnp.zeros_like(d)
    for a in axes:
        Q = kappa_iso * (T - _shf(T, -1, a)) / grid.dx[a]
        dE = dE + (dt / grid.dx[a]) * (_shf(Q, 1, a) - Q)
    sl = grid.interior()
    return state.replace(U=state.U.at[(IEN,) + sl].add(dE[sl]))


def integrate_diff(state: State, dt, sim: SimConfig, grid: GridConfig,
                   nu_iso=0.0, kappa_iso=0.0, cooling_fn=None,
                   eta_ohm=0.0, q_ad=0.0, nu_aniso=0.0,
                   kappa_aniso=0.0, d_ind=None, q_hall=0.0) -> State:
    """Operator-split diffusion update (integrate_diff, main.c:530-539).
    Sub-cycling to the diffusion CFL is handled by the caller clamping the
    hydro dt (new_dt also bounded by diff_dt)."""
    if (eta_ohm > 0.0 or q_ad > 0.0 or q_hall > 0.0) and sim.mhd:
        from .resistivity import resistivity
        state = resistivity(state, dt, sim, grid, eta_ohm, q_ad=q_ad,
                            d_ind=d_ind, q_hall=q_hall)
    if nu_iso > 0.0:
        state = viscosity_iso(state, dt, sim, grid, nu_iso)
    if nu_aniso > 0.0 and sim.mhd:
        from .aniso import viscosity_aniso
        state = viscosity_aniso(state, dt, sim, grid, nu_aniso)
    if kappa_iso > 0.0 and sim.adiabatic:
        state = conduction_iso(state, dt, sim, grid, kappa_iso)
    if kappa_aniso > 0.0 and sim.mhd and sim.adiabatic:
        from .aniso import conduction_aniso
        state = conduction_aniso(state, dt, sim, grid, kappa_aniso)
    if cooling_fn is not None and sim.adiabatic:
        U = state.U
        d = U[ID]
        ke = 0.5 * (U[IM1] ** 2 + U[IM1 + 1] ** 2 + U[IM1 + 2] ** 2) / d
        P = (U[IEN] - ke) * sim.gamma_1
        coolf = cooling_fn(d, P, dt)
        sl = grid.interior()
        state = state.replace(U=U.at[(IEN,) + sl].add(-dt * coolf[sl]))
    return state
