"""Ohmic resistivity with constrained-transport EMF coupling.

Reference: src/microphysics/resistivity.c —
  current density J = curl(B) on cell edges from the interface fields
  (:118-190), resistive EMF E = eta_Ohm·J with edge-averaged eta
  (EField_Ohm, :427-492), Poynting energy fluxes on faces from
  cell-centered-B x EMF averages (:239-296), then the CT update of the
  interface fields from curl(EMF) and the conservative energy update
  (:298-420).

Operator-split explicit update (integrate_diffusion.c); the explicit
stability limit dx^2/(2*ndim*eta) joins diff_dt.  Ambipolar diffusion
(EField_AD, resistivity.c:494-568) is implemented below; eta is taken
constant (the reference's get_eta.c single-fluid formulas reduce to
constants for the regression decks).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import GridConfig, SimConfig
from ..defs import IEN
from ..state import State


def _sh(q, k, axis):
    """sh(q,k)[...,i] = q[...,i+k] along Athena axis (wrap; edge garbage
    stays in ghosts)."""
    return jnp.roll(q, -k, axis=2 - axis)


def resistivity(state: State, dt, sim: SimConfig, grid: GridConfig,
                eta_ohm: float, q_ad: float = 0.0,
                d_ind=None) -> State:
    """One explicit resistive-diffusion step of (B1i,B2i,B3i,Bcc,E):
    Ohmic EMF eta_O*J plus, with q_ad > 0, the ambipolar EMF
    eta_AD*(J_perp) with edge-interpolated J and B (EField_AD,
    resistivity.c:829-1009).  With d_ind=None eta_AD = q_ad is a
    constant (the decay/selectivity regression mode); with d_ind set,
    eta_AD = Q_AD*B^2/rho^(1+d_ind) per cell (get_eta.c:110, the
    single-fluid form the cshock1d problem uses with d_ind=0)."""
    assert sim.mhd, "resistivity requires MHD"
    B1i, B2i, B3i = state.B1i, state.B2i, state.B3i
    Bcc = state.Bcc
    act = [grid.active(a) for a in range(3)]
    dx = grid.dx

    def d_dx(q, a):
        return (q - _sh(q, -1, a)) / dx[a] if act[a] else jnp.zeros_like(q)

    # edge currents (resistivity.c:118-190); J_a lives on the a-edge
    Jx = d_dx(B3i, 1) - d_dx(B2i, 2)
    Jy = d_dx(B1i, 2) - d_dx(B3i, 0)
    Jz = d_dx(B2i, 0) - d_dx(B1i, 1)

    # resistive EMF on edges; constant eta so the edge average is exact
    ex = eta_ohm * Jx
    ey = eta_ohm * Jy
    ez = eta_ohm * Jz

    if q_ad > 0.0:
        from ..defs import TINY_NUMBER
        J = [Jx, Jy, Jz]
        Bi = [B1i, B2i, B3i]

        def avm(q, a):      # 0.5*(q + q[-1_a])
            return 0.5 * (q + _sh(q, -1, a)) if act[a] else q

        def avp(q, a):      # 0.5*(q + q[+1_a])
            return 0.5 * (q + _sh(q, 1, a)) if act[a] else q

        if d_ind is not None:
            # single-fluid coefficient field (get_eta.c:110):
            # eta_AD = Q_AD * B^2 / rho^(1+d_ind), cell-centered, then
            # edge-averaged over the two transverse axes (EField_AD 3D:
            # 0.25*(eta + eta[-1_b] + eta[-1_c] + eta[-1_b,-1_c]))
            from ..defs import ID as _ID
            Bsq_cc = Bcc[0] ** 2 + Bcc[1] ** 2 + Bcc[2] ** 2
            rho = state.U[_ID]
            eta_cc = q_ad * Bsq_cc / rho ** (1.0 + d_ind)
        else:
            eta_cc = None   # legacy constant coefficient = q_ad

        emf_ad = []
        for a in range(3):
            b, c = (a + 1) % 3, (a + 2) % 3
            # a-edge (at the b-,c- corner): J_a aligned; J_b/J_c
            # 4-point averages (+1_a, -1_c / -1_b); B_a 4-cell average,
            # B_b/B_c interface fields averaged across the other
            # transverse axis (EField_AD 3D block)
            iJ = [None] * 3
            iJ[a] = J[a]
            # J_b lives on the b-edge (integer b, half a/c): moving to
            # the a-edge needs the (b, b-1) and (a, a+1) averages
            iJ[b] = avp(avm(J[b], b), a)
            iJ[c] = avp(avm(J[c], c), a)
            iB = [None] * 3
            iB[a] = avm(avm(Bcc[a], b), c)
            iB[b] = avm(Bi[b], c)
            iB[c] = avm(Bi[c], b)
            Bsq = jnp.maximum(iB[0] ** 2 + iB[1] ** 2 + iB[2] ** 2,
                              TINY_NUMBER)
            JdotB = iJ[0] * iB[0] + iJ[1] * iB[1] + iJ[2] * iB[2]
            eta_a = (q_ad if eta_cc is None
                     else avm(avm(eta_cc, b), c))
            emf_ad.append(eta_a * (J[a] - JdotB * iB[a] / Bsq))
        ex = ex + emf_ad[0]
        ey = ey + emf_ad[1]
        ez = ez + emf_ad[2]

    U = state.U
    if sim.adiabatic:
        # Poynting fluxes on faces (:239-296): F_x on the x-face etc.
        def av(q, a):      # 0.5*(q[i] + q[i-1]) along axis a
            return 0.5 * (q + _sh(q, -1, a)) if act[a] else q

        def av2(q, a):     # 0.5*(q[i] + q[i+1]) along axis a (edge pair)
            return 0.5 * (q + _sh(q, 1, a)) if act[a] else q

        Fx = av(Bcc[1], 0) * av2(ez, 1) - av(Bcc[2], 0) * av2(ey, 2)
        Fy = av(Bcc[2], 1) * av2(ex, 2) - av(Bcc[0], 1) * av2(ez, 0)
        Fz = av(Bcc[0], 2) * av2(ey, 0) - av(Bcc[1], 2) * av2(ex, 1)
        dE = jnp.zeros_like(U[IEN])
        for a, F in ((0, Fx), (1, Fy), (2, Fz)):
            if act[a]:
                dE = dE + dt / dx[a] * (_sh(F, 1, a) - F)
        U = U.at[IEN].add(dE)

    # CT update of the interface fields (:298-420): dB = -dt curl(E)
    def diff(q, a):
        return dt / dx[a] * (_sh(q, 1, a) - q) if act[a] \
            else jnp.zeros_like(q)

    B1i = B1i - diff(ez, 1) + diff(ey, 2)
    B2i = B2i - diff(ex, 2) + diff(ez, 0)
    B3i = B3i - diff(ey, 0) + diff(ex, 1)

    # cell-centered field = face average (with upper face at index i+1)
    def cc(Bi, a):
        return 0.5 * (Bi + _sh(Bi, 1, a)) if act[a] else Bi

    Bcc = jnp.stack([cc(B1i, 0), cc(B2i, 1), cc(B3i, 2)])

    # splice active cells only; ghosts refreshed by bvals
    sl = grid.interior()
    out = state
    out = out.replace(
        U=state.U.at[(slice(None),) + sl].set(U[(slice(None),) + sl]),
        B1i=state.B1i.at[sl].set(B1i[sl]),
        B2i=state.B2i.at[sl].set(B2i[sl]),
        B3i=state.B3i.at[sl].set(B3i[sl]),
        Bcc=state.Bcc.at[(slice(None),) + sl].set(Bcc[(slice(None),) + sl]))
    return out
