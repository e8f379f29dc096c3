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
                d_ind=None, q_hall: float = 0.0) -> State:
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

    if q_hall > 0.0:
        if not (grid.active(0) and grid.active(1)
                and not grid.active(2)):
            raise NotImplementedError(
                "Hall effect: 2D (x1,x2) grids only so far "
                "(EField_Hall 1D/3D sweeps not yet ported)")
        hx, hy, hz = _hall_emf_2d(state, dt, sim, grid, q_hall,
                                  0.0 if d_ind is None else d_ind)
        ex = ex + hx
        ey = ey + hy
        ez = ez + hz

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


# ---------------------------------------------------------------------------
# Hall effect (EField_Hall, resistivity.c:505-828): the directionally-SPLIT
# corrector scheme — each sweep adds one piece of the Hall EMF, provisionally
# updates the field (Bcor) by that piece alone, and recomputes the current
# (Jcor) so the next sweep sees partially-corrected values; a 6th-order
# hyper-diffusion of the current (hyper_diffusion6, prefac=0.01) stabilises
# the whistler cascade.  2D implementation (the hall_drift configuration);
# 1D/3D sweeps follow the same pattern and raise until ported.
# ---------------------------------------------------------------------------


def _hall_emf_2d(state: State, dt, sim: SimConfig, grid: GridConfig,
                 q_hall: float, d_ind: float):
    """Returns (ex, ey, ez) Hall EMF contributions on edges, 2D grid.

    Index conventions match the module's J/_sh layout: J.z lives on the
    (i-1/2, j-1/2) corner, J.x on (j-1/2), J.y on (i-1/2); emfh
    components live where the reference's emf[].x/y/z do."""
    Bcc = state.Bcc
    B1i, B2i = state.B1i, state.B2i
    dx1, dx2 = grid.dx[0], grid.dx[1]

    # per-cell eta_Hall/B = Q_Hall/rho^d_ind (get_eta.c:109 followed by
    # the /(Bmag+TINY) of EField_Hall:536-545)
    from ..defs import ID as _ID, TINY_NUMBER
    Bmag = jnp.sqrt(Bcc[0] ** 2 + Bcc[1] ** 2 + Bcc[2] ** 2)
    rho = state.U[_ID]
    etaH_cc = (q_hall * Bmag / rho ** d_ind) / (Bmag + TINY_NUMBER)

    def shm(q, a):
        return _sh(q, -1, a)

    def avm(q, a):
        return 0.5 * (q + _sh(q, -1, a))

    def avp(q, a):
        return 0.5 * (q + _sh(q, 1, a))

    # 2D currents (resistivity.c:139-156): Jx/Jy from cell-centered B3c,
    # Jz from the interface fields
    B3c = Bcc[2]
    Jx = (B3c - _sh(B3c, -1, 1)) / dx2
    Jy = -(B3c - _sh(B3c, -1, 0)) / dx1
    Jz = (B2i - _sh(B2i, -1, 0)) / dx1 - (B1i - _sh(B1i, -1, 1)) / dx2

    Bcor_x, Bcor_y, Bcor_z = B1i, B2i, B3c + jnp.zeros_like(B3c)

    # --- x1-sweep (emfh.x, :596-605) -----------------------------------
    etaH_j = avm(etaH_cc, 1)
    emfh_x = etaH_j * (
        0.125 * (Jy + _sh(Jy, 1, 0) + _sh(Jy, -1, 1)
                 + _sh(_sh(Jy, 1, 0), -1, 1))
        * (Bcor_z + _sh(Bcor_z, -1, 1))
        - 0.5 * ((Jz + _sh(Jz, 1, 0)) * Bcor_y))

    # provisional Bz update by the x1 piece (:608-611)
    Bcor_z = Bcor_z + dt / dx2 * (_sh(emfh_x, 1, 1) - emfh_x)

    # corrected currents (:614-627)
    Jcor_x = (Bcor_z - _sh(Bcor_z, -1, 1)) / dx2
    Jcor_y = -(Bcor_z - _sh(Bcor_z, -1, 0)) / dx1
    Jcor_z = Jz

    # --- x2-sweep (emfh.y, :630-639) -----------------------------------
    etaH_i = avm(etaH_cc, 0)
    emfh_y = etaH_i * (
        0.5 * ((Jcor_z + _sh(Jcor_z, 1, 1)) * Bcor_x)
        - 0.125 * (Jcor_x + _sh(Jcor_x, 1, 1) + _sh(Jcor_x, -1, 0)
                   + _sh(_sh(Jcor_x, 1, 1), -1, 0))
        * (Bcor_z + _sh(Bcor_z, -1, 0)))

    # provisional Bz update by the x2 piece (:642-645)
    Bcor_z = Bcor_z - dt / dx1 * (_sh(emfh_y, 1, 0) - emfh_y)

    # corrected currents again (:648-659)
    Jcor_x = (Bcor_z - _sh(Bcor_z, -1, 1)) / dx2
    Jcor_y = -(Bcor_z - _sh(Bcor_z, -1, 0)) / dx1

    # --- x3-sweep (emfh.z, :662-671) -----------------------------------
    etaH_c = avm(avm(etaH_cc, 0), 1)
    emfh_z = etaH_c * (
        0.25 * (Jcor_x + _sh(Jcor_x, -1, 0))
        * (Bcor_y + _sh(Bcor_y, -1, 0))
        - 0.25 * (Jcor_y + _sh(Jcor_y, -1, 1))
        * (Bcor_x + _sh(Bcor_x, -1, 1)))

    # hyper-diffusion of the ORIGINAL currents (hyper_diffusion6 with
    # prefac=0.01, applied to emf before the Hall pieces; additive, so
    # order is immaterial)
    prefac = 0.01
    fac = prefac * (dt / dx1) ** 2 * dt
    dx41 = 1.0 / dx1 ** 4
    dy41 = 1.0 / dx2 ** 4
    fac2 = (dx1 / dx2) ** 2

    def hyp(Jc, eta_edge):
        eta6 = (eta_edge ** 2) ** 2 * fac
        lap4x = (_sh(Jc, -2, 0) - 4.0 * _sh(Jc, -1, 0) + 6.0 * Jc
                 - 4.0 * _sh(Jc, 1, 0) + _sh(Jc, 2, 0)) * dx41
        lap4y = (_sh(Jc, -2, 1) - 4.0 * _sh(Jc, -1, 1) + 6.0 * Jc
                 - 4.0 * _sh(Jc, 1, 1) + _sh(Jc, 2, 1)) * dy41
        return eta6 * (lap4x + fac2 * lap4y)

    # the reference calls hyper_diffusion6 BEFORE dividing eta_Hall by
    # B (EField_Hall:533 vs :536-545), so the hyper term uses the full
    # eta_Hall = Q_Hall*B/rho^d_ind
    etaH_full = q_hall * Bmag / rho ** d_ind
    hx = hyp(Jx, avm(etaH_full, 1))
    hy = hyp(Jy, avm(etaH_full, 0))
    hz = hyp(Jz, avm(avm(etaH_full, 0), 1))

    return emfh_x + hx, emfh_y + hy, emfh_z + hz
