"""Stratified MRI shearing box (reference: src/prob/strat.c).

Vertically-stratified isothermal/adiabatic shearing sheet: density
rho = den exp(-z^2) (scale height H = 1 in units with cs = Omega = 1),
random pressure/velocity perturbations via the bit-exact ran2 port
(ipert=1), field geometries ifield in {1,2,3,4,5,7} (the Hirose flux
tube, ifield=6, is not ported), tidal potential enrolled as
ShearingBoxPot (UnstratifiedDisk) and vertical gravity
phi = Omega^2 z^2/2 as StaticGravPot (strat.c:362-363) — the two-
potential split the integrator handles via _phi_static_arrays.  The
z-boundaries use the reference's outflow extrapolation (strat_ix3/ox3):
fields copied from the last physical zone, density extrapolated
hydrostatically at the zone's effective temperature, velocities copied
(not momenta), inflow zeroed.  Userwork applies the D_FLOOR=1e-4
density floor each cycle (strat.c Userwork_in_loop).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from .. import state as state_mod
from ..config import GridConfig, SimConfig
from ..defs import ID, IEN, IM1, TINY_NUMBER
from . import register
from .hgb import _Ran2

D_FLOOR = 1.0e-4


@register("strat")
class Strat:
    sim_overrides = dict(shearing_box=True)

    def __init__(self, par, sim: SimConfig, grid: GridConfig):
        self.par = par
        self.omega0 = par.getd_def("problem", "omega", 1.0e-3)
        self.qshear = par.getd_def("problem", "qshear", 1.5)
        self.fargo = sim.fargo

    # StaticGravPot = VertGrav (zbc_out=1 branch, strat.c:VertGrav)
    def static_grav_pot(self, x1, x2, x3):
        return 0.5 * self.omega0 ** 2 * x3 * x3

    # ShearingBoxPot = UnstratifiedDisk
    def shearing_box_pot(self, x1, x2, x3):
        if self.fargo:
            return 0.0 * x1
        return -self.qshear * self.omega0 ** 2 * x1 ** 2

    def init(self, par, sim: SimConfig, grid: GridConfig):
        if grid.Nx[1] == 1:
            raise ValueError("[strat]: 2D/3D only")
        dtype = sim.jnp_dtype()
        st = state_mod.zeros(sim, grid)
        den = 1.0
        pres = par.getd_def("problem", "pres", 5.0e-7) if sim.adiabatic \
            else den * sim.iso_csound2
        amp = par.getd("problem", "amp")
        beta = par.getd("problem", "beta") if sim.mhd else 1.0
        B0 = math.sqrt(2.0 * pres / beta)
        ifield = par.geti_def("problem", "ifield", 1)
        ipert = par.geti_def("problem", "ipert", 1)
        if ipert != 1:
            raise NotImplementedError("[strat]: only ipert=1 is ported")
        if ifield == 6:
            raise NotImplementedError("[strat]: ifield=6 flux tube "
                                      "not ported")
        om, qsh = self.omega0, self.qshear
        Lx = grid.xmax[0] - grid.xmin[0]
        kx = (2.0 * math.pi / Lx) * par.geti_def("problem", "nwx", 1)

        nzl, nyl, nxl = grid.Nx[2], grid.Nx[1], grid.Nx[0]
        x1 = np.asarray(grid.cc_coords(0))
        x3 = np.asarray(grid.cc_coords(2)) if grid.Nx[2] > 1 else \
            np.zeros(1)
        lo = [grid.lo(a) for a in range(3)]

        rd = np.empty((nzl, nyl, nxl))
        rp = np.empty((nzl, nyl, nxl))
        rv = np.zeros((3, nzl, nyl, nxl))
        rng = _Ran2(-1)
        fac = 0.4 * math.sqrt(pres / den)
        for k in range(nzl):
            z = x3[k + lo[2]] if grid.Nx[2] > 1 else 0.0
            for j in range(nyl):
                for i in range(nxl):
                    rval = amp * (rng() - 0.5)
                    d_ = den * math.exp(-z * z) * (1.0 + 2.0 * rval)
                    if d_ < D_FLOOR:
                        d_ = D_FLOOR
                    rd[k, j, i] = d_
                    rp[k, j, i] = pres / den * d_
                    for c in range(3):
                        rval = amp * (rng() - 0.5)
                        rv[c, k, j, i] = fac * rval

        sl = grid.interior()
        U = st.U
        U = U.at[(ID,) + sl].set(jnp.asarray(rd, dtype))
        M1 = rd * rv[0]
        M2 = rd * rv[1]
        if not sim.fargo:
            M2 = M2 - rd * (qsh * om * x1[None, None, lo[0]:lo[0] + nxl])
        M3 = rd * rv[2]
        U = U.at[(IM1,) + sl].set(jnp.asarray(M1, dtype))
        U = U.at[(IM1 + 1,) + sl].set(jnp.asarray(M2, dtype))
        U = U.at[(IM1 + 2,) + sl].set(jnp.asarray(M3, dtype))

        kw = {}
        if sim.mhd:
            x1a = x1[None, None, lo[0]:lo[0] + nxl]
            x3a = (x3[lo[2]:lo[2] + nzl] if grid.Nx[2] > 1
                   else np.zeros(1))[:, None, None]
            zero = np.zeros((nzl, nyl, nxl))
            b1 = zero
            b2 = zero
            b3 = zero
            if ifield == 1:
                b3 = B0 * np.sin(kx * x1a) + zero
            elif ifield == 2:
                b3 = zero + B0
            elif ifield == 3:
                b2 = B0 * np.cos(kx * x1a) + zero
                b3 = B0 * np.sin(kx * x1a) + zero
            elif ifield == 4:
                b2 = np.where(np.abs(x3a) < 2.0, B0, 0.0) + zero
            elif ifield == 5:
                b2 = np.sqrt(den * np.exp(-x3a * x3a) * om * om
                             / beta) + zero
            # ifield == 7: zero field
            B1i = st.B1i.at[sl].set(jnp.asarray(b1, dtype))
            B2i = st.B2i.at[sl].set(jnp.asarray(b2, dtype))
            B3i = st.B3i.at[sl].set(jnp.asarray(b3, dtype))
            # upper boundary faces: same expressions (k/j/i==last lines)
            k_e, j_e, i_e = grid.hi(2), grid.hi(1), grid.hi(0)
            B1i = B1i.at[sl[0], sl[1], i_e + 1].set(
                jnp.asarray(b1[:, :, -1], dtype))
            B2i = B2i.at[sl[0], j_e + 1, sl[2]].set(
                jnp.asarray(b2[:, -1, :], dtype))
            if grid.Nx[2] > 1:
                B3i = B3i.at[k_e + 1, sl[1], sl[2]].set(
                    jnp.asarray(b3[-1, :, :], dtype))
            # Bcc = face averages (faces are x-/z-symmetric per column
            # for these geometries, matching the reference's B?c = B?i)
            Bcc = st.Bcc
            Bcc = Bcc.at[(0,) + sl].set(jnp.asarray(b1, dtype))
            Bcc = Bcc.at[(1,) + sl].set(jnp.asarray(b2, dtype))
            Bcc = Bcc.at[(2,) + sl].set(jnp.asarray(b3, dtype))
            kw = dict(Bcc=Bcc, B1i=B1i, B2i=B2i, B3i=B3i)

        if sim.adiabatic:
            ke = 0.5 * (M1 ** 2 + M2 ** 2 + M3 ** 2) / rd
            E = rp / sim.gamma_1 + ke
            if sim.mhd:
                E = E + 0.5 * (np.asarray(kw["Bcc"][(0,) + sl]) ** 2
                               + np.asarray(kw["Bcc"][(1,) + sl]) ** 2
                               + np.asarray(kw["Bcc"][(2,) + sl]) ** 2)
            U = U.at[(IEN,) + sl].set(jnp.asarray(E, dtype))
        return st.replace(U=U, **kw)

    def userwork_in_loop(self, state, sim, grid):
        sl = (ID,) + grid.interior()
        return state.replace(U=state.U.at[sl].set(
            jnp.maximum(state.U[sl], D_FLOOR)))

    # --- vertical outflow BCs (strat_ix3 / strat_ox3) ----------------------

    def _zbc(self, state, grid, sim, side):
        ng = grid.nghost
        om = self.omega0
        U, Bcc = state.U, state.Bcc
        Bi = [state.B1i, state.B2i, state.B3i] if sim.mhd else None
        ks, ke = grid.lo(2), grid.hi(2)
        kphys = ks if side == "lo" else ke
        x3 = jnp.asarray(np.asarray(grid.cc_coords(2)), U.dtype)
        zb = (grid.xmin[2] + 0.5 * grid.dx[2]) if side == "lo" else \
            (grid.xmax[2] - 0.5 * grid.dx[2])

        dphys = U[ID, kphys]
        M1p, M2p, M3p = (U[IM1 + c, kphys] for c in range(3))
        if sim.mhd:
            B1p, B2p, B3p = (Bcc[b, kphys] for b in range(3))
        if sim.adiabatic:
            p_ = U[IEN, kphys] - 0.5 * (M1p ** 2 + M2p ** 2
                                        + M3p ** 2) / dphys
            if sim.mhd:
                p_ = p_ - 0.5 * (B1p ** 2 + B2p ** 2 + B3p ** 2)
            p_ = jnp.maximum(p_ * sim.gamma_1, TINY_NUMBER)
            T = p_ / dphys
        else:
            T = 0.5 * om * om + 0.0 * dphys  # reference's iso branch

        for g in range(1, ng + 1):
            kg = kphys - g if side == "lo" else kphys + g
            z = x3[kg]
            if sim.mhd:
                for b in range(2):
                    Bi[b] = Bi[b].at[kg].set(Bi[b][kphys])
                    Bcc = Bcc.at[b, kg].set(Bcc[b, kphys])
                Bi[2] = Bi[2].at[kg].set(Bi[2][kphys])
            dg = dphys * jnp.exp(-(z * z - zb * zb)
                                 / (2.0 * T / (om * om)))
            U = U.at[ID, kg].set(dg)
            U = U.at[IM1, kg].set(M1p / dphys * dg)
            U = U.at[IM1 + 1, kg].set(M2p / dphys * dg)
            inflow = (M3p >= 0.0) if side == "lo" else (M3p <= 0.0)
            U = U.at[IM1 + 2, kg].set(
                jnp.where(inflow, 0.0, M3p / dphys * dg))
            if sim.adiabatic:
                Eg = (dg * T / sim.gamma_1
                      + 0.5 * (U[IM1, kg] ** 2 + U[IM1 + 1, kg] ** 2
                               + U[IM1 + 2, kg] ** 2) / dg)
                if sim.mhd:
                    Eg = Eg + 0.5 * (Bcc[0, kg] ** 2 + Bcc[1, kg] ** 2
                                     + Bcc[2, kg] ** 2)
                U = U.at[IEN, kg].set(Eg)
        if sim.mhd:
            # ghost-zone B3c from the (copied) face fields
            for g in range(1, ng + 1):
                kg = kphys - g if side == "lo" else kphys + g
                kup = kg + 1
                Bcc = Bcc.at[2, kg].set(0.5 * (Bi[2][kup] + Bi[2][kg]))
        kw = dict(U=U)
        if sim.mhd:
            kw.update(Bcc=Bcc, B1i=Bi[0], B2i=Bi[1], B3i=Bi[2])
        return state.replace(**kw)

    def bc_ix3(self, state, grid, sim):
        return self._zbc(state, grid, sim, "lo")

    def bc_ox3(self, state, grid, sim):
        return self._zbc(state, grid, sim, "hi")
