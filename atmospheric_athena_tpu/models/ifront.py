"""R-type/D-type ionization front test (reference: src/prob/ifront.c).

Uniform neutral medium (rho = n_H·m_H, P = rho·cs²) with one plane radiation
source on the -x1 edge (add_radplane_3d(pGrid, -1, flux), ifront.c:79).
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import state as state_mod
from ..config import GridConfig, SimConfig
from ..defs import ID, IEN
from . import register


@register("ifront")
class Ifront:
    # physics the reference fixes at configure time for this problem
    sim_overrides = dict(ion_radiation=True, ion_radplane=True, nscalars=1)

    def __init__(self, par, sim: SimConfig, grid: GridConfig):
        self.par = par
        flux = par.getd("problem", "flux")
        self.radplanes = [(-1, flux)]
        self.time_ramp = True  # hardcoded level-0 ramp, ionradplane_3d.c:265

    def init(self, par, sim: SimConfig, grid: GridConfig):
        st = state_mod.zeros(sim, grid)
        m_H = par.getd("ionradiation", "m_H")
        n_H = par.getd("problem", "n_H")
        cs = par.getd("problem", "cs")
        rho = n_H * m_H
        pressure = rho * cs * cs

        U = st.U
        U = U.at[ID].set(rho)
        if sim.adiabatic:
            U = U.at[IEN].set(pressure / sim.gamma_1)
        iscal = 5 if sim.adiabatic else 4
        U = U.at[iscal].set(rho)

        kw = {}
        if sim.mhd:
            Bcc = st.Bcc
            for a, nm in enumerate(("Bx", "By", "Bz")):
                Bcc = Bcc.at[a].set(par.getd_def("problem", nm, 0.0))
            pb = 0.5 * (Bcc[0] ** 2 + Bcc[1] ** 2 + Bcc[2] ** 2)
            U = U.at[IEN].add(pb)
            kw = dict(Bcc=Bcc, B1i=Bcc[0], B2i=Bcc[1], B3i=Bcc[2])
        return st.replace(U=U, **kw)
