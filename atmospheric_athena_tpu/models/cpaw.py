"""Circularly polarized Alfvén wave (reference: src/prob/cpaw1d.c).

An EXACT nonlinear MHD solution: the wave propagates at v_A = b_par/√ρ
without change of form, so the L1 error after whole periods measures both
accuracy and dispersion/diffusion of the CT scheme.  1D version (one
wavelength across the domain, right/left polarization).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from .. import state as state_mod
from ..config import GridConfig, SimConfig
from ..defs import ID, IEN, IM1
from . import register


@register("cpaw")
@register("cpaw1d")
class Cpaw:
    sim_overrides = dict(gas="mhd")

    def __init__(self, par, sim: SimConfig, grid: GridConfig):
        if grid.ndim != 1:
            raise ValueError("cpaw1d is 1D (cpaw1d.c:61-63)")
        self.b_par = par.getd("problem", "b_par")
        self.b_perp = par.getd("problem", "b_perp")
        self.pres = par.getd("problem", "pres")
        self.v_par = par.getd("problem", "v_par")
        self.fac = 1.0 if par.geti_def("problem", "dir", 1) == 1 else -1.0
        lam = grid.xmax[0] - grid.xmin[0]
        self.k_par = 2.0 * math.pi / lam
        self.v_A = self.b_par  # den = 1

    def _solution(self, sim, grid, t=0.0):
        den = 1.0
        v_perp = self.b_perp / math.sqrt(den)
        x = jnp.asarray(np.asarray(grid.cc_coords(0)))
        # wave moves at +v_A (for v_par=0); exact solution is the initial
        # profile shifted by v_A t
        ph = self.k_par * (x - (self.v_par + self.v_A) * t)
        sn = jnp.sin(ph)[None, None, :]
        cs = jnp.cos(ph)[None, None, :]
        shape = grid.padded_shape()
        out = {}
        out["d"] = jnp.full(shape, den)
        out["M1"] = jnp.full(shape, den * self.v_par)
        out["M2"] = jnp.broadcast_to(-self.fac * den * v_perp * sn, shape)
        out["M3"] = jnp.broadcast_to(-den * v_perp * cs, shape)
        out["B1"] = jnp.full(shape, self.b_par)
        out["B2"] = jnp.broadcast_to(self.fac * self.b_perp * sn, shape)
        out["B3"] = jnp.broadcast_to(self.b_perp * cs, shape)
        if sim.adiabatic:
            out["E"] = (self.pres / sim.gamma_1
                        + 0.5 * den * (self.v_par ** 2 + v_perp ** 2)
                        + 0.5 * (self.b_par ** 2 + self.b_perp ** 2)
                        ) * jnp.ones(shape)
        return out

    def init(self, par, sim: SimConfig, grid: GridConfig):
        st = state_mod.zeros(sim, grid)
        sol = self._solution(sim, grid)
        U = st.U.at[ID].set(sol["d"])
        U = U.at[IM1].set(sol["M1"]).at[IM1 + 1].set(sol["M2"]) \
             .at[IM1 + 2].set(sol["M3"])
        if sim.adiabatic:
            U = U.at[IEN].set(sol["E"])
        Bcc = st.Bcc.at[0].set(sol["B1"]).at[1].set(sol["B2"]) \
                    .at[2].set(sol["B3"])
        return st.replace(U=U, Bcc=Bcc, B1i=Bcc[0], B2i=Bcc[1], B3i=Bcc[2])

    def l1_error(self, state, sim, grid):
        """L1 error vs the exact (initial) solution after whole periods."""
        sol = self._solution(sim, grid)
        sl = grid.interior()
        err = 0.0
        n = state.U[0][sl].size
        for k, name in [(ID, "d"), (IM1, "M1"), (IM1 + 1, "M2"),
                        (IM1 + 2, "M3")]:
            err += float(jnp.abs(state.U[k][sl] - sol[name][sl]).sum()) / n
        for b, name in [(1, "B2"), (2, "B3")]:
            err += float(jnp.abs(state.Bcc[b][sl] - sol[name][sl]).sum()) / n
        return err
