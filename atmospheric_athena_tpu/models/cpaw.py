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


@register("cpaw3d")
class Cpaw3d:
    """3D circularly polarized Alfvén wave, propagating oblique to every
    grid axis (reference: src/prob/cpaw3d.c).

    The wavevector is rotated by ang_3 = atan(x1size/x2size) about z' and
    ang_2 = atan(0.5*(x1size*cos_a3 + x2size*sin_a3)/x3size) about y
    (cpaw3d.c:135-158), giving exactly one wavelength along each grid
    direction.  Interface B is initialized from line integrals of the
    vector potential A (gauge Ax'=0; cpaw3d.c:200-218, 530-584) so that
    ∇·B = 0 to roundoff; all fields are smooth and nonzero, which makes
    this the canonical *generic-branch* 3D MHD validation problem (no
    tie-degenerate EMF upwind selects, unlike the blast).
    """

    sim_overrides = dict(gas="mhd")

    def __init__(self, par, sim: SimConfig, grid: GridConfig):
        if grid.ndim != 3:
            raise ValueError("cpaw3d assumes a 3D grid (cpaw3d.c:122-123)")
        self.b_par = par.getd("problem", "b_par")
        self.b_perp = par.getd("problem", "b_perp")
        self.pres = par.getd("problem", "pres")
        self.v_par = par.getd("problem", "v_par")
        self.fac = 1.0 if par.geti_def("problem", "dir", 1) == 1 else -1.0

        x1size = grid.xmax[0] - grid.xmin[0]
        x2size = grid.xmax[1] - grid.xmin[1]
        x3size = grid.xmax[2] - grid.xmin[2]
        ang_3 = math.atan(x1size / x2size)
        self.sin_a3, self.cos_a3 = math.sin(ang_3), math.cos(ang_3)
        ang_2 = math.atan(0.5 * (x1size * self.cos_a3 +
                                 x2size * self.sin_a3) / x3size)
        self.sin_a2, self.cos_a2 = math.sin(ang_2), math.cos(ang_2)
        lam = min(x1size * self.cos_a2 * self.cos_a3,
                  x2size * self.cos_a2 * self.sin_a3,
                  x3size * self.sin_a2)
        self.k_par = 2.0 * math.pi / lam
        self.v_A = self.b_par  # den = 1

    # --- vector potential in the rotated frame (cpaw3d.c:530-584) ---------
    def _xy(self, x1, x2, x3):
        x = (x1 * self.cos_a2 * self.cos_a3
             + x2 * self.cos_a2 * self.sin_a3 + x3 * self.sin_a2)
        y = -x1 * self.sin_a3 + x2 * self.cos_a3
        return x, y

    def _AyAz(self, x1, x2, x3):
        x, y = self._xy(x1, x2, x3)
        Ay = self.fac * (self.b_perp / self.k_par) * np.sin(self.k_par * x)
        Az = (self.b_perp / self.k_par) * np.cos(self.k_par * x) \
            + self.b_par * y
        return Ay, Az

    def _A1(self, x1, x2, x3):
        Ay, Az = self._AyAz(x1, x2, x3)
        return -Ay * self.sin_a3 - Az * self.sin_a2 * self.cos_a3

    def _A2(self, x1, x2, x3):
        Ay, Az = self._AyAz(x1, x2, x3)
        return Ay * self.cos_a3 - Az * self.sin_a2 * self.sin_a3

    def _A3(self, x1, x2, x3):
        x, y = self._xy(x1, x2, x3)
        Az = (self.b_perp / self.k_par) * np.cos(self.k_par * x) \
            + self.b_par * y
        return Az * self.cos_a2

    def init(self, par, sim: SimConfig, grid: GridConfig):
        st = state_mod.zeros(sim, grid)
        dtype = st.U.dtype
        dx1, dx2, dx3 = grid.dx[0], grid.dx[1], grid.dx[2]
        h1, h2, h3 = 0.5 * dx1, 0.5 * dx2, 0.5 * dx3

        # lower-corner coordinates of every padded cell [k, j, i]
        x1l = (np.asarray(grid.cc_coords(0)) - h1)[None, None, :]
        x2l = (np.asarray(grid.cc_coords(1)) - h2)[None, :, None]
        x3l = (np.asarray(grid.cc_coords(2)) - h3)[:, None, None]

        # face fields from A line integrals (cpaw3d.c:200-218)
        B1i = ((self._A3(x1l, x2l + dx2, x3l + h3)
                - self._A3(x1l, x2l, x3l + h3)) / dx2
               - (self._A2(x1l, x2l + h2, x3l + dx3)
                  - self._A2(x1l, x2l + h2, x3l)) / dx3)
        B2i = ((self._A1(x1l + h1, x2l, x3l + dx3)
                - self._A1(x1l + h1, x2l, x3l)) / dx3
               - (self._A3(x1l + dx1, x2l, x3l + h3)
                  - self._A3(x1l, x2l, x3l + h3)) / dx1)
        B3i = ((self._A2(x1l + dx1, x2l + h2, x3l)
                - self._A2(x1l, x2l + h2, x3l)) / dx1
               - (self._A1(x1l + h1, x2l + dx2, x3l)
                  - self._A1(x1l + h1, x2l, x3l)) / dx2)
        B1i = jnp.asarray(np.broadcast_to(B1i, grid.padded_shape()), dtype)
        B2i = jnp.asarray(np.broadcast_to(B2i, grid.padded_shape()), dtype)
        B3i = jnp.asarray(np.broadcast_to(B3i, grid.padded_shape()), dtype)

        sol = self._solution(sim, grid, B1i, B2i, B3i)
        U = st.U.at[ID].set(sol["d"])
        U = U.at[IM1].set(sol["M1"]).at[IM1 + 1].set(sol["M2"]) \
             .at[IM1 + 2].set(sol["M3"])
        if sim.adiabatic:
            U = U.at[IEN].set(sol["E"])
        Bcc = st.Bcc.at[0].set(sol["B1"]).at[1].set(sol["B2"]) \
                    .at[2].set(sol["B3"])
        return st.replace(U=U, Bcc=Bcc, B1i=B1i, B2i=B2i, B3i=B3i)

    def _solution(self, sim, grid, B1i=None, B2i=None, B3i=None, t=0.0):
        """Cell-centered fields; exact solution = initial profile shifted
        by (v_par + v_A)·t along the rotated x axis (cpaw3d.c:221-260)."""
        den = 1.0
        v_perp = self.b_perp / math.sqrt(den)
        x1c = np.asarray(grid.cc_coords(0))[None, None, :]
        x2c = np.asarray(grid.cc_coords(1))[None, :, None]
        x3c = np.asarray(grid.cc_coords(2))[:, None, None]
        x, _ = self._xy(x1c, x2c, x3c)
        ph = self.k_par * (x - (self.v_par + self.v_A) * t)
        sn = np.sin(ph)
        cs = self.fac * np.cos(ph)
        shape = grid.padded_shape()
        out = {}
        out["d"] = jnp.full(shape, den)
        M1 = den * (self.v_par * self.cos_a2 * self.cos_a3
                    + v_perp * sn * self.sin_a3
                    + v_perp * cs * self.sin_a2 * self.cos_a3)
        M2 = den * (self.v_par * self.cos_a2 * self.sin_a3
                    - v_perp * sn * self.cos_a3
                    + v_perp * cs * self.sin_a2 * self.sin_a3)
        M3 = den * (self.v_par * self.sin_a2 - v_perp * cs * self.cos_a2)
        out["M1"] = jnp.asarray(np.broadcast_to(M1, shape))
        out["M2"] = jnp.asarray(np.broadcast_to(M2, shape))
        out["M3"] = jnp.asarray(np.broadcast_to(M3, shape))
        if B1i is not None:
            out["B1"] = 0.5 * (B1i + jnp.roll(B1i, -1, 2))
            out["B2"] = 0.5 * (B2i + jnp.roll(B2i, -1, 1))
            out["B3"] = 0.5 * (B3i + jnp.roll(B3i, -1, 0))
        else:
            # analytic cell-centered B (for L1 error after whole periods
            # the initial numerical profile is the exact solution; this
            # analytic form is only a fallback)
            b_perp = self.b_perp
            B1 = (self.b_par * self.cos_a2 * self.cos_a3
                  + b_perp * sn * self.sin_a3
                  + b_perp * cs * self.sin_a2 * self.cos_a3)
            B2 = (self.b_par * self.cos_a2 * self.sin_a3
                  - b_perp * sn * self.cos_a3
                  + b_perp * cs * self.sin_a2 * self.sin_a3)
            B3 = self.b_par * self.sin_a2 - b_perp * cs * self.cos_a2
            out["B1"] = jnp.asarray(np.broadcast_to(B1, shape))
            out["B2"] = jnp.asarray(np.broadcast_to(B2, shape))
            out["B3"] = jnp.asarray(np.broadcast_to(B3, shape))
        if sim.adiabatic:
            out["E"] = (self.pres / sim.gamma_1
                        + 0.5 * (out["B1"] ** 2 + out["B2"] ** 2
                                 + out["B3"] ** 2)
                        + 0.5 * (out["M1"] ** 2 + out["M2"] ** 2
                                 + out["M3"] ** 2) / den)
        return out

    def l1_error(self, state, sim, grid):
        """L1 error vs the stored initial state after whole periods
        (cpaw3d.c Userwork_after_loop pattern: compare to RootSoln)."""
        init = self.init(None, sim, grid)
        sl = grid.interior()
        err = 0.0
        n = state.U[0][sl].size
        for k in (ID, IM1, IM1 + 1, IM1 + 2):
            err += float(jnp.abs(state.U[k][sl] - init.U[k][sl]).sum()) / n
        for b in (0, 1, 2):
            err += float(jnp.abs(state.Bcc[b][sl]
                                 - init.Bcc[b][sl]).sum()) / n
        return err
