"""Spherical/cylindrical Noh implosion (reference: src/prob/noh.c).

Liska & Wendroff §4.5: d=1, radially-inflowing v=-1, p=1e-6; the outer
x1/x2(/x3) boundaries are fed the analytic similarity solution
f(t) = (1 + t/r)^(ndim-1) (noh3d_oib/ojb/okb).  Very strong shock,
sensitive to the carbuncle instability.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import state as state_mod
from ..config import GridConfig, SimConfig
from ..defs import ID, IEN, IM1
from . import register


@register("noh")
class Noh:
    def __init__(self, par, sim: SimConfig, grid: GridConfig):
        if sim.mhd:
            raise ValueError("[noh]: not an MHD problem")
        self.par = par

    def _coords(self, grid):
        x1 = np.asarray(grid.cc_coords(0))[None, None, :]
        x2 = np.asarray(grid.cc_coords(1))[None, :, None]
        if grid.Nx[2] > 1:
            x3 = np.asarray(grid.cc_coords(2))[:, None, None]
        else:
            x3 = np.zeros((1, 1, 1))
        return x1, x2, x3

    def init(self, par, sim: SimConfig, grid: GridConfig):
        dtype = sim.jnp_dtype()
        st = state_mod.zeros(sim, grid)
        x1, x2, x3 = self._coords(grid)
        three_d = grid.Nx[2] > 1
        if three_d:
            r = np.sqrt(x1 * x1 + x2 * x2 + x3 * x3)
        else:
            r = np.sqrt(x1 * x1 + x2 * x2)
        nz, ny, nx = grid.padded_shape()
        U = st.U
        bb = lambda a: jnp.asarray(np.broadcast_to(a, (nz, ny, nx)), dtype)
        U = U.at[ID].set(bb(np.ones_like(r)))
        U = U.at[IM1].set(bb(-x1 / r))
        U = U.at[IM1 + 1].set(bb(-x2 / r))
        if three_d:
            U = U.at[IM1 + 2].set(bb(-x3 / r))
        U = U.at[IEN].set(bb(np.full_like(r, 1.0e-6 / sim.gamma_1 + 0.5)))
        return st.replace(U=U)

    def _outer(self, state, grid, sim, axis):
        """Analytic inflow on the outer boundary of `axis` (noh3d_o*b)."""
        ng = grid.nghost
        x1, x2, x3 = self._coords(grid)
        three_d = grid.Nx[2] > 1
        t = state.time
        if three_d:
            r = jnp.asarray(np.sqrt(x1 * x1 + x2 * x2 + x3 * x3))
            f_t = (1.0 + t / r) * (1.0 + t / r)
        else:
            r = jnp.asarray(np.sqrt(x1 * x1 + x2 * x2))
            f_t = 1.0 + t / r
        d0 = 1.0 * f_t
        nz, ny, nx = state.U.shape[1:]
        x1j, x2j, x3j = (jnp.asarray(a) for a in (x1, x2, x3))
        dfull = jnp.broadcast_to(d0, (nz, ny, nx))
        m1 = jnp.broadcast_to(-x1j * d0 / r, (nz, ny, nx))
        m2 = jnp.broadcast_to(-x2j * d0 / r, (nz, ny, nx))
        if three_d:
            m3 = jnp.broadcast_to(-x3j * d0 / r, (nz, ny, nx))
            E = jnp.broadcast_to(
                1.0e-6 * f_t ** (1.0 + sim.gamma) / sim.gamma_1 + 0.5 * d0,
                (nz, ny, nx))
        else:
            m3 = jnp.zeros((nz, ny, nx), state.U.dtype)
            E = jnp.broadcast_to(1.0e-6 / sim.gamma_1 + 0.5 * d0,
                                 (nz, ny, nx))
        idx = [slice(None)] * 3
        ad = {0: 2, 1: 1, 2: 0}[axis]
        n = state.U.shape[1 + ad]
        idx[ad] = slice(n - ng, None)
        idx = tuple(idx)
        U = state.U
        U = U.at[(ID,) + idx].set(dfull[idx])
        U = U.at[(IM1,) + idx].set(m1[idx])
        U = U.at[(IM1 + 1,) + idx].set(m2[idx])
        U = U.at[(IM1 + 2,) + idx].set(m3[idx])
        U = U.at[(IEN,) + idx].set(E[idx].astype(U.dtype))
        return state.replace(U=U)

    def bc_ox1(self, state, grid, sim):
        return self._outer(state, grid, sim, 0)

    def bc_ox2(self, state, grid, sim):
        return self._outer(state, grid, sim, 1)

    def bc_ox3(self, state, grid, sim):
        if grid.Nx[2] > 1:
            return self._outer(state, grid, sim, 2)
        return state
