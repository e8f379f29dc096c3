"""Sedov-style blast driven from the inner-x1 edge
(reference: src/prob/testsedov.c).

Uniform gas rho = n_H*m_H at temperature T; the three interior cell
layers i <= is+2 are overpressured by `tempratio` (testsedov.c:problem),
launching a strong blast into the quiescent medium.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import state as state_mod
from ..config import GridConfig, SimConfig
from ..defs import ID, IEN
from . import register

_KB = 1.3806e-16   # kb = 1.3806/1.e16 (testsedov.c)


@register("testsedov")
class TestSedov:
    def __init__(self, par, sim: SimConfig, grid: GridConfig):
        if sim.mhd or not sim.adiabatic:
            raise ValueError("[testsedov]: adiabatic hydro only")
        self.par = par

    def init(self, par, sim: SimConfig, grid: GridConfig):
        dtype = sim.jnp_dtype()
        st = state_mod.zeros(sim, grid)
        n_H = par.getd("problem", "n_H")
        m_H = par.getd("problem", "m_H")
        T = par.getd("problem", "temperature")
        temprat = par.getd("problem", "tempratio")

        nz, ny, nx = grid.padded_shape()
        i = np.arange(nx)[None, None, :]
        hot = np.broadcast_to(i <= grid.lo(0) + 2, (nz, ny, nx))
        E = np.where(hot, n_H * _KB * T * temprat, n_H * _KB * T) \
            / sim.gamma_1
        U = st.U
        U = U.at[ID].set(n_H * m_H)
        U = U.at[IEN].set(jnp.asarray(E, dtype))
        return st.replace(U=U)
