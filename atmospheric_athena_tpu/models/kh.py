"""Kelvin-Helmholtz instability (reference: src/prob/kh.c).

iprob=2 (Ryu & Jones single-mode: vx = vflow·tanh(y/a), vy = amp·sin(2πx)·
exp(−y²/σ²), a=0.05, σ=0.2, kh.c:92-110); the iprob=1 random-stream variant
uses JAX PRNG instead of the reference's ran2 sequence (documented
deviation — bitwise golden comparison is impossible across RNGs).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .. import state as state_mod
from ..config import GridConfig, SimConfig
from ..defs import ID, IEN, IM1
from . import register


@register("kh")
class KelvinHelmholtz:
    def __init__(self, par, sim: SimConfig, grid: GridConfig):
        self.iprob = par.geti("problem", "iprob")
        self.vflow = par.getd("problem", "vflow")
        self.drat = par.getd_def("problem", "drat", 1.0)
        self.amp = par.getd("problem", "amp")
        self.b0 = par.getd_def("problem", "b0", 0.0)

    def init(self, par, sim: SimConfig, grid: GridConfig):
        st = state_mod.zeros(sim, grid)
        shape = grid.padded_shape()
        x1 = jnp.asarray(np.asarray(grid.cc_coords(0)),
                         st.U.dtype)[None, None, :]
        x2 = jnp.asarray(np.asarray(grid.cc_coords(1)),
                         st.U.dtype)[None, :, None]
        U = st.U
        if self.iprob == 2:
            a, sigma = 0.05, 0.2
            d = jnp.ones(shape, st.U.dtype)
            M1 = jnp.broadcast_to(self.vflow * jnp.tanh(x2 / a), shape)
            M2 = jnp.broadcast_to(
                self.amp * jnp.sin(2 * math.pi * x1) *
                jnp.exp(-(x2 ** 2) / sigma ** 2), shape)
            E0 = 1.0 / sim.gamma_1
        else:
            key = jax.random.PRNGKey(par.geti_def("problem", "seed", 1))
            k1, k2 = jax.random.split(key)
            r1 = self.amp * (jax.random.uniform(k1, shape) - 0.5)
            r2 = self.amp * (jax.random.uniform(k2, shape) - 0.5)
            inner = jnp.broadcast_to(jnp.abs(x2) < 0.25, shape)
            d = jnp.where(inner, self.drat, 1.0)
            M1 = jnp.where(inner, -self.drat * (self.vflow + r1),
                           self.vflow + r1)
            M2 = jnp.where(inner, self.drat * r2, r2)
            E0 = 2.5 / sim.gamma_1
        U = U.at[ID].set(d)
        U = U.at[IM1].set(M1)
        U = U.at[IM1 + 1].set(M2)
        if sim.adiabatic:
            U = U.at[IEN].set(E0 + 0.5 * (M1 ** 2 + M2 ** 2) / d)
        kw = {}
        if sim.mhd:
            Bcc = st.Bcc.at[0].set(self.b0)
            kw = dict(Bcc=Bcc, B1i=Bcc[0], B2i=Bcc[1], B3i=Bcc[2])
            if sim.adiabatic:
                U = U.at[IEN].add(0.5 * self.b0 ** 2)
        return st.replace(U=U, **kw)
