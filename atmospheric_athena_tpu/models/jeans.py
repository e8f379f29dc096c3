"""Jeans instability/oscillation test (reference: src/prob/jeans.c).

Sinusoidal density perturbation in a self-gravitating periodic medium;
four_pi_G is set so the domain holds njeans Jeans lengths
(jeans.c:86-100): stable (oscillating) for njeans < 1, unstable (growing)
for njeans > 1, with ω² = k²(cs² − 4πGρ₀/k²).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from .. import state as state_mod
from ..config import GridConfig, SimConfig
from ..defs import ID, IEN, IM1
from . import register


@register("jeans")
class Jeans:
    sim_overrides = dict(self_gravity=True)

    def __init__(self, par, sim: SimConfig, grid: GridConfig):
        amp = par.getd("problem", "amp")
        njeans = par.getd("problem", "njeans")
        kdir = par.geti("problem", "kdir")
        lam = grid.Nx[kdir - 1] * grid.dx[kdir - 1]
        d0, p0 = 1.0, 1.0
        four_pi_G = (4.0 * sim.gamma * p0) * \
            (math.pi ** 2 * njeans ** 2) / (d0 ** 2 * lam ** 2)
        # make the derived constants available through the parameter DB
        par.set("problem", "four_pi_G", four_pi_G)
        par.set("problem", "grav_mean_rho", d0)
        self.kwave = 2.0 * math.pi / lam
        cs = math.sqrt(sim.gamma * p0 / d0)
        self.omega2 = self.kwave ** 2 * cs ** 2 - four_pi_G * d0
        self.omega = math.sqrt(abs(self.omega2))
        self.amp, self.kdir, self.d0, self.p0 = amp, kdir, d0, p0

    def init(self, par, sim: SimConfig, grid: GridConfig):
        st = state_mod.zeros(sim, grid)
        a = self.kdir - 1
        x = jnp.asarray(np.asarray(grid.cc_coords(a)), st.U.dtype)
        shape = [1, 1, 1]
        shape[2 - a] = -1
        sinkx = jnp.broadcast_to(jnp.sin(x * self.kwave).reshape(shape),
                                 grid.padded_shape())
        coskx = jnp.broadcast_to(jnp.cos(x * self.kwave).reshape(shape),
                                 grid.padded_shape())
        d = self.d0 * (1.0 + self.amp * sinkx)
        U = st.U.at[ID].set(d)
        if sim.adiabatic:
            U = U.at[IEN].set((self.p0 / sim.gamma_1) *
                              (1.0 + sim.gamma * self.amp * sinkx))
        if self.omega2 < 0.0:
            U = U.at[IM1 + a].set(self.d0 * (self.omega / self.kwave) *
                                  self.amp * coskx)
        return st.replace(U=U)
