"""Particle friction test (reference: src/prob/par_friction.c).

One particle at the box center with initial velocity (v1,v2,v3) in a
static uniform gas, fixed stopping time: the analytic solution is
exponential relaxation v(t) = v0 exp(-t/ts),
x(t) = x0 + v0 ts (1 - exp(-t/ts)) with periodic wrapping
(ParticleTroj/ParticleVel, par_friction.c:254-285).  The reference's
Userwork_in_loop logs |x - x_analytic|; our test asserts it directly.

NOTE the reference's entire particle subsystem is pre-4.x code that does
not compile against its own tree (athena.h references an undefined
``Grain`` type; verified by building --with-particles=feedback), so no
reference-binary golden can exist for ANY par_* problem — the analytic
trajectory IS the validation the reference problem itself encodes.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from .. import state as state_mod
from ..config import GridConfig, SimConfig
from ..defs import ID, IEN
from . import register


@register("par_friction")
class ParFriction:
    def __init__(self, par, sim: SimConfig, grid: GridConfig):
        self.par = par
        if par.geti_def("particle", "partypes", 1) != 1:
            raise ValueError("[par_friction]: one particle type only")
        if par.geti_def("particle", "tsmode", 3) != 3:
            raise ValueError("[par_friction]: fixed stopping time only")
        self.tstop = par.getd("problem", "tstop")
        self.v0 = (par.getd("problem", "v1"),
                   par.getd("problem", "v2"),
                   par.getd("problem", "v3"))
        self.xc = tuple(0.5 * (grid.xmin[a] + grid.xmax[a])
                        for a in range(3))
        self.L = tuple(grid.xmax[a] - grid.xmin[a] for a in range(3))
        self.xmin = grid.xmin

    def init(self, par, sim: SimConfig, grid: GridConfig):
        st = state_mod.zeros(sim, grid)
        U = st.U.at[ID].set(1.0)
        if sim.adiabatic:
            U = U.at[IEN].set(
                par.getd_def("problem", "p0", 1.0) / sim.gamma_1)
        return st.replace(U=U)

    def init_particles(self, par, sim, grid):
        from .. import particles as P
        x = jnp.asarray(self.xc, jnp.float64).reshape(3, 1)
        v = jnp.asarray(self.v0, jnp.float64).reshape(3, 1)
        return P.Particles.create(x, v)

    # analytic solution (par_friction.c:254-285)
    def traj(self, t):
        ts = self.tstop
        pos = []
        for a in range(3):
            p = (self.xc[a]
                 + self.v0[a] * ts * (1.0 - math.exp(-t / ts)))
            p = p - math.floor((p - self.xmin[a]) / self.L[a]) * self.L[a]
            pos.append(p)
        return pos

    def vel(self, t):
        return [v * math.exp(-t / self.tstop) for v in self.v0]
