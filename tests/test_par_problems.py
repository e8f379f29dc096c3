"""Particle problem generators (par_friction / par_epicycle) validated
against their analytic trajectories — the same criterion the reference
problems' own Userwork_in_loop encodes (par_friction.c:210-250,
par_epicycle.c:240-280).

No reference-binary goldens are possible for ANY par_* problem: the
fork's particle subsystem is pre-4.x code that fails to compile against
its own tree (athena.h:327 references an undefined ``Grain`` type;
verified by configuring --with-particles=feedback and building).

Also: pgflow steady-state preservation (its reference copy likewise
predates the 4.x API and cannot build).
"""

import numpy as np
import pytest

from atmospheric_athena_tpu import ParameterDB, Simulation

FRICTION_DECK = """
<job>
problem_id = parfric
<time>
cour_no = 0.8
nlim = 100
tlim = 2.0
<domain1>
level = 0
Nx1 = 16
x1min = -2.0
x1max = 2.0
bc_ix1 = 4
bc_ox1 = 4
Nx2 = 16
x2min = -2.0
x2max = 2.0
bc_ix2 = 4
bc_ox2 = 4
Nx3 = 16
x3min = -2.0
x3max = 2.0
bc_ix3 = 4
bc_ox3 = 4
<problem>
gamma = 1.6666666666666667
v1 = 0.1
v2 = 0.05
v3 = -0.08
tstop = 0.5
<particle>
partypes = 1
tsmode = 3
tstop = 0.5
"""

EPICYCLE_DECK = """
<job>
problem_id = parepi
<time>
cour_no = 0.4
nlim = 400
tlim = 50.0
<domain1>
level = 0
Nx1 = 16
x1min = -2.0
x1max = 2.0
bc_ix1 = 4
bc_ox1 = 4
Nx2 = 16
x2min = -2.0
x2max = 2.0
bc_ix2 = 4
bc_ox2 = 4
Nx3 = 8
x3min = -1.0
x3max = 1.0
bc_ix3 = 4
bc_ox3 = 4
<problem>
iso_csound = 1.0
omega = 1.0
qshear = 1.5
amp = 0.4
tstop = 1.0e20
<particle>
partypes = 1
tsmode = 3
tstop = 1.0e20
"""


def test_par_friction_trajectory():
    """v(t) = v0 exp(-t/ts): the semi-implicit integrator's discrete map
    converges to the exponential; position follows the integrated
    trajectory with periodic wrap (par_friction.c ParticleTroj)."""
    par = ParameterDB.from_string(FRICTION_DECK)
    s = Simulation.from_par(par, problem="par_friction")
    prob = s.problem
    nst = 0
    while float(s.state.time) < 1.0 and nst < 200:
        s.step()
        nst += 1
    t = float(s.state.time)
    x = np.asarray(s.particles.x)[:, 0]
    v = np.asarray(s.particles.v)[:, 0]
    xa = prob.traj(t)
    va = prob.vel(t)
    # dt ~ CFL(cs=sqrt(gamma p/d)) — the discrete drag map differs from
    # the exponential at O(dt^2/ts^2) per step
    np.testing.assert_allclose(v, va, rtol=0, atol=5e-4)
    np.testing.assert_allclose(x, xa, rtol=0, atol=5e-4)


def test_par_epicycle_orbit():
    """Epicyclic oscillation x = amp cos(omg t): with tstop=1e20 only the
    shearing-sheet terms act; one full epicycle returns the particle to
    its starting point (par_epicycle.c ParticlePosition)."""
    import math
    par = ParameterDB.from_string(EPICYCLE_DECK)
    s = Simulation.from_par(par, problem="par_epicycle", eos="isothermal",
                            shearing_box=True)
    prob = s.problem
    Torb = 2.0 * math.pi / prob.omg
    nst = 0
    while float(s.state.time) < Torb and nst < 1000:
        s.step()
        nst += 1
    t = float(s.state.time)
    x = np.asarray(s.particles.x)[:, 0]
    v = np.asarray(s.particles.v)[:, 0]
    xa = prob.position(t)
    va = prob.velocity(xa, t)
    np.testing.assert_allclose(x, xa, rtol=0, atol=2e-3)
    np.testing.assert_allclose(v, va, rtol=0, atol=2e-3)


def test_pgflow_steady():
    """The Bernoulli-root init is an exact steady flow: after 20 cycles
    the density change stays at truncation level (the reference's
    expr_drho diagnostic)."""
    deck = """
<job>
problem_id = pg
<time>
cour_no = 0.8
nlim = 20
tlim = 99.0
<domain1>
level = 0
Nx1 = 64
x1min = 0.0
x1max = 1.0
bc_ix1 = 4
bc_ox1 = 4
Nx2 = 4
x2min = 0.0
x2max = 0.0625
bc_ix2 = 4
bc_ox2 = 4
Nx3 = 1
x3min = -0.5
x3max = 0.5
<problem>
gamma = 1.6666666666666667
angle = 0.0
grav = 0.01
root = 0
den = 1.0
pres = 0.1
v_par = 1.0
"""
    par = ParameterDB.from_string(deck)
    s = Simulation.from_par(par, problem="pgflow")
    d0 = np.asarray(s.state.U)[0].copy()
    s.run(max_steps=20)
    d1 = np.asarray(s.state.U)[0]
    sl = s.grid.interior()
    drho = np.abs(d1[sl] - d0[sl]).max()
    assert drho < 5e-4, drho
