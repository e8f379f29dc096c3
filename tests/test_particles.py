"""Particle subsystem tests vs analytic solutions (the par_* class of
reference problems: par_drag's exponential velocity relaxation,
par_epicycle's shearing-sheet oscillation), plus TSC interpolation /
deposit conservation and drag-feedback momentum balance."""

import numpy as np
import pytest
import jax.numpy as jnp

from atmospheric_athena_tpu import ParameterDB, Simulation
from atmospheric_athena_tpu import particles as P
from atmospheric_athena_tpu.config import GridConfig, SimConfig
from atmospheric_athena_tpu.defs import ID, IEN, IM1
from atmospheric_athena_tpu import state as state_mod


def _uniform_state(sim, grid, d0=1.0, p0=1.0, v=(0.0, 0.0, 0.0)):
    st = state_mod.zeros(sim, grid)
    U = st.U
    U = U.at[ID].set(d0)
    for c in range(3):
        U = U.at[IM1 + c].set(d0 * v[c])
    ke = 0.5 * d0 * sum(vc ** 2 for vc in v)
    U = U.at[IEN].set(p0 / sim.gamma_1 + ke)
    return st.replace(U=U)


def _setup(n=16):
    sim = SimConfig(gas="hydro")
    grid = GridConfig(Nx=(n, n, n), xmin=(-1.0,) * 3, xmax=(1.0,) * 3)
    return sim, grid, _uniform_state(sim, grid)


def test_tsc_partition_of_unity_and_deposit_conservation():
    sim, grid, st = _setup()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-0.9, 0.9, (3, 64)))
    w, idx, ok = P.tsc_weights(grid, x)
    assert bool(ok.all())
    np.testing.assert_allclose(np.asarray(w.sum(axis=(1, 2, 3))), 1.0,
                               rtol=1e-13)
    # constant-field interpolation is exact
    field = jnp.full(grid.padded_shape(), 3.7)
    np.testing.assert_allclose(np.asarray(P.gather(field, w, idx, ok)),
                               3.7, rtol=1e-13)
    # deposit conserves total mass
    pp = P.ParticleParams(mass=(2.0,), feedback=True)
    pts = P.Particles.create(x, jnp.zeros_like(x))
    dpar = P.deposit_density(pts, grid, pp, jnp.float64)
    vol = np.prod([grid.dx[a] for a in range(3)])
    np.testing.assert_allclose(float(dpar.sum()) * vol, 2.0 * 64,
                               rtol=1e-12)


def test_drag_relaxation_matches_analytic():
    """Fixed stopping time, static gas: v(t) = v0 exp(-t/ts).  The
    semi-implicit integrator's one-step map for this linear problem is
    the Pade approximant (2 - dt/ts)/(2 + dt/ts) — check both the exact
    discrete map and convergence to the exponential."""
    sim, grid, st = _setup()
    ts = 0.5
    pp = P.ParticleParams(integrator=2, tsmode=3, tstop0=(ts,))
    x0 = jnp.zeros((3, 1)) + 0.01
    v0 = jnp.asarray([[1.0], [0.0], [0.0]])
    pts = P.Particles.create(x0, v0)
    dt = 0.01
    nstep = 50
    for _ in range(nstep):
        pts, _ = P.integrate(pts, st, dt, sim, grid, pp)
    ratio = (2.0 - dt / ts) / (2.0 + dt / ts)
    v_exact_discrete = 1.0 * ratio ** nstep
    v_num = float(pts.v[0, 0])
    assert v_num == pytest.approx(v_exact_discrete, rel=1e-10)
    assert v_num == pytest.approx(np.exp(-nstep * dt / ts), rel=1e-3)


def test_epicycle_frequency():
    """Shearing-sheet particle with no drag: epicyclic oscillation at
    kappa = sqrt(2(2-q)) Omega (par_epicycle.c class)."""
    sim, grid, st = _setup()
    om, q = 1.0, 1.5
    pp = P.ParticleParams(integrator=3, tsmode=3, tstop0=(1.0e8,),
                          omega0=om, qshear=q)
    amp = 0.05
    kappa = np.sqrt(2.0 * (2.0 - q)) * om
    x0 = jnp.asarray([[amp], [0.0], [0.0]])
    # turning point of an epicycle about x_g=0: vx=0 and the epicyclic
    # velocity w = -kappa^2/(2 Omega) amp ON TOP of the background shear
    # -q Omega x carried by the non-FARGO frame
    vy0 = -q * om * amp - (kappa ** 2) / (2.0 * om) * amp
    pts = P.Particles.create(x0, jnp.asarray([[0.0], [vy0], [0.0]]))
    period = 2.0 * np.pi / kappa
    nstep = 400
    dt = period / nstep
    xs = []
    for _ in range(nstep):
        pts, _ = P.integrate(pts, st, dt, sim, grid, pp)
        xs.append(float(pts.x[0, 0]))
    # after one full epicyclic period the particle returns to x0
    assert xs[-1] == pytest.approx(amp, rel=2e-3)
    # amplitude bounded (stable oscillation)
    assert np.max(np.abs(xs)) < 1.5 * amp


def test_feedback_momentum_balance():
    """The drag impulse deposited on the gas equals minus the particles'
    momentum change (feedback.c conservation property)."""
    sim, grid, st = _setup()
    pp = P.ParticleParams(integrator=2, tsmode=3, tstop0=(0.3,),
                          mass=(0.01,), feedback=True)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-0.5, 0.5, (3, 32)))
    v = jnp.asarray(rng.normal(0.0, 1.0, (3, 32)))
    pts = P.Particles.create(x, v)
    dt = 0.02
    new, fb = P.integrate(pts, st, dt, sim, grid, pp)
    vol = np.prod([grid.dx[a] for a in range(3)])
    dp_gas = np.asarray(fb).sum(axis=(1, 2, 3)) * vol
    dp_par = 0.01 * np.asarray(new.v - pts.v).sum(axis=1)
    np.testing.assert_allclose(dp_gas, -dp_par, rtol=1e-10)
