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
        pts, _, _ = P.integrate(pts, st, dt, sim, grid, pp)
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
        pts, _, _ = P.integrate(pts, st, dt, sim, grid, pp)
        xs.append(float(pts.x[0, 0]))
    # after one full epicyclic period the particle returns to x0
    assert xs[-1] == pytest.approx(amp, rel=2e-3)
    # amplitude bounded (stable oscillation)
    assert np.max(np.abs(xs)) < 1.5 * amp


def test_feedback_momentum_balance():
    """The corrector feedback integrates to the particles' momentum
    change: sum(fb)*vol = m*sum(dv) with no external forces, and the gas
    applies U.M -= fb (integrate_3d_ctu.c:2957-2964 conservation)."""
    sim, grid, st = _setup()
    pp = P.ParticleParams(integrator=2, tsmode=3, tstop0=(0.3,),
                          mass=(0.01,), feedback=True)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-0.5, 0.5, (3, 32)))
    v = jnp.asarray(rng.normal(0.0, 1.0, (3, 32)))
    pts = P.Particles.create(x, v)
    dt = 0.02
    new, fb, eloss = P.integrate(pts, st, dt, sim, grid, pp)
    vol = np.prod([grid.dx[a] for a in range(3)])
    dp_fb = np.asarray(fb).sum(axis=(1, 2, 3)) * vol
    dp_par = 0.01 * np.asarray(new.v - pts.v).sum(axis=1)
    np.testing.assert_allclose(dp_fb, dp_par, rtol=1e-10)
    assert float(eloss.min()) >= 0.0


def test_feedback_ghost_fold_conservation():
    """Particles hugging a periodic boundary spill TSC weight into the
    ghost zones; fold_ghost_deposits (exchange_feedback,
    feedback.c periodic_*_feedback) returns every bit of it to the
    interior so the total deposited momentum is unchanged."""
    sim, grid, st = _setup()
    pp = P.ParticleParams(integrator=2, tsmode=3, tstop0=(0.3,),
                          mass=(0.05,), feedback=True)
    rng = np.random.default_rng(2)
    # within half a cell of each face -> guaranteed ghost spill
    x = jnp.asarray(np.concatenate([
        rng.uniform(-1.0, -0.99, (3, 8)),
        rng.uniform(0.99, 1.0, (3, 8))], axis=1))
    v = jnp.asarray(rng.normal(0.0, 1.0, (3, 16)))
    pts = P.Particles.create(x, v)
    dt = 0.02
    new, fb, eloss = P.integrate(pts, st, dt, sim, grid, pp)
    fbn = np.asarray(fb)
    n = grid.nghost
    # ghosts are zeroed after the fold
    assert np.all(fbn[:, :, :, :n] == 0.0)
    assert np.all(fbn[:, :, :, -n:] == 0.0)
    vol = np.prod([grid.dx[a] for a in range(3)])
    dp_fb = fbn.sum(axis=(1, 2, 3)) * vol
    dp_par = 0.05 * np.asarray(new.v - pts.v).sum(axis=1)
    np.testing.assert_allclose(dp_fb, dp_par, rtol=1e-10)


def test_feedback_reflect_fold_flips_normal():
    """Reflecting fold (reflect_ix1_feedback, feedback.c): the mirrored
    ghost deposit negates the NORMAL momentum component and keeps the
    transverse ones and Eloss."""
    sim, grid, _ = _setup()
    import dataclasses
    from atmospheric_athena_tpu.config import BC_REFLECT
    gridr = dataclasses.replace(grid, bc=((BC_REFLECT, BC_REFLECT),)
                                + grid.bc[1:])
    n = gridr.nghost
    arr = jnp.zeros((3,) + gridr.padded_shape())
    # one unit of (fx, fy) deposited one cell OUTSIDE the inner x1 face
    arr = arr.at[0, 10, 10, n - 1].set(1.0)
    arr = arr.at[1, 10, 10, n - 1].set(2.0)
    out = np.asarray(P.fold_ghost_deposits(arr, gridr,
                                           flip_axis_comp=True))
    assert out[0, 10, 10, n] == pytest.approx(-1.0)   # normal flipped
    assert out[1, 10, 10, n] == pytest.approx(2.0)    # transverse kept
    assert out[:, :, :, :n].sum() == 0.0


def test_feedback_predictor_halfstep_impulse():
    """feedback_predictor (integrators_particle.c:521-631): the deposit
    integrates to m * (u - v) * 0.5*dt/ts and Eloss >= 0."""
    sim, grid, _ = _setup()
    st = _uniform_state(sim, grid, v=(0.3, 0.0, 0.0))
    ts = 0.4
    pp = P.ParticleParams(tsmode=3, tstop0=(ts,), mass=(0.02,),
                          feedback=True)
    x = jnp.zeros((3, 4)) + jnp.asarray([[0.1, -0.2, 0.3, 0.0]])
    v = jnp.zeros((3, 4))
    pts = P.Particles.create(x, v)
    dt = 0.05
    fb, eloss = P.feedback_predictor(pts, st, sim, grid, pp, dt)
    vol = np.prod([grid.dx[a] for a in range(3)])
    px = float(fb[0].sum()) * vol
    assert px == pytest.approx(4 * 0.02 * 0.3 * 0.5 * dt / ts, rel=1e-12)
    assert float(fb[1].sum()) == pytest.approx(0.0, abs=1e-14)
    assert float(eloss.min()) >= 0.0


def test_dusty_box_mutual_drag_driver():
    """Driver-level validation of the FULL predictor-corrector feedback
    loop: a uniform dust lattice moving through uniform gas.  The
    two-fluid solution is dv(t) = dv0 exp(-t (1+eps)/ts) with mass
    loading eps = mu/rho, and total gas+dust momentum is conserved to
    roundoff (the par_drag-class test the reference encodes)."""
    deck = """
<job>
problem_id = dusty
<time>
cour_no = 0.8
nlim = 100
tlim = 0.5
<domain1>
level = 0
Nx1 = 16
x1min = -1.0
x1max = 1.0
bc_ix1 = 4
bc_ox1 = 4
Nx2 = 16
x2min = -1.0
x2max = 1.0
bc_ix2 = 4
bc_ox2 = 4
Nx3 = 16
x3min = -1.0
x3max = 1.0
bc_ix3 = 4
bc_ox3 = 4
<problem>
gamma = 1.6666666666666667
v1 = 0.1
v2 = 0.0
v3 = 0.0
tstop = 0.5
p0 = 10.0
<particle>
partypes = 1
tsmode = 3
tstop = 0.5
feedback = 1
parmass = %.17g
"""
    eps = 0.25          # dust-to-gas mass ratio
    n = 16
    vol_cell = (2.0 / n) ** 3
    mpar = eps * 1.0 * vol_cell     # one grain per cell, rho = 1
    par = ParameterDB.from_string(deck % mpar)
    s = Simulation.from_par(par, problem="par_friction")
    # replace the single test grain with a cell-centered lattice
    c = (np.arange(n) + 0.5) * (2.0 / n) - 1.0
    zz, yy, xx = np.meshgrid(c, c, c, indexing="ij")
    x = jnp.asarray(np.stack([xx.ravel(), yy.ravel(), zz.ravel()]))
    v = jnp.zeros_like(x).at[0].set(0.1)
    s.particles = P.Particles.create(x, v)
    vol = vol_cell
    interior = (slice(4, -4),) * 3
    p_tot0 = (float(s.state.U[IM1][interior].sum()) * vol
              + mpar * float(s.particles.v[0].sum()))
    nst = 0
    while float(s.state.time) < 0.5 and nst < 100:
        s.step()
        nst += 1
    t = float(s.state.time)
    # uniform problem: gas stays uniform, dust stays on the lattice
    u1 = np.asarray(s.state.U[IM1] / s.state.U[ID])
    u1i = u1[interior]
    assert np.ptp(u1i) < 1e-12
    dv = float(s.particles.v[0, 0]) - float(u1i.mean())
    ts = 0.5
    dv_exact = 0.1 * np.exp(-t * (1.0 + eps) / ts)
    assert dv == pytest.approx(dv_exact, rel=2e-3)
    # momentum conservation gas+dust
    p_tot = (float(s.state.U[IM1][interior].sum()) * vol
             + mpar * float(s.particles.v[0].sum()))
    assert p_tot == pytest.approx(p_tot0, abs=1e-11 * max(1.0,
                                                          abs(p_tot0)))
