"""Microphysics validation against analytic diffusion rates.

A sinusoidal shear velocity decays as exp(−ν k² t) under isotropic
viscosity; a sinusoidal temperature perturbation in a static uniform
medium decays as exp(−(Γ−1)κ/ρ · k² t) under isotropic conduction (the
reference's κ carries the mbar/k_B factor so T = P/ρ)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from atmospheric_athena_tpu import ParameterDB, Simulation
from atmospheric_athena_tpu.defs import ID, IEN, IM1

DECK = """
<comment>
problem = microphysics decay
<job>
problem_id = diff
<time>
cour_no = 0.4
nlim    = 100000
tlim    = {tlim}
<domain1>
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
x3min = 0.0
x3max = 1.0
<problem>
gamma   = 1.66666666666667
pamb    = 1.0
prat    = 1.0
radius  = -1.0
damb    = 1.0
{extra}
"""


def _setup(extra, tlim):
    par = ParameterDB.from_string(DECK.format(extra=extra, tlim=tlim))
    s = Simulation.from_par(par, problem="blast")  # uniform medium
    return s


@pytest.mark.slow
def test_viscous_shear_decay():
    nu = 0.01
    k = 2.0 * math.pi
    tlim = 0.1 / (nu * k * k)   # decay by factor e^-0.1
    s = _setup(f"nu_iso = {nu}", tlim)
    x = jnp.asarray(np.asarray(s.grid.cc_coords(0)))
    vy = 1e-3 * jnp.sin(k * x)[None, None, :]
    U = s.state.U.at[IM1 + 1].set(jnp.broadcast_to(vy,
                                                   s.grid.padded_shape()))
    from atmospheric_athena_tpu import bvals
    s.state = bvals.apply_bc(s.state.replace(U=U), s.grid, s.sim, s.problem)
    amp0 = np.abs(np.asarray(s.state.U[IM1 + 1])[s.grid.interior()]).max()
    s.run()
    t = float(s.state.time)
    amp1 = np.abs(np.asarray(s.state.U[IM1 + 1])[s.grid.interior()]).max()
    expected = math.exp(-nu * k * k * t)
    assert amp1 / amp0 == pytest.approx(expected, rel=0.05)


@pytest.mark.slow
def test_conduction_decay_operator():
    """Conduction operator alone (no hydro reaction): isochoric decay of a
    temperature sine at rate (gamma-1)·kappa/rho · k²."""
    from atmospheric_athena_tpu import bvals
    from atmospheric_athena_tpu.microphysics import integrate_diff
    kappa = 0.01
    gamma = 5.0 / 3.0
    k = 2.0 * math.pi
    chi = (gamma - 1.0) * kappa
    s = _setup(f"kappa_iso = {kappa}", 1.0)
    x = jnp.asarray(np.asarray(s.grid.cc_coords(0)))
    dP = 1e-6 * jnp.sin(k * x)[None, None, :]
    U = s.state.U.at[IEN].add(
        jnp.broadcast_to(dP, s.grid.padded_shape()) / (gamma - 1.0))
    st = bvals.apply_bc(s.state.replace(U=U), s.grid, s.sim, s.problem)

    dt = 0.2 * s.grid.dx[0] ** 2 / chi
    nsteps = 50
    for _ in range(nsteps):
        st = integrate_diff(st, dt, s.sim, s.grid, 0.0, kappa, None)
        st = bvals.apply_bc(st, s.grid, s.sim, s.problem)
    t = nsteps * dt

    E = np.asarray(st.U[IEN])[s.grid.interior()]
    amp1 = np.abs(E - E.mean()).max()
    amp0 = float(np.abs(np.asarray(dP)).max()) / (gamma - 1.0)
    expected = math.exp(-chi * k * k * t)
    assert amp1 / amp0 == pytest.approx(expected, rel=0.05)


def test_ohmic_resistivity_decay_rate():
    """Ohmic decay of B2 = B0 sin(kx): dB/dt = eta d2B/dx2, so the
    discrete decay factor per step is (1 - dt*eta*k_eff^2) with
    k_eff^2 = (2 - 2 cos(k dx))/dx^2 (resistivity.c Ohmic path)."""
    import jax.numpy as jnp
    import numpy as np
    from atmospheric_athena_tpu import state as state_mod
    from atmospheric_athena_tpu.config import GridConfig, SimConfig
    from atmospheric_athena_tpu.microphysics.resistivity import resistivity

    sim = SimConfig(gas="mhd", nscalars=0)
    N = 64
    grid = GridConfig(Nx=(N, 1, 1), xmin=(0, 0, 0), xmax=(1, 1, 1))
    st = state_mod.zeros(sim, grid)
    x_f = np.asarray(grid.fc_coords(0))[:grid.padded_shape()[2]]
    k = 2 * np.pi
    B0 = 1e-3
    B2i = jnp.asarray(B0 * np.sin(k * x_f))
    B2c = 0.5 * (B2i + jnp.roll(B2i, -1))
    st = st.replace(U=st.U.at[0].set(1.0).at[4].set(1.0),
                    B2i=jnp.broadcast_to(B2i, grid.padded_shape()),
                    Bcc=st.Bcc.at[1].set(B2c))
    eta, dt = 0.01, 1e-4
    out = resistivity(st, dt, sim, grid, eta)
    sl = grid.interior()
    b_old = np.asarray(st.B2i[sl])
    b_new = np.asarray(out.B2i[sl])
    mask = np.abs(b_old) > 1e-6   # skip the sin nodes (0/0)
    ratio = b_new[mask] / b_old[mask]
    dx = grid.dx[0]
    keff2 = (2 - 2 * np.cos(k * dx)) / dx ** 2
    expected = 1 - dt * eta * keff2
    np.testing.assert_allclose(ratio, expected, rtol=1e-8)
