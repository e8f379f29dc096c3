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


def test_ambipolar_decay_rate():
    """Ambipolar diffusion of a small transverse perturbation B3 =
    b sin(kx) on a strong uniform B1 = B0: J is perpendicular to B at
    leading order, so the decay matches Ohmic with eta_eff = Q_AD*B0^2
    (EField_AD, resistivity.c:714-880).  2D so the >=2D edge averages
    run."""
    import jax.numpy as jnp
    import numpy as np
    from atmospheric_athena_tpu import state as state_mod
    from atmospheric_athena_tpu.config import GridConfig, SimConfig
    from atmospheric_athena_tpu.microphysics.resistivity import resistivity

    sim = SimConfig(gas="mhd", nscalars=0)
    N = 64
    grid = GridConfig(Nx=(N, 8, 1), xmin=(0, 0, 0), xmax=(1, 0.125, 1))
    st = state_mod.zeros(sim, grid)
    shape = grid.padded_shape()
    x_c = np.asarray(grid.cc_coords(0))
    k = 2 * np.pi
    B0, b = 1.0, 1e-6
    B3 = jnp.asarray(b * np.sin(k * x_c))
    st = st.replace(
        U=st.U.at[0].set(1.0).at[4].set(1.0),
        B1i=jnp.full(shape, B0), B2i=jnp.zeros(shape),
        B3i=jnp.broadcast_to(B3, shape),
        Bcc=st.Bcc.at[0].set(B0).at[2].set(jnp.broadcast_to(B3, shape)))
    q_ad, dt = 0.01, 1e-4
    out = resistivity(st, dt, sim, grid, 0.0, q_ad=q_ad)
    sl = grid.interior()
    b_old = np.asarray(st.B3i[sl])
    b_new = np.asarray(out.B3i[sl])
    mask = np.abs(b_old) > b * 1e-3
    ratio = (b_new[mask] / b_old[mask])
    dx = grid.dx[0]
    keff2 = (2 - 2 * np.cos(k * dx)) / dx ** 2
    expected = 1 - dt * (q_ad * B0 ** 2) * keff2
    np.testing.assert_allclose(ratio, expected, rtol=1e-4)


def test_aniso_conduction_field_aligned():
    """Anisotropic conduction only transports heat ALONG B: with
    T = T0 + t1 sin(kx), kappa_aniso diffuses it when B = x-hat
    (parallel) and does nothing when B = y-hat (perpendicular)
    (HeatFlux_aniso, conduction.c:219-330)."""
    import jax.numpy as jnp
    import numpy as np
    from atmospheric_athena_tpu import state as state_mod
    from atmospheric_athena_tpu.config import GridConfig, SimConfig
    from atmospheric_athena_tpu.microphysics.aniso import conduction_aniso

    sim = SimConfig(gas="mhd", nscalars=0)
    N = 64
    grid = GridConfig(Nx=(N, 8, 1), xmin=(0, 0, 0), xmax=(1, 0.125, 1))
    x_c = np.asarray(grid.cc_coords(0))
    k = 2 * np.pi
    e0, e1 = 1.0, 1e-3

    def mkstate(Bdir):
        st = state_mod.zeros(sim, grid)
        shape = grid.padded_shape()
        Eth = jnp.broadcast_to(jnp.asarray(e0 + e1 * np.sin(k * x_c)),
                               shape)
        B = [jnp.zeros(shape)] * 3
        B[Bdir] = jnp.full(shape, 1.0)
        me = 0.5
        return st.replace(
            U=st.U.at[0].set(1.0).at[4].set(Eth + me),
            B1i=B[0], B2i=B[1], B3i=B[2],
            Bcc=st.Bcc.at[Bdir].set(1.0))

    kappa, dt = 0.01, 1e-4
    sl = grid.interior()
    # parallel: decays like iso conduction of T = Gamma_1*Eth
    st = mkstate(0)
    out = conduction_aniso(st, dt, sim, grid, kappa)
    dE = np.asarray(out.U[4][sl] - st.U[4][sl])
    # dT/dt = kappa d2T/dx2 with T = Gamma_1*e_sp -> dE = dt*kappa*
    # Gamma_1*d2(Eth)/dx2
    dx = grid.dx[0]
    keff2 = (2 - 2 * np.cos(k * dx)) / dx ** 2
    expected = -dt * kappa * (sim.gamma - 1.0) * keff2 * np.asarray(
        st.U[4][sl] - 0.5 - e0)
    np.testing.assert_allclose(dE, expected, atol=1e-12 + 1e-4 *
                               np.abs(expected).max())
    # perpendicular: no transport
    st = mkstate(1)
    out = conduction_aniso(st, dt, sim, grid, kappa)
    dE = np.asarray(out.U[4][sl] - st.U[4][sl])
    assert np.abs(dE).max() < 1e-14


def test_braginskii_field_aligned_shear():
    """Braginskii viscosity has NO effect on a shear flow perpendicular
    to B (Vy(x), B = x-hat: bb:grad V = 0), unlike isotropic viscosity;
    a compressive flow ALONG B (Vx(x)) diffuses with effective
    coefficient (4/3) nu (ViscStress_aniso)."""
    import jax.numpy as jnp
    import numpy as np
    from atmospheric_athena_tpu import state as state_mod
    from atmospheric_athena_tpu.config import GridConfig, SimConfig
    from atmospheric_athena_tpu.microphysics.aniso import viscosity_aniso

    sim = SimConfig(gas="mhd", nscalars=0)
    N = 64
    grid = GridConfig(Nx=(N, 8, 1), xmin=(0, 0, 0), xmax=(1, 0.125, 1))
    x_c = np.asarray(grid.cc_coords(0))
    k = 2 * np.pi
    v1 = 1e-3

    def mkstate(comp):
        st = state_mod.zeros(sim, grid)
        shape = grid.padded_shape()
        M = jnp.broadcast_to(jnp.asarray(v1 * np.sin(k * x_c)), shape)
        U = st.U.at[0].set(1.0).at[4].set(10.0)
        U = U.at[1 + comp].set(M)
        return st.replace(U=U, B1i=jnp.full(shape, 1.0),
                          Bcc=st.Bcc.at[0].set(1.0))

    nu, dt = 0.01, 1e-4
    sl = grid.interior()
    # perpendicular shear: no Braginskii momentum diffusion
    st = mkstate(1)
    out = viscosity_aniso(st, dt, sim, grid, nu)
    dM = np.asarray(out.U[2][sl] - st.U[2][sl])
    assert np.abs(dM).max() < 1e-14, np.abs(dM).max()
    # parallel compression: decays at ~ (4/3) nu k^2 (continuum)
    st = mkstate(0)
    out = viscosity_aniso(st, dt, sim, grid, nu)
    M_old = np.asarray(st.U[1][sl])
    M_new = np.asarray(out.U[1][sl])
    mask = np.abs(M_old) > v1 * 1e-2
    ratio = M_new[mask] / M_old[mask]
    dx = grid.dx[0]
    keff2 = (2 - 2 * np.cos(k * dx)) / dx ** 2
    expected = 1 - dt * (4.0 / 3.0) * nu * keff2
    np.testing.assert_allclose(ratio, expected, rtol=2e-3)
