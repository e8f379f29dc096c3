"""FFT-driven turbulence forcing (models/turb.py vs src/prob/turb.c):
exact energy-injection normalization, zero net momentum, solenoidality,
band-limited spectrum, and a short driven run."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from atmospheric_athena_tpu import ParameterDB, Simulation
from atmospheric_athena_tpu.defs import ID, IM1

DECK = """
<comment>
config = --with-gas=hydro --with-eos=isothermal --enable-fft

<job>
problem_id = turb

<time>
cour_no = 0.4
tlim    = 1.0
nlim    = {nlim}

<domain1>
level = 0
Nx1 = 16
x1min = 0.0
x1max = 1.0
bc_ix1 = 4
bc_ox1 = 4
Nx2 = 16
x2min = 0.0
x2max = 1.0
bc_ix2 = 4
bc_ox2 = 4
Nx3 = 16
x3min = 0.0
x3max = 1.0
bc_ix3 = 4
bc_ox3 = 4

<problem>
iso_csound = 1.0
dedt  = 0.5
klow  = 1.0
khigh = 4.0
expo  = 2.0
ispect = 1
idrive = 0
rseed = 7
"""


def _sim(nlim=1):
    return Simulation.from_par(ParameterDB.from_string(
        DECK.format(nlim=nlim)), problem="turb")


def test_energy_injection_exact():
    """perturb's quadratic normalization injects EXACTLY de = dedt*dt of
    kinetic energy and zero net momentum (turb.c:372-405)."""
    from atmospheric_athena_tpu.models.turb import drive
    s = _sim()
    st = s.state
    sl = s.grid.interior()
    dt = 0.01
    out = drive(st, s.sim, s.grid, 0.5, s.problem.pars,
                jax.random.PRNGKey(3), dt)
    d = np.asarray(st.U[(ID,) + sl])
    ke0 = 0.0
    M0 = [np.asarray(st.U[(IM1 + c,) + sl]) for c in range(3)]
    M1_ = [np.asarray(out.U[(IM1 + c,) + sl]) for c in range(3)]
    dvol = np.prod([s.grid.dx[a] for a in range(3)])
    ke_new = 0.5 * sum(m * m for m in M1_) / d
    ke_old = 0.5 * sum(m * m for m in M0) / d
    dE = float((ke_new - ke_old).sum() * dvol)
    assert dE == pytest.approx(0.5 * dt, rel=1e-10)
    for c in range(3):
        assert abs(float((M1_[c] - M0[c]).sum())) < 1e-12 * np.abs(
            M1_[c]).max()


def test_forcing_solenoidal_and_banded():
    """The generated field is divergence-free in k-space and band
    limited to klow < |k| < khigh (generate/project,
    turb.c:140-249)."""
    from atmospheric_athena_tpu.models.turb import _solenoidal_field
    s = _sim()
    dv = _solenoidal_field(jax.random.PRNGKey(0), s.grid,
                           s.problem.pars, jnp.float64)
    vk = [np.fft.fftn(np.asarray(v)) for v in dv]
    N = 16
    k = np.fft.fftfreq(N, d=1.0 / N)
    KZ, KY, KX = np.meshgrid(k, k, k, indexing="ij")
    div = KX * vk[0] + KY * vk[1] + KZ * vk[2]
    assert np.abs(div).max() < 1e-10 * max(np.abs(v).max() for v in vk)
    kmag = np.sqrt(KX ** 2 + KY ** 2 + KZ ** 2)
    power = sum(np.abs(v) ** 2 for v in vk)
    assert power[(kmag <= 1.0) | (kmag >= 4.0)].max() < 1e-20
    assert power[(kmag > 1.0) & (kmag < 4.0)].max() > 0


@pytest.mark.slow
def test_driven_run_reaches_motion():
    """A short driven run stays finite and builds kinetic energy."""
    s = _sim(nlim=5)
    for _ in range(5):
        s.step()
    sl = s.grid.interior()
    U = np.asarray(s.state.U)
    assert np.isfinite(U).all()
    ke = (0.5 * sum(U[(IM1 + c,) + sl] ** 2 for c in range(3))
          / U[(ID,) + sl]).sum()
    assert ke > 0
