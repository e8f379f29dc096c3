"""Shearing-box tests vs the reference C code.

Golden generated from the reference built with
  --with-problem=hgb --with-gas=mhd --with-eos=isothermal
  --enable-shearing-box
running tests/golden/athinput.hgb16 (a 16x16x8 shrink of
tst/3D-mhd/athinput.hgb) for 100 cycles (t ~ 610, yshear ~ 1.5 dy, so
both the fractional RemapFlux remap and the integer joffset shift of
ShearingSheet_ix1/_ox1 and RemapEy are exercised), dumped with
dat_fmt=%25.17e.  The init uses a bit-exact ran2 port, so agreement is
at machine epsilon.
"""

import os

import numpy as np
import pytest

from atmospheric_athena_tpu.simulation import Simulation

GOLD_DIR = os.path.join(os.path.dirname(__file__), "golden")


@pytest.mark.slow
def test_hgb_mri_100cycles():
    """3D MRI shearing box (CTU, roe, isothermal MHD): shearing-sheet
    remap BCs (bvals_shear.c ShearingSheet_ix1/_ox1), RemapEy net-Bz
    conservation, Crank-Nicolson Coriolis/tidal update
    (integrate_3d_ctu.c:2653-2739), and the hgb generator's ran2
    perturbations (prob/hgb.c:120-250)."""
    s = Simulation.from_file(os.path.join(GOLD_DIR, "athinput.hgb16"))
    assert s.sim.shearing_box and s.sim.eos == "isothermal"
    s.run(max_steps=100)
    gold = np.loadtxt(os.path.join(GOLD_DIR, "hgb_100cycles.tab"))
    sl = s.grid.interior()
    U = np.asarray(s.state.U)
    B = np.asarray(s.state.Bcc)
    fields = [U[0], U[1], U[2], U[3], B[0], B[1], B[2]]
    for i, nm in enumerate(["d", "M1", "M2", "M3", "B1c", "B2c", "B3c"]):
        np.testing.assert_allclose(
            np.ravel(fields[i][sl]), gold[:, 6 + i], rtol=0, atol=5e-15,
            err_msg=nm)


def test_shearing_sheet_identity_at_t0():
    """At t=0 the remap is the identity except for the +-qomL*d azimuthal
    momentum jump on the x1 ghost slabs (bvals_shear.c:183-195)."""
    import jax.numpy as jnp

    from atmospheric_athena_tpu import state as state_mod
    from atmospheric_athena_tpu.config import GridConfig, SimConfig
    from atmospheric_athena_tpu.shearing import shearing_sheet

    sim = SimConfig(gas="hydro", eos="isothermal", shearing_box=True,
                    omega0=1e-3, qshear=1.5)
    grid = GridConfig(Nx=(8, 8, 4), xmin=(-0.5, -0.5, -0.25),
                      xmax=(0.5, 0.5, 0.25))
    rng = np.random.default_rng(3)
    st = state_mod.zeros(sim, grid)
    U = rng.normal(size=np.shape(st.U)) + 2.0
    U[0] = np.abs(U[0]) + 1.0
    st = st.replace(U=jnp.asarray(U))
    out = shearing_sheet(st, sim, grid, 0.0)
    ng = grid.nghost
    qomL = sim.qshear * sim.omega0 * (grid.xmax[0] - grid.xmin[0])
    sl_y = slice(grid.lo(1), grid.hi(1) + 1)
    for xs, sgn in ((slice(0, ng), 1.0), (slice(-ng, None), -1.0)):
        got = np.asarray(out.U[2][:, sl_y, xs])
        want = U[2][:, sl_y, xs] + sgn * qomL * U[0][:, sl_y, xs]
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-15)
        np.testing.assert_allclose(np.asarray(out.U[0][:, sl_y, xs]),
                                   U[0][:, sl_y, xs], rtol=0, atol=0)


@pytest.mark.slow
def test_hgb_mri_fargo_100cycles():
    """FARGO orbital advection (bvals_shear.c Fargo():1966-2345 +
    the hdt*(q-2)*Omega source-term variants in integrate_3d_ctu.c and
    the zeroed UnstratifiedDisk): same deck as the non-FARGO MRI test,
    reference built with --enable-fargo, 100 cycles."""
    s = Simulation.from_file(os.path.join(GOLD_DIR, "athinput.hgb16"),
                             fargo=True)
    assert s.sim.fargo
    s.run(max_steps=100)
    gold = np.load(os.path.join(GOLD_DIR,
                                "hgb_fargo_100cycles.npz"))["data"]
    sl = s.grid.interior()
    U = np.asarray(s.state.U)
    B = np.asarray(s.state.Bcc)
    fields = [U[0], U[1], U[2], U[3], B[0], B[1], B[2]]
    for i, nm in enumerate(["d", "M1", "M2", "M3", "B1c", "B2c", "B3c"]):
        np.testing.assert_allclose(
            np.ravel(fields[i][sl]), gold[:, i], rtol=0, atol=5e-15,
            err_msg=nm)
