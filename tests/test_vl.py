"""VL (MUSCL-Hancock) integrator validation vs the reference C code.

Golden committed in tests/golden/ (deck `athinput.blastvl`,
blastvl_1step.npz), regenerated from a reference build of
`--with-gas=mhd --with-flux=hlld --with-order=2p --with-integrator=vl
--enable-fofc`.

Eager single step on the asymmetric MHD blast matches to roundoff
(~5e-14 every variable, including B): first-order fluxes, predictor
corner EMFs, half faces, corrector fluxes and corner EMFs were each
verified against instrumented reference dumps at 1e-15 in round 1.
"""

import os

import numpy as np
import pytest

from atmospheric_athena_tpu import Simulation
from atmospheric_athena_tpu.integrators import vl3d

GOLD_DIR = os.path.join(os.path.dirname(__file__), "golden")


@pytest.mark.slow
def test_vl_mhd_blast_one_step_eager_exact():
    s = Simulation.from_file(
        os.path.join(GOLD_DIR, "athinput.blastvl"), gas="mhd",
        integrator="vl", flux="hlld", order="2p",
        first_order_flux_correction=True)
    st = vl3d.step(s.state, s.state.dt, s.sim, s.grid, s.problem)
    gold = np.load(os.path.join(GOLD_DIR, "blastvl_1step.npz"))
    U = np.asarray(st.U)[(slice(None),) + s.grid.interior()]
    B = np.asarray(st.Bcc)[(slice(None),) + s.grid.interior()]
    got = {"d": U[0], "M1": U[1], "M2": U[2], "M3": U[3], "E": U[4],
           "B1c": B[0], "B2c": B[1], "B3c": B[2]}
    for name in got:
        np.testing.assert_allclose(got[name], gold[name], rtol=0, atol=5e-14)


def test_vl_1d_mhd_briowu_50cycles():
    """1D VL Newtonian MHD (integrate_1d_vl.c MHD branch) vs the reference
    built with --with-gas=mhd --with-integrator=vl --with-flux=hlld
    --with-order=2, on tst/1D-mhd/athinput.brio-wu at cour_no=0.4 (the VL
    CFL<=0.5 constraint) for 50 cycles."""
    import jax.numpy as jnp

    from atmospheric_athena_tpu.eos import cons1d_to_prim1d
    s = Simulation.from_file(
        "/root/reference/tst/1D-mhd/athinput.brio-wu", problem="shkset1d",
        gas="mhd", integrator="vl", flux="hlld", order="2",
        cmdline=["time/nlim=50", "time/tlim=10.0", "time/cour_no=0.4"])
    s.run(max_steps=50)
    gold = np.loadtxt(os.path.join(GOLD_DIR, "bw_vl_50cycles.tab"))
    U = np.asarray(s.state.U)
    sl = s.grid.interior()
    Bcc = np.asarray(s.state.Bcc)
    U1d = np.concatenate([U[:5], Bcc[1][None], Bcc[2][None]],
                         0)[(slice(None),) + sl]
    W = np.asarray(cons1d_to_prim1d(jnp.asarray(U1d),
                                    jnp.asarray(Bcc[0][sl]), s.sim))
    mine = [W[0], W[1], W[2], W[3], W[4], np.ravel(Bcc[0][sl]), W[5], W[6]]
    for i, nm in enumerate(["d", "v1", "v2", "v3", "P", "B1", "B2", "B3"]):
        np.testing.assert_allclose(np.ravel(mine[i]), gold[:, 2 + i],
                                   rtol=0, atol=1e-12, err_msg=nm)


def test_vl_2d_mhd_orszag_tang_10cycles():
    """2D VL Newtonian MHD with the reduced CT update (integrate_2d_vl.c)
    vs the reference built with --with-problem=orszag-tang --with-gas=mhd
    --with-integrator=vl --with-flux=hlld --with-order=2, 64^2, 10 cycles
    at cour_no=0.4."""
    s = Simulation.from_file(
        os.path.join(GOLD_DIR, "athinput.ot64"), gas="mhd",
        integrator="vl", flux="hlld", order="2",
        cmdline=["time/nlim=10", "time/tlim=10", "time/cour_no=0.4"])
    s.run(max_steps=10)
    gold = np.loadtxt(os.path.join(GOLD_DIR, "ot_vl_10cycles.tab"))
    sl = s.grid.interior()
    U = np.asarray(s.state.U)
    B = np.asarray(s.state.Bcc)
    fields = [U[0], U[1], U[2], U[3], U[4], B[0], B[1], B[2]]
    for i, nm in enumerate(["d", "M1", "M2", "M3", "E",
                            "B1", "B2", "B3"]):
        np.testing.assert_allclose(np.ravel(fields[i][sl]),
                                   gold[:, 4 + i], rtol=0, atol=1e-13,
                                   err_msg=nm)
