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
