"""SMR-MHD vs the reference C code: face-field restriction, EMF flux
correction, and Toth-Roe prolongation (smr.c RestrictCorrect step
1c/2b + Prolongate step 3c/ProFld).

Golden: reference built with
  --with-problem=field_loop --with-gas=mhd --enable-smr
on tests/golden/athinput.fl2lev (3D field loop, 2-level mesh with an
interior refined box), 10 cycles, dat_fmt=%25.17e per-domain tabs.
"""

import os

import numpy as np
import pytest

from atmospheric_athena_tpu import ParameterDB
from atmospheric_athena_tpu.simulation import Simulation

GOLD_DIR = os.path.join(os.path.dirname(__file__), "golden")


@pytest.mark.slow
def test_field_loop_2level_smr_mhd_10cycles():
    par = ParameterDB.from_file(os.path.join(GOLD_DIR, "athinput.fl2lev"))
    par.set("time", "nlim", 10)
    s = Simulation.from_par(par)
    assert s.sim.mhd and len(s.levels) == 2
    for _ in range(10):
        s.step()
    for li, gname in ((0, "fl2lev_root_10cycles.npz"),
                      (1, "fl2lev_lev1_10cycles.npz")):
        gold = np.load(os.path.join(GOLD_DIR, gname))["data"]
        lev = s.levels[li]
        sl = lev.grid.interior()
        U = np.asarray(lev.state.U)
        B = np.asarray(lev.state.Bcc)
        fields = [U[0], U[1], U[2], U[3], U[4], B[0], B[1], B[2]]
        for i, nm in enumerate(["d", "M1", "M2", "M3", "E",
                                "B1c", "B2c", "B3c"]):
            np.testing.assert_allclose(
                np.ravel(fields[i][sl]), gold[:, i], rtol=0,
                atol=2e-13, err_msg=f"lev{li} {nm}")
    # the point of the exercise: div(B) stays at roundoff on BOTH levels
    # across the fine/coarse boundary
    from atmospheric_athena_tpu.utils.fields import compute_div_b
    for lev in s.levels:
        db = compute_div_b(lev.state.B1i, lev.state.B2i, lev.state.B3i,
                           lev.grid)
        assert float(np.abs(np.asarray(db)).max()) < 1e-14


@pytest.mark.slow
def test_field_loop_2level_smr_mhd_2d_10cycles():
    """2D variant: B3 is cell-centered, only EMF3 is corrected, and
    ProFld degenerates to transverse-mcd + Uxx/Vyy terms
    (smr.c:2638-2662 z-copy BCs)."""
    par = ParameterDB.from_file(os.path.join(GOLD_DIR,
                                             "athinput.fl2d2lev"))
    par.set("time", "nlim", 10)
    s = Simulation.from_par(par)
    assert s.sim.mhd and len(s.levels) == 2
    for _ in range(10):
        s.step()
    for li, gname in ((0, "fl2d2lev_root_10cycles.npz"),
                      (1, "fl2d2lev_lev1_10cycles.npz")):
        gold = np.load(os.path.join(GOLD_DIR, gname))["data"]
        lev = s.levels[li]
        sl = lev.grid.interior()
        U = np.asarray(lev.state.U)
        B = np.asarray(lev.state.Bcc)
        fields = [U[0], U[1], U[2], U[3], U[4], B[0], B[1], B[2]]
        for i, nm in enumerate(["d", "M1", "M2", "M3", "E",
                                "B1c", "B2c", "B3c"]):
            np.testing.assert_allclose(
                np.ravel(fields[i][sl]), gold[:, i], rtol=0,
                atol=1e-13, err_msg=f"lev{li} {nm}")
    from atmospheric_athena_tpu.utils.fields import compute_div_b
    for lev in s.levels:
        db = compute_div_b(lev.state.B1i, lev.state.B2i, lev.state.B3i,
                           lev.grid)
        assert float(np.abs(np.asarray(db)).max()) < 1e-14
