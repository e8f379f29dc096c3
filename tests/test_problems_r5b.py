"""Late round-5 problem generators vs reference C builds: shu_osher,
lw_implode, rotor, current_sheet.

Goldens per tests/golden/README.md recipe (tab cons dumps every cycle,
dat_fmt=%25.17e; cycle-1 + final-cycle snapshots in each npz).
"""

import numpy as np
import pytest

from test_problems_r5 import GOLD, _run_compare


@pytest.mark.slow
def test_shu_osher_30cycles():
    """Shu-Osher shocktube (shu-osher.c): Mach-3 shock into a sine
    density field, 200 zones, outflow BCs."""
    _run_compare("athinput.shuosher", "shuosher_30cycles.npz",
                 "shu_osher", 30, ["d", "M1", "M2", "M3", "E"],
                 1e-11, 1e-9,
                 gas="hydro", flux="hllc", order="2", integrator="ctu")


@pytest.mark.slow
def test_lw_implode_20cycles_and_symmetry():
    """Liska-Wendroff implosion (lw_implode.c): 64^2 reflecting box.
    Also asserts the scheme preserves the exact i<->j symmetry of the
    initial data (the reference's diff_d diagnostic) to roundoff."""
    s = _run_compare("athinput.lwimplode", "lwimplode_20cycles.npz",
                     "lw_implode", 20, ["d", "M1", "M2", "M3", "E"],
                     1e-11, 1e-9,
                     gas="hydro", flux="hllc", order="2", integrator="ctu")
    sl = s.grid.interior()
    d = np.asarray(s.state.U[0])[sl][0]       # (Ny, Nx) plane
    np.testing.assert_allclose(d, d.T, rtol=0, atol=1e-12,
                               err_msg="i<->j symmetry broken")
    # M1(i,j) must mirror M2(j,i)
    M1 = np.asarray(s.state.U[1])[sl][0]
    M2 = np.asarray(s.state.U[2])[sl][0]
    np.testing.assert_allclose(M1, M2.T, rtol=0, atol=1e-12)


@pytest.mark.slow
def test_rotor_20cycles():
    """First rotor problem (rotor.c): dense rotating disk in uniform Bx,
    64^2, no taper (r1 < 0), outflow BCs."""
    _run_compare("athinput.rotor64", "rotor_20cycles.npz", "rotor", 20,
                 ["d", "M1", "M2", "M3", "E", "B1", "B2", "B3"],
                 1e-11, 1e-9, eager=True,
                 gas="mhd", flux="roe", order="2", integrator="ctu")


@pytest.mark.slow
def test_current_sheet_physics():
    """Current sheet (current_sheet.c): doubly-periodic reconnection
    layers, 64^2.

    This problem is validated by physics invariants rather than a
    bitwise reference golden: with v2 == 0 identically, the x2-sweep
    mass flux at the sheet columns is a pure cancellation of order
    1e-16 whose SIGN selects the CT EMF upwind branch
    (integrate_2d_ctu.c's upwinded emf3 corner average), so bitwise
    parity there is a measure-zero floating-point tie (the reference
    itself would flip it under different compiler flags).  Our Roe
    solver matches the reference bit-for-bit on the identical
    interface states (verified offline; see tests/golden/README.md).
    """
    from atmospheric_athena_tpu import Simulation
    from atmospheric_athena_tpu.utils.fields import compute_div_b
    import os
    s = Simulation.from_file(
        os.path.join(GOLD, "athinput.cursheet"), problem="current_sheet",
        cmdline=["time/nlim=20", "time/tlim=9e9"],
        gas="mhd", flux="roe", order="2", integrator="ctu")
    sl = s.grid.interior()

    def energies(st):
        U = np.asarray(st.U); B = np.asarray(st.Bcc)
        Eb = 0.5 * (B[0] ** 2 + B[1] ** 2 + B[2] ** 2)[sl].sum()
        Et = U[4][sl].sum()
        return Eb, Et

    Eb0, Et0 = energies(s.state)
    for _ in range(20):
        s.step()
    Eb1, Et1 = energies(s.state)
    # div(B) stays at machine zero under CT
    db = np.asarray(compute_div_b(s.state.B1i, s.state.B2i, s.state.B3i,
                                  s.grid))[sl]
    assert np.abs(db).max() < 1e-12
    # reconnection dissipates magnetic energy into the gas; total E is
    # conserved by the periodic box
    assert Eb1 < Eb0
    assert abs(Et1 - Et0) < 1e-10 * abs(Et0)
    # the x3 direction stays dead (Roe wave-sum roundoff only)
    assert np.abs(np.asarray(s.state.U[3])[sl]).max() < 1e-20
    assert np.abs(np.asarray(s.state.Bcc[2])[sl]).max() < 1e-20


@pytest.mark.slow
def test_carbuncle_20cycles():
    """Carbuncle test (carbuncle.c): Mach-10 inflow reflecting off the
    outer-x1 wall with a checkerboard M2 seed (shk_flag=1)."""
    _run_compare("athinput.carbuncle", "carbuncle_20cycles.npz",
                 "carbuncle", 20, ["d", "M1", "M2", "M3", "E"],
                 1e-11, 1e-9, eager=True,
                 gas="hydro", flux="roe", order="2", integrator="ctu")


@pytest.mark.slow
def test_testsedov_20cycles():
    """Edge-driven Sedov blast (testsedov.c), 3D CTU."""
    _run_compare("athinput.testsedov", "testsedov_20cycles.npz",
                 "testsedov", 20, ["d", "M1", "M2", "M3", "E"],
                 1e-11, 1e-9,
                 gas="hydro", flux="hllc", order="2", integrator="ctu")
