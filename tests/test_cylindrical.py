"""Cylindrical-coordinate CTU integrator vs the reference C binary
(--with-coord=cylindrical builds; tst/cylindrical decks).

Goldens (tests/golden/README.md recipe):
  cylblast2d_*    — athinput.cylblast_B0-2D (200x300 R-phi hydro blast,
                    config --with-problem=cylblast --with-coord=cylindrical
                    --with-gas=hydro; flux hllc), 20 cycles.
  cylwindrot1d_*  — athinput.cylwindrot-1D (128-zone rotating transonic
                    wind with point-mass gravity via x1GravAcc), 30
                    cycles.  The init differs at the bisection tolerance
                    (~4e-8 abs), so the trajectory comparison is at 1e-6.
"""

import os

import numpy as np
import pytest

from atmospheric_athena_tpu import Simulation

HERE = os.path.dirname(__file__)
GOLD = os.path.join(HERE, "golden")


def test_cylblast_2d_vs_reference():
    s = Simulation.from_file(os.path.join(GOLD, "athinput.cylblast2d"),
                             dtype="float64")
    assert s.grid.cylindrical and s.sim.flux == "hllc"
    g0 = np.load(os.path.join(GOLD, "cylblast2d_init.npz"))
    sl = (slice(None),) + s.grid.interior()
    U = np.asarray(s.state.U)[sl]
    np.testing.assert_allclose(U[0][0], g0["d"], rtol=0, atol=1e-12)
    np.testing.assert_allclose(U[4][0], g0["E"], rtol=0, atol=1e-12)

    g = np.load(os.path.join(GOLD, "cylblast2d_20cycles.npz"))
    for _ in range(20):
        s.step()
    assert float(s.state.time) == pytest.approx(float(g["time"]),
                                                rel=1e-5)
    U = np.asarray(s.state.U)[sl]
    for k, n in [(0, "d"), (1, "M1"), (2, "M2"), (3, "M3"), (4, "E")]:
        scale = np.abs(g[n]).max()
        np.testing.assert_allclose(U[k][0], g[n], rtol=0,
                                   atol=1e-10 * max(scale, 1e-30))


def test_cylwindrot_1d_vs_reference():
    s = Simulation.from_file(os.path.join(GOLD, "athinput.cylwindrot1d"),
                             dtype="float64")
    assert s.grid.cylindrical
    g = np.load(os.path.join(GOLD, "cylwindrot1d_30cycles.npz"))
    for _ in range(30):
        s.step()
    assert float(s.state.time) == pytest.approx(float(g["time"]),
                                                rel=1e-5)
    sl = (slice(None),) + s.grid.interior()
    U = np.asarray(s.state.U)[sl]
    for k, n in [(0, "d"), (1, "M1"), (2, "M2"), (4, "E")]:
        scale = np.abs(g[n]).max()
        np.testing.assert_allclose(U[k][0, 0], g[n], rtol=0,
                                   atol=1e-6 * scale)


def test_cylwindrot_steady_state():
    """The transonic wind is a steady solution: after 30 cycles the
    relative drift from the initial profile stays small (the reference's
    own Userwork_after_loop error diagnostic)."""
    s = Simulation.from_file(os.path.join(GOLD, "athinput.cylwindrot1d"),
                             dtype="float64")
    sl = (slice(None),) + s.grid.interior()
    U0 = np.asarray(s.state.U)[sl]
    for _ in range(30):
        s.step()
    U = np.asarray(s.state.U)[sl]
    drift = np.abs(U - U0).max() / np.abs(U0).max()
    assert drift < 5e-3, drift


def test_cylwindrotb_1d_mhd_vs_reference():
    """1D cylindrical MHD (integrators/cyl.step_mhd1d) vs the reference
    --with-coord=cylindrical --with-gas=mhd --with-flux=roe build on
    athinput.cylwindrotb-1D (Sakurai's magnetized rotating wind), 30
    cycles.  Init is bit-exact (same bisection); trajectory at 1e-12."""
    s = Simulation.from_file(os.path.join(GOLD, "athinput.cwrb1d"),
                             problem="cylwindrotb", dtype="float64")
    assert s.grid.cylindrical and s.sim.mhd and s.sim.flux == "roe"
    g = np.load(os.path.join(GOLD, "cwrb1d_30cycles.npz"))
    sl = (slice(None),) + s.grid.interior()
    U = np.asarray(s.state.U)[sl]
    B = np.asarray(s.state.Bcc)[sl]
    for k, n in [(0, "d"), (1, "M1"), (2, "M2"), (4, "E")]:
        np.testing.assert_allclose(U[k][0, 0], g[n + "_init"], rtol=0,
                                   atol=1e-13 * np.abs(g[n + "_init"]).max())
    for k, n in [(0, "B1c"), (1, "B2c")]:
        np.testing.assert_allclose(B[k][0, 0], g[n + "_init"], rtol=0,
                                   atol=1e-13 * np.abs(g[n + "_init"]).max())

    for _ in range(30):
        s.step()
    assert float(s.state.time) == pytest.approx(float(g["time"]),
                                                rel=1e-6)
    U = np.asarray(s.state.U)[sl]
    B = np.asarray(s.state.Bcc)[sl]
    for k, n in [(0, "d"), (1, "M1"), (2, "M2"), (3, "M3"), (4, "E")]:
        scale = max(np.abs(g[n]).max(), 1e-30)
        np.testing.assert_allclose(U[k][0, 0], g[n], rtol=0,
                                   atol=1e-12 * scale)
    for k, n in [(0, "B1c"), (1, "B2c"), (2, "B3c")]:
        scale = max(np.abs(g[n]).max(), 1e-30)
        np.testing.assert_allclose(B[k][0, 0], g[n], rtol=0,
                                   atol=1e-12 * scale)


def test_cylblast_2d_mhd_vs_reference():
    """2D (R,phi) cylindrical MHD CTU+CT (integrators/cyl.step_mhd2d) vs
    the reference --with-coord=cylindrical --with-gas=mhd
    --with-flux=hlld build on a reduced athinput.cylblast_B1-2D
    (64x96, planar 45-degree field), 20 cycles."""
    s = Simulation.from_file(os.path.join(GOLD, "athinput.cylblastb2d"),
                             dtype="float64")
    assert s.grid.cylindrical and s.sim.mhd and s.sim.flux == "hlld"
    g = np.load(os.path.join(GOLD, "cylblastb2d_20cycles.npz"))
    sl = (slice(None),) + s.grid.interior()

    def fields():
        U = np.asarray(s.state.U)[sl]
        B = np.asarray(s.state.Bcc)[sl]
        return {"d": U[0][0], "M1": U[1][0], "M2": U[2][0],
                "M3": U[3][0], "E": U[4][0], "B1c": B[0][0],
                "B2c": B[1][0], "B3c": B[2][0]}

    f = fields()
    for n in ("d", "M1", "M2", "E", "B1c", "B2c", "B3c"):
        np.testing.assert_allclose(
            f[n], g[n + "_init"], rtol=0,
            atol=1e-12 * max(np.abs(g[n + "_init"]).max(), 1e-30))

    s.step()
    # the tab header prints Time= with %g (6 sig figs)
    assert float(s.state.time) == pytest.approx(float(g["time_c1"]),
                                                rel=1e-5)
    f = fields()
    for n in ("d", "M1", "M2", "M3", "E", "B1c", "B2c", "B3c"):
        scale = max(np.abs(g[n + "_c1"]).max(), 1e-30)
        np.testing.assert_allclose(f[n], g[n + "_c1"], rtol=0,
                                   atol=1e-13 * scale)

    for _ in range(19):
        s.step()
    assert float(s.state.time) == pytest.approx(float(g["time"]),
                                                rel=1e-5)
    f = fields()
    for n in ("d", "M1", "M2", "M3", "E", "B1c", "B2c", "B3c"):
        scale = max(np.abs(g[n]).max(), 1e-30)
        np.testing.assert_allclose(f[n], g[n], rtol=0,
                                   atol=1e-12 * scale)
