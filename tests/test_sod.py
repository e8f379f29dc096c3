"""End-to-end golden test: Sod shock tube vs the reference C code.

tests/golden/sod_t0.25_prim.tab was produced by building the reference
(configure --with-problem=shkset1d --with-gas=hydro --with-flux=roe) and
running it on tst/1D-hydro/athinput.sod with dat_fmt=%25.16e.  Both codes
take 87 cycles to t=0.25; agreement is at FP-roundoff level (~1e-13),
demonstrating bit-faithful PLM/Roe/CTU numerics.
"""

import os

import numpy as np
import pytest

from atmospheric_athena_tpu import Simulation
from atmospheric_athena_tpu.eos import cons1d_to_prim1d
from atmospheric_athena_tpu.integrators.sweep import to_sweep

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "sod_t0.25_prim.tab")
DECK = "/root/reference/tst/1D-hydro/athinput.sod"


@pytest.fixture(scope="module")
def sod_result():
    s = Simulation.from_file(DECK)
    s.run()
    return s


class TestSod:
    def test_cycle_count(self, sod_result):
        assert int(sod_result.state.nstep) == 87
        assert float(sod_result.state.time) == pytest.approx(0.25)

    def test_matches_reference(self, sod_result):
        s = sod_result
        ref = np.loadtxt(GOLDEN)
        U1d, _ = to_sweep(s.state.U, None, 0, s.sim)
        W = np.asarray(cons1d_to_prim1d(U1d, None, s.sim))[:, 0, 0, :]
        sl = s.grid.interior()[2]
        mine = W[:, sl]
        np.testing.assert_allclose(s.grid.cc_coords(0)[sl], ref[:, 1],
                                   atol=1e-12)
        for k, col in [(0, 2), (1, 3), (2, 4), (3, 5), (4, 6)]:
            np.testing.assert_allclose(mine[k], ref[:, col],
                                       rtol=1e-10, atol=1e-10)

    def test_conservation(self, sod_result):
        s = sod_result
        U = np.asarray(s.state.U)[(slice(None),) + s.grid.interior()]
        mass = U[0].sum() * s.grid.dx[0]
        assert mass == pytest.approx(0.5625, rel=1e-12)
        assert not np.isnan(U).any()


class TestBrioWu:
    """1D MHD shock tube vs reference (golden from the C binary, 95 cycles
    to t=0.1; agreement ~1e-15)."""

    def test_matches_reference(self):
        from atmospheric_athena_tpu.eos import cons1d_to_prim1d
        from atmospheric_athena_tpu.integrators.sweep import to_sweep
        s = Simulation.from_file(
            "/root/reference/tst/1D-mhd/athinput.brio-wu", gas="mhd")
        s.run()
        assert int(s.state.nstep) == 95
        ref = np.load(os.path.join(os.path.dirname(__file__), "golden",
                                   "briowu_t0.1_prim.npz"))["data"]
        U1d, Bxc = to_sweep(s.state.U, s.state.Bcc, 0, s.sim)
        W = np.asarray(cons1d_to_prim1d(U1d, Bxc, s.sim))[:, 0, 0, :]
        sl = s.grid.interior()[2]
        mine = W[:, sl]
        for k, col in [(0, 2), (1, 3), (2, 4), (3, 5), (4, 6), (5, 8),
                       (6, 9)]:
            np.testing.assert_allclose(mine[k], ref[:, col], rtol=0,
                                       atol=1e-11)
