"""Golden tests: 2D blast and 3D ionization front vs the reference C code.

Goldens were produced by building /root/reference (configure
--with-problem={blast,ifront} --with-gas=hydro --with-flux=roe [--enable-
ion-radiation --enable-ion-plane]) and running short configurations with
%25.16e tab dumps.  Observed agreement:
  - blast 2D (64x96, periodic, 20 cycles to t=0.05): max |Δ| ~ 1e-15
  - ifront 3D (64³, 10 cycles, full radiation sub-cycling with the dt
    feedback): identical cycle-by-cycle (time, dt) trajectory; final state
    rel. diff ≤ ~1e-14, density bit-identical.
"""

import os

import numpy as np
import pytest

from atmospheric_athena_tpu import ParameterDB, Simulation

HERE = os.path.dirname(__file__)
GOLD = os.path.join(HERE, "golden")

BLAST_DECK = """
<comment>
config  = --with-gas=hydro --with-problem=blast
<job>
problem_id = Blast
<time>
cour_no = 0.8
nlim    = 10000
tlim    = 0.05
<domain1>
Nx1 = 64
x1min = -0.5
x1max = 0.5
bc_ix1 = 4
bc_ox1 = 4
Nx2 = 96
x2min = -0.75
x2max = 0.75
bc_ix2 = 4
bc_ox2 = 4
Nx3 = 1
x3min = -0.5
x3max = 0.5
<problem>
gamma  = 1.66666666666667
pamb   = 0.1
prat   = 100.0
radius = 0.1
"""


@pytest.mark.slow
def test_blast2d_matches_reference():
    par = ParameterDB.from_string(BLAST_DECK)
    s = Simulation.from_par(par)
    s.run()
    assert float(s.state.time) == pytest.approx(0.05)
    gold = np.load(os.path.join(GOLD, "blast2d_64x96_t0.05.npz"))
    U = np.asarray(s.state.U)[(slice(None),) + s.grid.interior()][:, 0]
    for name, k in [("d", 0), ("M1", 1), ("M2", 2), ("E", 4)]:
        np.testing.assert_allclose(U[k], gold[name], rtol=0, atol=1e-9)


@pytest.mark.slow
def test_ifront_matches_reference():
    deck = "/root/reference/tst/ionradiation/athinput.ifront"
    s = Simulation.from_file(deck, problem="ifront")
    # reference trajectory for the first 10 cycles (athena stderr log)
    ref_traj = [
        (6.986404e+07, 1.397281e+08), (9.207990e+07, 4.443173e+07),
        (1.365116e+08, 8.886345e+07), (2.253751e+08, 1.777269e+08),
        (4.031020e+08, 3.554538e+08), (7.585558e+08, 7.109076e+08),
        (8.723936e+08, 2.276757e+08), (9.336030e+08, 1.224187e+08),
        (1.056022e+09, 2.448374e+08), (1.300859e+09, 4.896747e+08),
    ]
    for i, (t_ref, dt_ref) in enumerate(ref_traj):
        s.step()
        assert float(s.state.time) == pytest.approx(t_ref, rel=1e-6), i
        assert float(s.state.dt) == pytest.approx(dt_ref, rel=1e-6), i

    gold = np.load(os.path.join(GOLD, "ifront_64_10cycles.npz"))
    U = np.asarray(s.state.U)[(slice(None),) + s.grid.interior()]
    for name, k in [("d", 0), ("M1", 1), ("M2", 2), ("M3", 3),
                    ("E", 4), ("s0", 5)]:
        scale = np.abs(gold[name]).max() or 1.0
        np.testing.assert_allclose(U[k], gold[name], rtol=0,
                                   atol=1e-12 * scale)
