"""Golden test: the production ioniz_sphere problem vs the reference C code.

Reference built with the production configure line minus MPI/SMR
(--with-problem=ioniz_sphere --with-gas=hydro --enable-ion-radiation
--enable-ion-plane --with-flux=roe --enable-h-correction), run on a 64³
single-domain version of tst/massloss/athinput.ioniz_sphere_hires for 10
cycles.  Observed: identical (time, dt) trajectory; final state rel diff
≤ ~1e-12 (d and s0 at ~1e-21).
"""

import os

import numpy as np
import pytest

from atmospheric_athena_tpu import Simulation

HERE = os.path.dirname(__file__)
GOLD = os.path.join(HERE, "golden")

REF_TRAJ = [
    (8.977883e-06, 1.795577e-05), (2.693365e-05, 3.591153e-05),
    (6.284518e-05, 7.182306e-05), (1.346682e-04, 1.436461e-04),
    (2.783144e-04, 2.872922e-04), (5.656066e-04, 5.745845e-04),
    (1.140191e-03, 1.149169e-03), (2.289360e-03, 2.298338e-03),
    (4.587698e-03, 4.596676e-03), (9.184374e-03, 9.193352e-03),
]


@pytest.mark.slow
def test_ioniz_sphere_matches_reference():
    s = Simulation.from_file(os.path.join(GOLD, "athinput.isph64"),
                             problem="ioniz_sphere")
    assert s.sim.h_correction
    for i, (t_ref, dt_ref) in enumerate(REF_TRAJ):
        s.step()
        assert float(s.state.time) == pytest.approx(t_ref, rel=1e-6), i
        assert float(s.state.dt) == pytest.approx(dt_ref, rel=1e-6), i

    gold = np.load(os.path.join(GOLD, "ioniz_sphere_64_10cycles.npz"))
    U = np.asarray(s.state.U)[(slice(None),) + s.grid.interior()]
    for name, k in [("d", 0), ("M1", 1), ("M2", 2), ("M3", 3),
                    ("E", 4), ("s0", 5)]:
        scale = np.abs(gold[name]).max() or 1.0
        np.testing.assert_allclose(U[k], gold[name], rtol=0,
                                   atol=1e-10 * scale)
