"""Batched radiation sub-cycle (ionradiation/batch_iters > 1,
pallas_rad.build_batch) vs the reference-exact per-substep path.

The batch uses a conservative dt schedule (THETA*dt_lim) validated
in-kernel, so it integrates the same physics with slightly smaller
substeps; the two paths agree to the per-iteration change caps, not
bitwise.  MAXCELLCOUNT/CFL stops shift by at most K-1 substeps."""

import numpy as np
import pytest

from atmospheric_athena_tpu import ParameterDB, Simulation

ISPH = None


def _sim(n, batch):
    import __graft_entry__ as ge
    par = ParameterDB.from_string(ge._ISPH_DECK.format(n=n))
    par.set("ionradiation", "maxiter", 30)
    if batch > 1:
        par.set("ionradiation", "batch_iters", batch)
    return Simulation.from_par(par, problem="ioniz_sphere",
                               dtype="float64")


@pytest.mark.slow
def test_batch_matches_reference_path():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    s_ref = _sim(32, 1)
    s_bat = _sim(32, 8)
    for _ in range(3):
        s_ref.step()
        s_bat.step()
    Ur = np.asarray(s_ref.state.U)
    Ub = np.asarray(s_bat.state.U)
    assert s_bat.ion.batch_iters == 8
    tr = float(s_ref.state.time)
    tb = float(s_bat.state.time)
    assert tb == pytest.approx(tr, rel=1e-6)
    for k, nm in ((0, "d"), (4, "E"), (5, "s0")):
        scale = np.abs(Ur[k]).max()
        err = np.abs(Ub[k] - Ur[k]).max() / scale
        assert err < 3e-3, (nm, err)
