"""Pallas fused-kernel equivalence: the TPU fast path (ops/pallas_hydro.py)
must produce the same step as the reference-validated jnp formulation.

Runs the kernels in interpreter mode on CPU (pallas_hydro._interpret) via
use_pallas='on'.  The only numerical difference permitted is the Roe
HLLE-fallback evaluation strategy (lax.cond vs branchless where-blend),
which is value-identical, so the comparison is exact.
"""

import os

import numpy as np
import pytest

from atmospheric_athena_tpu import Simulation

HERE = os.path.dirname(__file__)
GOLD = os.path.join(HERE, "golden")


def _step_pair(**overrides):
    """Two sims off the production 64^3 deck: jnp path vs pallas path."""
    path = os.path.join(GOLD, "athinput.isph64")
    a = Simulation.from_file(path, problem="ioniz_sphere",
                             use_pallas="off", **overrides)
    b = Simulation.from_file(path, problem="ioniz_sphere",
                             use_pallas="on", **overrides)
    return a, b


@pytest.mark.slow
def test_pallas_step_matches_jnp():
    """Full production step (radiation sub-cycle + CTU hydro).  The fused
    radiation kernels are formula-identical to the jnp path but sit in a
    different fusion context, so XLA's FMA choices differ at the last ulp —
    hence tight-allclose, not bitwise (observed max rel ~6e-14 in f64)."""
    a, b = _step_pair()
    assert a.sim.h_correction  # etah path exercised
    for _ in range(2):
        a.step()
        b.step()
    Ua = np.asarray(a.state.U)[(slice(None),) + a.grid.interior()]
    Ub = np.asarray(b.state.U)[(slice(None),) + b.grid.interior()]
    for k in range(Ua.shape[0]):
        scale = np.abs(Ua[k]).max()
        np.testing.assert_allclose(Ub[k], Ua[k], rtol=0,
                                   atol=1e-12 * scale)
    assert float(a.state.dt) == pytest.approx(float(b.state.dt),
                                              rel=1e-12)


@pytest.mark.slow
def test_pallas_step_matches_jnp_ppm():
    a, b = _step_pair(order="3")
    a.step()
    b.step()
    Ua = np.asarray(a.state.U)[(slice(None),) + a.grid.interior()]
    Ub = np.asarray(b.state.U)[(slice(None),) + b.grid.interior()]
    for k in range(Ua.shape[0]):
        scale = np.abs(Ua[k]).max()
        np.testing.assert_allclose(Ub[k], Ua[k], rtol=0,
                                   atol=1e-12 * scale)


@pytest.mark.slow
def test_pallas_step_matches_jnp_no_hcorr():
    """Without the H-correction the pallas path takes the with_df fast
    route (sweep-emitted dF + flux_sweep_df + aligned final update) —
    the production bench configuration.  Must still match jnp."""
    a, b = _step_pair(h_correction=False)
    assert not a.sim.h_correction
    for _ in range(2):
        a.step()
        b.step()
    Ua = np.asarray(a.state.U)[(slice(None),) + a.grid.interior()]
    Ub = np.asarray(b.state.U)[(slice(None),) + b.grid.interior()]
    for k in range(Ua.shape[0]):
        scale = np.abs(Ua[k]).max()
        np.testing.assert_allclose(Ub[k], Ua[k], rtol=0,
                                   atol=1e-12 * scale)
    assert float(a.state.dt) == pytest.approx(float(b.state.dt),
                                              rel=1e-12)
