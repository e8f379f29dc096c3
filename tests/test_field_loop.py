"""Field-loop advection: the vecpot2b*i contract (utils.c) + CT
divergence preservation (prob/field_loop.c)."""

import numpy as np
import pytest

from atmospheric_athena_tpu import ParameterDB, Simulation
from atmospheric_athena_tpu.utils import compute_div_b

DECK = """
<comment>
config = --with-gas=mhd --with-problem=field_loop --with-flux=hlld --with-order=2
<job>
problem_id = fl
maxout = 0
<time>
cour_no = 0.4
nlim = 10
tlim = 2.0
<domain1>
level = 0
Nx1 = 64
x1min = -1.0
x1max = 1.0
bc_ix1 = 4
bc_ox1 = 4
Nx2 = 32
x2min = -0.5
x2max = 0.5
bc_ix2 = 4
bc_ox2 = 4
Nx3 = 1
x3min = -0.5
x3max = 0.5
<problem>
gamma = 1.6666666666666667
iprob = 1
rad = 0.3
amp = 1.0e-3
vflow = 1.0
"""


def test_field_loop_divb_and_advection():
    s = Simulation.from_par(ParameterDB.from_string(DECK),
                            problem="field_loop")
    div0 = np.asarray(compute_div_b(s.state.B1i, s.state.B2i, s.state.B3i,
                                    s.grid))
    b0 = np.abs(np.asarray(s.state.Bcc)).max()
    assert b0 > 5e-4                      # the loop is there
    assert np.abs(div0).max() < 1e-12 * b0 / s.grid.dx[0]

    me0 = float(np.sum(np.asarray(s.state.Bcc) ** 2))
    for _ in range(10):
        s.step()
    div = np.asarray(compute_div_b(s.state.B1i, s.state.B2i, s.state.B3i,
                                   s.grid))
    assert np.abs(div).max() < 1e-10 * b0 / s.grid.dx[0]   # CT preserves
    me = float(np.sum(np.asarray(s.state.Bcc) ** 2))
    assert 0.8 * me0 < me <= 1.0001 * me0  # loop advects, mild dissipation
