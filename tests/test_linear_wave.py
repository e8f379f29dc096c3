"""Linear-wave convergence: the reference's primary regression harness
(tst/1D-hydro/run.linear_wave1d loops resolutions and wave families and
checks L1 errors).  Here: sound wave and MHD fast wave must converge at
2nd order between N=32 and N=64 after one crossing period."""

import math

import numpy as np
import pytest

from atmospheric_athena_tpu import ParameterDB, Simulation

DECK = """
<comment>
problem = linear wave
<job>
problem_id = LinWave
<time>
cour_no = 0.4
nlim    = 100000
tlim    = {tlim}
<domain1>
Nx1 = {n}
x1min = 0.0
x1max = 1.0
bc_ix1 = 4
bc_ox1 = 4
Nx2 = 1
x2min = 0.0
x2max = 1.0
Nx3 = 1
x3min = 0.0
x3max = 1.0
<problem>
gamma     = 1.66666666666667
wave_flag = {wave_flag}
amp       = 1e-6
vflow     = 0.0
"""


def l1_sum(n, wave_flag, gas, speed):
    par = ParameterDB.from_string(
        DECK.format(n=n, wave_flag=wave_flag, tlim=1.0 / speed))
    s = Simulation.from_par(par, problem="linear_wave", gas=gas)
    s.run()
    errs = s.problem.l1_errors(s.state, s.sim, s.grid)
    return sum(errs)


@pytest.mark.slow
def test_sound_wave_second_order():
    cs = math.sqrt(1.0)  # gamma*p0/d0 = 1
    e32 = l1_sum(32, 0, "hydro", cs)
    e64 = l1_sum(64, 0, "hydro", cs)
    rate = math.log2(e32 / e64)
    assert rate > 1.7, f"sound wave converges at {rate:.2f} order"


@pytest.mark.slow
def test_mhd_fast_wave_second_order():
    # fast speed for bx=1, by=sqrt2, bz=0.5, d=1, a^2=1
    bsq = 1.0 + 2.0 + 0.25
    a2 = 1.0
    ct2 = 2.25
    cf = math.sqrt(0.5 * (a2 + bsq + math.sqrt((a2 + bsq) ** 2
                                               - 4 * a2 * 1.0)))
    e32 = l1_sum(32, 0, "mhd", cf)
    e64 = l1_sum(64, 0, "mhd", cf)
    rate = math.log2(e32 / e64)
    assert rate > 1.7, f"fast wave converges at {rate:.2f} order"


CPAW_DECK = """
<comment>
problem = cpaw
<job>
problem_id = cpaw
<time>
cour_no = 0.4
nlim    = 100000
tlim    = {tlim}
<domain1>
Nx1 = {n}
x1min = 0.0
x1max = 1.0
bc_ix1 = 4
bc_ox1 = 4
Nx2 = 1
x2min = 0.0
x2max = 1.0
Nx3 = 1
x3min = 0.0
x3max = 1.0
<problem>
gamma  = 1.66666666666667
b_par  = 1.0
b_perp = 0.1
pres   = 0.1
v_par  = 0.0
dir    = 1
"""


@pytest.mark.slow
def test_cpaw_second_order():
    """Circularly polarized Alfven wave: exact nonlinear solution; 2nd-order
    convergence after one period (v_A = 1)."""
    def err(n):
        par = ParameterDB.from_string(CPAW_DECK.format(n=n, tlim=1.0))
        s = Simulation.from_par(par, problem="cpaw")
        s.run()
        return s.problem.l1_error(s.state, s.sim, s.grid)
    e32 = err(32)
    e64 = err(64)
    rate = math.log2(e32 / e64)
    assert rate > 1.7, f"cpaw converges at {rate:.2f} order"
