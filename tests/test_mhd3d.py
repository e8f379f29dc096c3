"""2D/3D MHD CTU+CT validation vs the reference C code.

Goldens are committed in tests/golden/ (decks `athinput.*`, fields as
compressed .npz), regenerated from a reference build of
`--with-gas=mhd --with-flux=roe --with-order=2 --with-integrator=ctu
--enable-h-correction` (see tests/golden/README.md).

Tolerance notes (established by stage-by-stage forensics in round 1):
  - hydro variables (d, M, E) match the reference to ~1e-15 per step;
  - on the *blast* problem the background velocity is exactly zero, so
    the Gardiner-Stone corner-EMF upwind select (sign of the transverse
    mass flux, integrate_3d_ctu.c:3579-3617) is tie-degenerate at t=0:
    the C build's op ordering produces ±1e-18 noise where JAX produces
    exact zeros (or vice versa), flipping the select on a few dozen
    interfaces and perturbing B there by ~1e-3 after one step.  Any
    compiler change does the same to the C code, so the blast tests
    use a split tolerance: tight on U after 1 step, loose on B.
  - cpaw3d has smooth nonzero fields everywhere (no degenerate
    branches) and matches to ~2e-15 after 10 cycles — that is the
    *tight* multi-cycle 3D MHD CT check.
"""

import os

import numpy as np
import pytest

from atmospheric_athena_tpu import Simulation

GOLD_DIR = os.path.join(os.path.dirname(__file__), "golden")


def gpath(name):
    return os.path.join(GOLD_DIR, name)


def divb_max(s):
    B1i = np.asarray(s.state.B1i)
    B2i = np.asarray(s.state.B2i)
    B3i = np.asarray(s.state.B3i)
    g = s.grid
    zs, ys, xs = g.interior()
    return np.abs(
        (B1i[zs, ys, xs.start + 1:xs.stop + 1] - B1i[zs, ys, xs]) / g.dx[0]
        + (B2i[zs, ys.start + 1:ys.stop + 1, xs] - B2i[zs, ys, xs]) / g.dx[1]
        + (B3i[zs.start + 1:zs.stop + 1, ys, xs] - B3i[zs, ys, xs]) / g.dx[2]
    ).max()


def _interior_fields(st, grid):
    U = np.asarray(st.U)[(slice(None),) + grid.interior()]
    B = np.asarray(st.Bcc)[(slice(None),) + grid.interior()]
    return {"d": U[0], "M1": U[1], "M2": U[2], "M3": U[3], "E": U[4],
            "B1c": B[0], "B2c": B[1], "B3c": B[2]}


@pytest.mark.slow
def test_blast3d_mhd_one_step_eager():
    from atmospheric_athena_tpu.integrators import ctu3d_mhd
    s = Simulation.from_file(gpath("athinput.b3n1"), gas="mhd")
    st = ctu3d_mhd.step(s.state, s.state.dt, s.sim, s.grid, s.problem)
    gold = np.load(gpath("blast3dmhd_sym_1step.npz"))
    got = _interior_fields(st, s.grid)
    # hydro vars: tight
    for name in ("d", "M1", "M2", "M3", "E"):
        np.testing.assert_allclose(got[name], gold[name], rtol=0, atol=5e-13)
    # B: absorb tie-degenerate EMF-upwind flips (~64 of 49k cells, ~1.2e-3)
    for name in ("B1c", "B2c", "B3c"):
        diff = np.abs(got[name] - gold[name])
        assert diff.max() < 2e-3
        assert (diff > 1e-12).sum() < 200  # flips stay localized


@pytest.mark.slow
def test_blast3d_mhd_two_steps():
    s = Simulation.from_file(gpath("athinput.b3a2"), gas="mhd")
    s.run(max_steps=2)
    gold = np.load(gpath("blast3dmhd_asym_2step.npz"))
    got = _interior_fields(s.state, s.grid)
    # step-1 B tie-flips contaminate everything at the 1e-3 level by step 2
    for name in ("d", "M1", "M2", "M3", "E", "B1c", "B2c", "B3c"):
        np.testing.assert_allclose(got[name], gold[name], rtol=0, atol=5e-3)
    assert divb_max(s) < 1e-12


@pytest.mark.slow
def test_blast2d_mhd_one_step_eager():
    """2D CTU+CT (emf3 corners, B3 flux differencing, H-correction)
    matches the reference to roundoff on a single asymmetric MHD blast
    step (integrate_2d_ctu.c incl. H_CORRECTION :1219-1245)."""
    from atmospheric_athena_tpu.integrators import ctu2d_mhd
    s = Simulation.from_file(gpath("athinput.blast2dmhd"), gas="mhd")
    st = ctu2d_mhd.step(s.state, s.state.dt, s.sim, s.grid, s.problem)
    gold = np.load(gpath("blast2dmhd_1step.npz"))
    U = np.asarray(st.U)[(slice(None),) + s.grid.interior()][:, 0]
    B = np.asarray(st.Bcc)[(slice(None),) + s.grid.interior()][:, 0]
    got = {"d": U[0], "M1": U[1], "M2": U[2], "M3": U[3], "E": U[4],
           "B1c": B[0], "B2c": B[1], "B3c": B[2]}
    for name in got:
        np.testing.assert_allclose(got[name], gold[name], rtol=0, atol=1e-14)


@pytest.mark.slow
def test_cpaw3d_ten_cycles_tight():
    """Oblique 3D circularly polarized Alfvén wave: generic smooth fields
    (no tie-degenerate upwind branches) — 10 jitted cycles match the
    reference to ~5e-15 in every variable including B."""
    s = Simulation.from_file(gpath("athinput.cpaw3d"))
    s.run(max_steps=10)
    gold = np.load(gpath("cpaw3d_10cycles.npz"))
    got = _interior_fields(s.state, s.grid)
    for name in got:
        np.testing.assert_allclose(got[name], gold[name], rtol=0, atol=2e-14)
    assert divb_max(s) < 5e-13  # roundoff at B~1, dx~0.09


@pytest.mark.slow
def test_orszag_tang_matches_reference():
    """2D MHD Orszag-Tang vortex: 10 jitted cycles match the reference to
    ~1e-14 (generic fields — no tie-degenerate upwind branches)."""
    deck = gpath("athinput.ot64")
    s = Simulation.from_file(deck, problem="orszag-tang")
    s.run(max_steps=10)
    gold = np.load(gpath("orszag_tang_64_10cycles.npz"))["data"]
    N = 64
    U = np.asarray(s.state.U)[(slice(None),) + s.grid.interior()][:, 0]
    B = np.asarray(s.state.Bcc)[(slice(None),) + s.grid.interior()][:, 0]
    for q, c in [(U[0], 4), (U[1], 5), (U[2], 6), (U[4], 8),
                 (B[0], 9), (B[1], 10)]:
        np.testing.assert_allclose(q, gold[:, c].reshape(N, N), rtol=0,
                                   atol=1e-12)
