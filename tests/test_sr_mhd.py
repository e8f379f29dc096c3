"""Special-relativistic MHD vs the reference C build.

Goldens from /root/reference configured with --with-problem=shkset1d
--with-gas=mhd --enable-special-relativity --with-integrator=vl
--with-flux=hlld --with-order=2p, run on tst/1D-sr-mhd decks for 50
cycles with %25.16e tab output.  Exercises the SR-MHD Noble-style Newton
inversion (convert_var.c:613-800), the HLLD solver with the PLUTO quartic
wave speeds and ECHO fallback (hlld_sr.c), and the 1D VL-SR integrator
(integrate_1d_vl_sr.c, MHD branch, FOFC off).
"""

import os

import numpy as np
import pytest

from atmospheric_athena_tpu import Simulation
from atmospheric_athena_tpu.config import SimConfig
from atmospheric_athena_tpu.eos_sr import (sr_mhd_cons1d_to_prim1d,
                                           sr_mhd_prim1d_to_cons1d)

HERE = os.path.dirname(__file__)
GOLD = os.path.join(HERE, "golden")
DECKS = "/root/reference/tst/1D-sr-mhd"


def test_sr_mhd_eos_roundtrip():
    sim = SimConfig(gas="mhd", special_relativity=True, integrator="vl",
                    order="2p", flux="hlld")
    rng = np.random.default_rng(7)
    n = 256
    d = rng.uniform(0.1, 10.0, n)
    v = rng.uniform(-0.6, 0.6, (3, n))
    v *= 0.9 / np.maximum(1.0, np.sqrt((v ** 2).sum(0)))[None]
    P = rng.uniform(0.01, 50.0, n)
    B = rng.uniform(-2.0, 2.0, (3, n))
    W = np.stack([d, v[0], v[1], v[2], P, B[1], B[2]])
    U = np.asarray(sr_mhd_prim1d_to_cons1d(W, B[0], sim))
    W2 = np.asarray(sr_mhd_cons1d_to_prim1d(U, B[0], sim))
    np.testing.assert_allclose(W2, W, rtol=1e-8, atol=1e-10)


def _run_and_compare(deck, golden, ncyc=50, tol=1e-9):
    s = Simulation.from_file(os.path.join(DECKS, deck), problem="shkset1d",
                             gas="mhd", flux="hlld",
                             cmdline=[f"time/nlim={ncyc}", "time/tlim=10.0"])
    s.run(max_steps=ncyc)
    gold = np.loadtxt(os.path.join(GOLD, golden))
    sl = s.grid.interior()
    U = np.asarray(s.state.U)
    Bcc = np.asarray(s.state.Bcc)
    U1d = np.concatenate([U[:5], Bcc[1][None], Bcc[2][None]],
                         0)[(slice(None),) + sl]
    W = np.asarray(sr_mhd_cons1d_to_prim1d(U1d, Bcc[0][sl], s.sim))
    mine = [W[0], W[1], W[2], W[3], W[4], np.ravel(Bcc[0][sl]), W[5], W[6]]
    for i, name in enumerate(["d", "v1", "v2", "v3", "P",
                              "B1", "B2", "B3"]):
        ref = gold[:, 2 + i]
        scale = max(np.abs(ref).max(), 1.0)
        np.testing.assert_allclose(
            np.ravel(mine[i]), ref, rtol=0, atol=tol * scale,
            err_msg=f"{deck}: {name}")


@pytest.mark.slow
def test_sr_mhd_mub1_50cycles():
    """MUB shock tube 1 (Brio & Wu-like, gamma=2, v=0 initial)."""
    _run_and_compare("athinput.mub1", "sr_mub1_50cycles.tab")


@pytest.mark.slow
def test_sr_mhd_mubrot_50cycles():
    """Rotated-field tube: nonzero v2/v3, B2/B3 on both sides exercises
    the full 7-wave fan and the K-vector contact construction."""
    _run_and_compare("athinput.mubrot", "sr_mubrot_50cycles.tab")
