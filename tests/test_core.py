"""Unit tests: parameter parser, EOS conversions, eigensystems."""

import jax.numpy as jnp
import numpy as np
import pytest

from atmospheric_athena_tpu.config import SimConfig
from atmospheric_athena_tpu.eos import cons1d_to_prim1d, prim1d_to_cons1d, cfast
from atmospheric_athena_tpu.ops import eigen
from atmospheric_athena_tpu.par import ParameterDB

SOD_DECK = "/root/reference/tst/1D-hydro/athinput.sod"


class TestPar:
    def test_sod_deck(self):
        par = ParameterDB.from_file(SOD_DECK)
        assert par.geti("domain1", "Nx1") == 128
        assert par.getd("domain1", "x1min") == -0.5
        assert par.getd("problem", "gamma") == 1.4
        assert par.gets("output1", "out_fmt") == "tab"
        assert par.getd_def("time", "cour_no", 0.0) == 0.8
        assert par.geti_def("nope", "nope", 7) == 7
        assert par.matching_blocks("domain") == [
            "domain1", "domain2", "domain3", "domain4"]

    def test_cmdline_override(self):
        par = ParameterDB.from_file(SOD_DECK)
        par.apply_cmdline(["domain1/Nx1=64", "problem/gamma=1.6667"])
        assert par.geti("domain1", "Nx1") == 64
        assert par.getd("problem", "gamma") == 1.6667


def rand_state(sim, n=32, seed=0):
    rng = np.random.default_rng(seed)
    nv = sim.nwave + sim.nscalars
    W = np.empty((nv, n))
    W[0] = rng.uniform(0.1, 10.0, n)          # d
    W[1:4] = rng.uniform(-2, 2, (3, n))       # V
    k = 4
    if sim.adiabatic:
        W[4] = rng.uniform(0.01, 5.0, n)      # P
        k = 5
    if sim.mhd:
        W[k:k + 2] = rng.uniform(-2, 2, (2, n))
        k += 2
    for s in range(sim.nscalars):
        W[k + s] = rng.uniform(0, 1, n)
    Bx = rng.uniform(-2, 2, n)
    return jnp.asarray(W), jnp.asarray(Bx)


class TestEOS:
    @pytest.mark.parametrize("gas", ["hydro", "mhd"])
    @pytest.mark.parametrize("eos", ["adiabatic", "isothermal"])
    def test_roundtrip(self, gas, eos):
        sim = SimConfig(gas=gas, eos=eos, nscalars=2, gamma=1.4)
        W, Bx = rand_state(sim)
        U = prim1d_to_cons1d(W, Bx, sim)
        W2 = cons1d_to_prim1d(U, Bx, sim)
        np.testing.assert_allclose(np.asarray(W2), np.asarray(W),
                                   rtol=1e-12, atol=1e-12)

    def test_pressure_floor(self):
        sim = SimConfig(gamma=1.4)
        # E below kinetic energy -> P floored to TINY_NUMBER
        U = jnp.asarray([[1.0], [2.0], [0.0], [0.0], [1.0]])
        W = cons1d_to_prim1d(U, None, sim)
        assert float(W[4][0]) == pytest.approx(1e-20)

    def test_cfast_hydro(self):
        sim = SimConfig(gamma=1.4)
        W, _ = rand_state(sim)
        U = prim1d_to_cons1d(W, None, sim)
        c = cfast(U, None, sim)
        np.testing.assert_allclose(np.asarray(c),
                                   np.sqrt(1.4 * np.asarray(W[4] / W[0])),
                                   rtol=1e-12)


def dense(mat, n):
    """Sparse symbolic eigenmatrix -> dense numpy [N, nw, nw]."""
    nw = len(mat)
    out = np.zeros((n, nw, nw))
    for i in range(nw):
        for j in range(nw):
            c = mat[i][j]
            out[:, i, j] = np.asarray(c) if not isinstance(c, float) else c
    return out


class TestEigen:
    @pytest.mark.parametrize("gas,eos", [
        ("hydro", "adiabatic"), ("hydro", "isothermal"),
        ("mhd", "adiabatic"), ("mhd", "isothermal")])
    def test_prim_LR_identity(self, gas, eos):
        """L·R = I for every cell: validates the sparse eigensystems."""
        sim = SimConfig(gas=gas, eos=eos, gamma=1.4)
        W, Bx = rand_state(sim, n=64, seed=3)
        ev, rem, lem = eigen.esys_prim(W, Bx if sim.mhd else None, sim)
        n = W.shape[1]
        L = dense(lem, n)
        R = dense(rem, n)
        eye = np.broadcast_to(np.eye(sim.nwave), (n, sim.nwave, sim.nwave))
        np.testing.assert_allclose(L @ R, eye, atol=1e-11)
        # eigenvalues sorted ascending
        evn = np.stack([np.asarray(e) for e in ev])
        assert (np.diff(evn, axis=0) >= -1e-12).all()

    def test_roe_adb_hyd_LR_identity(self):
        sim = SimConfig(gamma=1.4)
        rng = np.random.default_rng(1)
        n = 64
        v1, v2, v3 = [jnp.asarray(rng.uniform(-2, 2, n)) for _ in range(3)]
        vsq = v1**2 + v2**2 + v3**2
        h = 0.5 * vsq + jnp.asarray(rng.uniform(0.5, 5.0, n))  # h > vsq/2
        ev, rem, lem = eigen.esys_roe_adb_hyd(v1, v2, v3, h, sim)
        L, R = dense(lem, n), dense(rem, n)
        eye = np.broadcast_to(np.eye(5), (n, 5, 5))
        np.testing.assert_allclose(L @ R, eye, atol=1e-11)

    def test_roe_iso_hyd_LR_identity(self):
        sim = SimConfig(eos="isothermal", iso_csound=0.7)
        rng = np.random.default_rng(2)
        n = 16
        v1, v2, v3 = [jnp.asarray(rng.uniform(-2, 2, n)) for _ in range(3)]
        ev, rem, lem = eigen.esys_roe_iso_hyd(v1, v2, v3, sim)
        L, R = dense(lem, n), dense(rem, n)
        eye = np.broadcast_to(np.eye(4), (n, 4, 4))
        np.testing.assert_allclose(L @ R, eye, atol=1e-11)
