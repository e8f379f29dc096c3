"""Offline vis readers round-trip the writers (vis/__init__.py vs io/)."""

import os

import numpy as np

from atmospheric_athena_tpu import Simulation
from atmospheric_athena_tpu import vis
from atmospheric_athena_tpu.io import vtk as vtk_io
from atmospheric_athena_tpu.io import formats

HERE = os.path.dirname(__file__)
GOLD = os.path.join(HERE, "golden")


def _sim(tmp_path):
    return Simulation.from_file(os.path.join(GOLD, "athinput.ot64"),
                                problem="orszag_tang", dtype="float64")


def test_vtk_roundtrip(tmp_path):
    s = _sim(tmp_path)
    p = str(tmp_path / "ot.vtk")
    vtk_io.dump_vtk(s.state, s.sim, s.grid, p, out="cons")
    d = vis.read_vtk(p)
    sl = (slice(None),) + s.grid.interior()
    U = np.asarray(s.state.U)[sl]
    np.testing.assert_allclose(d["density"][0], U[0][0].astype(np.float32),
                               rtol=0, atol=0)
    np.testing.assert_allclose(d["momentum"][0, ..., 0],
                               U[1][0].astype(np.float32), rtol=0, atol=0)
    B = np.asarray(s.state.Bcc)[sl]
    np.testing.assert_allclose(d["cell_centered_B"][0, ..., 1],
                               B[1][0].astype(np.float32), rtol=0, atol=0)


def test_bin_roundtrip(tmp_path):
    s = _sim(tmp_path)
    p = str(tmp_path / "ot.bin")
    formats.dump_binary(p, s.state, s.sim, s.grid, out="cons")
    d = vis.read_bin(p)
    sl = (slice(None),) + s.grid.interior()
    U = np.asarray(s.state.U)[sl]
    np.testing.assert_allclose(d["d"][0], U[0][0].astype(np.float32),
                               rtol=0, atol=0)
    assert d["x1"].size == s.grid.Nx[0]


def test_tab_and_hst_readers(tmp_path):
    g = vis.read_tab(os.path.join(GOLD, "cwrb1d_30cycles.npz").replace(
        "cwrb1d_30cycles.npz", "bw_vl_50cycles.tab"))
    assert g["data"].ndim == 2 and g["data"].shape[0] > 10
