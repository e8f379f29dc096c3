"""I/O subsystem tests: history, VTK, restart round-trip, output dispatch."""

import os
import struct

import numpy as np
import pytest

from atmospheric_athena_tpu import ParameterDB, Simulation
from atmospheric_athena_tpu.io.history import compute_history, history_names
from atmospheric_athena_tpu.io.restart import (load_checkpoint,
                                               save_checkpoint)
from atmospheric_athena_tpu.io.vtk import dump_vtk

SOD = "/root/reference/tst/1D-hydro/athinput.sod"


@pytest.fixture(scope="module")
def sod():
    return Simulation.from_file(SOD)


def test_history_values(sod):
    vals = [float(v) for v in compute_history(sod.state, sod.sim, sod.grid)]
    names = history_names(sod.sim)
    assert len(vals) == len(names)
    h = dict(zip(names, vals))
    # Sod initial state: mean density (1.0+0.125)/2, zero momentum
    assert h["mass"] == pytest.approx(0.5625)
    assert h["x1 Mom."] == 0.0
    # E = P/(gamma-1): (1.0+0.1)/2/0.4
    assert h["total E"] == pytest.approx(1.375)


def test_vtk_roundtrip(tmp_path, sod):
    path = str(tmp_path / "sod.vtk")
    dump_vtk(sod.state, sod.sim, sod.grid, path, out="cons")
    raw = open(path, "rb").read()
    assert raw.startswith(b"# vtk DataFile Version 2.0")
    assert b"DIMENSIONS 129 2 2" in raw
    assert b"SCALARS density float" in raw
    i = raw.index(b"LOOKUP_TABLE default\n") + len(b"LOOKUP_TABLE default\n")
    d = np.frombuffer(raw[i:i + 128 * 4], ">f4")
    U = np.asarray(sod.state.U)[(slice(None),) + sod.grid.interior()]
    np.testing.assert_allclose(d, U[0].ravel(), rtol=1e-6)


def test_restart_roundtrip(tmp_path, sod):
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, sod.state, sod.sim, sod.grid, sod.par)
    state, sim, grid, par = load_checkpoint(path)
    assert sim == sod.sim
    assert grid.Nx == sod.grid.Nx
    np.testing.assert_array_equal(np.asarray(state.U),
                                  np.asarray(sod.state.U))
    assert par.geti("domain1", "Nx1") == 128

    # resumed simulation continues stepping
    s2 = Simulation(par, sim, grid, sod.problem, state)
    s2.step()
    assert int(s2.state.nstep) == int(sod.state.nstep) + 1


def test_output_dispatch(tmp_path):
    s = Simulation.from_file(SOD)
    outs = s.make_outputs(str(tmp_path))
    # Sod deck: output1 tab (pending), output2 hst
    outs(s)
    hst = tmp_path / "Sod.hst"
    assert hst.exists()
    lines = hst.read_text().strip().splitlines()
    assert lines[-1].split()[0] == "0.000000e+00"
