"""Output-format parity tests: tab, bin, ppm/pgm, pdf, expressions and
slice/average reduction (reference: src/dump_tab.c, dump_binary.c,
output_ppm.c, output_pgm.c, output_pdf.c, output.c OutData1/2/3)."""

import numpy as np
import pytest

from atmospheric_athena_tpu import ParameterDB, Simulation
from atmospheric_athena_tpu.io import formats

SOD = "/root/reference/tst/1D-hydro/athinput.sod"

BLAST2D = """
<comment>
config = --with-gas=hydro --with-problem=blast
<job>
problem_id = bl
maxout = 4
<output1>
out_fmt = tab
dt = 0.0
<output2>
out_fmt = bin
dt = 0.0
<output3>
out_fmt = ppm
out = d
id = d
dt = 0.0
dmin = 0.08
dmax = 1.2
palette = rainbow
<output4>
out_fmt = pdf
out = P
dt = 0.0
<time>
cour_no = 0.8
tlim = 1.0
<domain1>
Nx1 = 16
x1min = -0.5
x1max = 0.5
bc_ix1 = 4
bc_ox1 = 4
Nx2 = 16
x2min = -0.5
x2max = 0.5
bc_ix2 = 4
bc_ox2 = 4
Nx3 = 1
x3min = -0.5
x3max = 0.5
<problem>
gamma = 1.6666666667
pamb = 0.1
prat = 100.0
radius = 0.2
"""


@pytest.fixture(scope="module")
def blast2d():
    par = ParameterDB.from_string(BLAST2D)
    return Simulation.from_par(par, problem="blast")


def test_dump_tab_format(tmp_path, blast2d):
    s = blast2d
    path = str(tmp_path / "t.tab")
    formats.dump_tab(path, s.state, s.sim, s.grid)
    lines = open(path).read().splitlines()
    assert lines[0] == "# Nx1 = 16"
    assert "# x1-size = 1" in lines[1]
    assert any(l.startswith("# CONSERVED vars at Time=") for l in lines)
    hdr = [l for l in lines if "[1]=i-zone" in l][0]
    assert "[3]=x1" in hdr and "[5]=d" in hdr and "[9]=E" in hdr
    rows = [l for l in lines if not l.startswith("#")]
    assert len(rows) == 16 * 16
    # first active cell: i=4 j=4 (nghost), d = ambient or inside
    cols = rows[0].split()
    assert cols[0] == "4" and cols[1] == "4"
    U = np.asarray(s.state.U)[(slice(None),) + s.grid.interior()]
    assert float(cols[4]) == pytest.approx(float(U[0, 0, 0, 0]), rel=1e-7)


def test_dump_binary_format(tmp_path, blast2d):
    s = blast2d
    path = str(tmp_path / "t.bin")
    formats.dump_binary(path, s.state, s.sim, s.grid)
    raw = open(path, "rb").read()
    ints = np.frombuffer(raw[:32], "<i4")
    assert ints[0] == -1                       # CARTESIAN coordsys
    assert list(ints[1:5]) == [16, 16, 1, 5]   # Nx1,Nx2,Nx3,NVAR
    floats = np.frombuffer(raw[32:48], "<f4")
    assert floats[0] == pytest.approx(s.sim.gamma_1)
    assert floats[2] == pytest.approx(float(s.state.time))
    off = 48 + (16 + 16 + 1) * 4
    d = np.frombuffer(raw[off:off + 16 * 16 * 4], "<f4").reshape(16, 16)
    U = np.asarray(s.state.U)[(slice(None),) + s.grid.interior()]
    np.testing.assert_allclose(d, U[0, 0], rtol=1e-6)


def test_expressions(blast2d):
    s = blast2d
    d = formats.evaluate("d", s.state, s.sim, s.grid)
    P = formats.evaluate("P", s.state, s.sim, s.grid)
    V1 = formats.evaluate("V1", s.state, s.sim, s.grid)
    cs2 = formats.evaluate("cs2", s.state, s.sim, s.grid)
    assert d.shape == (1, 16, 16)
    np.testing.assert_allclose(cs2, s.sim.gamma * P / d, rtol=1e-12)
    assert np.all(V1 == 0.0)
    assert P.max() == pytest.approx(10.0, rel=1e-5)   # prat*pamb
    with pytest.raises(KeyError):
        formats.evaluate("nope", s.state, s.sim, s.grid)


def test_reduce_data(blast2d):
    s = blast2d
    q = formats.evaluate("d", s.state, s.sim, s.grid)
    # slice a single x2 row through the center -> 1D in x1
    out = formats.reduce_data(q, s.grid, {1: (0.0, 0.0)})
    data, kept = out
    assert kept == [0] and data.shape == (16,)
    # average whole domain in x2: mean over axis
    out2 = formats.reduce_data(q, s.grid, {1: (-np.inf, np.inf)})
    np.testing.assert_allclose(out2[0], q[0].mean(axis=0), rtol=1e-12)
    # slice outside the domain -> None
    assert formats.reduce_data(q, s.grid, {1: (2.0, 3.0)}) is None


def test_ppm_pgm_pdf(tmp_path, blast2d):
    s = blast2d
    q = formats.evaluate("d", s.state, s.sim, s.grid)[0]
    gmin, gmax = formats.output_ppm(str(tmp_path / "i.ppm"), q,
                                    0.08, 1.2, "rainbow")
    raw = open(tmp_path / "i.ppm", "rb").read()
    assert raw.startswith(b"P6\n# dmin=")
    assert b"16 16\n255\n" in raw
    assert len(raw.split(b"255\n", 1)[1]) == 16 * 16 * 3
    assert gmin == pytest.approx(q.min())

    formats.output_pgm(str(tmp_path / "i.pgm"), q)
    raw = open(tmp_path / "i.pgm", "rb").read()
    assert raw.startswith(b"P5\n16 16\n255\n")
    assert len(raw.split(b"255\n", 1)[1]) == 16 * 16

    qp = formats.evaluate("P", blast2d.state, blast2d.sim, blast2d.grid)[0]
    formats.output_pdf(str(tmp_path / "h.prb"), qp, 0.0, "P")
    lines = open(tmp_path / "h.prb").read().splitlines()
    assert lines[0].startswith("# Time =")
    assert any(l.startswith("# Nbin = 16") for l in lines)  # sqrt(256)
    rows = [l for l in lines if not l.startswith("#")]
    # histogram integrates to ~1
    vals = np.array([[float(x) for x in r.split()] for r in rows])
    delta = (qp.max() - qp.min()) / 16
    assert vals[:, 1].sum() * delta == pytest.approx(1.0, rel=1e-6)


def test_dispatcher_all_formats(tmp_path, blast2d):
    par = ParameterDB.from_string(BLAST2D)
    s = Simulation.from_par(par, problem="blast")
    outs = s.make_outputs(str(tmp_path))
    outs(s, force=True)
    names = sorted(p.name for p in tmp_path.iterdir())
    assert "bl.0000.tab" in names
    assert "bl.0000.bin" in names
    assert "bl.0000.d.ppm" in names
    assert "bl.0000.out4.prb" in names


def test_sod_tab_output(tmp_path):
    """The Sod deck's <output1> tab block (previously a silent no-op)."""
    s = Simulation.from_file(SOD)
    outs = s.make_outputs(str(tmp_path))
    outs(s, force=True)
    tabs = [p for p in tmp_path.iterdir() if p.suffix == ".tab"]
    assert tabs, "tab output missing"
