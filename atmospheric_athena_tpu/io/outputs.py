"""Output dispatcher (reference: src/output.c:17-29 + data_output).

Parses <outputN> blocks (out_fmt ∈ {hst, vtk, tab, rst}, out, dt, id,
usr_expr_flag) and fires each writer whenever sim time passes its next
output time, exactly like data_output's `if (pM->time >= pout->t)` schedule.
Image formats (ppm/pgm/pdf) and bin dumps of the reference are pending.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from ..par import ParameterDB
from .history import HistoryWriter
from .restart import save_checkpoint
from .vtk import dump_vtk, dump_vtk_expr


@dataclass
class Output:
    num: int
    fmt: str
    dt: float
    out: str = "cons"
    id: Optional[str] = None
    usr_expr_flag: bool = False
    t_next: float = 0.0
    count: int = 0


class OutputSet:
    def __init__(self, par: ParameterDB, outdir: str = ".",
                 problem_id: Optional[str] = None):
        self.outdir = outdir
        self.problem_id = problem_id or par.gets_def("job", "problem_id",
                                                     "out")
        self.outputs = []
        maxout = par.geti_def("job", "maxout", 0)
        for blk in par.matching_blocks("output"):
            num = int(blk[len("output"):])
            if num > maxout:
                continue
            if not par.exist(blk, "out_fmt"):
                continue
            self.outputs.append(Output(
                num=num,
                fmt=par.gets(blk, "out_fmt"),
                dt=par.getd_def(blk, "dt", 0.0),
                out=par.gets_def(blk, "out", "cons"),
                id=par.gets_def(blk, "id", None),
                usr_expr_flag=par.geti_def(blk, "usr_expr_flag", 0) == 1))
        self._hst = {}
        os.makedirs(outdir, exist_ok=True)

    def __call__(self, sim_obj, force: bool = False):
        """data_output(pM, flag) analogue; pass the Simulation object."""
        t = float(sim_obj.state.time)
        for o in self.outputs:
            if not force and t < o.t_next:
                continue
            self._write(o, sim_obj)
            o.count += 1
            while o.t_next <= t:
                o.t_next += o.dt if o.dt > 0 else float("inf")

    def _path(self, o: Output, ext: str):
        tag = f"-{o.id}" if o.id else ""
        return os.path.join(self.outdir,
                            f"{self.problem_id}{tag}.{o.count:04d}.{ext}")

    def _write(self, o: Output, s):
        state, sim, grid = s.state, s.sim, s.grid
        if o.fmt == "hst":
            key = o.num
            if key not in self._hst:
                user = getattr(s.problem, "history_scalars", ())
                self._hst[key] = HistoryWriter(
                    os.path.join(self.outdir, f"{self.problem_id}.hst"),
                    sim, user)
            self._hst[key](state, grid)
        elif o.fmt == "vtk":
            if o.usr_expr_flag:
                expr = getattr(s.problem, "get_usr_expr", lambda n: None)(
                    o.out)
                if expr is None and o.out == "flux" and \
                        state.Eflux is not None:
                    q = np.asarray(state.Eflux)[..., :-1]
                else:
                    q = np.asarray(expr(state, sim, grid))
                dump_vtk_expr(q, grid, self._path(o, "vtk"), o.out,
                              float(state.time))
            else:
                dump_vtk(state, sim, grid, self._path(o, "vtk"), o.out)
        elif o.fmt == "rst":
            save_checkpoint(self._path(o, "rst.npz"), state, sim, grid,
                            s.par)
        elif o.fmt in ("tab", "bin", "ppm", "pgm", "pdf"):
            pass  # pending formats; hst/vtk/rst cover the validation decks
