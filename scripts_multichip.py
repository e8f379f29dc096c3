"""Multichip validation + measurement on the virtual 8-device CPU mesh
(VERDICT item 2 artifact): sharded==serial equivalence, per-step wall
times, collective op counts from the compiled HLO, and scaling numbers.

Run:  XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
      JAX_PLATFORMS=cpu python scripts_multichip.py
Writes MULTICHIP_r03.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

# sitecustomize may pre-import jax with the axon TPU backend; force CPU
# before any backend initialization (see tests/conftest.py)
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from atmospheric_athena_tpu import ParameterDB
from atmospheric_athena_tpu.parallel.mesh import (make_mesh, shard_state,
                                                  state_shardings)
from atmospheric_athena_tpu.simulation import Simulation

N = int(os.environ.get("MC_N", "64"))
REPS = int(os.environ.get("MC_REPS", "5"))

sys.path.insert(0, "/root/repo")
from __graft_entry__ import _ISPH_DECK

out = {"devices": len(jax.devices()), "n": N}
par = ParameterDB.from_string(_ISPH_DECK.format(n=N))
s = Simulation.from_par(par, problem="ioniz_sphere", dtype="float32")
fn = s._build_step().__wrapped__
aux = s._step_aux


def timeit(f, *a):
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(REPS):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / REPS, r


def collective_counts(compiled):
    txt = compiled.as_text()
    return {k: txt.count(k) for k in
            ("all-reduce", "collective-permute", "all-gather",
             "reduce-scatter", "all-to-all")}


# --- serial (1 device) --------------------------------------------------
f1 = jax.jit(fn)
t1, out1 = timeit(f1, s.state, aux)
out["serial_step_s"] = t1

# --- z-sharded GSPMD step over 8 devices --------------------------------
mesh = make_mesh(8)
sh = state_shardings(mesh, s.sim)
stS = shard_state(s.state, mesh, s.sim)
f8 = jax.jit(lambda st: fn(st, aux), in_shardings=(sh,), out_shardings=sh)
t8, out8 = timeit(f8, stS)
out["sharded_step_s"] = t8
out["speedup_8dev"] = t1 / t8
out["parallel_efficiency"] = t1 / t8 / 8.0
lowered = jax.jit(lambda st: fn(st, aux), in_shardings=(sh,),
                  out_shardings=sh).lower(stS).compile()
out["collectives_gspmd_step"] = collective_counts(lowered)
err = float(np.abs(np.asarray(out8.U) - np.asarray(out1.U)).max())
scale = float(np.abs(np.asarray(out1.U)).max())
out["step_rel_err_sharded_vs_serial"] = err / scale

# --- x-sharded distributed radiation scan (shard_map + ppermute) --------
from atmospheric_athena_tpu.ionrad.config import ion_config_from_par
from atmospheric_athena_tpu.ionrad.plane import (get_ph_rate_plane,
                                                 get_ph_rate_plane_dist)

ion = ion_config_from_par(par, s.grid,
                          radplanes=getattr(s.problem, "radplanes", ()))
rng = np.random.default_rng(0)
shp = s.grid.padded_shape()
s0 = jnp.asarray(np.abs(rng.normal(size=shp)) * 1e-4 + 1e-5, jnp.float32)
inflow = jnp.float32(1.37)   # plane flux is a broadcast scalar
t_ser, (ph1, fl1) = timeit(
    jax.jit(lambda a, b: get_ph_rate_plane(a, b, -1, s.grid, ion)),
    s0, inflow)
xmesh = make_mesh(8, shape=(1, 2, 4))   # ('z','y','x'), x sharded x4
fd = jax.jit(lambda a, b: get_ph_rate_plane_dist(a, b, -1, s.grid, ion,
                                                 xmesh))
t_dist, (ph8, el8, ex8) = timeit(fd, s0, inflow)
out["rad_scan_serial_s"] = t_ser
out["rad_scan_dist8_s"] = t_dist
out["rad_scan_bitwise_equal"] = bool(
    (np.asarray(ph1) == np.asarray(ph8)).all())
out["collectives_rad_scan"] = collective_counts(
    fd.lower(s0, inflow).compile())

# --- explicit-halo overlapped step (ppermute halos) ---------------------
from atmospheric_athena_tpu.parallel.overlap import hydro_step_sharded
hmesh = make_mesh(8, shape=(2, 2, 2))
dt = jnp.float32(1e-4)
fh = jax.jit(lambda st: hydro_step_sharded(st, dt, s.sim, s.grid, hmesh))
try:
    th, outh = timeit(fh, s.state)
    out["halo_step_s"] = th
    out["collectives_halo_step"] = collective_counts(
        fh.lower(s.state).compile())
except Exception as e:      # pragma: no cover
    out["halo_step_error"] = str(e)[:200]

print(json.dumps(out, indent=1))
with open("MULTICHIP_r03.json", "w") as f:
    json.dump(out, f, indent=1)
