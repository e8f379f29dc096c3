"""Per-phase profiler for the production 256^3 ioniz_sphere step.

Times each Pallas/jnp phase of the CTU hydro step, each radiation
sub-cycle kernel, bvals, and new_dt individually on the real chip, so
optimization work targets the real bottleneck (bench.py only reports
aggregates)."""
import time

import jax
import jax.numpy as jnp

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from atmospheric_athena_tpu import ParameterDB, Simulation
from atmospheric_athena_tpu import bvals, dt as dt_mod
from atmospheric_athena_tpu.integrators import ctu3d
from atmospheric_athena_tpu.integrators.ctu3d import _phi_arrays
from atmospheric_athena_tpu.ionrad.driver import ion_radtransfer
from atmospheric_athena_tpu.ops import pallas_ctu_mid, pallas_hydro
from __graft_entry__ import _ISPH_DECK

N = int(os.environ.get("PROF_N", "256"))
par = ParameterDB.from_string(_ISPH_DECK.format(n=N))
par.set("ionradiation", "maxiter", 50)
s = Simulation.from_par(par, problem="ioniz_sphere", dtype="float32")
s.step(); s.step()
st = s.state
sim, grid = s.sim, s.grid
dt = st.dt
phic, phif = _phi_arrays(s.problem, grid, st.U.dtype)


def timeit(name, f, *args, reps=10):
    o = f(*args)
    float(jnp.sum(jax.tree.leaves(o)[0]))
    t0 = time.perf_counter()
    for _ in range(reps):
        o = f(*args)
    float(jnp.sum(jax.tree.leaves(o)[0]))
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f'{name:28s}: {ms:8.2f} ms', flush=True)
    return o


U = st.U
axes = [0, 1, 2]
dtodx = {a: dt / grid.dx[a] for a in axes}
q = {a: 0.5 * dtodx[a] for a in axes}

# --- hydro phases -----------------------------------------------------------
import os
SKIP_SWEEP = os.environ.get('SKIP_SWEEP', '0') == '1'
sw = {}
for a in axes:
    f = jax.jit(lambda U, dtdx, phic, phif_a, a=a:
                pallas_hydro.sweep_lrflux(U, phic, phif_a, dtdx, sim, a))
    if SKIP_SWEEP:
        sw[a] = f(U, dtodx[a], phic, phif[a])
        float(jnp.sum(sw[a][0][0]))
    else:
        sw[a] = timeit(f'sweep_lrflux axis{a}', f, U, dtodx[a], phic,
                       phif[a])
Ulp = {a: sw[a][0] for a in axes}
Urp = {a: sw[a][1] for a in axes}
Fp = {a: sw[a][2] for a in axes}

G = timeit('gcross', jax.jit(
    lambda U, Fp, phic, phif: pallas_ctu_mid.gcross(U, phic, phif, Fp,
                                                    q, axes)),
    U, Fp, phic, phif)

tc = {}
for a in axes:
    tc[a] = timeit(
        f'transverse_correct axis{a}',
        jax.jit(lambda Ulp, Urp, Fp, G, a=a: pallas_ctu_mid.
                transverse_correct(Ulp, Urp, Fp, G, q, sim, grid, a, axes)),
        Ulp[a], Urp[a], Fp, G)
Ulc = {a: tc[a][0] for a in axes}
Urc = {a: tc[a][1] for a in axes}
etaS = jnp.stack([tc[a][2] for a in axes])

Fp2 = {}
for a in axes:
    Fp2[a] = timeit(
        f'flux_corrected axis{a}',
        jax.jit(lambda Ulc, Urc, etaS, a=a: pallas_ctu_mid.flux_corrected(
            Ulc, Urc, etaS, sim, grid, a, axes)),
        Ulc[a], Urc[a], etaS)


def dhalf_fn(U, Fp):
    dh = U[0]
    for a in axes:
        dFID = (jnp.roll(Fp[a][0], -1, axis=2 - a) - Fp[a][0])
        dh = dh - q[a] * dFID
    return dh


dhalf = timeit('dhalf', jax.jit(dhalf_fn), U, Fp)
Sg = timeit('grav_source', jax.jit(
    lambda Fp2, dhalf, phic, phif: pallas_ctu_mid.grav_source(
        Fp2, dhalf, phic, phif, dtodx, axes)), Fp2, dhalf, phic, phif)
timeit('final_update', jax.jit(
    lambda U, Fp2, Sg: pallas_ctu_mid.final_update(
        U, Fp2, Sg, dtodx, sim, grid, axes)), U, Fp2, Sg)

timeit('hydro total', jax.jit(
    lambda st, phi: ctu3d.step(st, st.dt, sim, grid, s.problem,
                               phi=phi)), st, (phic, phif))

# --- radiation --------------------------------------------------------------
from atmospheric_athena_tpu.ionrad import pallas_rad
from atmospheric_athena_tpu.defs import ID, IEN, IM1

sl = grid.interior()
Usl = (slice(None),) + sl
Ui = st.U[Usl]
d, M1, M2, M3, E = Ui[ID], Ui[IM1], Ui[IM1+1], Ui[IM1+2], Ui[IEN]
s0 = Ui[5]
ke_be = 0.5 * (M1**2 + M2**2 + M3**2) / d
from atmospheric_athena_tpu.ionrad.driver import (_apply_floors, _temp,
                                                  _d_nlim)
E0, s00 = _apply_floors(E, s0, d, ke_be, sim, s.ion)
_, e_th_init, x_init = _temp(E0, s00, d, ke_be, sim, s.ion)
d_nlim = _d_nlim(d, s.ion)
rates_fn, update_fn, _fused = pallas_rad.build(
    sim, grid, s.ion, d, ke_be, M1, M2, M3, E0, e_th_init, x_init, d_nlim)
from atmospheric_athena_tpu.ionrad.plane import inlet_ramp
Fin0 = inlet_ramp(s.ion.radplanes[0][1], st.time, s.ion)
code = jnp.ones(d.shape, jnp.int32)

r = timeit('rad rates_fn', jax.jit(
    lambda s0, E, code: rates_fn(s0, E, code, Fin0)), s00, E0, code)
_, _, kph, nHdot, edot, dtc, dtt = r
dtm = jnp.minimum(dtc, dtt)
timeit('rad update_fn', jax.jit(
    lambda s0, E, kph, nHdot, edot, dtm: update_fn(s0, E, kph, nHdot,
                                                   edot, dtm)),
    s00, E0, kph, nHdot, edot, dtm)

rad = jax.jit(lambda st: ion_radtransfer(
    st, sim, grid, s.ion, st.time, s.cour_no, return_niter=True))
out = timeit('radiation (50 iters)', rad, st)
print('   niter =', int(out[2]), flush=True)

# --- glue ------------------------------------------------------------------
timeit('bvals.apply_bc', jax.jit(
    lambda st: bvals.apply_bc(st, grid, sim, s.problem)), st)
timeit('new_dt', jax.jit(
    lambda st: dt_mod.new_dt(st, sim, grid, s.cour_no)), st)
uw = getattr(s.problem, 'userwork_in_loop', None)
if uw is not None:
    aux = (s.problem.userwork_aux(st.U.dtype, sim, grid)
           if hasattr(s.problem, 'userwork_aux') else None)
    if aux is not None:
        timeit('userwork_in_loop', jax.jit(
            lambda st: uw(st, sim, grid, aux=aux)), st)
    else:
        timeit('userwork_in_loop', jax.jit(lambda st: uw(st, sim, grid)),
               st)

t0 = time.perf_counter()
for _ in range(5):
    s.step()
float(jnp.sum(s.state.U[0, 8]))
print(f'{"FULL STEP":28s}: {(time.perf_counter()-t0)/5*1e3:8.2f} ms',
      flush=True)
print('DONE', flush=True)
