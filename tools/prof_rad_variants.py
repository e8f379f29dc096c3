"""Isolate the radiation rates-kernel cost: sweep vs chemistry vs IO."""
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from atmospheric_athena_tpu import ParameterDB, Simulation
from atmospheric_athena_tpu.defs import ID, IEN, IM1
from atmospheric_athena_tpu.ionrad import pallas_rad
from atmospheric_athena_tpu.ionrad import driver as drv
from atmospheric_athena_tpu.ionrad.driver import (_apply_floors, _d_nlim,
                                                  _temp)
from __graft_entry__ import _ISPH_DECK

N = int(os.environ.get("PROF_N", "256"))
par = ParameterDB.from_string(_ISPH_DECK.format(n=N))
par.set("ionradiation", "maxiter", 50)
s = Simulation.from_par(par, problem="ioniz_sphere", dtype="float32")
s.step(); s.step()
st = s.state
sim, grid = s.sim, s.grid
ion = s.ion


def timeit(name, f, *args, reps=10):
    o = f(*args)
    float(jnp.sum(jax.tree.leaves(o)[0]))
    t0 = time.perf_counter()
    for _ in range(reps):
        o = f(*args)
    float(jnp.sum(jax.tree.leaves(o)[0]))
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f'{name:34s}: {ms:8.2f} ms', flush=True)
    return o


sl = grid.interior()
Ui = st.U[(slice(None),) + sl]
d, M1, M2, M3, E = Ui[ID], Ui[IM1], Ui[IM1+1], Ui[IM1+2], Ui[IEN]
s0 = Ui[5]
ke_be = 0.5 * (M1**2 + M2**2 + M3**2) / d
E0, s00 = _apply_floors(E, s0, d, ke_be, sim, ion)
d_nlim = _d_nlim(d, ion)
NZ, NY, NX = d.shape
dt_f = d.dtype
code = jnp.ones(d.shape, jnp.int32)
Fin0 = 1.0


def make_kernel(body, n_in, n_out, by=64, extra_eflux=False):
    blk = (1, by, NX)
    imap = lambda i, j: (i, j, 0)
    fld = pl.BlockSpec(blk, imap)
    efl = pl.BlockSpec((1, by, NX + 1), imap)
    fshape = jax.ShapeDtypeStruct((NZ, NY, NX), dt_f)
    eshape = jax.ShapeDtypeStruct((NZ, NY, NX + 1), dt_f)
    outs = [fld] * n_out
    oshapes = [fshape] * n_out
    if extra_eflux:
        outs.append(efl)
        oshapes.append(eshape)
    return pl.pallas_call(
        body, grid=(NZ, NY // by),
        in_specs=[fld] * n_in,
        out_specs=tuple(outs), out_shape=tuple(oshapes),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


# (a) pure copy: 5 in, 5 out — IO floor
def k_copy(a_ref, b_ref, c_ref, d_ref, e_ref, *outs):
    for o, i in zip(outs, (a_ref, b_ref, c_ref, d_ref, e_ref)):
        o[...] = i[...]


f = jax.jit(lambda *a: make_kernel(k_copy, 5, 5)(*a))
timeit('copy 5F->5F (IO floor)', f, s00, E0, d, ke_be, d_nlim)


# (b) sweep only
def k_sweep(s_ref, out_ref, ef_ref):
    kph, ef = pallas_rad._sweep_x(s_ref[...][0], Fin0, grid.dx[0],
                                  grid.dx[0], ion)
    out_ref[...] = kph[None]
    ef_ref[...] = ef[None]


f = jax.jit(lambda *a: make_kernel(k_sweep, 1, 1, extra_eflux=True)(*a))
timeit('sweep only (+eflux out)', f, s00)


# (b2) sweep without eflux output
def k_sweep2(s_ref, out_ref):
    kph, ef = pallas_rad._sweep_x(s_ref[...][0], Fin0, grid.dx[0],
                                  grid.dx[0], ion)
    out_ref[...] = kph[None]


f = jax.jit(lambda *a: make_kernel(k_sweep2, 1, 1)(*a))
timeit('sweep only (no eflux)', f, s00)


# (b3) exp only (no cumprod)
def k_exp(s_ref, out_ref):
    s0b = s_ref[...][0]
    tau = ion.sigma_ph * (s0b * (1.0 / ion.m_H)) * grid.dx[0]
    out_ref[...] = jnp.exp(-tau)[None]


f = jax.jit(lambda *a: make_kernel(k_exp, 1, 1)(*a))
timeit('exp(-tau) only', f, s00)


# (c) chemistry only (kph = s0, no sweep)
def k_chem(s_ref, E_ref, code_ref, d_ref, Msq_ref, *outs):
    from atmospheric_athena_tpu.ionrad.config import IONFRACFLOOR
    s0b = s_ref[...][0]
    Eb = E_ref[...][0]
    db = d_ref[...][0]
    Msq = Msq_ref[...][0]
    ke = 0.5 * Msq / db
    dn = jnp.minimum(db * IONFRACFLOOR, ion.d_nlo)
    lsn, scn = pallas_rad._unpack(code_ref[...][0])
    r = drv.rates_percell(s0b, Eb, db, ke, lsn, scn, s0b, dn, sim, ion)
    nHdot, nsn, ncn, dtc, edot, dtt = r
    outs[0][...] = nHdot[None]
    outs[1][...] = edot[None]
    outs[2][...] = (dtc + dtt)[None]


Msq = M1**2 + M2**2 + M3**2


def k_chem_wrap(s0, E0, code, d, Msq):
    blk = (1, 64, NX)
    imap = lambda i, j: (i, j, 0)
    fld = pl.BlockSpec(blk, imap)
    ifld = pl.BlockSpec(blk, imap)
    fshape = jax.ShapeDtypeStruct((NZ, NY, NX), dt_f)
    return pl.pallas_call(
        k_chem, grid=(NZ, NY // 64),
        in_specs=[fld, fld, ifld, fld, fld],
        out_specs=(fld, fld, fld), out_shape=(fshape,) * 3,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(s0, E0, code, d, Msq)


timeit('chemistry only (no sweep)', jax.jit(k_chem_wrap), s00, E0, code,
       d, Msq)
print('DONE', flush=True)


# (d) block-size scan on the copy kernel
def k_copy2(a_ref, b_ref, c_ref, d_ref, e_ref, *outs):
    for o, i in zip(outs, (a_ref, b_ref, c_ref, d_ref, e_ref)):
        o[...] = i[...]


for bz, by in ((1, 64), (1, 128), (1, 256), (2, 256), (4, 256), (8, 256)):
    blk = (bz, by, NX)
    imap = lambda i, j: (i, j, 0)
    fld = pl.BlockSpec(blk, imap)
    fshape = jax.ShapeDtypeStruct((NZ, NY, NX), dt_f)
    call = pl.pallas_call(
        k_copy2, grid=(NZ // bz, NY // by),
        in_specs=[fld] * 5, out_specs=(fld,) * 5, out_shape=(fshape,) * 5,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))
    f = jax.jit(lambda *a, c=call: c(*a))
    timeit(f'copy 5F bz={bz} by={by} ({NZ//bz*(NY//by)} blk)', f,
           s00, E0, d, ke_be, d_nlim)
