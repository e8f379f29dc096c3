"""Lagrangian particles (dust grains) — TPU-native re-design of
src/particles/ (integrators_particle.c, utils_particle.c, feedback.c,
bvals_particle.c, init_particle.c; ~7.1k LoC of per-particle C loops).

Design: a fixed-capacity structure-of-arrays pytree (positions,
velocities, property index, alive mask) updated by fully vectorized
whole-population kernels — the per-particle while-loop of
Integrate_Particles (integrators_particle.c:75-188) becomes one fused
elementwise program; the TSC gather/scatter (getwei_TSC,
utils_particle.c:149-210) becomes a vectorized 27-point gather /
scatter-add.  Inactive slots are masked, so departures (outflow BCs)
need no compaction.

Physics implemented:
  - TSC (triangular-shaped cloud) weights, the reference default
    (interp=2); per-axis collapse for 1D/2D grids.
  - drag force  f_d = -(v - u)/t_stop with the three stopping-time
    regimes (tsmode 1 general Epstein/Stokes, 2 Epstein, 3 fixed t_stop,
    utils_particle.c:376-445).
  - the three time integrators: 2nd-order explicit, semi-implicit
    (default), and fully implicit (integrators_particle.c:200-472),
    including their shearing-sheet (Omega_0, qshear) matrix terms.
  - shearing-sheet forces in Get_Force (integrators_particle.c:817-851):
    3D (x,y,z) orientation, non-FARGO form.
  - the FULL predictor-corrector momentum/energy feedback of the
    reference (round-5 upgrade over the simplified drag impulse):
    feedback_predictor (integrators_particle.c:521-631) deposits the
    half-step drag impulse density m*vd*(0.5*dt/ts) + its dissipation
    Eloss = fb.vd, which the gas half-step subtracts from the momenta
    (integrate_3d_ctu.c:2236-2241, 420-437); feedback_corrector
    (integrators_particle.c:633-700) deposits m*(dv - dt*f_ext) at the
    MIDPOINT particle position plus Eloss = m*|dv - dt*f_ext|^2*ts,
    applied as U.M -= fb, U.E += Eloss at the final update
    (integrate_3d_ctu.c:2957-2973).  Ghost-zone TSC spill is folded
    back into the interior per BC flag exactly as exchange_feedback
    (feedback.c periodic_/reflect_/outflow_*_feedback).
  - particle BCs: periodic wrap / outflow deactivation per axis from
    the grid's BC flags (bvals_particle.c semantics, serial).

Half-step gas coupling: the driver evaluates the drag against the
average of the pre- and post-step gas states — the 2nd-order-accurate
equivalent of the reference's predictor half-step GPCouple fields
(integrate_3d_ctu.c stores Coup.grid_v at t^{n+1/2}; the average
differs from the predictor value at O(dt^2) truncation only).
Deviations (documented): one integrator type for the whole population
(the reference's per-type selector defaults to a single global
<particle>/integrator anyway); FARGO orbital advection pending with
the gas-side FARGO.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import (BC_OUTFLOW, BC_PERIODIC, BC_REFLECT, GridConfig,
                      SimConfig)
from ..defs import ID, IEN, IM1


class ParticleParams(NamedTuple):
    """<particle> block + per-type grain properties (init_particle.c)."""
    integrator: int = 2          # 1 exp | 2 semimp | 3 fulimp
    tsmode: int = 3              # 1 general | 2 Epstein | 3 fixed
    tstop0: tuple = (1.0,)       # per-type fixed stopping time (tsmode 3)
    grrhoa: tuple = (1.0,)       # per-type rho_s*a (normalized)
    alamcoeff: float = 1.0       # a/lambda coefficient (tsmode 1)
    mass: tuple = (0.0,)         # per-type particle mass (feedback)
    feedback: bool = False
    omega0: float = 0.0          # shearing-sheet Omega_0 (0 = off)
    qshear: float = 1.5


def params_from_par(par, feedback=False):
    ntypes = par.geti_def("particle", "partypes", 1)

    def arr(name, default):
        vals = []
        for i in range(ntypes):
            if par.exist("particle", f"{name}{i + 1}"):
                vals.append(par.getd("particle", f"{name}{i + 1}"))
            else:
                vals.append(par.getd_def("particle", name, default))
        return tuple(vals)

    return ParticleParams(
        integrator=par.geti_def("particle", "integrator", 2),
        tsmode=par.geti_def("particle", "tsmode", 3),
        tstop0=arr("tstop", 1.0),
        grrhoa=arr("grrhoa", 1.0),
        alamcoeff=par.getd_def("particle", "alamcoeff", 1.0),
        mass=arr("parmass", 0.0),
        feedback=feedback,
        omega0=par.getd_def("problem", "omega", 0.0),
        qshear=par.getd_def("problem", "qshear", 1.5))


@jax.tree_util.register_pytree_node_class
class Particles:
    """SoA particle population of fixed capacity N."""

    def __init__(self, x, v, prop, alive, my_id):
        self.x = x          # (3, N) positions (x1, x2, x3)
        self.v = v          # (3, N) velocities
        self.prop = prop    # (N,) int32 type index
        self.alive = alive  # (N,) bool
        self.my_id = my_id  # (N,) int32

    def tree_flatten(self):
        return (self.x, self.v, self.prop, self.alive, self.my_id), None

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch)

    @property
    def n(self):
        return self.x.shape[1]

    @classmethod
    def create(cls, x, v, prop=None, dtype=jnp.float64):
        x = jnp.asarray(x, dtype)
        v = jnp.asarray(v, dtype)
        n = x.shape[1]
        if prop is None:
            prop = jnp.zeros(n, jnp.int32)
        return cls(x, v, jnp.asarray(prop, jnp.int32),
                   jnp.ones(n, bool), jnp.arange(n, dtype=jnp.int32))


# ---------------------------------------------------------------------------
# TSC weights + gather/scatter
# ---------------------------------------------------------------------------


def _axis_weights(x, xmin, dx, lo, n_pad, active):
    """1D TSC weights (getwei_TSC, utils_particle.c:149-210) with the
    celli convention a = (x - xmin)/dx + is (cc_pos.c:86-92).
    Returns (w (N,3), i0 (N,)) with i0 the index of weight 0."""
    if not active:
        N = x.shape[0]
        w = jnp.stack([jnp.ones(N, x.dtype), jnp.zeros(N, x.dtype),
                       jnp.zeros(N, x.dtype)], -1)
        return w, jnp.zeros(N, jnp.int32)
    a = (x - xmin) / dx + lo
    i = jnp.floor(a).astype(jnp.int32)
    d = a - i
    w = jnp.stack([0.5 * (1.0 - d) ** 2,
                   0.75 - (d - 0.5) ** 2,
                   0.5 * d ** 2], -1)
    return w, i - 1


def tsc_weights(grid: GridConfig, x):
    """(w (N,3,3,3), (k0,j0,i0), in_grid mask) for positions x (3, N)."""
    w1, i0 = _axis_weights(x[0], grid.xmin[0], grid.dx[0], grid.lo(0),
                           grid.padded_shape()[2], grid.active(0))
    w2, j0 = _axis_weights(x[1], grid.xmin[1], grid.dx[1], grid.lo(1),
                           grid.padded_shape()[1], grid.active(1))
    w3, k0 = _axis_weights(x[2], grid.xmin[2], grid.dx[2], grid.lo(2),
                           grid.padded_shape()[0], grid.active(2))
    w = w3[:, :, None, None] * w2[:, None, :, None] * w1[:, None, None, :]
    NZ, NY, NX = grid.padded_shape()
    ok = ((i0 >= 0) & (i0 + 2 < NX) if grid.active(0) else True)
    ok = ok & ((j0 >= 0) & (j0 + 2 < NY) if grid.active(1) else True)
    ok = ok & ((k0 >= 0) & (k0 + 2 < NZ) if grid.active(2) else True)
    ok = jnp.broadcast_to(ok, i0.shape)
    return w, (k0, j0, i0), ok


def _nbhd_idx(idx):
    k0, j0, i0 = idx
    o = jnp.arange(3)
    kk = jnp.clip(k0[:, None, None, None] + o[None, :, None, None], 0,
                  None)
    jj = j0[:, None, None, None] + o[None, None, :, None]
    ii = i0[:, None, None, None] + o[None, None, None, :]
    kk = jnp.broadcast_to(kk, kk.shape[:1] + (3, 3, 3))
    jj = jnp.broadcast_to(jj, jj.shape[:1] + (3, 3, 3))
    ii = jnp.broadcast_to(ii, ii.shape[:1] + (3, 3, 3))
    return kk, jj, ii


def gather(field, w, idx, ok):
    """Interpolate a [Nz,Ny,Nx] field to particles (getvalues)."""
    kk, jj, ii = _nbhd_idx(idx)
    vals = field[kk, jj, ii]
    return jnp.where(ok, jnp.sum(w * vals, axis=(1, 2, 3)), 0.0)


def scatter_add(field, w, idx, ok, q):
    """TSC deposit of per-particle quantity q onto a [Nz,Ny,Nx] field."""
    kk, jj, ii = _nbhd_idx(idx)
    contrib = (w * jnp.where(ok, q, 0.0)[:, None, None, None]).ravel()
    return field.at[kk.ravel(), jj.ravel(), ii.ravel()].add(contrib)


def fold_ghost_deposits(arr, grid: GridConfig, flip_axis_comp=False):
    """Fold ghost-zone TSC deposits back into the interior per BC flag —
    the serial analogue of exchange_feedback (feedback.c:186-260):
    periodic ghosts add to the opposite interior slab
    (periodic_ix1_feedback), reflecting ghosts add to their mirror cell
    with the NORMAL momentum component negated (reflect_ix1_feedback),
    outflow ghosts are dropped (outflow_feedback).  Ghost slabs are
    zeroed afterwards so the array is purely interior.

    arr: (..., NZ, NY, NX); if flip_axis_comp, arr's leading axis is the
    (3,) vector-component axis and component a flips under reflection at
    the axis-a boundary."""
    nd = arr.ndim
    for a in range(3):
        if not grid.active(a):
            continue
        n, N = grid.lo(a), grid.Nx[a]
        ax = nd - 1 - a          # spatial position of grid axis a

        def sl(s):
            idx = [slice(None)] * nd
            idx[ax] = s
            return tuple(idx)

        for side in (0, 1):
            bc = grid.bc[a][side]
            ghost = sl(slice(0, n)) if side == 0 else sl(
                slice(n + N, n + N + n))
            g = arr[ghost]
            if bc == BC_PERIODIC:
                dest = sl(slice(N, N + n)) if side == 0 else sl(
                    slice(n, 2 * n))
                arr = arr.at[dest].add(g)
            elif bc == BC_REFLECT:
                gm = jnp.flip(g, axis=ax)
                if flip_axis_comp:
                    sgn = jnp.ones((3,) + (1,) * (nd - 1), arr.dtype)
                    sgn = sgn.at[a].set(-1.0)
                    gm = gm * sgn
                dest = sl(slice(n, 2 * n)) if side == 0 else sl(
                    slice(N, N + n))
                arr = arr.at[dest].add(gm)
            # outflow / everything else: drop (outflow_feedback)
            arr = arr.at[ghost].set(0.0)
    return arr


# ---------------------------------------------------------------------------
# gas state at particle positions + stopping time + forces
# ---------------------------------------------------------------------------


def _gas_fields(state, sim: SimConfig):
    U = state.U
    d = U[ID]
    di = 1.0 / d
    u = [U[IM1 + c] * di for c in range(3)]
    if sim.adiabatic:
        ke = 0.5 * (U[IM1] ** 2 + U[IM1 + 1] ** 2 + U[IM1 + 2] ** 2) * di
        p = jnp.maximum(sim.gamma_1 * (U[IEN] - ke), 1e-30)
        cs = jnp.sqrt(sim.gamma * p * di)
    else:
        cs = jnp.full_like(d, sim.iso_csound)
    return d, u, cs


def _interp_gas(state, sim, grid, x):
    w, idx, ok = tsc_weights(grid, x)
    d, u, cs = _gas_fields(state, sim)
    rho = gather(d, w, idx, ok)
    u1 = gather(u[0], w, idx, ok)
    u2 = gather(u[1], w, idx, ok)
    u3 = gather(u[2], w, idx, ok)
    csp = gather(cs, w, idx, ok)
    return rho, (u1, u2, u3), csp, ok


def _tstop(pp: ParticleParams, prop, rho, cs, vd, dt):
    t0 = jnp.asarray(pp.tstop0)[prop]
    rhoa = jnp.asarray(pp.grrhoa)[prop]
    if pp.tsmode == 3:
        ts = t0 * jnp.ones_like(rho)
    elif pp.tsmode == 2:
        ts = rhoa / (rho * cs)
    else:
        # general: Epstein / Stokes by a/lambda (utils_particle.c:376-418)
        alam = pp.alamcoeff * rhoa * rho  # a*rho scaling via rhoa proxy
        Re = 4.0 * alam * vd / cs
        CD = jnp.where(Re < 1.0, 24.0 / jnp.maximum(Re, 1e-30),
                       jnp.where(Re < 800.0,
                                 24.0 * jnp.exp(-0.6 * jnp.log(
                                     jnp.maximum(Re, 1e-30))), 0.44))
        ts = jnp.where(alam < 2.25, rhoa / (rho * cs),
                       rhoa / (rho * vd * CD))
    return jnp.maximum(ts, 1.0e-8 * dt)


def _get_drag(state, sim, grid, pp, prop, x, v, dt, problem=None):
    """Get_Drag (integrators_particle.c:749-803): -(v-u)/t_stop; 1/ts = 0
    out of grid (free motion)."""
    rho, u, cs, ok = _interp_gas(state, sim, grid, x)
    vshift = getattr(problem, "gas_vshift", None) if problem else None
    if vshift is not None:
        u = vshift(x, u)
    vd = [v[c] - u[c] for c in range(3)]
    vmag = jnp.sqrt(vd[0] ** 2 + vd[1] ** 2 + vd[2] ** 2)
    ts = _tstop(pp, prop, jnp.maximum(rho, 1e-30), cs, vmag, dt)
    ts1 = jnp.where(ok, 1.0 / ts, 0.0)
    vd = [jnp.where(ok, c, 0.0) for c in vd]
    return [-ts1 * vd[c] for c in range(3)], ts1


def _get_force(pp: ParticleParams, grid, x, v, problem=None):
    """Get_Force (integrators_particle.c:817-851): user forces + 3D
    shearing-sheet terms (non-FARGO)."""
    N = x.shape[1]
    f = [jnp.zeros(N, x.dtype) for _ in range(3)]
    uf = getattr(problem, "particle_force", None) if problem else None
    if uf is not None:
        f = uf(x, v, f)
    if pp.omega0 != 0.0:
        om, q = pp.omega0, pp.qshear
        f[0] = f[0] + 2.0 * (q * om * om * x[0] + v[1] * om)
        f[1] = f[1] - 2.0 * v[0] * om
    return f


# ---------------------------------------------------------------------------
# integrators (integrators_particle.c:200-472), vectorized
# ---------------------------------------------------------------------------


def _advance_dv(state, sim, grid, pp, pts: Particles, dt, problem):
    x, v, prop = pts.x, pts.v, pts.prop
    act = [grid.active(a) for a in range(3)]

    def predict(frac):
        return jnp.stack([x[a] + frac * v[a] * dt if act[a] else x[a]
                          for a in range(3)])

    if pp.integrator == 1:     # explicit
        fd, ts1 = _get_drag(state, sim, grid, pp, prop, x, v, dt, problem)
        fr = _get_force(pp, grid, x, v, problem)
        ft = [fd[c] + fr[c] for c in range(3)]
        vn = jnp.stack([v[c] + 0.5 * ft[c] * dt for c in range(3)])
        xn = predict(0.5)
        fd, ts1 = _get_drag(state, sim, grid, pp, prop, xn, vn, dt,
                            problem)
        fr = _get_force(pp, grid, xn, vn, problem)
        dv = [(fd[c] + fr[c]) * dt for c in range(3)]
        return dv, 1.0 / jnp.maximum(ts1, 1e-300)

    if pp.integrator == 2:     # semi-implicit (default)
        xn = predict(0.5)
        fd, ts1 = _get_drag(state, sim, grid, pp, prop, xn, v, dt,
                            problem)
        fr = _get_force(pp, grid, xn, v, problem)
        ft = [fd[c] + fr[c] for c in range(3)]
        b = dt * ts1 + 2.0
        if pp.omega0 != 0.0:
            oh = pp.omega0 * dt
            b1 = 1.0 / (b * b + 4.0 * oh * oh)
            b2 = b * b1
            dv1 = dt * 2.0 * b2 * ft[0] + dt * 4.0 * oh * b1 * ft[1]
            dv2 = dt * 2.0 * b2 * ft[1] - 4.0 * dt * oh * b1 * ft[0]
            dv3 = dt * 2.0 * ft[2] / b
            dv = [dv1, dv2, dv3]
        else:
            b2 = 1.0 / b
            dv = [dt * 2.0 * b2 * ft[c] for c in range(3)]
        return dv, 1.0 / jnp.maximum(ts1, 1e-300)

    # fully implicit (integrator 3)
    xn = predict(1.0)
    fd, ts11 = _get_drag(state, sim, grid, pp, prop, x, v, dt, problem)
    fr = _get_force(pp, grid, x, v, problem)
    fc = [fd[c] + fr[c] for c in range(3)]
    fd, ts12 = _get_drag(state, sim, grid, pp, prop, xn, v, dt, problem)
    fr = _get_force(pp, grid, xn, v, problem)
    fp = [fd[c] + fr[c] for c in range(3)]
    b0 = 1.0 + dt * ts11
    ft = [0.5 * (fc[c] + b0 * fp[c]) for c in range(3)]
    D = 1.0 + 0.5 * dt * (ts11 + ts12 + dt * ts11 * ts12)
    if pp.omega0 != 0.0:
        oh = pp.omega0 * dt
        ft[0] = ft[0] - oh * fp[1]
        ft[1] = ft[1] + oh * fp[0]
        B = oh * (-2.0 - (ts11 + ts12) * dt)
        A = D - 2.0 * oh * oh
        C = -B
        Det1 = 1.0 / (A * A - B * C)
        dv = [dt * Det1 * (ft[0] * A - ft[1] * B),
              dt * Det1 * (-ft[0] * C + ft[1] * A),
              dt * ft[2] / D]
    else:
        Di = 1.0 / D
        dv = [dt * ft[c] * Di for c in range(3)]
    ts = 0.5 / jnp.maximum(ts11, 1e-300) + 0.5 / jnp.maximum(ts12, 1e-300)
    return dv, ts


def _cell_volume(grid: GridConfig):
    vol = 1.0
    for a in range(3):
        if grid.active(a):
            vol = vol * grid.dx[a]
    return vol


def feedback_predictor(pts: "Particles", state, sim: SimConfig,
                       grid: GridConfig, pp: ParticleParams, dt,
                       problem=None):
    """feedback_predictor (integrators_particle.c:521-631): the HALF-step
    drag impulse density the gas predictor subtracts from its momenta.

    Per particle at the t^n gas state: vd = u - v (gas minus grain),
    fb = m * vd * (0.5*dt/ts), Eloss = fb . vd; TSC-deposited as
    densities and ghost-folded (exchange_feedback).  The FBstiff
    normalization is computed upstream but its correction is commented
    out (integrators_particle.c:616-625), so it is omitted here.
    Returns (fb (3,NZ,NY,NX), eloss (NZ,NY,NX))."""
    x, v, prop = pts.x, pts.v, pts.prop
    rho, u, cs, ok = _interp_gas(state, sim, grid, x)
    vshift = getattr(problem, "gas_vshift", None) if problem else None
    if vshift is not None:
        u = vshift(x, u)
    vd = [u[c] - v[c] for c in range(3)]
    vmag = jnp.sqrt(vd[0] ** 2 + vd[1] ** 2 + vd[2] ** 2)
    ts = _tstop(pp, prop, jnp.maximum(rho, 1e-30), cs, vmag, dt)
    ok = ok & pts.alive
    m = jnp.asarray(pp.mass, x.dtype)[prop]
    ts1h = jnp.where(ok, 0.5 * dt / ts, 0.0)
    vol = _cell_volume(grid)
    fbq = [m * vd[c] * ts1h / vol for c in range(3)]
    elq = fbq[0] * vd[0] + fbq[1] * vd[1] + fbq[2] * vd[2]
    w, idx, _ = tsc_weights(grid, x)
    zero = jnp.zeros(grid.padded_shape(), state.U.dtype)
    fb = jnp.stack([scatter_add(zero, w, idx, ok, fbq[c])
                    for c in range(3)])
    eloss = scatter_add(zero, w, idx, ok, elq)
    fb = fold_ghost_deposits(fb, grid, flip_axis_comp=True)
    eloss = fold_ghost_deposits(eloss, grid)
    return fb, eloss


def apply_bc(grid: GridConfig, x, alive):
    """Particle BCs per axis: periodic wrap or outflow deactivation
    (bvals_particle.c, serial semantics)."""
    xo = []
    for a in range(3):
        xa = x[a]
        if grid.active(a):
            L = grid.xmax[a] - grid.xmin[a]
            if grid.bc[a][0] == BC_PERIODIC:
                xa = grid.xmin[a] + jnp.mod(xa - grid.xmin[a], L)
            else:
                alive = alive & (xa >= grid.xmin[a]) & (xa < grid.xmax[a])
        xo.append(xa)
    return jnp.stack(xo), alive


def integrate(pts: Particles, state, dt, sim: SimConfig, grid: GridConfig,
              pp: ParticleParams, problem=None, drag_state=None):
    """Integrate_Particles (integrators_particle.c:75-188), vectorized.
    Returns (new particles, corrector feedback fb or None, Eloss or
    None).  The caller applies U.M -= fb; U.E += Eloss (the reference's
    final update, integrate_3d_ctu.c:2957-2973).

    drag_state: gas state to interpolate for the drag force — the
    driver passes the old/new average, the 2nd-order equivalent of the
    reference's predictor half-step GPCouple fields (feedback.c /
    integrate_3d's Coup.grid_v at t^{n+1/2})."""
    gs = drag_state if drag_state is not None else state
    dv, ts = _advance_dv(gs, sim, grid, pp, pts, dt, problem)
    vnew = jnp.stack([pts.v[c] + dv[c] for c in range(3)])
    xdrift = jnp.stack([
        pts.x[a] + 0.5 * dt * (pts.v[a] + vnew[a]) if grid.active(a)
        else pts.x[a] for a in range(3)])
    xnew, alive = apply_bc(grid, xdrift, pts.alive)
    vnew = jnp.where(pts.alive[None], vnew, pts.v)
    xnew = jnp.where(pts.alive[None], xnew, pts.x)

    fb = eloss = None
    if pp.feedback:
        # feedback_corrector (integrators_particle.c:633-700): deposit
        # m*(dv - dt*f_ext) and Eloss = m*|dv - dt*f_ext|^2 * ts at the
        # MIDPOINT position/velocity of the step (pre-BC-wrap), then
        # ghost-fold (exchange_feedback)
        m = jnp.asarray(pp.mass, pts.x.dtype)[pts.prop]
        xm = 0.5 * (pts.x + xdrift)
        vm = 0.5 * (pts.v + vnew)
        fr = _get_force(pp, grid, xm, vm, problem)
        fbq = [dv[c] - dt * fr[c] for c in range(3)]
        elq = m * (fbq[0] ** 2 + fbq[1] ** 2 + fbq[2] ** 2) * ts
        vol = _cell_volume(grid)
        w, idx, ok = tsc_weights(grid, xm)
        ok = ok & pts.alive
        zero = jnp.zeros(grid.padded_shape(), state.U.dtype)
        fb = jnp.stack([
            scatter_add(zero, w, idx, ok, m * fbq[c] / vol)
            for c in range(3)])
        eloss = scatter_add(zero, w, idx, ok, elq / vol)
        fb = fold_ghost_deposits(fb, grid, flip_axis_comp=True)
        eloss = fold_ghost_deposits(eloss, grid)
    return Particles(xnew, vnew, pts.prop, alive, pts.my_id), fb, eloss


def deposit_density(pts: Particles, grid: GridConfig, pp: ParticleParams,
                    dtype):
    """Particle mass density on the grid (TSC deposit; dpar output)."""
    m = jnp.asarray(pp.mass, dtype)[pts.prop]
    w, idx, ok = tsc_weights(grid, pts.x)
    ok = ok & pts.alive
    vol = 1.0
    for a in range(3):
        if grid.active(a):
            vol = vol * grid.dx[a]
    zero = jnp.zeros(grid.padded_shape(), dtype)
    return scatter_add(zero, w, idx, ok, m / vol)
