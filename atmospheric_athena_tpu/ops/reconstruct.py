"""Spatial reconstruction of L/R interface states.

Vectorized re-implementation of /root/reference/src/reconstruction/:
  - ``dc``  — first order donor cell (lr_states_dc.c)
  - ``plm`` — second order piecewise-linear with characteristic projection
              and CTU characteristic tracing (lr_states_plm.c:62-374)

Layout: all arrays are stacked 1D-slice primitives [nvar1d, ..., M] with the
sweep along the LAST axis; nvar1d = NWAVE + nscalars.  Instead of the
reference's per-cell pencil loop, every cell's stencil is formed with
whole-array shifts (jnp.roll), so the big i-loop becomes pure VPU arithmetic.

Outputs are *cell-based*: for each cell i we return
  Wminus[..., i] — the traced state at the cell's left interface
                   (the reference's ``Wr[i]``, lr_states_plm.c:17-22)
  Wplus[..., i]  — the traced state at the cell's right interface
                   (the reference's ``Wl[i+1]``)
valid wherever the full stencil lies inside the array (cells [2, M-3] for
PLM).  The integrator assembles interface L/R pairs by shifting.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import SimConfig
from . import eigen

#: flux families that use the HLL tracing branch in lr_states_plm.c:257
HLL_FLUXES = ("hlle", "hllc", "hlld")


_AXIS = -1  # sweep axis for neighbor shifts (set per lr_states call)


def _sh(q, k):
    """_sh(q, k)[..., i] == q[..., i+k] along the sweep axis (wraps; wrapped
    cells are invalid)."""
    return jnp.roll(q, -k, axis=_AXIS)


def dc(W, Bx, dtodx, sim: SimConfig):
    """Donor cell: piecewise constant states (lr_states_dc.c:44-60)."""
    return W, W


def _char_slopes(W, Bx, sim: SimConfig, characteristic=True, geom=None):
    """Monotonized slopes dWm per cell plus the eigensystem —
    PLM steps 1-5 (lr_states_plm.c:98-203), shared by PLM and PPM (the
    latter repeats them verbatim, lr_states_ppm.c:105-207).  With
    characteristic=False the limiting acts directly on the primitive
    variables (lr_states_prim2.c:104-131 / prim3, orders 2p/3p).

    `geom`: cylindrical R-sweep weights (lr_states_plm.c:123-141) from
    cyl.plm_geom(), or None for Cartesian sweeps."""
    nw = sim.nwave
    nv = nw + sim.nscalars
    assert W.shape[0] == nv, (W.shape, nv)

    Wc = [W[n] for n in range(nv)]
    Wp = [_sh(W[n], 1) for n in range(nv)]
    Wm = [_sh(W[n], -1) for n in range(nv)]

    ev, rem, lem = eigen.esys_prim(W, Bx, sim)

    dWc = [p - m for p, m in zip(Wp, Wm)]
    dWl = [c - m for c, m in zip(Wc, Wm)]
    dWr = [p - c for p, c in zip(Wp, Wc)]
    if geom is not None:
        # cylindrical conservative-slope weights z_c/z_l/z_r applied to
        # the raw differences BEFORE the van-Leer mean / projection
        dWc = [geom["zc"] * q for q in dWc]
        dWl = [geom["zl"] * q for q in dWl]
        dWr = [geom["zr"] * q for q in dWr]
    dWg = [jnp.where(l * r > 0.0, 2.0 * l * r / jnp.where(l + r == 0.0, 1.0,
                                                          l + r), 0.0)
           for l, r in zip(dWl, dWr)]

    if characteristic:
        dac = eigen.lmul(lem, dWc[:nw]) + dWc[nw:]
        dal = eigen.lmul(lem, dWl[:nw]) + dWl[nw:]
        dar = eigen.lmul(lem, dWr[:nw]) + dWr[nw:]
        dag = eigen.lmul(lem, dWg[:nw]) + dWg[nw:]
    else:
        dac, dal, dar, dag = dWc, dWl, dWr, dWg

    da = []
    for c, l, r, g in zip(dac, dal, dar, dag):
        lim1 = jnp.minimum(jnp.abs(l), jnp.abs(r))
        lim2 = jnp.minimum(0.5 * jnp.abs(c), jnp.abs(g))
        da.append(jnp.where(l * r > 0.0,
                            jnp.sign(c) * jnp.minimum(2.0 * lim1, lim2), 0.0))

    if characteristic:
        dWmn = eigen.rmul(rem, da[:nw]) + da[nw:]
    else:
        dWmn = da
    return Wc, Wp, Wm, dWmn, ev, rem, lem


def _fpl(qx, geom):
    """Plus-side cylindrical tracing curvature factor
    (lr_states_plm.c:272-301): qx·(1 − dx·qx/(3(ri[i+1] − dx·qx)))."""
    if geom is None:
        return qx
    dx = geom["dx"]
    return qx * (1.0 - dx * qx / (3.0 * (geom["rir"] - dx * qx)))


def _fmr(qx, geom):
    """Minus-side factor: qx·(1 + dx·qx/(3(ri[i] + dx·qx)))."""
    if geom is None:
        return qx
    dx = geom["dx"]
    return qx * (1.0 + dx * qx / (3.0 * (geom["ril"] + dx * qx)))


def plm(W, Bx, dtodx, sim: SimConfig, characteristic=True, geom=None):
    """Piecewise-linear reconstruction + CTU tracing (characteristic
    projection for order '2', primitive-variable limiting for '2p').

    W: stacked primitives [nvar1d, ..., M]; Bx: [..., M] (MHD) or None.
    dtodx: dt/dx (traced scalar, or per-cell array for cylindrical phi
    sweeps).  `geom`: cylindrical R-sweep geometry (cyl.plm_geom()) or
    None.  Returns (Wminus, Wplus), same shape as W.
    """
    nw = sim.nwave
    nv = nw + sim.nscalars
    Wc, Wp, Wm, dWmn, ev, rem, lem = _char_slopes(W, Bx, sim,
                                                  characteristic, geom)

    # Step 7: L/R values limited between neighbours (:214-236); the
    # cylindrical R sweep uses the curvature asymmetry gamma_curv =
    # dx/(6r) with the mean C = Wrv + beta·Wlv preserved through the
    # clamps (Cartesian: gamma_curv = 0, beta = 1 — kept as the exact
    # original expressions)
    if geom is None:
        Wlv = [c - 0.5 * m for c, m in zip(Wc, dWmn)]
        Wrv = [c + 0.5 * m for c, m in zip(Wc, dWmn)]
        for n in range(nv):
            C = Wrv[n] + Wlv[n]
            lv = jnp.maximum(jnp.minimum(Wc[n], Wm[n]), Wlv[n])
            lv = jnp.minimum(jnp.maximum(Wc[n], Wm[n]), lv)
            rv = C - lv
            rv = jnp.maximum(jnp.minimum(Wc[n], Wp[n]), rv)
            rv = jnp.minimum(jnp.maximum(Wc[n], Wp[n]), rv)
            lv = C - rv
            Wlv[n], Wrv[n] = lv, rv
    else:
        opg = 1.0 + geom["gcurv"]
        omg = 1.0 - geom["gcurv"]
        beta = omg / opg
        betai = opg / omg
        Wlv = [c - 0.5 * m * opg for c, m in zip(Wc, dWmn)]
        Wrv = [c + 0.5 * m * omg for c, m in zip(Wc, dWmn)]
        for n in range(nv):
            C = Wrv[n] + beta * Wlv[n]
            lv = jnp.maximum(jnp.minimum(Wc[n], Wm[n]), Wlv[n])
            lv = jnp.minimum(jnp.maximum(Wc[n], Wm[n]), lv)
            rv = C - beta * lv
            rv = jnp.maximum(jnp.minimum(Wc[n], Wp[n]), rv)
            rv = jnp.minimum(jnp.maximum(Wc[n], Wp[n]), rv)
            lv = (C - rv) * betai
            Wlv[n], Wrv[n] = lv, rv

    dW = [r - l for r, l in zip(Wrv, Wlv)]

    if sim.integrator != "ctu":
        # VL integrator: no characteristic tracing (:250-255)
        return jnp.stack(Wlv), jnp.stack(Wrv)

    if sim.flux in HLL_FLUXES:
        return _trace_hll(Wlv, Wrv, dW, ev, rem, lem, dtodx, nw, sim,
                          geom)
    return _trace_ctu(Wc, Wlv, Wrv, dW, ev, rem, lem, dtodx, nw, sim,
                      geom)


def _trace_ctu(Wc, Wlv, Wrv, dW, ev, rem, lem, dtodx, nw, sim, geom=None):
    """CTU characteristic tracing, non-HLL branch (lr_states_plm.c:296-367)."""
    ev_max, ev_min = ev[nw - 1], ev[0]

    # Step 8: integrate over domain of dependence
    qxp = _fpl(0.5 * jnp.maximum(ev_max, 0.0) * dtodx, geom)
    Wplus = [rv - qxp * d for rv, d in zip(Wrv, dW)]
    qxm = _fmr(-0.5 * jnp.minimum(ev_min, 0.0) * dtodx, geom)
    Wminus = [lv + qxm * d for lv, d in zip(Wlv, dW)]

    # Step 9: subtract waves that do not reach the interface (:322-358)
    dWw = dW[:nw]
    for n in range(nw):
        mask_p = ev[n] >= 0.0
        if geom is None:
            qx = 0.5 * dtodx * (ev_max - ev[n])
        else:
            # per-term curvature factors (:326-332)
            qx = _fpl(0.5 * dtodx * ev_max, geom) - \
                _fpl(0.5 * dtodx * ev[n], geom)
        qa = eigen.lmul([lem[n]], [qx * d for d in dWw])[0]
        qa = jnp.where(mask_p, qa, 0.0)
        rcol = eigen.column(rem, n)
        for m in range(nw):
            c = rcol[m]
            if isinstance(c, float) and c == 0.0:
                continue
            Wplus[m] = Wplus[m] + qa * c

        mask_m = ev[n] <= 0.0
        if geom is None:
            qx = 0.5 * dtodx * (ev_min - ev[n])
        else:
            # qx = -qx1 + qx2 with qx1/qx2 factored separately (:343-352)
            qx = -_fmr(-0.5 * dtodx * ev_min, geom) + \
                _fmr(-0.5 * dtodx * ev[n], geom)
        qa = eigen.lmul([lem[n]], [qx * d for d in dWw])[0]
        qa = jnp.where(mask_m, qa, 0.0)
        for m in range(nw):
            c = rcol[m]
            if isinstance(c, float) and c == 0.0:
                continue
            Wminus[m] = Wminus[m] + qa * c

    # Scalar (advected) wave subtraction (:361-367)
    Vx = Wc[1]
    for n in range(nw, len(dW)):
        Wplus[n] = Wplus[n] + jnp.where(
            Vx > 0.0, 0.5 * dtodx * (ev_max - Vx) * dW[n], 0.0)
        Wminus[n] = Wminus[n] + jnp.where(
            Vx < 0.0, 0.5 * dtodx * (ev_min - Vx) * dW[n], 0.0)

    return jnp.stack(Wminus), jnp.stack(Wplus)


def _trace_hll(Wlv, Wrv, dW, ev, rem, lem, dtodx, nw, sim, geom=None):
    """CTU tracing for HLL-family fluxes (lr_states_plm.c:257-294): subtract
    each wave moving toward the interface.  The reference leaves scalar L/R
    states unset in this branch (loops run only n<NWAVE); we use the untraced
    Wrv/Wlv for scalars."""
    Wplus = list(Wrv)
    Wminus = list(Wlv)
    dWw = dW[:nw]
    for n in range(nw):
        qx = 0.5 * dtodx * ev[n]
        qx_p = _fpl(qx, geom)
        # NB the HLL branch's minus side keeps the SAME factor form with
        # ri[i] (qx < 0 there), lr_states_plm.c:286-290 — unlike the
        # non-HLL branch's sign-flipped _fmr
        if geom is None:
            qx_m = qx
        else:
            dx = geom["dx"]
            qx_m = qx * (1.0 - dx * qx / (3.0 * (geom["ril"] - dx * qx)))
        qa_p = eigen.lmul([lem[n]], [qx_p * d for d in dWw])[0]
        qa_m = qa_p if geom is None else \
            eigen.lmul([lem[n]], [qx_m * d for d in dWw])[0]
        qa_p = jnp.where(ev[n] > 0.0, qa_p, 0.0)
        qa_m = jnp.where(ev[n] < 0.0, qa_m, 0.0)
        rcol = eigen.column(rem, n)
        for m in range(nw):
            c = rcol[m]
            if isinstance(c, float) and c == 0.0:
                continue
            Wplus[m] = Wplus[m] - qa_p * c
            Wminus[m] = Wminus[m] - qa_m * c
    return jnp.stack(Wminus), jnp.stack(Wplus)


def ppm(W, Bx, dtodx, sim: SimConfig, characteristic=True):
    """Piecewise-parabolic (Colella-Woodward) characteristic reconstruction
    with CTU tracing (lr_states_ppm.c:67-660).

    Deviation noted: the reference's scalar wave-subtraction indexes dW/W6
    with a stale loop variable (lr_states_ppm.c:639,643 use m==NWAVE-1
    instead of n) — we use the scalar's own dW/W6.
    """
    nw = sim.nwave
    nv = nw + sim.nscalars
    Wc, Wp, Wm, dWmn, ev, rem, lem = _char_slopes(W, Bx, sim,
                                                  characteristic)

    # Step 14: parabolic left-interface values Wim1h[i] (CW eqn 1.6)
    Wlv = []
    Wrv = []
    for n in range(nv):
        wim1h = 0.5 * (Wc[n] + Wm[n]) - (dWmn[n] - _sh(dWmn[n], -1)) / 6.0
        Wlv.append(wim1h)                 # left interface of cell i
        Wrv.append(_sh(wim1h, 1))         # left interface of cell i+1

    # Step 16: parabola monotonization (CW eqn 1.10; if/elif chain at
    # lr_states_ppm.c:465-477 with gamma_curv=0: (6W-4·)/2 = 3W-2·) then
    # neighbor clamps (:479-484)
    for n in range(nv):
        qa = (Wrv[n] - Wc[n]) * (Wc[n] - Wlv[n])
        qb = Wrv[n] - Wlv[n]
        qc = 6.0 * (Wc[n] - 0.5 * (Wlv[n] + Wrv[n]))
        c1 = qa <= 0.0
        c2 = (~c1) & (qb * qc > qb * qb)
        c3 = (~c1) & (~c2) & (qb * qc < -(qb * qb))
        lv = jnp.where(c1, Wc[n],
                       jnp.where(c2, 3.0 * Wc[n] - 2.0 * Wrv[n], Wlv[n]))
        rv = jnp.where(c1, Wc[n],
                       jnp.where(c3, 3.0 * Wc[n] - 2.0 * Wlv[n], Wrv[n]))
        lv = jnp.maximum(jnp.minimum(Wc[n], Wm[n]), lv)
        lv = jnp.minimum(jnp.maximum(Wc[n], Wm[n]), lv)
        rv = jnp.maximum(jnp.minimum(Wc[n], Wp[n]), rv)
        rv = jnp.minimum(jnp.maximum(Wc[n], Wp[n]), rv)
        Wlv[n], Wrv[n] = lv, rv

    dW = [r - l for r, l in zip(Wrv, Wlv)]
    W6 = [6.0 * (c - 0.5 * (l + r)) for c, l, r in zip(Wc, Wlv, Wrv)]

    if sim.integrator != "ctu":
        return jnp.stack(Wlv), jnp.stack(Wrv)

    F43 = 4.0 / 3.0
    if sim.flux in HLL_FLUXES:
        Wplus = list(Wrv)
        Wminus = list(Wlv)
        dWw, W6w = dW[:nw], W6[:nw]
        for n in range(nw):
            qx = 0.5 * dtodx * ev[n]
            qc = F43 * qx * qx
            qa_p = eigen.lmul([lem[n]], [qx * (d - w) + qc * w
                                         for d, w in zip(dWw, W6w)])[0]
            qa_m = eigen.lmul([lem[n]], [qx * (d + w) + qc * w
                                         for d, w in zip(dWw, W6w)])[0]
            qa_p = jnp.where(ev[n] > 0.0, qa_p, 0.0)
            qa_m = jnp.where(ev[n] < 0.0, qa_m, 0.0)
            rcol = eigen.column(rem, n)
            for m in range(nw):
                c = rcol[m]
                if isinstance(c, float) and c == 0.0:
                    continue
                Wplus[m] = Wplus[m] - qa_p * c
                Wminus[m] = Wminus[m] - qa_m * c
        return jnp.stack(Wminus), jnp.stack(Wplus)

    # Step 18: parabola integrals over the max/min wave fans
    ev_max, ev_min = ev[nw - 1], ev[0]
    qx1 = 0.5 * jnp.maximum(ev_max, 0.0) * dtodx
    Wplus = [rv - qx1 * (d - (1.0 - F43 * qx1) * w)
             for rv, d, w in zip(Wrv, dW, W6)]
    qx2 = -0.5 * jnp.minimum(ev_min, 0.0) * dtodx
    Wminus = [lv + qx2 * (d + (1.0 - F43 * qx2) * w)
              for lv, d, w in zip(Wlv, dW, W6)]

    # Step 19: per-wave corrections
    dWw, W6w = dW[:nw], W6[:nw]
    for n in range(nw):
        qx1 = 0.5 * dtodx * ev_max
        qx2 = 0.5 * dtodx * ev[n]
        qb = qx1 - qx2
        qc = F43 * (qx1 * qx1 - qx2 * qx2)
        qa = eigen.lmul([lem[n]], [qb * (d - w) + qc * w
                                   for d, w in zip(dWw, W6w)])[0]
        qa = jnp.where(ev[n] >= 0.0, qa, 0.0)
        rcol = eigen.column(rem, n)
        for m in range(nw):
            c = rcol[m]
            if isinstance(c, float) and c == 0.0:
                continue
            Wplus[m] = Wplus[m] + qa * c

        qx1 = 0.5 * dtodx * ev_min
        qb = qx1 - qx2
        qc = F43 * (qx1 * qx1 - qx2 * qx2)
        qa = eigen.lmul([lem[n]], [qb * (d + w) + qc * w
                                   for d, w in zip(dWw, W6w)])[0]
        qa = jnp.where(ev[n] <= 0.0, qa, 0.0)
        for m in range(nw):
            c = rcol[m]
            if isinstance(c, float) and c == 0.0:
                continue
            Wminus[m] = Wminus[m] + qa * c

    # scalar wave subtraction (with the index fix noted above)
    Vx = Wc[1]
    for n in range(nw, nv):
        qb = 0.5 * dtodx * (ev_max - Vx)
        qc = 0.5 * dtodx * dtodx * (2.0 / 3.0) * (ev_max ** 2 - Vx ** 2)
        Wplus[n] = Wplus[n] + jnp.where(
            Vx > 0.0, qb * (dW[n] - W6[n]) + qc * W6[n], 0.0)
        qb = 0.5 * dtodx * (ev_min - Vx)
        qc = 0.5 * dtodx * dtodx * (2.0 / 3.0) * (ev_min ** 2 - Vx ** 2)
        Wminus[n] = Wminus[n] + jnp.where(
            Vx < 0.0, qb * (dW[n] + W6[n]) + qc * W6[n], 0.0)

    return jnp.stack(Wminus), jnp.stack(Wplus)


def lr_states(W, Bx, dtodx, sim: SimConfig, axis: int = -1, geom=None):
    """Dispatch on sim.order (reconstruction/prototypes.h:40-46).

    `axis` is the sweep axis within W's trailing dims; passing it avoids
    transposing the whole grid per sweep (the only axis-dependent op in
    reconstruction is the neighbor shift — everything else is elementwise,
    so XLA sees identical arithmetic with zero data movement).
    `geom`: cylindrical R-sweep geometry (integrators/cyl.plm_geom) or
    None (Cartesian / phi / z sweeps).
    """
    global _AXIS
    _AXIS = axis
    if geom is not None and sim.order not in ("1", "2", "2p"):
        raise NotImplementedError(
            "cylindrical reconstruction: PLM only (lr_states_plm.c)")
    if sim.order == "1":
        return dc(W, Bx, dtodx, sim)
    if sim.order == "2":
        return plm(W, Bx, dtodx, sim, geom=geom)
    if sim.order == "3":
        return ppm(W, Bx, dtodx, sim)
    if sim.order == "2p":
        return plm(W, Bx, dtodx, sim, characteristic=False, geom=geom)
    if sim.order == "3p":
        return ppm(W, Bx, dtodx, sim, characteristic=False)
    raise NotImplementedError(f"order={sim.order} not yet implemented")
