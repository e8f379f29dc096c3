"""Oblique 2D MHD shock (shkset2d.c) vs the reference C build.

Golden from /root/reference configured with --with-problem=shkset2d
--with-gas=mhd --with-flux=roe --with-order=2 --with-integrator=ctu on
tst/2D-mhd/athinput.rj2a (Ryu & Jones 1995 fig. 2a rotated to
atan(Lx/Ly)), 20 cycles.  Exercises the volume-fraction interface init
and the four unit-cell ghost-remap BCs (shkset2d_iib/oib/ijb/ojb).
"""

import os

import numpy as np
import pytest

from atmospheric_athena_tpu import Simulation

HERE = os.path.dirname(__file__)
GOLD = os.path.join(HERE, "golden")


@pytest.mark.slow
def test_shkset2d_rj2a_20cycles():
    gold = np.load(os.path.join(GOLD, "rj2a_shkset2d.npz"))
    s = Simulation.from_file(
        os.path.join(GOLD, "athinput.rj2a"), problem="shkset2d",
        gas="mhd", flux="roe", order="2", integrator="ctu",
        cmdline=["time/nlim=20", "time/tlim=99"])
    traj = gold["traj"]
    for cyc in range(1, 21):
        s.step()
        # tab-header times carry 6 significant digits
        assert float(s.state.time) == pytest.approx(traj[cyc - 1][0],
                                                    rel=1e-5), cyc
        if cyc == 1:
            ref, atol = gold["cons1"], 1e-11
        elif cyc == 20:
            ref, atol = gold["cons20"], 1e-9
        else:
            continue
        sl = s.grid.interior()
        U = np.asarray(s.state.U)
        B = np.asarray(s.state.Bcc)
        fields = [U[i][sl].ravel() for i in range(5)] + \
                 [B[i][sl].ravel() for i in range(3)]
        for i, (m, nm) in enumerate(zip(fields,
                                        ["d", "M1", "M2", "M3", "E",
                                         "B1c", "B2c", "B3c"])):
            r = ref[:, 4 + i]
            scale = max(np.abs(r).max(), 1e-30)
            np.testing.assert_allclose(m, r, rtol=0, atol=atol * scale,
                                       err_msg="%s cyc%d" % (nm, cyc))
