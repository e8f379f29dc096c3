"""Explicit ppermute halo exchange (parallel/halo.py) vs the
roll-based ground truth, on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from atmospheric_athena_tpu.parallel.halo import gather_halos
from atmospheric_athena_tpu.parallel.mesh import make_mesh


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_gather_halos_matches_roll():
    mesh = make_mesh(8)   # (2,2,2)
    ng = 2
    N = 8
    x = jnp.arange(2 * N * N * N, dtype=jnp.float64).reshape(2, N, N, N)
    xs = jax.device_put(x, NamedSharding(mesh, P(None, "z", "y", "x")))
    out = gather_halos(xs, mesh, ng)
    out = np.asarray(out)   # (2, N+2*2*ng? ...) per-dim: 2 shards of 4+2ng
    # reconstruct: each device block is shard(4) + 2*ng halos = 8 -> global
    # gathered array dims = N + nshards*2*ng = 8 + 2*4 = 16
    assert out.shape == (2, 16, 16, 16)
    xn = np.asarray(x)
    blk = 4
    for iz in range(2):
        for iy in range(2):
            for ix in range(2):
                loc = out[:,
                          iz * 8:(iz + 1) * 8,
                          iy * 8:(iy + 1) * 8,
                          ix * 8:(ix + 1) * 8]
                # expected: wrap-padded shard
                zs = [(iz * blk + o) % N for o in range(-ng, blk + ng)]
                ys = [(iy * blk + o) % N for o in range(-ng, blk + ng)]
                xsl = [(ix * blk + o) % N for o in range(-ng, blk + ng)]
                exp = xn[:, zs][:, :, ys][:, :, :, xsl]
                np.testing.assert_array_equal(loc, exp)
