"""Distributed analysis over a device mesh — the xgcm_tpu replacement for
the reference's dask-cluster workflow (docs/grid_ufuncs.md "Parallelizing").

Run (CPU demo with 8 virtual devices):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/sharded_analysis.py
On a real TPU slice the same code uses the chips directly.
"""

import os

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

import numpy as np
import jax

import xgcm_tpu as xt
from xgcm_tpu.parallel import ShardedGrid, make_mesh


def main():
    n_dev = len(jax.devices())
    print(f"{n_dev} devices:", jax.devices()[:4], "...")

    nx, ny = 512, 256
    ds = xt.Dataset(
        coords={
            "xc": ("xc", np.arange(nx, dtype=np.float32)),
            "xg": ("xg", np.arange(nx, dtype=np.float32)),
            "yc": ("yc", np.arange(ny, dtype=np.float32)),
            "yg": ("yg", np.arange(ny, dtype=np.float32)),
        }
    )
    grid = xt.Grid(
        ds,
        coords={
            "X": {"center": "xc", "left": "xg"},
            "Y": {"center": "yc", "left": "yg"},
        },
        autoparse_metadata=False,
    )

    # domain-decompose X over all devices
    mesh = make_mesh({"x": n_dev})
    sgrid = ShardedGrid(grid, mesh, {"xc": "x", "xg": "x"})

    rng = np.random.RandomState(0)
    u = sgrid.shard(xt.GriddedArray(rng.rand(ny, nx).astype(np.float32), ("yc", "xg")))
    v = sgrid.shard(xt.GriddedArray(rng.rand(ny, nx).astype(np.float32), ("yg", "xc")))

    # explicit halo-ring path: each diff exchanges one column with ring
    # neighbours via ppermute
    zeta = sgrid.diff(v, "X") - grid.diff(u, "Y")
    print("vorticity:", zeta.dims, "sharding:", zeta.data.sharding.spec)

    # distributed prefix sum (impossible to chunk under the reference's dask)
    transport = sgrid.cumsum(v, "X", to="left", boundary="fill")
    print("cumsum   :", transport.dims, "sharding:", transport.data.sharding.spec)

    # equivalence with single-device
    v_local = xt.GriddedArray(np.asarray(v.data), ("yg", "xc"))
    expected = grid.cumsum(v_local, "X", to="left", boundary="fill")
    ok = np.allclose(np.asarray(transport.data), np.asarray(expected.data))
    print("matches single-device:", bool(ok))

    # batch several ops into ONE exchange round with name-based specs
    dvdx, u_c = sgrid.apply_many([
        dict(op="diff", args=v, axis="X", to="left", boundary="fill"),
        dict(op="interp", args=u, axis="X", to="center", boundary="fill"),
    ])
    print("apply_many:", dvdx.dims, u_c.dims)

    # audit the communication budget of any expression (the regression
    # bound the reference's dask task-count test only stubbed)
    from xgcm_tpu.utils import count_collectives

    budget = count_collectives(
        lambda vd: sgrid.diff(
            xt.GriddedArray(vd, ("yg", "xc")), "X"
        ).data,
        v.data,
    )
    print("collective budget of one sharded diff:", budget)


if __name__ == "__main__":
    main()
