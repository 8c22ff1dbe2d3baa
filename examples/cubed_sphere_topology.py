"""Cross-face analysis on a cubed-sphere grid — the topology workload of the
reference's grid_topology docs, natively, with optional face-per-device
sharding.

Run:  python examples/cubed_sphere_topology.py
"""

import numpy as np
import jax

import xgcm_tpu as xt
from xgcm_tpu.grids import cubed_sphere_grid


def main():
    n = 32
    ds, grid = cubed_sphere_grid(n=n)
    rng = np.random.RandomState(0)

    # a smooth scalar field that crosses face boundaries
    field = xt.GriddedArray(
        np.cumsum(rng.randn(6, n, n), axis=-1) * 0.1, ("face", "y", "x"),
        name="tracer",
    )

    gx = grid.diff(field, "X")
    gy = grid.diff(field, "Y")
    print("gradients:", gx.dims, gy.dims)

    # constant-field invariant: the topology is seam-free
    const = xt.GriddedArray(np.ones((6, n, n)), ("face", "y", "x"))
    seam_err = float(np.abs(np.asarray(grid.diff(const, "X").data)).max())
    print(f"seam error on constant field: {seam_err:g} (must be 0)")

    # whole thing under jit
    @jax.jit
    def roughness(x):
        da = xt.GriddedArray(x, ("face", "y", "x"))
        gx = grid.diff(da, "X")
        gy = grid.diff(da, "Y")
        import jax.numpy as jnp
        return jnp.sum(gx.data**2) + jnp.sum(gy.data**2)

    print("roughness:", float(roughness(field.data)))

    # face-per-device when a big enough mesh is available
    if len(jax.devices()) >= 6:
        from xgcm_tpu.parallel import ShardedGrid, make_mesh

        mesh = make_mesh({"f": 6}, devices=jax.devices()[:6])
        sgrid = ShardedGrid(grid, mesh, {"face": "f"})
        sharded = sgrid.shard(field)
        gx6 = sgrid.diff(sharded, "X")
        ok = np.allclose(np.asarray(gx6.data), np.asarray(gx.data))
        print("face-sharded == single-device:", bool(ok))


if __name__ == "__main__":
    main()
