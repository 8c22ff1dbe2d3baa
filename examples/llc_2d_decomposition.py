"""Face x interior 2-D decomposition + one-exchange multi-op batches —
the layout and communication pattern an LLC4320-scale analysis needs on a
TPU pod slice (13 faces x 4320^2 per level do not fit one chip's HBM at
depth, so faces ride one mesh axis and within-face rows a second).

The reference reaches the same decomposition by letting dask chunk the
face dim AND the core dims simultaneously (xgcm padding.py:70-335 with
grid_ufunc.py:990-1066); here it is explicit mesh geometry, and the whole
diagnostic set shares ONE strip-exchange round via sharded_apply_many.

Run (CPU demo with 8 virtual devices):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/llc_2d_decomposition.py
On a real TPU slice the same code uses the chips directly.
"""

import os

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

import jax
import numpy as np

import xgcm_tpu as xt
from xgcm_tpu.grids import llc_grid
from xgcm_tpu.parallel import ShardedGrid, make_mesh, shard_gridded


def main():
    n_dev = len(jax.devices())
    if n_dev < 8:
        print(f"only {n_dev} devices; need 8 for the 4x2 mesh — skipping")
        return

    n = 16  # per-face resolution (tiny demo; LLC4320 has n=4320)
    ds, grid = llc_grid(n=n)
    rng = np.random.RandomState(0)
    u = xt.GriddedArray(
        rng.rand(13, n, n).astype(np.float32), ("face", "y", "xl"), name="u"
    )
    v = xt.GriddedArray(
        rng.rand(13, n, n).astype(np.float32), ("face", "yl", "x"), name="v"
    )

    # 13 faces over a 4-way face axis (dummy-padded to 16 internally) x
    # rows over a 2-way interior axis
    mesh = make_mesh({"f": 4, "r": 2})
    sgrid = ShardedGrid(
        grid, mesh,
        {"face": "f", "y": "r", "yl": "r"},
    )
    u_sh = shard_gridded(u, mesh, {"face": "f", "y": "r"}, uneven_ok=("face",))
    v_sh = shard_gridded(v, mesh, {"face": "f", "yl": "r"}, uneven_ok=("face",))

    # vector component across rotated faces: partner strips + sign rules,
    # cross-face halos routed per (face-shard, row-shard)
    dvdx = sgrid.diff(
        {"Y": v_sh}, "X", boundary="fill", other_component={"X": u_sh}
    )
    print("dvdx:", dvdx.dims, dvdx.data.shape)

    # the whole diagnostic set in ONE shard_map / ONE exchange round:
    # each distinct input is padded once at the max width any op requests
    # (name-based specs select the same gridops kernels as sgrid.diff)
    outs = sgrid.apply_many([
        dict(op="diff", args=v_sh, axis="X", to="left", boundary="fill"),
        dict(op="diff", args=u_sh, axis="Y", to="left", boundary="fill"),
        dict(op="interp", args=u_sh, axis="X", to="center",
             boundary="fill"),
        dict(op="interp", args=v_sh, axis="Y", to="center",
             boundary="fill"),
    ])
    dvdx, dudy, u_c, v_c = outs
    ke = 0.5 * (u_c * u_c + v_c * v_c)
    print("ke:", ke.dims, float(np.asarray(ke.data).mean()))

    # sharded == single-device (the dask-vs-eager analog)
    e = grid.interp(u, "X", boundary="fill")
    np.testing.assert_allclose(
        np.asarray(u_c.data), np.asarray(e.data), rtol=1e-6
    )
    print("sharded == single-device OK")


if __name__ == "__main__":
    main()
