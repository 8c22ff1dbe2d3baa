"""C-grid diagnostics on an MITgcm-style grid — the workload of the
reference's 02_mitgcm example notebook (vorticity, divergence, strain),
written against the native API and fully jittable.

Run:  python examples/mitgcm_c_grid.py
"""

import numpy as np
import jax
import jax.numpy as jnp

import xgcm_tpu as xt


def build_grid(nx=360, ny=160):
    """A lat-lon C-grid with spherical metric factors."""
    lon_c = np.linspace(0.5, 359.5, nx, dtype=np.float32)
    lon_g = np.linspace(0.0, 359.0, nx, dtype=np.float32)
    lat_c = np.linspace(-79.5, 79.5, ny, dtype=np.float32)
    lat_g = np.linspace(-80.0, 79.0, ny, dtype=np.float32)

    re = 6.371e6
    deg = np.pi / 180.0
    dyc = np.full(ny, re * deg * (lat_c[1] - lat_c[0]), dtype=np.float32)
    dxc = (re * deg * np.cos(lat_c * deg) * (lon_c[1] - lon_c[0])).astype(
        np.float32
    )

    ds = xt.Dataset(
        coords={
            "XC": ("XC", lon_c, {"axis": "X"}),
            "XG": ("XG", lon_g, {"axis": "X", "c_grid_axis_shift": -0.5}),
            "YC": ("YC", lat_c, {"axis": "Y"}),
            "YG": ("YG", lat_g, {"axis": "Y", "c_grid_axis_shift": -0.5}),
            "dxC": (("YC",), dxc),
            "dyC": (("YC",), dyc),
        }
    )
    grid = xt.Grid(
        ds,
        coords={
            "X": {"center": "XC", "left": "XG"},
            "Y": {"center": "YC", "left": "YG"},
        },
        boundary={"X": "periodic", "Y": "extend"},
        autoparse_metadata=False,
    )
    return grid


def diagnostics(grid, u, v):
    """Vorticity (corners), divergence + strain (centers), KE (centers)."""
    zeta = grid.diff(v, "X") - grid.diff(u, "Y")
    div = grid.diff(u, "X", to="center") + grid.diff(v, "Y", to="center")
    strain = grid.diff(u, "X", to="center") - grid.diff(v, "Y", to="center")
    u_c = grid.interp(u, "X", to="center")
    v_c = grid.interp(v, "Y", to="center")
    ke = 0.5 * (u_c * u_c + v_c * v_c)
    return zeta, div, strain, ke


def main():
    nx, ny = 360, 160
    grid = build_grid(nx, ny)
    rng = np.random.RandomState(0)
    u = xt.GriddedArray(
        rng.rand(ny, nx).astype(np.float32), ("YC", "XG"), name="u"
    )
    v = xt.GriddedArray(
        rng.rand(ny, nx).astype(np.float32), ("YG", "XC"), name="v"
    )

    @jax.jit
    def step(ud, vd):
        uu = xt.GriddedArray(ud, ("YC", "XG"))
        vv = xt.GriddedArray(vd, ("YG", "XC"))
        z, d, s, k = diagnostics(grid, uu, vv)
        return z.data, d.data, s.data, k.data

    zeta, div, strain, ke = step(u.data, v.data)
    print("zeta  :", zeta.shape, "mean", float(jnp.mean(zeta)))
    print("div   :", div.shape, "mean", float(jnp.mean(div)))
    print("strain:", strain.shape, "mean", float(jnp.mean(strain)))
    print("KE    :", ke.shape, "mean", float(jnp.mean(ke)))
    # coordinate labels for the vorticity field:
    print("zeta coords:", sorted(grid.coords_for(
        xt.GriddedArray(zeta, ("YG", "XG"))
    )))


if __name__ == "__main__":
    main()
