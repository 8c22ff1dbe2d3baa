"""Closed tracer budget on a 3-D C-grid — the workload of the reference's
ECCOv4 budget-analysis example notebook (advective flux divergence,
metric-weighted integrals, exact closure), written against the native API.

The finite-volume identity this checks: with periodic horizontal
boundaries and zero vertical boundary flux, the volume integral of the
flux divergence vanishes identically (what goes out of one cell goes
into its neighbour), so the total tracer tendency is zero to roundoff.

Run:  python examples/tracer_budget.py
"""

import numpy as np
import jax
import jax.numpy as jnp

import xgcm_tpu as xt


def build_grid(nx=32, ny=24, nz=8):
    """C-grid with dx/dy/dz metrics at the positions the fluxes need."""
    ds = xt.Dataset(
        coords={
            "xc": ("xc", np.arange(nx) + 0.5),
            "xg": ("xg", np.arange(nx) * 1.0),
            "yc": ("yc", np.arange(ny) + 0.5),
            "yg": ("yg", np.arange(ny) * 1.0),
            "zc": ("zc", np.arange(nz) + 0.5),
            "zg": ("zg", np.arange(nz) * 1.0),
            # spatially varying cell sizes make the closure non-trivial
            "dx_c": ("xc", 1.0 + 0.1 * np.sin(np.arange(nx))),
            "dx_g": ("xg", 1.0 + 0.1 * np.sin(np.arange(nx) - 0.5)),
            "dy_c": ("yc", 1.0 + 0.05 * np.cos(np.arange(ny))),
            "dy_g": ("yg", 1.0 + 0.05 * np.cos(np.arange(ny) - 0.5)),
            "dz_c": ("zc", 1.0 + 0.2 * np.arange(nz) / nz),
            "dz_g": ("zg", 1.0 + 0.2 * (np.arange(nz) - 0.5) / nz),
        }
    )
    grid = xt.Grid(
        ds,
        coords={
            "X": {"center": "xc", "left": "xg"},
            "Y": {"center": "yc", "left": "yg"},
            "Z": {"center": "zc", "left": "zg"},
        },
        boundary={"X": "periodic", "Y": "periodic", "Z": "fill"},
        fill_value=0.0,
        metrics={
            ("X",): ["dx_c", "dx_g"],
            ("Y",): ["dy_c", "dy_g"],
            ("Z",): ["dz_c", "dz_g"],
        },
        autoparse_metadata=False,
    )
    return ds, grid


def budget_terms(grid, theta, u, v, w):
    """Advective flux divergence, cell volumes, and the tendency.

    Fluxes live on cell faces (u at xg, v at yg, w at zg); the tracer is
    interpolated onto each face, multiplied by the transport, and the
    face-flux differences are summed — the standard finite-volume
    advection operator (reference's ECCO budget recipe).
    """
    # tracer on the three face families
    th_x = grid.interp(theta, "X")            # -> xg
    th_y = grid.interp(theta, "Y")            # -> yg
    th_z = grid.interp(theta, "Z", boundary="extend")  # -> zg

    # face areas from the metric registry (product of the two tangential
    # cell sizes at the face's position)
    ax = grid.get_metric(th_x, ("Y", "Z"))
    ay = grid.get_metric(th_y, ("X", "Z"))
    az = grid.get_metric(th_z, ("X", "Y"))

    fx = u * th_x * ax
    fy = v * th_y * ay
    fz = w * th_z * az

    # divergence: diff back to centers.  X/Y wrap periodically; the
    # vertical fill_value=0 is exactly the "no flux through the surface
    # and bottom" boundary condition of a closed budget.
    div = (
        grid.diff(fx, "X", to="center")
        + grid.diff(fy, "Y", to="center")
        + grid.diff(fz, "Z", to="center")
    )
    vol = grid.get_metric(theta, ("X", "Y", "Z"))
    tendency = -div / vol
    return div, vol, tendency


def main():
    ds, grid = build_grid()
    nx, ny, nz = ds.dims["xc"], ds.dims["yc"], ds.dims["zc"]
    rng = np.random.RandomState(7)

    theta = xt.GriddedArray(
        20.0 + rng.rand(nz, ny, nx), ("zc", "yc", "xc"), name="theta"
    )
    u = xt.GriddedArray(rng.randn(nz, ny, nx), ("zc", "yc", "xg"), name="u")
    v = xt.GriddedArray(rng.randn(nz, ny, nx), ("zc", "yg", "xc"), name="v")
    # w = 0 at the surface face (zg index 0) => no flux into the domain
    w_data = rng.randn(nz, ny, nx)
    w_data[0] = 0.0
    w = xt.GriddedArray(w_data, ("zg", "yc", "xc"), name="w")

    div, vol, tendency = jax.jit(
        lambda t, uu, vv, ww: budget_terms(grid, t, uu, vv, ww)
    )(theta, u, v, w)

    # --- closure: the volume-integrated tendency vanishes ---------------
    total = grid.integrate(tendency, ["X", "Y", "Z"])
    scale = float(grid.integrate(abs(tendency), ["X", "Y", "Z"]).data)
    closure = abs(float(total.data)) / scale
    print(f"volume-integrated |tendency| / L1 norm: {closure:.2e}")
    # roundoff floor scales with dtype (f32 summation accumulates ~1e-5)
    tol = 1e-10 if tendency.data.dtype == jnp.float64 else 1e-4
    assert closure < tol, "budget does not close"

    # --- metric-weighted diagnostics ------------------------------------
    mean_theta = grid.average(theta, ["X", "Y", "Z"])
    print(f"volume-mean tracer: {float(mean_theta.data):.4f}")

    # depth-integrated tendency (content change per column)
    col = grid.integrate(tendency, "Z")
    print(f"column tendency field: dims={col.dims}, "
          f"max |.| = {float(jnp.max(jnp.abs(col.data))):.3e}")

    # cumulative vertical integral of the divergence recovers the vertical
    # flux profile up to the horizontal contributions (cumint demo)
    content = grid.cumint(tendency, "Z", boundary="fill")
    print(f"cumulative content tendency: dims={content.dims}")

    print("tracer budget closes on the C-grid: OK")


if __name__ == "__main__":
    main()
