"""MOM6-style diagnostics on a symmetric C-grid — the workload of the
reference's 03_MOM6 example notebook (corner-point vorticity in symmetric
mode, thickness-weighted averaging, conservative remap of layer content
onto potential-density coordinates), written against the native API.

MOM6's "symmetric" output staggering puts corner (Bu) points at ``outer``
positions — nx+1 / ny+1 points along each axis — which is exactly the
grid layout the reference notebook builds (``xq``/``yq`` outer vs
``xh``/``yh`` center).  This example exercises the outer-position ops the
other examples don't touch.

Run:  python examples/mom6_diagnostics.py
"""

import numpy as np
import jax
import jax.numpy as jnp

import xgcm_tpu as xt


def build_grid(nx=60, ny=40, nz=12):
    """Symmetric-mode MOM6 grid: centers xh/yh, corners xq/yq (outer)."""
    xh = np.arange(nx) + 0.5
    xq = np.arange(nx + 1) * 1.0          # symmetric: one extra point
    yh = np.arange(ny) + 0.5
    yq = np.arange(ny + 1) * 1.0
    zl = np.arange(nz) + 0.5              # layer centers
    zi = np.arange(nz + 1) * 1.0          # layer interfaces (outer)

    # spatially varying cell sizes (the notebook reads dxCu/dyCv/areacello
    # from the model's static file; here they're synthetic but non-uniform)
    dxT = 1.0 + 0.1 * np.sin(2 * np.pi * xh / nx)
    dyT = 1.0 + 0.05 * np.cos(2 * np.pi * yh / ny)

    ds = xt.Dataset(
        coords={
            "xh": ("xh", xh, {"axis": "X"}),
            "xq": ("xq", xq, {"axis": "X", "c_grid_axis_shift": 0.5}),
            "yh": ("yh", yh, {"axis": "Y"}),
            "yq": ("yq", yq, {"axis": "Y", "c_grid_axis_shift": 0.5}),
            "zl": ("zl", zl),
            "zi": ("zi", zi),
            "dxT": ("xh", dxT),
            "dyT": ("yh", dyT),
        }
    )
    grid = xt.Grid(
        ds,
        coords={
            "X": {"center": "xh", "outer": "xq"},
            "Y": {"center": "yh", "outer": "yq"},
            "Z": {"center": "zl", "outer": "zi"},
        },
        # regional/symmetric setup: solid walls, not periodic
        boundary={"X": "fill", "Y": "fill", "Z": "extend"},
        fill_value=0.0,
        metrics={("X",): ["dxT"], ("Y",): ["dyT"]},
        autoparse_metadata=False,
    )
    return ds, grid


def corner_vorticity(grid, u, v):
    """Relative vorticity on the Bu (corner/outer) points.

    In symmetric mode u lives at (yh, xq) and v at (yq, xh); the curl's
    two terms are center->outer differences, landing both on (yq, xq).
    The metric division uses the registry (condition-2 auto-interp of the
    center cell sizes onto the outer positions).
    """
    dv_dx = grid.derivative(v, "X", to="outer")
    du_dy = grid.derivative(u, "Y", to="outer")
    return dv_dx - du_dy


def main():
    ds, grid = build_grid()
    nx, ny, nz = ds.dims["xh"], ds.dims["yh"], ds.dims["zl"]
    rng = np.random.RandomState(3)

    # prognostic fields at MOM6 symmetric positions
    u = xt.GriddedArray(rng.randn(ny, nx + 1), ("yh", "xq"), name="u")
    v = xt.GriddedArray(rng.randn(ny + 1, nx), ("yq", "xh"), name="v")
    h = xt.GriddedArray(  # layer thickness, strictly positive
        1.0 + rng.rand(nz, ny, nx), ("zl", "yh", "xh"), name="h"
    )
    salt = xt.GriddedArray(
        34.0 + rng.rand(nz, ny, nx), ("zl", "yh", "xh"), name="salt"
    )

    # --- corner-point vorticity (outer x outer) --------------------------
    zeta = jax.jit(lambda uu, vv: corner_vorticity(grid, uu, vv))(u, v)
    assert zeta.dims == ("yq", "xq")
    assert zeta.data.shape == (ny + 1, nx + 1)
    print(f"zeta  : dims={zeta.dims} shape={zeta.data.shape} "
          f"mean={float(jnp.mean(zeta.data)):.4f}")

    # --- thickness-weighted average (the notebook's h-weighted mean) -----
    swm = jnp.sum(h.data * salt.data, axis=0) / jnp.sum(h.data, axis=0)
    print(f"thickness-weighted mean salt: {float(jnp.mean(swm)):.4f}")

    # --- conservative remap of layer salt content onto density layers ----
    # potential density at the layer interfaces, monotonically increasing
    # with depth (target_data must live on the outer Z coordinate)
    rho_profile = 1030.0 + 2.0 * np.arange(nz + 1) / nz
    rho_i = xt.GriddedArray(
        np.broadcast_to(
            rho_profile[:, None, None], (nz + 1, ny, nx)
        ).copy() + 0.05 * rng.rand(nz + 1, ny, nx).cumsum(axis=0),
        ("zi", "yh", "xh"),
        name="rho",
    )
    # density bin edges covering the full range -> exact conservation
    rho_targets = np.linspace(1029.0, 1033.5, 9)

    content = h * salt  # layer salt content (thickness-weighted)
    remapped = grid.transform(
        content, "Z", rho_targets, target_data=rho_i, method="conservative"
    )
    # the transformed core dim moves last (reference transform semantics)
    assert remapped.dims == ("yh", "xh", "rho")

    total_z = jnp.sum(content.data, axis=0)
    # density bins no source cell touches are NaN-masked (reference
    # conservative semantics) — exclude them from the conservation sum
    total_rho = jnp.nansum(remapped.data, axis=-1)
    err = float(jnp.max(jnp.abs(total_rho - total_z) / jnp.abs(total_z)))
    print(f"conservative remap onto density layers: dims={remapped.dims}, "
          f"max relative conservation error = {err:.2e}")
    tol = 1e-10 if remapped.data.dtype == jnp.float64 else 1e-5
    assert err < tol, "conservative remap lost content"

    # --- same remap for several variables in one fused pass --------------
    heat = h * xt.GriddedArray(
        2.0 + rng.rand(nz, ny, nx), ("zl", "yh", "xh"), name="temp"
    )
    salt_r, heat_r = grid.transform_multi(
        [content, heat], "Z", rho_targets, target_data=rho_i,
        method="conservative",
    )
    np.testing.assert_allclose(
        np.asarray(salt_r.data), np.asarray(remapped.data), rtol=1e-6
    )
    print(f"transform_multi: {heat_r.dims} matches per-variable transform")

    print("MOM6 symmetric-grid diagnostics: OK")


if __name__ == "__main__":
    main()
