"""NEMO-style idealized-basin diagnostics — the workload of the
reference's 04_nemo_idealized example notebook (curl/divergence on the
ORCA staggering, kinetic energy, meridional overturning streamfunction),
written against the native API.

NEMO places U east and V north of the T point, i.e. ``right``-shifted
coordinates (``c_grid_axis_shift: 0.5``) — the opposite convention from
the MITgcm example — and describes cell geometry with e1/e2/e3 scale
factors.  Axis positions here are inferred from COMODO attributes
(``autoparse_metadata=True``), exercising the parser path end to end.

Run:  python examples/nemo_idealized.py
"""

import numpy as np
import jax
import jax.numpy as jnp

import xgcm_tpu as xt


def build_grid(nx=40, ny=50, nz=15):
    """Idealized closed basin on NEMO's grid with COMODO metadata."""
    ds = xt.Dataset(
        coords={
            # T points unshifted; U/V/W points right-shifted (+0.5)
            "x_c": ("x_c", np.arange(nx) + 0.5, {"axis": "X"}),
            "x_f": ("x_f", np.arange(nx) + 1.0,
                    {"axis": "X", "c_grid_axis_shift": 0.5}),
            "y_c": ("y_c", np.arange(ny) + 0.5, {"axis": "Y"}),
            "y_f": ("y_f", np.arange(ny) + 1.0,
                    {"axis": "Y", "c_grid_axis_shift": 0.5}),
            "z_c": ("z_c", np.arange(nz) + 0.5, {"axis": "Z"}),
            "z_f": ("z_f", np.arange(nz) + 1.0,
                    {"axis": "Z", "c_grid_axis_shift": 0.5}),
            # horizontal scale factors at T and F points (non-uniform)
            "e1t": ("x_c", 1.0e3 * (1.0 + 0.1 * np.sin(np.arange(nx)))),
            "e1f": ("x_f", 1.0e3 * (1.0 + 0.1 * np.sin(np.arange(nx) + 0.5))),
            "e2t": ("y_c", 1.0e3 * (1.0 + 0.05 * np.cos(np.arange(ny)))),
            "e2f": ("y_f", 1.0e3 * (1.0 + 0.05 * np.cos(np.arange(ny) + 0.5))),
            # vertical scale factor (stretched levels)
            "e3t": ("z_c", 10.0 * (1.0 + np.arange(nz) / nz)),
        }
    )
    grid = xt.Grid(
        ds,
        # closed basin: no periodic wrap anywhere
        boundary="fill",
        fill_value=0.0,
        metrics={
            ("X",): ["e1t", "e1f"],
            ("Y",): ["e2t", "e2f"],
            ("Z",): ["e3t"],
        },
        # axes/positions come from the COMODO attributes above
        autoparse_metadata=True,
    )
    return ds, grid


def main():
    ds, grid = build_grid()
    nx, ny, nz = ds.dims["x_c"], ds.dims["y_c"], ds.dims["z_c"]

    # the parser must have inferred the NEMO staggering (right-shifted)
    assert grid.axes["X"].coords == {"center": "x_c", "right": "x_f"}
    assert grid.axes["Y"].coords == {"center": "y_c", "right": "y_f"}
    print("COMODO autoparse:", {k: dict(a.coords) for k, a in grid.axes.items()})

    rng = np.random.RandomState(11)
    u = xt.GriddedArray(
        0.1 * rng.randn(nz, ny, nx), ("z_c", "y_c", "x_f"), name="u"
    )
    v = xt.GriddedArray(
        0.1 * rng.randn(nz, ny, nx), ("z_c", "y_f", "x_c"), name="v"
    )

    @jax.jit
    def diagnostics(u, v):
        # relative vorticity at F points: metric derivative moves each
        # component onto (y_f, x_f) — NEMO's curl recipe
        zeta = grid.derivative(v, "X") - grid.derivative(u, "Y")
        # kinetic energy at T points
        u_t = grid.interp(u, "X")
        v_t = grid.interp(v, "Y")
        ke = 0.5 * (u_t * u_t + v_t * v_t)
        return zeta, ke

    zeta, ke = diagnostics(u, v)
    assert zeta.dims == ("z_c", "y_f", "x_f")
    assert ke.dims == ("z_c", "y_c", "x_c")
    print(f"zeta: dims={zeta.dims} mean={float(jnp.mean(zeta.data)):.3e}")
    print(f"KE  : dims={ke.dims} mean={float(jnp.mean(ke.data)):.3e}")

    # --- meridional overturning streamfunction ---------------------------
    # zonally integrated meridional transport, cumulated downward:
    #   psi(z_f, y_f) = cumsum_z( integral_x v e1 dz )
    vdz = v * grid.get_metric(v, ("Z",))          # v * e3t  (m^2/s)
    transport = grid.integrate(vdz, "X")          # sum_x v e1 e3 (m^3/s)
    psi = grid.cumsum(transport, "Z", boundary="fill")
    assert psi.dims == ("z_f", "y_f")
    sv = jnp.max(jnp.abs(psi.data)) / 1e6
    print(f"overturning psi: dims={psi.dims} max |psi| = {float(sv):.3f} Sv")

    # sanity: the cumulative sum at the deepest interface equals the full
    # water-column transport
    full_col = jnp.sum(np.asarray(transport.data), axis=0)
    np.testing.assert_allclose(
        np.asarray(psi.data)[-1], full_col, rtol=1e-6
    )

    # --- basin-mean stratification via the metric registry ---------------
    temp = xt.GriddedArray(
        4.0 + 20.0 * np.exp(-np.arange(nz) / 5.0)[:, None, None]
        * np.ones((nz, ny, nx)),
        ("z_c", "y_c", "x_c"),
        name="temp",
    )
    profile = grid.average(temp, ["X", "Y"])
    assert profile.dims == ("z_c",)
    print(f"basin-mean T(z): surface {float(profile.data[0]):.2f} degC, "
          f"bottom {float(profile.data[-1]):.2f} degC")

    print("NEMO idealized-basin diagnostics: OK")


if __name__ == "__main__":
    main()
