"""CMIP-archive-style analysis from CF metadata alone (beyond reference).

CMIP-published model output carries CF attributes — ``standard_name``,
``units``, ``positive`` — but usually no COMODO staggering attributes, so
the reference cannot autoparse it (its ``cf_parser`` is an unimplemented
stub, metadata_parsers.py:100-119).  xgcm_tpu's CF fallback
(``parsers/cf.py``) infers the axes, orients the (n, n+1) depth /
depth-bounds pair as center/outer, and the resulting grid drives a
conservative heat-content rebin into density space.

Run:  python examples/cmip_cf_dataset.py
"""

import numpy as np

import xgcm_tpu as xt


def build_dataset(nx=30, ny=20, nz=12):
    """A thetao-style field with CF coordinate metadata only."""
    rng = np.random.default_rng(7)
    z_o = np.linspace(0.0, 600.0, nz + 1)
    z_c = 0.5 * (z_o[:-1] + z_o[1:])
    ds = xt.Dataset(
        coords={
            "lon": ("lon", np.linspace(0.5, 359.5, nx),
                    {"standard_name": "longitude", "units": "degrees_east"}),
            "lat": ("lat", np.linspace(-60.0, 60.0, ny),
                    {"standard_name": "latitude", "units": "degrees_north"}),
            "lev": ("lev", z_c, {"units": "m", "positive": "down"}),
            "lev_bnds": ("lev_bnds", z_o, {"units": "m", "positive": "down"}),
        },
        data_vars={
            "thetao": (
                ("lev", "lat", "lon"),
                20.0 - 15.0 * (z_c / 600.0)[:, None, None]
                + 0.5 * rng.standard_normal((nz, ny, nx)),
            ),
        },
    )
    return ds


def main():
    ds = build_dataset()

    # no coords= needed: the CF fallback parser finds X/Y/Z
    grid = xt.Grid(ds, periodic=False)
    assert set(grid.axes) == {"X", "Y", "Z"}
    assert grid.axes["Z"].coords == {"center": "lev", "outer": "lev_bnds"}
    print("CF-autoparsed axes:", {k: dict(v.coords) for k, v in grid.axes.items()})

    # density on the cell bounds (monotonic in depth for this idealized
    # stratification), heat content per layer on the centers
    nz = ds.sizes["lev"]
    thickness = xt.GriddedArray(
        np.diff(np.asarray(ds["lev_bnds"].data)), ("lev",)
    )
    heat = ds["thetao"] * thickness
    sigma_bnds = xt.GriddedArray(
        np.linspace(23.0, 28.0, nz + 1), ("lev_bnds",), name="sigma"
    )

    bins = np.linspace(22.5, 28.5, 9)
    heat_in_sigma = grid.transform(
        heat, "Z", bins, target_data=sigma_bnds, method="conservative"
    )
    total_in = float(np.sum(np.asarray(heat.data)))
    total_out = float(np.nansum(np.asarray(heat_in_sigma.data)))
    np.testing.assert_allclose(total_out, total_in, rtol=1e-6)
    print(f"heat content conserved through density rebin: {total_out:.3f}")

    # on TPU, the same call with reassociate=True takes the telescoped
    # kernel (~10% faster, f32 sums reassociated); on CPU it is identical
    fast = grid.transform(
        heat, "Z", bins, target_data=sigma_bnds, method="conservative",
        reassociate=True,
    )
    np.testing.assert_allclose(
        np.nansum(np.asarray(fast.data)), total_in, rtol=1e-6
    )
    print("reassociate=True variant conserves too")


if __name__ == "__main__":
    main()
