"""Depth -> density coordinate transformation — the workload of the
reference's transform tutorial notebook (docs/transform.ipynb), natively.

Run:  python examples/density_transform.py
"""

import numpy as np
import jax

import xgcm_tpu as xt


def main():
    nz, ny, nx = 50, 64, 128
    rng = np.random.RandomState(0)

    z_c = (np.arange(nz) + 0.5) * 20.0
    z_o = np.arange(nz + 1) * 20.0
    ds = xt.Dataset(coords={"zc": ("zc", z_c), "zo": ("zo", z_o)})
    grid = xt.Grid(
        ds,
        coords={"Z": {"center": "zc", "outer": "zo"}},
        periodic=False,
        autoparse_metadata=False,
    )

    # synthetic stratification: density increases with depth, varies by column
    sigma = xt.GriddedArray(
        24.0
        + 4.0 * (z_c / z_c[-1])[None, None, :]
        + 0.2 * rng.rand(ny, nx, nz),
        ("y", "x", "zc"),
        name="sigma",
    )
    temp = xt.GriddedArray(
        20.0 - 15.0 * (z_c / z_c[-1])[None, None, :] + rng.rand(ny, nx, nz),
        ("y", "x", "zc"),
        name="temp",
    )

    # 1. linear: temperature on density surfaces
    sigma_levels = np.linspace(24.5, 27.5, 20)
    temp_on_sigma = grid.transform(temp, "Z", sigma_levels, target_data=sigma)
    print("temp on sigma:", temp_on_sigma.dims, temp_on_sigma.shape)

    # 2. conservative: heat content per density class (integral preserved)
    dz = np.diff(z_o)
    heat = temp * xt.GriddedArray(dz, ("zc",))  # extensive quantity
    heat = heat.rename("heat")
    bins = np.linspace(23.5, 28.5, 11)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # center->bounds auto-interp notice
        heat_by_class = grid.transform(
            heat, "Z", bins, target_data=sigma, method="conservative"
        )
    total_in = float(np.sum(np.asarray(heat.data)))
    total_out = float(np.nansum(np.asarray(heat_by_class.data)))
    print(f"heat conserved: in={total_in:.3f} out={total_out:.3f}")

    # 3. several variables onto the same surfaces in one fused pass:
    # the standard T/S/velocity density-space analysis pattern
    salt = xt.GriddedArray(
        35.0 + 0.5 * (z_c / z_c[-1])[None, None, :] + 0.1 * rng.rand(ny, nx, nz),
        ("y", "x", "zc"),
        name="salt",
    )
    t_sig, s_sig = grid.transform_multi(
        [temp, salt], "Z", sigma_levels, target_data=sigma
    )
    np.testing.assert_allclose(
        np.asarray(t_sig.data), np.asarray(temp_on_sigma.data), rtol=1e-6
    )
    print("transform_multi:", t_sig.name, s_sig.name, s_sig.shape)

    # 4. the whole thing is jittable
    @jax.jit
    def pipeline(t, s):
        return grid.transform(
            xt.GriddedArray(t, ("y", "x", "zc")),
            "Z",
            sigma_levels,
            target_data=xt.GriddedArray(s, ("y", "x", "zc"), name="sigma"),
            target_dim="sigma",
        ).data

    out = pipeline(temp.data, sigma.data)
    print("jitted pipeline:", out.shape)


if __name__ == "__main__":
    main()
