"""Extending the operator set with custom grid ufuncs — the workflow of the
reference's grid_ufuncs tutorial (docs/grid_ufuncs.md), natively.

Run:  python examples/custom_grid_ufunc.py
"""

import numpy as np
import jax
import jax.numpy as jnp

import xgcm_tpu as xt
from xgcm_tpu import as_grid_ufunc


# A 4th-order centered difference (5-point stencil): needs a 2-wide halo on
# each side, declared via boundary_width.
@as_grid_ufunc(
    signature="(X:center)->(X:center)", boundary_width={"X": (2, 2)}
)
def diff4(a):
    return (
        -a[..., 4:] + 8 * a[..., 3:-1] - 8 * a[..., 1:-3] + a[..., :-4]
    ) / 12.0


# A flux-limited upwind difference, with the advecting velocity passed as a
# kernel kwarg.
@as_grid_ufunc(signature="(X:center)->(X:left)", boundary_width={"X": (1, 0)})
def upwind(a, velocity_positive=True):
    return a[..., 1:] - a[..., :-1] if velocity_positive else a[..., :-1] - a[..., 1:]


def main():
    n = 64
    ds = xt.Dataset(
        coords={
            "xc": ("xc", np.arange(n) + 0.5),
            "xg": ("xg", np.arange(n) * 1.0),
        }
    )
    grid = xt.Grid(
        ds, coords={"X": {"center": "xc", "left": "xg"}},
        autoparse_metadata=False,
    )

    x = 2 * np.pi * (np.arange(n) + 0.5) / n
    da = xt.GriddedArray(np.sin(x), ("xc",), name="s")

    d4 = diff4(grid, da, axis=[("X",)])
    # compare with the analytic derivative (times dx)
    dx = 2 * np.pi / n
    err = np.abs(np.asarray(d4.data) / dx - np.cos(x)).max()
    print(f"4th-order derivative max error: {err:.2e}")

    up = upwind(grid, da, axis=[("X",)], velocity_positive=True)
    print("upwind diff:", up.dims, up.shape)

    # custom ufuncs are jittable like everything else
    @jax.jit
    def step(v):
        return diff4(grid, xt.GriddedArray(v, ("xc",)), axis=[("X",)]).data

    print("jitted custom ufunc ok:", step(da.data).shape)


if __name__ == "__main__":
    main()
