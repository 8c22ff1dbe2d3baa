"""High-level fused C-grid diagnostics.

``cgrid_diagnostics`` computes relative vorticity, divergence, and kinetic
energy of a C-grid velocity pair in one call — through the single-pass
Pallas kernel when the inputs qualify (TPU, 2D, 128-lane-aligned, periodic),
otherwise through the equivalent Grid-API ops (which XLA still fuses well).
This is the workload of the reference's MITgcm example notebook
(``docs/ufunc_examples.md`` §Vorticity/§Divergence) packaged as one fused
framework op.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from ..core.dataarray import GriddedArray
from ..core.grid import Grid

__all__ = ["cgrid_diagnostics"]


def cgrid_diagnostics(
    grid: Grid,
    u: GriddedArray,
    v: GriddedArray,
    x_axis: str = "X",
    y_axis: str = "Y",
    inv_dx: Optional[GriddedArray] = None,
    inv_dy: Optional[GriddedArray] = None,
) -> Tuple[GriddedArray, GriddedArray, GriddedArray]:
    """(zeta, div, ke) for C-grid velocities u on (yc, xg), v on (yg, xc).

    ``inv_dx``/``inv_dy`` are optional 1D inverse grid spacings (defaults to
    1, i.e. index-space derivatives).  Periodic boundaries.
    """
    from . import pallas_stencils as ps

    xax, yax = grid.axes[x_axis], grid.axes[y_axis]
    _, u_xdim = xax._get_position_name(u)
    _, u_ydim = yax._get_position_name(u)
    _, v_xdim = xax._get_position_name(v)
    _, v_ydim = yax._get_position_name(v)

    corner_dims = (v_ydim, u_xdim)  # (yg, xg)
    center_dims = (u_ydim, v_xdim)  # (yc, xc)

    nx = u.sizes[u_xdim]
    ny = u.sizes[u_ydim]
    ix = jnp.ones(nx, u.dtype) if inv_dx is None else jnp.asarray(inv_dx.data)
    iy = jnp.ones(ny, u.dtype) if inv_dy is None else jnp.asarray(inv_dy.data)

    u2 = u.transpose(u_ydim, u_xdim).data
    v2 = v.transpose(v_ydim, v_xdim).data

    use_pallas = (
        ps.supports_pallas(u2, v2)
        and xax.boundary == "periodic"
        and yax.boundary == "periodic"
    )
    if use_pallas:
        zeta, div, ke = ps.fused_cgrid_diagnostics(u2, v2, ix, iy)
    else:
        zeta = (v2 - jnp.roll(v2, 1, 1)) * ix[None, :] - (
            u2 - jnp.roll(u2, 1, 0)
        ) * iy[:, None]
        div = (jnp.roll(u2, -1, 1) - u2) * ix[None, :] + (
            jnp.roll(v2, -1, 0) - v2
        ) * iy[:, None]
        u_c = 0.5 * (u2 + jnp.roll(u2, -1, 1))
        v_c = 0.5 * (v2 + jnp.roll(v2, -1, 0))
        ke = 0.5 * (u_c * u_c + v_c * v_c)

    return (
        GriddedArray(zeta, corner_dims, name="vorticity"),
        GriddedArray(div, center_dims, name="divergence"),
        GriddedArray(ke, center_dims, name="kinetic_energy"),
    )
