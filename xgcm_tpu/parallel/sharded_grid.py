"""ShardedGrid: a Grid proxy bound to a mesh.

Convenience wrapper so distributed analysis code reads like single-device
code: pick a mesh and a dim->mesh-axis mapping once, then call the usual
operator methods.  Ops whose core dim is sharded route through the explicit
``shard_map`` + ``ppermute`` halo ring; everything else falls through to the
plain Grid methods (which are GSPMD-correct under jit anyway).

No reference counterpart: the closest analog is implicitly chunk-aware
xarray objects under dask (reference grid.py:654-687 auto-selects the dask
mode per call); here the mesh binding is explicit and static.
"""

from __future__ import annotations

from typing import Mapping

from jax.sharding import Mesh

from ..core.dataarray import GriddedArray
from ..core.grid import Grid
from .halo import _SHARDABLE_WIDTHS, sharded_cumsum, sharded_op
from .mesh import shard_gridded

__all__ = ["ShardedGrid"]


class ShardedGrid:
    """Binds a Grid to a Mesh and a dim->mesh-axis mapping.

    >>> sgrid = ShardedGrid(grid, mesh, {"xc": "x", "xg": "x"})
    >>> zeta = sgrid.diff(v, "X") - sgrid.diff(u, "Y")
    """

    def __init__(
        self, grid: Grid, mesh: Mesh, dim_to_mesh_axis: Mapping[str, str]
    ):
        self.grid = grid
        self.mesh = mesh
        self.dim_to_mesh_axis = dict(dim_to_mesh_axis)

    @property
    def axes(self):
        return self.grid.axes

    def shard(self, da: GriddedArray) -> GriddedArray:
        """Place an array on the mesh according to the dim mapping."""
        mapping = {
            d: ax for d, ax in self.dim_to_mesh_axis.items() if d in da.dims
        }
        return shard_gridded(da, self.mesh, mapping)

    def _core_dim_sharded(self, da: GriddedArray, axis_name: str, to) -> bool:
        ax = self.grid.axes[axis_name]
        from_pos, dim = ax._get_position_name(da)
        to_pos = to or ax.default_shifts[from_pos]
        return (
            self.dim_to_mesh_axis.get(dim) is not None
            and (from_pos, to_pos) in _SHARDABLE_WIDTHS
        )

    def _face_sharded_args(self, da):
        """(mesh_axis, x_axis, y_axis) when the grid's face dim is sharded
        and the array spans exactly two connection axes; else None."""
        grid = self.grid
        if grid._face_connections is None:
            return None
        facedim = grid._facedim
        mesh_axis = self.dim_to_mesh_axis.get(facedim)
        if mesh_axis is None or facedim not in da.dims:
            return None
        conn_axes = sorted(
            {
                a
                for links in grid._face_connections[facedim].values()
                for a in links
            }
        )
        if len(conn_axes) != 2:
            return None
        return mesh_axis, conn_axes[0], conn_axes[1]

    def _op(self, name, da, axis, to=None, boundary=None, fill_value=None, **kw):
        from .face_sharded import sharded_face_op

        if isinstance(axis, str):
            axis = [axis]
        out = da
        for ax_name in axis:
            ax_to = to.get(ax_name) if isinstance(to, dict) else to
            face_args = (
                self._face_sharded_args(out) if name != "cumsum" else None
            )
            if face_args is not None and ax_name in face_args[1:]:
                mesh_axis, x_axis, y_axis = face_args
                out = sharded_face_op(
                    self.grid, name, out, ax_name, self.mesh, mesh_axis,
                    x_axis, y_axis, to=ax_to, boundary=boundary,
                    fill_value=fill_value,
                )
            elif self._core_dim_sharded(out, ax_name, ax_to):
                if name == "cumsum":
                    out = sharded_cumsum(
                        self.grid, out, ax_name, self.mesh,
                        self.dim_to_mesh_axis, to=ax_to, boundary=boundary,
                        fill_value=fill_value,
                    )
                else:
                    out = sharded_op(
                        self.grid, name, out, ax_name, self.mesh,
                        self.dim_to_mesh_axis, to=ax_to, boundary=boundary,
                        fill_value=fill_value,
                    )
            else:
                out = getattr(self.grid, name)(
                    out, ax_name, to=ax_to, boundary=boundary,
                    fill_value=fill_value, **kw,
                )
        return out

    def interp(self, da, axis, **kw):
        return self._op("interp", da, axis, **kw)

    def diff(self, da, axis, **kw):
        return self._op("diff", da, axis, **kw)

    def min(self, da, axis, **kw):
        return self._op("min", da, axis, **kw)

    def max(self, da, axis, **kw):
        return self._op("max", da, axis, **kw)

    def cumsum(self, da, axis, **kw):
        return self._op("cumsum", da, axis, **kw)
