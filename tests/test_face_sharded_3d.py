"""Full face x y x x 3-D decomposition: faces, within-face rows, AND
within-face columns each on their own mesh axis.

The reference chunks the face dim and BOTH core dims simultaneously under
dask (reference padding.py:70-335 composed with grid_ufunc.py:990-1066);
this is the TPU-native analog built from collectives
(parallel/face_sharded.face_halo_pad_widths with both interior mesh axes).
Every test asserts sharded == single-device (the dask-vs-eager oracle),
covering built-in stencils, custom width-2 and corner-reading kernels,
vector components with sign rules, cumsum, and the one-exchange
apply_many batch.
"""

import jax
import numpy as np
import pytest

from xgcm_tpu import Dataset, Grid, GriddedArray
from xgcm_tpu.parallel import (
    ShardedGrid,
    make_mesh,
    shard_gridded,
    sharded_face_cumsum,
)

from .datasets import cubed_sphere_dataset, llc_dataset

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

# y (rows) on "r", x (columns) on "c", faces on "f"
SPEC_3D = {"face": "f", "y": "r", "yl": "r", "x": "c", "xl": "c"}


def _match(s, e, **kw):
    assert s.dims == e.dims
    np.testing.assert_allclose(np.asarray(s.data), np.asarray(e.data), **kw)


def smooth5(a):
    """Width-(2,2) 5-point running mean along the last axis."""
    return 0.2 * (
        a[..., :-4] + a[..., 1:-3] + a[..., 2:-2] + a[..., 3:-1] + a[..., 4:]
    )


def ninepoint(a):
    """Width-(1,1) x (1,1) 9-point mean over the last TWO axes — reads the
    corner halo cells of the 3-D decomposition."""
    nx = a.shape[-2] - 2
    ny = a.shape[-1] - 2
    s = 0.0
    for dx in range(3):
        for dy in range(3):
            s = s + a[..., dx : nx + dx, dy : ny + dy]
    return s / 9.0


class TestCubedSphere3D:
    @pytest.mark.parametrize("axis", ["X", "Y"])
    @pytest.mark.parametrize("op", ["diff", "interp"])
    def test_builtin_ops(self, axis, op):
        ds, fc = cubed_sphere_dataset(n=8)
        grid = Grid(ds, face_connections=fc)
        da = ds["data_c"]
        mesh = make_mesh({"f": 2, "r": 2, "c": 2})
        sg = ShardedGrid(grid, mesh, SPEC_3D)
        s = getattr(sg, op)(sg.shard(da), axis, boundary="extend")
        e = getattr(grid, op)(da, axis, boundary="extend")
        _match(s, e)

    def test_vector_components(self):
        """Swapped/flipped edges route partner strip segments to the
        correct (face, row, column) shard with the sign rules."""
        ds, fc = cubed_sphere_dataset(n=8)
        grid = Grid(ds, face_connections=fc)
        u, v = ds["u"], ds["v"]
        mesh = make_mesh({"f": 2, "r": 2, "c": 2})
        sg = ShardedGrid(grid, mesh, SPEC_3D)
        s = sg.diff(
            {"X": sg.shard(u)}, "X", boundary="fill",
            other_component={"Y": sg.shard(v)},
        )
        e = grid.diff({"X": u}, "X", boundary="fill",
                      other_component={"Y": v})
        _match(s, e)

    @pytest.mark.parametrize("axis,sig", [
        ("X", "(X:center)->(X:center)"),
        ("Y", "(Y:center)->(Y:center)"),
    ])
    def test_custom_width2(self, axis, sig):
        """Custom width-2 kernel along a SHARDED in-face axis (multi-row
        strip segments from both rings and the face plan)."""
        ds, fc = cubed_sphere_dataset(n=8)
        grid = Grid(ds, face_connections=fc)
        da = ds["data_c"]
        mesh = make_mesh({"f": 2, "r": 2, "c": 2})
        sg = ShardedGrid(grid, mesh, SPEC_3D)
        kw = dict(
            axis=[(axis,)],
            signature=sig,
            boundary_width={axis: (2, 2)},
            boundary="extend",
        )
        s = sg.apply_as_grid_ufunc(smooth5, sg.shard(da), **kw)
        e = grid.apply_as_grid_ufunc(smooth5, da, **kw)
        _match(s, e, rtol=1e-12)

    @pytest.mark.parametrize("boundary", ["fill", {"X": "fill", "Y": "extend"}])
    def test_corner_reading_kernel(self, boundary):
        """Corner halo cells of the 3-D decomposition match the
        single-device assembly, including mixed-BC ordering."""
        ds, fc = cubed_sphere_dataset(n=8)
        grid = Grid(ds, face_connections=fc)
        da = ds["data_c"]
        mesh = make_mesh({"f": 2, "r": 2, "c": 2})
        sg = ShardedGrid(grid, mesh, SPEC_3D)
        kw = dict(
            axis=[("X", "Y")],
            signature="(X:center,Y:center)->(X:center,Y:center)",
            boundary_width={"X": (1, 1), "Y": (1, 1)},
            boundary=boundary,
        )
        s = sg.apply_as_grid_ufunc(ninepoint, sg.shard(da), **kw)
        e = grid.apply_as_grid_ufunc(ninepoint, da, **kw)
        _match(s, e, rtol=1e-12)

    def test_apply_many_one_exchange(self):
        """The multi-op batch shares one exchange round on the 3-D mesh."""
        ds, fc = cubed_sphere_dataset(n=8)
        grid = Grid(ds, face_connections=fc)
        da = ds["data_c"]
        mesh = make_mesh({"f": 2, "r": 2, "c": 2})
        sg = ShardedGrid(grid, mesh, SPEC_3D)
        sh = sg.shard(da)
        from xgcm_tpu.core import gridops

        specs = [
            dict(
                func=gridops.diff_center_to_left.ufunc,
                args=sh, axis=[("X",)],
                signature="(X:center)->(X:left)",
                boundary_width={"X": (1, 0)},
                boundary="fill",
            ),
            dict(
                func=gridops.interp_center_to_left.ufunc,
                args=sh, axis=[("Y",)],
                signature="(Y:center)->(Y:left)",
                boundary_width={"Y": (1, 0)},
                boundary="fill",
            ),
        ]
        res = sg.apply_many(specs)
        e1 = grid.diff(da, "X", to="left", boundary="fill")
        e2 = grid.interp(da, "Y", to="left", boundary="fill")
        _match(res[0], e1)
        _match(res[1], e2)


class TestLLC3D:
    @pytest.mark.parametrize("axis", ["X", "Y"])
    def test_llc_13_faces_3d_mesh(self, axis):
        """13 faces dummy-padded onto a 2-way face axis x 2x2 interior —
        rotated LLC connections across all three mesh axes."""
        ds, fc = llc_dataset(n=8)
        grid = Grid(ds, face_connections=fc)
        da = ds["data_c"]
        mesh = make_mesh({"f": 2, "r": 2, "c": 2})
        sg = ShardedGrid(grid, mesh, SPEC_3D)
        sh = shard_gridded(
            da, mesh, {"face": "f", "y": "r", "x": "c"}, uneven_ok=("face",)
        )
        s = sg.diff(sh, axis, boundary="fill")
        e = grid.diff(da, axis, boundary="fill")
        _match(s, e)

    def test_llc_vector_3d_mesh(self):
        ds, fc = llc_dataset(n=8)
        grid = Grid(ds, face_connections=fc)
        u, v = ds["u"], ds["v"]
        mesh = make_mesh({"f": 2, "r": 2, "c": 2})
        sg = ShardedGrid(grid, mesh, SPEC_3D)
        su = shard_gridded(
            u, mesh, {"face": "f", "y": "r", "xl": "c"}, uneven_ok=("face",)
        )
        sv = shard_gridded(
            v, mesh, {"face": "f", "yl": "r", "x": "c"}, uneven_ok=("face",)
        )
        s = sg.diff({"X": su}, "X", boundary="fill",
                    other_component={"Y": sv})
        e = grid.diff({"X": u}, "X", boundary="fill",
                      other_component={"Y": v})
        _match(s, e)


def _nonsquare_ring(ny=6, nx=8):
    """4-face straight ring with non-square faces (tests ny != nx under the
    3-D decomposition; shift-cumsum is legal here — no axis swaps)."""
    ds = Dataset(
        coords={
            "x": ("x", np.arange(nx) + 0.5, {"axis": "X"}),
            "xl": ("xl", np.arange(nx) * 1.0,
                   {"axis": "X", "c_grid_axis_shift": -0.5}),
            "y": ("y", np.arange(ny) + 0.5, {"axis": "Y"}),
            "yl": ("yl", np.arange(ny) * 1.0,
                   {"axis": "Y", "c_grid_axis_shift": -0.5}),
            "face": ("face", np.arange(4)),
        }
    )
    fc = {"face": {
        0: {"X": ((3, "X", False), (1, "X", False))},
        1: {"X": ((0, "X", False), (2, "X", False))},
        2: {"X": ((1, "X", False), (3, "X", False))},
        3: {"X": ((2, "X", False), (0, "X", False))},
    }}
    grid = Grid(ds, face_connections=fc)
    da = GriddedArray(np.random.rand(4, ny, nx), ("face", "y", "x"), name="c")
    return grid, da


class TestNonSquare3D:
    @pytest.mark.parametrize("axis", ["X", "Y"])
    @pytest.mark.parametrize("boundary", ["fill", "extend", "periodic"])
    def test_straight_ring_ops(self, axis, boundary):
        grid, da = _nonsquare_ring()
        mesh = make_mesh({"f": 2, "r": 2, "c": 2})
        sg = ShardedGrid(grid, mesh, SPEC_3D)
        s = sg.interp(sg.shard(da), axis, boundary=boundary)
        e = grid.interp(da, axis, boundary=boundary)
        _match(s, e)

    @pytest.mark.parametrize("axis", ["X", "Y"])
    def test_cumsum_3d_mesh_shift(self, axis):
        """Distributed prefix sum with the summed dim sharded (X rides the
        column axis, Y the row axis) plus the per-face-plan shift pad."""
        grid, da = _nonsquare_ring()
        mesh = make_mesh({"f": 2, "r": 2, "c": 2})
        sh = shard_gridded(da, mesh, {"face": "f", "y": "r", "x": "c"})
        s = sharded_face_cumsum(
            grid, sh, axis, mesh, "f", "X", "Y", to="left", boundary="fill",
            interior_mesh_axis="r", interior_mesh_axis_x="c",
        )
        e = grid.cumsum(da, axis, to="left", boundary="fill")
        _match(s, e, rtol=1e-12)

    def test_cumsum_3d_mesh_noshift(self):
        """left -> center cumsum (no shift pad) with columns sharded."""
        grid, _ = _nonsquare_ring()
        da = GriddedArray(
            np.random.rand(4, 6, 8), ("face", "y", "xl"), name="u"
        )
        mesh = make_mesh({"f": 2, "r": 2, "c": 2})
        sh = shard_gridded(da, mesh, {"face": "f", "y": "r", "xl": "c"})
        s = sharded_face_cumsum(
            grid, sh, "X", mesh, "f", "X", "Y", to="center",
            boundary="fill", interior_mesh_axis="r", interior_mesh_axis_x="c",
        )
        e = grid.cumsum(da, "X", to="center", boundary="fill")
        _match(s, e, rtol=1e-12)

    def test_cumsum_through_sharded_grid(self):
        grid, da = _nonsquare_ring()
        mesh = make_mesh({"f": 2, "r": 2, "c": 2})
        sg = ShardedGrid(grid, mesh, SPEC_3D)
        s = sg.cumsum(sg.shard(da), "X", to="left", boundary="fill")
        e = grid.cumsum(da, "X", to="left", boundary="fill")
        _match(s, e, rtol=1e-12)


class TestWidthLimits:
    def test_width_exceeds_rows_per_shard(self):
        ds, fc = cubed_sphere_dataset(n=4)
        grid = Grid(ds, face_connections=fc)
        da = ds["data_c"]
        mesh = make_mesh({"f": 2, "r": 2, "c": 2})
        sg = ShardedGrid(grid, mesh, SPEC_3D)
        kw = dict(
            axis=[("X",)],
            signature="(X:center)->(X:center)",
            boundary_width={"X": (3, 3)},  # > 4/2 = 2 rows/cols per shard
            boundary="fill",
        )
        with pytest.raises(ValueError, match="per interior shard"):
            sg.apply_as_grid_ufunc(smooth5, sg.shard(da), **kw)

    def test_width_exceeds_columns_per_shard(self):
        # non-square faces (ny=8 > nx=4): the rows check passes, the
        # columns check must still catch the over-wide halo
        grid, da = _nonsquare_ring(ny=8, nx=4)
        mesh = make_mesh({"f": 2, "r": 2, "c": 2})
        sg = ShardedGrid(grid, mesh, SPEC_3D)
        kw = dict(
            axis=[("X",)],
            signature="(X:center)->(X:center)",
            boundary_width={"X": (3, 3)},  # <= 4 rows, > 2 columns
            boundary="fill",
        )
        with pytest.raises(ValueError, match="columns per interior shard"):
            sg.apply_as_grid_ufunc(smooth5, sg.shard(da), **kw)
