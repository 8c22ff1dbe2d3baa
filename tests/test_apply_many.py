"""sharded_apply_many: arbitrary op chains share one halo-exchange round.

VERDICT r2 item 6: the generic multi-op API must (a) equal the chained
single-op results, and (b) issue exactly the collective count of the
hand-fused diagnostics program (parallel/diagnostics.py) for the
vorticity + divergence + KE chain."""

import jax
import numpy as np
import pytest

from xgcm_tpu import Dataset, Grid, GriddedArray
from xgcm_tpu.core import gridops
from xgcm_tpu.parallel import (
    ShardedGrid,
    make_mesh,
    shard_gridded,
    sharded_apply_many,
    sharded_cgrid_diagnostics,
)

from .datasets import cubed_sphere_dataset


def _cgrid(nx=16, ny=16):
    ds = Dataset(coords={
        "xc": ("xc", np.arange(nx) + 0.5, {"axis": "X"}),
        "xg": ("xg", np.arange(nx) * 1.0,
               {"axis": "X", "c_grid_axis_shift": -0.5}),
        "yc": ("yc", np.arange(ny) + 0.5, {"axis": "Y"}),
        "yg": ("yg", np.arange(ny) * 1.0,
               {"axis": "Y", "c_grid_axis_shift": -0.5}),
    })
    grid = Grid(ds)
    rng = np.random.RandomState(7)
    u = GriddedArray(rng.rand(ny, nx), ("yc", "xg"), name="u")
    v = GriddedArray(rng.rand(ny, nx), ("yg", "xc"), name="v")
    return grid, u, v


def _diag_specs(u, v):
    """The zeta/div/ke op set as generic specs (6 ops, 2 inputs)."""
    return [
        dict(func=gridops.diff_center_to_left.ufunc, args=[v],
             axis=[("X",)], signature=gridops.diff_center_to_left.signature,
             boundary_width=gridops.diff_center_to_left.boundary_width),
        dict(func=gridops.diff_center_to_left.ufunc, args=[u],
             axis=[("Y",)], signature=gridops.diff_center_to_left.signature,
             boundary_width=gridops.diff_center_to_left.boundary_width),
        dict(func=gridops.diff_left_to_center.ufunc, args=[u],
             axis=[("X",)], signature=gridops.diff_left_to_center.signature,
             boundary_width=gridops.diff_left_to_center.boundary_width),
        dict(func=gridops.diff_left_to_center.ufunc, args=[v],
             axis=[("Y",)], signature=gridops.diff_left_to_center.signature,
             boundary_width=gridops.diff_left_to_center.boundary_width),
        dict(func=gridops.interp_left_to_center.ufunc, args=[u],
             axis=[("X",)], signature=gridops.interp_left_to_center.signature,
             boundary_width=gridops.interp_left_to_center.boundary_width),
        dict(func=gridops.interp_left_to_center.ufunc, args=[v],
             axis=[("Y",)], signature=gridops.interp_left_to_center.signature,
             boundary_width=gridops.interp_left_to_center.boundary_width),
    ]


def _count_collectives(fn, *args, names=("ppermute", "all_gather", "all_to_all")):
    """Total data-moving collectives via the public inspection utility."""
    from xgcm_tpu.utils import count_collectives

    return count_collectives(fn, *args, names=names)["total"]


class TestApplyManyCGrid:
    def test_matches_chained_ops_and_fused_diagnostics(self):
        grid, u, v = _cgrid()
        mesh = make_mesh({"x": 2, "y": 2}, devices=jax.devices()[:4])
        d2m = {"xc": "x", "xg": "x", "yc": "y", "yg": "y"}
        us = shard_gridded(u, mesh, d2m)
        vs = shard_gridded(v, mesh, d2m)
        sg = ShardedGrid(grid, mesh, d2m)

        outs = sharded_apply_many(
            _diag_specs(us, vs), grid=grid, mesh=mesh, dim_to_mesh_axis=d2m
        )
        dvdx, dudy, dudx, dvdy, u_c, v_c = outs
        zeta = dvdx - dudy
        div = dudx + dvdy
        ke = 0.5 * (u_c * u_c + v_c * v_c)

        ez, ed, ek = sharded_cgrid_diagnostics(grid, us, vs, mesh, d2m)
        np.testing.assert_allclose(np.asarray(zeta.data), np.asarray(ez.data))
        np.testing.assert_allclose(np.asarray(div.data), np.asarray(ed.data))
        np.testing.assert_allclose(np.asarray(ke.data), np.asarray(ek.data))

        # and each piece equals the chained ShardedGrid single ops
        np.testing.assert_allclose(
            np.asarray(dvdx.data), np.asarray(sg.diff(vs, "X").data)
        )
        np.testing.assert_allclose(
            np.asarray(u_c.data),
            np.asarray(sg.interp(us, "X", to="center").data),
        )

    def test_collective_count_matches_fused_program(self):
        """The 6-op batch pads u once and v once (2 ppermutes each under
        periodic BCs) — exactly the hand-fused program's exchange count,
        where 6 chained shard_maps would pay 6 rounds."""
        grid, u, v = _cgrid()
        mesh = make_mesh({"x": 2, "y": 2}, devices=jax.devices()[:4])
        d2m = {"xc": "x", "xg": "x", "yc": "y", "yg": "y"}

        def many(ud, vd):
            uu = GriddedArray(ud, u.dims)
            vv = GriddedArray(vd, v.dims)
            return tuple(
                o.data
                for o in sharded_apply_many(
                    _diag_specs(uu, vv), grid=grid, mesh=mesh,
                    dim_to_mesh_axis=d2m,
                )
            )

        def fused(ud, vd):
            uu = GriddedArray(ud, u.dims)
            vv = GriddedArray(vd, v.dims)
            z, d, k = sharded_cgrid_diagnostics(grid, uu, vv, mesh, d2m)
            return z.data, d.data, k.data

        n_many = _count_collectives(many, u.data, v.data)
        n_fused = _count_collectives(fused, u.data, v.data)
        assert n_many == n_fused, (n_many, n_fused)

        # a 6-op chain of separate shard_maps costs 6 rounds; the batch
        # costs one round per input array
        def chained(ud, vd):
            sg = ShardedGrid(grid, mesh, d2m)
            uu = GriddedArray(ud, u.dims)
            vv = GriddedArray(vd, v.dims)
            return (
                sg.diff(vv, "X").data, sg.diff(uu, "Y").data,
                sg.diff(uu, "X", to="center").data,
                sg.diff(vv, "Y", to="center").data,
                sg.interp(uu, "X", to="center").data,
                sg.interp(vv, "Y", to="center").data,
            )

        n_chained = _count_collectives(chained, u.data, v.data)
        assert n_chained > n_many

    def test_mixed_widths_pad_once(self):
        """Ops with different widths on the same input share one pad at
        the max width; results equal the single-op engine."""
        grid, u, _ = _cgrid()
        mesh = make_mesh({"x": 4}, devices=jax.devices()[:4])
        d2m = {"xc": "x", "xg": "x"}
        us = shard_gridded(u, mesh, d2m)

        def smooth5(a):
            return 0.2 * (
                a[..., :-4] + a[..., 1:-3] + a[..., 2:-2] + a[..., 3:-1]
                + a[..., 4:]
            )

        specs = [
            dict(func=gridops.interp_left_to_center.ufunc, args=[us],
                 axis=[("X",)],
                 signature=gridops.interp_left_to_center.signature,
                 boundary_width=gridops.interp_left_to_center.boundary_width),
            dict(func=smooth5, args=[us], axis=[("X",)],
                 signature="(X:left)->(X:left)",
                 boundary_width={"X": (2, 2)}),
        ]
        interp_out, smooth_out = sharded_apply_many(
            specs, grid=grid, mesh=mesh, dim_to_mesh_axis=d2m
        )
        e1 = grid.interp(u, "X", to="center")
        e2 = grid.apply_as_grid_ufunc(
            smooth5, u, axis=[("X",)], signature="(X:left)->(X:left)",
            boundary_width={"X": (2, 2)},
        )
        np.testing.assert_allclose(
            np.asarray(interp_out.data), np.asarray(e1.data), rtol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(smooth_out.data), np.asarray(e2.data), rtol=1e-12
        )

        # one pad at width (2,2) serves both: 2 ppermutes total
        def many(ud):
            uu = GriddedArray(ud, u.dims, name="u")
            rs = sharded_apply_many(
                [
                    {**specs[0], "args": [uu]},
                    {**specs[1], "args": [uu]},
                ],
                grid=grid, mesh=mesh, dim_to_mesh_axis=d2m,
            )
            return tuple(r.data for r in rs)

        n = _count_collectives(many, u.data)
        assert n == 2, n


class TestApplyManyFaces:
    def test_face_sharded_batch(self):
        """apply_many on a face-sharded cubed sphere: scalar diff+interp
        share the strip gather."""
        ds, fc = cubed_sphere_dataset(n=8)
        grid = Grid(ds, face_connections=fc)
        da = ds["data_c"]
        mesh = make_mesh({"f": 6}, devices=jax.devices()[:6])
        sh = shard_gridded(da, mesh, {"face": "f"})
        specs = [
            dict(func=gridops.diff_center_to_left.ufunc, args=[sh],
                 axis=[("X",)],
                 signature=gridops.diff_center_to_left.signature,
                 boundary_width=gridops.diff_center_to_left.boundary_width,
                 boundary="fill"),
            dict(func=gridops.interp_center_to_left.ufunc, args=[sh],
                 axis=[("Y",)],
                 signature=gridops.interp_center_to_left.signature,
                 boundary_width=gridops.interp_center_to_left.boundary_width,
                 boundary="fill"),
        ]
        d_out, i_out = sharded_apply_many(
            specs, grid=grid, mesh=mesh, dim_to_mesh_axis={"face": "f"}
        )
        np.testing.assert_allclose(
            np.asarray(d_out.data),
            np.asarray(grid.diff(da, "X", boundary="fill").data),
        )
        np.testing.assert_allclose(
            np.asarray(i_out.data),
            np.asarray(grid.interp(da, "Y", boundary="fill").data),
        )

    def test_through_sharded_grid_api(self):
        ds, fc = cubed_sphere_dataset(n=8)
        grid = Grid(ds, face_connections=fc)
        da = ds["data_c"]
        mesh = make_mesh({"f": 3}, devices=jax.devices()[:3])
        sg = ShardedGrid(grid, mesh, {"face": "f"})
        sh = sg.shard(da)
        outs = sg.apply_many([
            dict(func=gridops.diff_center_to_left.ufunc, args=[sh],
                 axis=[("X",)],
                 signature=gridops.diff_center_to_left.signature,
                 boundary_width=gridops.diff_center_to_left.boundary_width,
                 boundary="extend"),
            dict(func=gridops.diff_center_to_left.ufunc, args=[sh],
                 axis=[("Y",)],
                 signature=gridops.diff_center_to_left.signature,
                 boundary_width=gridops.diff_center_to_left.boundary_width,
                 boundary="extend"),
        ])
        np.testing.assert_allclose(
            np.asarray(outs[0].data),
            np.asarray(grid.diff(da, "X", boundary="extend").data),
        )
        np.testing.assert_allclose(
            np.asarray(outs[1].data),
            np.asarray(grid.diff(da, "Y", boundary="extend").data),
        )


class TestApplyManyVector:
    def test_face_sharded_vector_batch(self):
        """Vector components (with other_component sign rules) through the
        apply_many face branch: both diffs of a C-grid vector in one
        batch match the per-component sharded ops."""
        ds, fc = cubed_sphere_dataset(n=8)
        grid = Grid(ds, face_connections=fc)
        u, v = ds["u"], ds["v"]
        mesh = make_mesh({"f": 6}, devices=jax.devices()[:6])
        sg = ShardedGrid(grid, mesh, {"face": "f"})
        su, sv = sg.shard(u), sg.shard(v)
        op = gridops.diff_left_to_center
        specs = [
            dict(func=op.ufunc, args=[{"X": su}], axis=[("X",)],
                 signature=op.signature, boundary_width=op.boundary_width,
                 boundary="fill", other_component=[{"Y": sv}]),
            dict(func=op.ufunc, args=[{"Y": sv}], axis=[("Y",)],
                 signature=op.signature, boundary_width=op.boundary_width,
                 boundary="fill", other_component=[{"X": su}]),
        ]
        dx, dy = sg.apply_many(specs)
        ex = grid.diff({"X": u}, "X", boundary="fill",
                       other_component={"Y": v})
        ey = grid.diff({"Y": v}, "Y", boundary="fill",
                       other_component={"X": u})
        assert dx.dims == ex.dims and dy.dims == ey.dims
        np.testing.assert_allclose(
            np.asarray(dx.data), np.asarray(ex.data), rtol=1e-12)
        np.testing.assert_allclose(
            np.asarray(dy.data), np.asarray(ey.data), rtol=1e-12)


class TestNameBasedSpecs:
    def test_named_ops_match_explicit_specs(self):
        """dict(op="diff", ...) selects the same gridops kernel as the
        explicit func/signature form and as ShardedGrid.diff."""
        grid, u, v = _cgrid()
        mesh = make_mesh({"x": 2, "y": 2}, devices=jax.devices()[:4])
        d2m = {"xc": "x", "xg": "x", "yc": "y", "yg": "y"}
        sg = ShardedGrid(grid, mesh, d2m)
        us, vs = sg.shard(u), sg.shard(v)
        outs = sg.apply_many([
            dict(op="diff", args=vs, axis="X"),
            dict(op="interp", args=us, axis="X", to="center"),
            dict(op="max", args=vs, axis="Y", boundary="extend"),
        ])
        np.testing.assert_allclose(
            np.asarray(outs[0].data), np.asarray(sg.diff(vs, "X").data))
        np.testing.assert_allclose(
            np.asarray(outs[1].data),
            np.asarray(sg.interp(us, "X", to="center").data))
        np.testing.assert_allclose(
            np.asarray(outs[2].data),
            np.asarray(sg.max(vs, "Y", boundary="extend").data))

    def test_named_vector_on_face_grid(self):
        ds, fc = cubed_sphere_dataset(n=8)
        grid = Grid(ds, face_connections=fc)
        u, v = ds["u"], ds["v"]
        mesh = make_mesh({"f": 6}, devices=jax.devices()[:6])
        sg = ShardedGrid(grid, mesh, {"face": "f"})
        su, sv = sg.shard(u), sg.shard(v)
        (dx,) = sg.apply_many([
            dict(op="diff", args={"X": su}, axis="X", to="center",
                 boundary="fill", other_component=[{"Y": sv}]),
        ])
        ex = grid.diff({"X": u}, "X", to="center", boundary="fill",
                       other_component={"Y": v})
        np.testing.assert_allclose(
            np.asarray(dx.data), np.asarray(ex.data), rtol=1e-12)

    def test_cumsum_rejected(self):
        grid, u, _ = _cgrid()
        mesh = make_mesh({"x": 2}, devices=jax.devices()[:2])
        sg = ShardedGrid(grid, mesh, {"xc": "x", "xg": "x"})
        with pytest.raises(ValueError, match="cumsum"):
            sg.apply_many([dict(op="cumsum", args=sg.shard(u), axis="X")])


def test_apply_many_face_grid_z_batch_without_face_mapping():
    """apply_many on a face grid with only a NON-connected dim sharded
    (face dim unmapped) takes the ring route — faces are shard-local."""
    import numpy as _np

    n, nz = 8, 8
    _, fc = cubed_sphere_dataset(n=n)
    ds = Dataset(coords={
        "x": ("x", _np.arange(n) + 0.5, {"axis": "X"}),
        "xl": ("xl", _np.arange(n) * 1.0,
               {"axis": "X", "c_grid_axis_shift": -0.5}),
        "y": ("y", _np.arange(n) + 0.5, {"axis": "Y"}),
        "yl": ("yl", _np.arange(n) * 1.0,
               {"axis": "Y", "c_grid_axis_shift": -0.5}),
        "z": ("z", _np.arange(nz) * 1.0, {"axis": "Z"}),
        "face": ("face", _np.arange(6)),
    })
    grid = Grid(ds, face_connections=fc)
    rng = _np.random.RandomState(17)
    q = GriddedArray(rng.rand(6, nz, n, n), ("face", "z", "y", "x"),
                     name="q")
    mesh = make_mesh({"zm": 8})
    sg = ShardedGrid(grid, mesh, {"z": "zm"})
    sh = shard_gridded(q, mesh, {"z": "zm"})
    d_out, i_out = sg.apply_many([
        dict(op="diff", args=sh, axis="X", boundary="fill"),
        dict(op="interp", args=sh, axis="Y", boundary="fill"),
    ])
    np.testing.assert_allclose(
        np.asarray(d_out.data),
        np.asarray(grid.diff(q, "X", boundary="fill").data), rtol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(i_out.data),
        np.asarray(grid.interp(q, "Y", boundary="fill").data), rtol=1e-12,
    )
