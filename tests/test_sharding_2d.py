"""2D domain decomposition and autodiff-through-ops tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xgcm_tpu import Dataset, Grid, GriddedArray
from xgcm_tpu.parallel import make_mesh, shard_gridded, sharded_op

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

NX, NY = 32, 16


@pytest.fixture()
def grid():
    ds = Dataset(
        coords={
            "xc": ("xc", np.arange(NX, dtype=float)),
            "xg": ("xg", np.arange(NX, dtype=float)),
            "yc": ("yc", np.arange(NY, dtype=float)),
            "yg": ("yg", np.arange(NY, dtype=float)),
        }
    )
    return Grid(
        ds,
        coords={
            "X": {"center": "xc", "left": "xg"},
            "Y": {"center": "yc", "left": "yg"},
        },
        autoparse_metadata=False,
    )


def test_2d_decomposition_x_op(grid):
    """Both spatial dims sharded (4x2 mesh); diff along X must equal the
    single-device result — the 2D analog of the dask-vs-eager oracle."""
    mesh = make_mesh({"x": 4, "y": 2})
    a = np.random.rand(NY, NX)
    da = GriddedArray(a, ("yc", "xc"))
    expected = grid.diff(da, "X", boundary="fill")

    sharded = shard_gridded(da, mesh, {"xc": "x", "yc": "y"})
    out = sharded_op(
        grid, "diff", sharded, "X", mesh, {"xc": "x", "yc": "y"},
        boundary="fill",
    )
    np.testing.assert_allclose(np.asarray(out.data), np.asarray(expected.data))


def test_2d_decomposition_both_axes_sequential(grid):
    """Vorticity-style: op along X then along Y, both dims sharded."""
    mesh = make_mesh({"x": 4, "y": 2})
    a = np.random.rand(NY, NX)
    da = GriddedArray(a, ("yc", "xc"))
    spec = {"xc": "x", "yc": "y", "xg": "x", "yg": "y"}

    step1 = sharded_op(grid, "interp", shard_gridded(da, mesh, spec), "X",
                       mesh, spec, boundary="periodic")
    step2 = sharded_op(grid, "diff", step1, "Y", mesh, spec,
                       boundary="periodic")

    expected = grid.diff(
        grid.interp(da, "X", boundary="periodic"), "Y", boundary="periodic"
    )
    assert step2.dims == expected.dims
    np.testing.assert_allclose(
        np.asarray(step2.data), np.asarray(expected.data)
    )


class TestAutodiff:
    def test_grad_through_diff(self, grid):
        """Grid ops are differentiable: d/dx sum(diff(x)^2) matches a
        finite-difference check."""
        a = np.random.rand(NX)

        def loss(x):
            da = GriddedArray(x, ("xc",))
            d = grid.diff(da, "X", boundary="periodic")
            return jnp.sum(d.data**2)

        g = jax.grad(loss)(jnp.asarray(a))
        # finite differences need a dtype-scaled step and tolerance:
        # 1e-6 is noise in f32, and f32 roundoff in the loss is ~5e-4 of
        # the gradient at eps=1e-3
        import jax as _jax
        x64 = _jax.config.jax_enable_x64
        eps = 1e-6 if x64 else 1e-3
        fd_rtol = 1e-4 if x64 else 5e-3
        for i in [0, 5, NX - 1]:
            ap = a.copy()
            ap[i] += eps
            am = a.copy()
            am[i] -= eps
            fd = (float(loss(jnp.asarray(ap))) - float(loss(jnp.asarray(am)))) / (
                2 * eps
            )
            np.testing.assert_allclose(float(g[i]), fd, rtol=fd_rtol)

    def test_grad_through_transform(self):
        nz = 12
        ds = Dataset(coords={"zc": ("zc", np.arange(nz) + 0.5)})
        gridz = Grid(
            ds, coords={"Z": {"center": "zc"}}, periodic=False,
            autoparse_metadata=False,
        )
        theta = np.linspace(20, 28, nz)
        target = np.linspace(21, 27, 5)

        def loss(x):
            da = GriddedArray(x, ("zc",), name="q")
            out = gridz.transform(
                da, "Z", target,
                target_data=GriddedArray(theta, ("zc",), name="s"),
                mask_edges=False,
            )
            return jnp.sum(out.data)

        g = jax.grad(loss)(jnp.asarray(np.random.rand(nz)))
        assert np.all(np.isfinite(np.asarray(g)))
        # interpolation weights sum to the number of targets
        np.testing.assert_allclose(float(jnp.sum(g)), len(target), rtol=1e-6)

    def test_vmap_over_batch(self, grid):
        a = np.random.rand(5, NX)

        def one(x):
            return grid.interp(GriddedArray(x, ("xc",)), "X").data

        batched = jax.vmap(one)(jnp.asarray(a))
        for i in range(5):
            np.testing.assert_allclose(
                np.asarray(batched[i]), np.asarray(one(jnp.asarray(a[i])))
            )


def test_sharded_grid_proxy(grid):
    """ShardedGrid routes sharded core dims through the halo ring and
    matches the plain Grid everywhere."""
    from xgcm_tpu.parallel import ShardedGrid, make_mesh

    mesh = make_mesh({"x": 4})
    sgrid = ShardedGrid(grid, mesh, {"xc": "x", "xg": "x"})
    a = np.random.rand(NY, NX)
    da = sgrid.shard(GriddedArray(a, ("yc", "xc")))

    out = sgrid.diff(sgrid.interp(da, "X", boundary="extend"), "Y")
    expected = grid.diff(
        grid.interp(GriddedArray(a, ("yc", "xc")), "X", boundary="extend"), "Y"
    )
    assert out.dims == expected.dims
    np.testing.assert_allclose(np.asarray(out.data), np.asarray(expected.data))

    c = sgrid.cumsum(da, "X", to="left", boundary="fill")
    c_exp = grid.cumsum(GriddedArray(a, ("yc", "xc")), "X", to="left", boundary="fill")
    np.testing.assert_allclose(np.asarray(c.data), np.asarray(c_exp.data))


def test_sharded_grid_face_routing():
    """ShardedGrid routes ops on a face-sharded cubed sphere through the
    face-sharded halo exchange automatically."""
    import jax as _jax

    if len(_jax.devices()) < 6:
        pytest.skip("needs 6 devices")
    from xgcm_tpu.grids import cubed_sphere_grid
    from xgcm_tpu.parallel import ShardedGrid, make_mesh

    ds, cgrid = cubed_sphere_grid(n=8)
    mesh = make_mesh({"f": 6}, devices=_jax.devices()[:6])
    sgrid = ShardedGrid(cgrid, mesh, {"face": "f"})

    a = np.random.rand(6, 8, 8)
    da = sgrid.shard(GriddedArray(a, ("face", "y", "x")))
    out = sgrid.diff(da, "X", boundary="fill")
    expected = cgrid.diff(GriddedArray(a, ("face", "y", "x")), "X", boundary="fill")
    assert out.dims == expected.dims
    np.testing.assert_allclose(np.asarray(out.data), np.asarray(expected.data))


@pytest.mark.parametrize("op", ["min", "max"])
def test_sharded_grid_minmax(grid, op):
    from xgcm_tpu.parallel import ShardedGrid, make_mesh

    mesh = make_mesh({"x": 4})
    sgrid = ShardedGrid(grid, mesh, {"xc": "x", "xg": "x"})
    a = np.random.rand(NY, NX)
    da = sgrid.shard(GriddedArray(a, ("yc", "xc")))
    out = getattr(sgrid, op)(da, "X", boundary="extrapolate")
    expected = getattr(grid, op)(
        GriddedArray(a, ("yc", "xc")), "X", boundary="extrapolate"
    )
    np.testing.assert_allclose(np.asarray(out.data), np.asarray(expected.data))


def test_sharded_transform_matches_single_device():
    """Vertical transform with horizontal columns sharded (embarrassingly
    parallel under GSPMD): sharded == single-device."""
    from xgcm_tpu.parallel import make_mesh, shard_gridded

    nz, ncol = 10, 64
    ds = Dataset(coords={"zc": ("zc", np.arange(nz) + 0.5)})
    gridz = Grid(
        ds, coords={"Z": {"center": "zc"}}, periodic=False,
        autoparse_metadata=False,
    )
    rng = np.random.RandomState(0)
    data = rng.rand(ncol, nz)
    sigma = np.sort(rng.rand(ncol, nz), axis=-1) * 8 + 20
    target = np.linspace(21, 27, 5)

    def run(d, s):
        return gridz.transform(
            GriddedArray(d, ("col", "zc"), name="q"),
            "Z", target,
            target_data=GriddedArray(s, ("col", "zc"), name="sigma"),
            target_dim="sigma", mask_edges=False,
        ).data

    expected = run(data, sigma)

    mesh = make_mesh({"c": 8})
    d8 = shard_gridded(GriddedArray(data, ("col", "zc")), mesh, {"col": "c"})
    s8 = shard_gridded(GriddedArray(sigma, ("col", "zc")), mesh, {"col": "c"})
    out = jax.jit(run)(d8.data, s8.data)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-12)


def test_sharded_transform_multi_matches_single_device():
    """ShardedGrid.transform_multi with horizontal columns sharded equals
    the per-variable single-device transforms."""
    from xgcm_tpu.parallel import ShardedGrid, make_mesh, shard_gridded

    nz, ncol = 10, 64
    ds = Dataset(coords={"zc": ("zc", np.arange(nz) + 0.5)})
    gridz = Grid(
        ds, coords={"Z": {"center": "zc"}}, periodic=False,
        autoparse_metadata=False,
    )
    rng = np.random.RandomState(1)
    das = [rng.rand(ncol, nz) for _ in range(2)]
    sigma = np.sort(rng.rand(ncol, nz), axis=-1) * 8 + 20
    target = np.linspace(21, 27, 5)

    expected = [
        gridz.transform(
            GriddedArray(d, ("col", "zc"), name=f"q{i}"), "Z", target,
            target_data=GriddedArray(sigma, ("col", "zc"), name="sigma"),
            target_dim="sigma", mask_edges=False,
        )
        for i, d in enumerate(das)
    ]

    mesh = make_mesh({"c": 8})
    sgrid = ShardedGrid(gridz, mesh, {"col": "c"})
    sh = [
        shard_gridded(
            GriddedArray(d, ("col", "zc"), name=f"q{i}"), mesh, {"col": "c"}
        )
        for i, d in enumerate(das)
    ]
    s8 = shard_gridded(
        GriddedArray(sigma, ("col", "zc"), name="sigma"), mesh, {"col": "c"}
    )
    outs = sgrid.transform_multi(
        sh, "Z", target, target_data=s8, target_dim="sigma",
        mask_edges=False,
    )
    for o, e in zip(outs, expected):
        assert o.dims == e.dims
        np.testing.assert_allclose(
            np.asarray(o.data), np.asarray(e.data), rtol=1e-12
        )

    # transforming along a sharded dim refuses, like transform
    sgrid_z = ShardedGrid(gridz, mesh, {"zc": "c"})
    shz = shard_gridded(
        GriddedArray(das[0], ("col", "zc")), mesh, {"zc": "c"}
    )
    with pytest.raises(NotImplementedError):
        sgrid_z.transform_multi([shz], "Z", target,
                                target_data=s8, target_dim="sigma")


class TestPerShardTransform:
    """ShardedGrid.transform runs INSIDE shard_map over mesh-mapped column
    dims: zero collectives, per-shard kernels, results == single-device."""

    def _zgrid(self, nz):
        ds = Dataset(coords={
            "zc": ("zc", np.arange(nz) + 0.5),
            "zo": ("zo", np.arange(nz + 1) * 1.0),
        })
        return Grid(
            ds, coords={"Z": {"center": "zc", "outer": "zo"}},
            periodic=False, autoparse_metadata=False,
        )

    def test_single_transform_sharded_columns(self):
        from xgcm_tpu.parallel import ShardedGrid, make_mesh, shard_gridded

        nz, ncol = 10, 64
        gridz = self._zgrid(nz)
        rng = np.random.RandomState(5)
        q = GriddedArray(rng.rand(ncol, nz), ("col", "zc"), name="q")
        sigma = GriddedArray(
            np.sort(rng.rand(ncol, nz), -1) * 8 + 20, ("col", "zc"),
            name="sigma",
        )
        target = GriddedArray(
            np.linspace(21, 27, 5), ("sigma",), name="sigma"
        )
        expected = gridz.transform(q, "Z", target, target_data=sigma)

        mesh = make_mesh({"c": 8})
        sgrid = ShardedGrid(gridz, mesh, {"col": "c"})
        out = sgrid.transform(
            shard_gridded(q, mesh, {"col": "c"}), "Z", target,
            target_data=shard_gridded(sigma, mesh, {"col": "c"}),
        )
        assert out.dims == expected.dims
        assert out.name == expected.name
        np.testing.assert_allclose(
            np.asarray(out.data), np.asarray(expected.data), rtol=1e-12
        )

    def test_conservative_sharded_columns(self):
        from xgcm_tpu.parallel import ShardedGrid, make_mesh, shard_gridded

        nz, ncol = 10, 32
        gridz = self._zgrid(nz)
        rng = np.random.RandomState(6)
        q = GriddedArray(rng.rand(ncol, nz), ("col", "zc"), name="q")
        sigma_o = GriddedArray(
            np.sort(rng.rand(ncol, nz + 1), -1) * 8 + 20, ("col", "zo"),
            name="sigma",
        )
        bins = np.linspace(19, 29, 6)
        expected = gridz.transform(
            q, "Z", bins, target_data=sigma_o, target_dim="sigma",
            method="conservative",
        )
        mesh = make_mesh({"c": 8})
        sgrid = ShardedGrid(gridz, mesh, {"col": "c"})
        out = sgrid.transform(
            shard_gridded(q, mesh, {"col": "c"}), "Z", bins,
            target_data=shard_gridded(sigma_o, mesh, {"col": "c"}),
            target_dim="sigma", method="conservative",
        )
        assert out.dims == expected.dims
        np.testing.assert_allclose(
            np.asarray(out.data), np.asarray(expected.data), rtol=1e-12
        )

    def test_zero_collectives(self):
        """The per-shard transform issues NO collectives — the budget that
        distinguishes it from GSPMD's unplanned gathers."""
        from xgcm_tpu.parallel import ShardedGrid, make_mesh
        from xgcm_tpu.utils import count_collectives

        nz, ncol = 10, 64
        gridz = self._zgrid(nz)
        rng = np.random.RandomState(7)
        mesh = make_mesh({"c": 8})
        sgrid = ShardedGrid(gridz, mesh, {"col": "c"})
        q = GriddedArray(rng.rand(ncol, nz), ("col", "zc"), name="q")
        sigma = GriddedArray(
            np.sort(rng.rand(ncol, nz), -1) * 8 + 20, ("col", "zc"),
            name="sigma",
        )
        target = np.linspace(21, 27, 5)

        def f(qd, sd):
            return sgrid.transform(
                GriddedArray(qd, q.dims, name="q"), "Z", target,
                target_data=GriddedArray(sd, sigma.dims, name="sigma"),
                target_dim="sigma",
            ).data

        counts = count_collectives(f, q.data, sigma.data)
        assert counts["total"] == 0, counts

    def test_face_sharded_columns(self):
        """Transform of face-sharded data: faces are just more columns."""
        from xgcm_tpu.parallel import ShardedGrid, make_mesh, shard_gridded

        from .datasets import cubed_sphere_dataset

        n, nz = 4, 6
        _, fc = cubed_sphere_dataset(n=n)
        rng = np.random.RandomState(8)
        ds = Dataset(coords={
            "x": ("x", np.arange(n) + 0.5, {"axis": "X"}),
            "y": ("y", np.arange(n) + 0.5, {"axis": "Y"}),
            "zc": ("zc", np.arange(nz) + 0.5, {"axis": "Z"}),
            "face": ("face", np.arange(6)),
        })
        gridf = Grid(ds, periodic=False, autoparse_metadata=False,
                     coords={"X": {"center": "x"}, "Y": {"center": "y"},
                             "Z": {"center": "zc"}},
                     face_connections=fc)
        q = GriddedArray(
            rng.rand(6, nz, n, n), ("face", "zc", "y", "x"), name="q"
        )
        sigma = GriddedArray(
            np.sort(rng.rand(6, nz, n, n), axis=1) * 8 + 20,
            ("face", "zc", "y", "x"), name="sigma",
        )
        target = np.linspace(21, 27, 5)
        expected = gridf.transform(
            q, "Z", target, target_data=sigma, target_dim="sigma"
        )
        mesh = make_mesh({"f": 2, "ym": 4})
        sgrid = ShardedGrid(gridf, mesh, {"face": "f", "y": "ym"})
        out = sgrid.transform(
            shard_gridded(q, mesh, {"face": "f", "y": "ym"}), "Z", target,
            target_data=shard_gridded(sigma, mesh, {"face": "f", "y": "ym"}),
            target_dim="sigma",
        )
        assert out.dims == expected.dims
        np.testing.assert_allclose(
            np.asarray(out.data), np.asarray(expected.data), rtol=1e-12
        )

    def test_columns_first_layout_sharded(self):
        """(zc, col) columns-first input with col sharded: the layout
        contract yields (sigma, col) and the per-shard path preserves it."""
        from xgcm_tpu.parallel import ShardedGrid, make_mesh, shard_gridded

        nz, ncol = 10, 64
        gridz = self._zgrid(nz)
        rng = np.random.RandomState(9)
        qT = GriddedArray(rng.rand(nz, ncol), ("zc", "col"), name="q")
        sigT = GriddedArray(
            np.sort(rng.rand(nz, ncol), 0) * 8 + 20, ("zc", "col"),
            name="sigma",
        )
        target = GriddedArray(
            np.linspace(21, 27, 5), ("sigma",), name="sigma"
        )
        expected = gridz.transform(qT, "Z", target, target_data=sigT)
        assert expected.dims == ("sigma", "col")  # the layout contract
        mesh = make_mesh({"c": 8})
        sgrid = ShardedGrid(gridz, mesh, {"col": "c"})
        out = sgrid.transform(
            shard_gridded(qT, mesh, {"col": "c"}), "Z", target,
            target_data=shard_gridded(sigT, mesh, {"col": "c"}),
        )
        assert out.dims == ("sigma", "col")
        np.testing.assert_allclose(
            np.asarray(out.data), np.asarray(expected.data), rtol=1e-12
        )

    def test_log_method_and_default_target_data(self):
        from xgcm_tpu.parallel import ShardedGrid, make_mesh, shard_gridded

        nz, ncol = 10, 64
        gridz = self._zgrid(nz)
        rng = np.random.RandomState(10)
        q = GriddedArray(rng.rand(ncol, nz), ("col", "zc"), name="q")
        sigma = GriddedArray(
            np.sort(rng.rand(ncol, nz), -1) * 8 + 20, ("col", "zc"),
            name="sigma",
        )
        mesh = make_mesh({"c": 8})
        sgrid = ShardedGrid(gridz, mesh, {"col": "c"})
        q_sh = shard_gridded(q, mesh, {"col": "c"})
        s_sh = shard_gridded(sigma, mesh, {"col": "c"})
        # log method
        e_log = gridz.transform(
            q, "Z", np.linspace(21, 27, 5), target_data=sigma,
            target_dim="sigma", method="log",
        )
        o_log = sgrid.transform(
            q_sh, "Z", np.linspace(21, 27, 5), target_data=s_sh,
            target_dim="sigma", method="log",
        )
        np.testing.assert_allclose(
            np.asarray(o_log.data), np.asarray(e_log.data), rtol=1e-12
        )
        # target_data=None resolves to the axis coordinate inside the
        # shard (grid coords ride the closure as replicated constants)
        t2 = np.linspace(1.5, 8.5, 4)
        e_def = gridz.transform(q, "Z", t2)
        o_def = sgrid.transform(q_sh, "Z", t2)
        assert o_def.dims == e_def.dims
        np.testing.assert_allclose(
            np.asarray(o_def.data), np.asarray(e_def.data), rtol=1e-12
        )


class TestBatchShardedOps:
    """Ops whose sharded dims are pure batch dims run inside shard_map
    with zero collectives (per-shard Pallas on multichip TPU)."""

    def test_batch_sharded_diff_matches_and_is_collective_free(self):
        from xgcm_tpu.parallel import ShardedGrid, make_mesh, shard_gridded
        from xgcm_tpu.utils import count_collectives

        nz, ny, nx = 8, 8, 16
        ds = Dataset(coords={
            "xc": ("xc", np.arange(nx) + 0.5, {"axis": "X"}),
            "xg": ("xg", np.arange(nx) * 1.0,
                   {"axis": "X", "c_grid_axis_shift": -0.5}),
            "z": ("z", np.arange(nz) * 1.0, {"axis": "Z"}),
        })
        grid2 = Grid(ds)
        rng = np.random.RandomState(11)
        q = GriddedArray(rng.rand(nz, ny, nx), ("z", "yb", "xc"), name="q")
        mesh = make_mesh({"zm": 8})
        sg = ShardedGrid(grid2, mesh, {"z": "zm"})
        q_sh = shard_gridded(q, mesh, {"z": "zm"})
        expected = grid2.diff(q, "X", boundary="fill")
        out = sg.diff(q_sh, "X", boundary="fill")
        assert out.dims == expected.dims
        np.testing.assert_allclose(
            np.asarray(out.data), np.asarray(expected.data), rtol=1e-12
        )
        counts = count_collectives(
            lambda d: sg.diff(
                GriddedArray(d, q.dims, name="q"), "X", boundary="fill"
            ).data,
            q.data,
        )
        assert counts["total"] == 0, counts
        # cumsum along the unsharded dim is also shard-local
        e_c = grid2.cumsum(q, "X", boundary="fill")
        o_c = sg.cumsum(q_sh, "X", boundary="fill")
        np.testing.assert_allclose(
            np.asarray(o_c.data), np.asarray(e_c.data), rtol=1e-12
        )

    def test_face_inface_sharding_stays_gspmd(self):
        """A sharded face-connected in-face dim is NOT batch-safe (rotated
        halos cross shards): the op must keep the GSPMD fall-through and
        stay correct."""
        from .datasets import cubed_sphere_dataset
        from xgcm_tpu.parallel import ShardedGrid, make_mesh, shard_gridded

        ds, fc = cubed_sphere_dataset(n=8)
        grid2 = Grid(ds, face_connections=fc)
        da = ds["data_c"]
        mesh = make_mesh({"ym": 8})
        # face dim NOT sharded; y (in-face, rotation target) sharded
        sg = ShardedGrid(grid2, mesh, {"y": "ym"})
        assert not sg._batch_safe_dims(
            da.dims, grid2.axes["X"].coords.values()
        )
        out = sg.diff(
            shard_gridded(da, mesh, {"y": "ym"}), "X", boundary="fill"
        )
        expected = grid2.diff(da, "X", boundary="fill")
        np.testing.assert_allclose(
            np.asarray(out.data), np.asarray(expected.data), rtol=1e-12
        )

    def test_z_batch_on_face_grid_is_shard_local(self):
        """A sharded NON-connected dim (z) on a face grid IS batch-safe."""
        from .datasets import cubed_sphere_dataset
        from xgcm_tpu.parallel import ShardedGrid, make_mesh, shard_gridded
        from xgcm_tpu.utils import count_collectives

        n, nz = 4, 8
        _, fc = cubed_sphere_dataset(n=n)
        ds = Dataset(coords={
            "x": ("x", np.arange(n) + 0.5, {"axis": "X"}),
            "xl": ("xl", np.arange(n) * 1.0,
                   {"axis": "X", "c_grid_axis_shift": -0.5}),
            "y": ("y", np.arange(n) + 0.5, {"axis": "Y"}),
            "yl": ("yl", np.arange(n) * 1.0,
                   {"axis": "Y", "c_grid_axis_shift": -0.5}),
            "z": ("z", np.arange(nz) * 1.0, {"axis": "Z"}),
            "face": ("face", np.arange(6)),
        })
        gridf = Grid(ds, face_connections=fc)
        rng = np.random.RandomState(12)
        q = GriddedArray(
            rng.rand(6, nz, n, n), ("face", "z", "y", "x"), name="q"
        )
        mesh = make_mesh({"zm": 8})
        sg = ShardedGrid(gridf, mesh, {"z": "zm"})
        q_sh = shard_gridded(q, mesh, {"z": "zm"})
        expected = gridf.diff(q, "X", boundary="fill")
        out = sg.diff(q_sh, "X", boundary="fill")
        np.testing.assert_allclose(
            np.asarray(out.data), np.asarray(expected.data), rtol=1e-12
        )
        counts = count_collectives(
            lambda d: sg.diff(
                GriddedArray(d, q.dims, name="q"), "X", boundary="fill"
            ).data,
            q.data,
        )
        assert counts["total"] == 0, counts


def test_per_column_2d_target_sharded():
    """A spatially varying (col, m) target rides the column sharding."""
    from xgcm_tpu.parallel import ShardedGrid, make_mesh, shard_gridded

    nz, ncol, m = 10, 64, 5
    ds = Dataset(coords={
        "zc": ("zc", np.arange(nz) + 0.5),
        "zo": ("zo", np.arange(nz + 1) * 1.0),
    })
    gridz = Grid(
        ds, coords={"Z": {"center": "zc", "outer": "zo"}},
        periodic=False, autoparse_metadata=False,
    )
    rng = np.random.RandomState(13)
    q = GriddedArray(rng.rand(ncol, nz), ("col", "zc"), name="q")
    sigma = GriddedArray(
        np.sort(rng.rand(ncol, nz), -1) * 8 + 20, ("col", "zc"),
        name="sigma",
    )
    tgt2d = GriddedArray(
        np.sort(rng.rand(ncol, m), -1) * 6 + 21, ("col", "sigma"),
        name="sigma",
    )
    expected = gridz.transform(
        q, "Z", tgt2d, target_data=sigma, target_dim="sigma",
    )
    mesh = make_mesh({"c": 8})
    sgrid = ShardedGrid(gridz, mesh, {"col": "c"})
    out = sgrid.transform(
        shard_gridded(q, mesh, {"col": "c"}), "Z",
        shard_gridded(tgt2d, mesh, {"col": "c"}),
        target_data=shard_gridded(sigma, mesh, {"col": "c"}),
        target_dim="sigma",
    )
    assert out.dims == expected.dims
    np.testing.assert_allclose(
        np.asarray(out.data), np.asarray(expected.data), rtol=1e-12
    )


def test_custom_ufunc_batch_only_sharding():
    """A custom ufunc whose sharded dims are pure batch dims routes
    through the engine-inside-shard_map: equal results, zero collectives."""
    from xgcm_tpu.parallel import ShardedGrid, make_mesh, shard_gridded
    from xgcm_tpu.utils import count_collectives

    nz, ny, nx = 8, 8, 16
    ds = Dataset(coords={
        "xc": ("xc", np.arange(nx) + 0.5, {"axis": "X"}),
        "xg": ("xg", np.arange(nx) * 1.0,
               {"axis": "X", "c_grid_axis_shift": -0.5}),
        "z": ("z", np.arange(nz) * 1.0, {"axis": "Z"}),
    })
    grid2 = Grid(ds)
    rng = np.random.RandomState(14)
    q = GriddedArray(rng.rand(nz, ny, nx), ("z", "yb", "xc"), name="q")

    def sm3(a):
        return (a[..., :-2] + a[..., 1:-1] + a[..., 2:]) / 3.0

    kw = dict(axis=[("X",)], signature="(X:center)->(X:center)",
              boundary_width={"X": (1, 1)}, boundary="extend")
    mesh = make_mesh({"zm": 8})
    sg = ShardedGrid(grid2, mesh, {"z": "zm"})
    q_sh = shard_gridded(q, mesh, {"z": "zm"})
    e = grid2.apply_as_grid_ufunc(sm3, q, **kw)
    o = sg.apply_as_grid_ufunc(sm3, q_sh, **kw)
    assert o.dims == e.dims
    np.testing.assert_allclose(
        np.asarray(o.data), np.asarray(e.data), rtol=1e-12
    )
    cc = count_collectives(
        lambda d: sg.apply_as_grid_ufunc(
            sm3, GriddedArray(d, q.dims, name="q"), **kw
        ).data,
        q.data,
    )
    assert cc["total"] == 0, cc


def test_custom_ufunc_batch_sharding_on_face_grid_without_face_mapped():
    """Face grid, face dim NOT mesh-mapped, z batch-sharded: the custom
    ufunc runs per shard (regression: this briefly raised the engine's
    face-dim-required error)."""
    from .datasets import cubed_sphere_dataset
    from xgcm_tpu.parallel import ShardedGrid, make_mesh, shard_gridded
    from xgcm_tpu.utils import count_collectives

    n, nz = 4, 8
    _, fc = cubed_sphere_dataset(n=n)
    ds = Dataset(coords={
        "x": ("x", np.arange(n) + 0.5, {"axis": "X"}),
        "xl": ("xl", np.arange(n) * 1.0,
               {"axis": "X", "c_grid_axis_shift": -0.5}),
        "y": ("y", np.arange(n) + 0.5, {"axis": "Y"}),
        "yl": ("yl", np.arange(n) * 1.0,
               {"axis": "Y", "c_grid_axis_shift": -0.5}),
        "z": ("z", np.arange(nz) * 1.0, {"axis": "Z"}),
        "face": ("face", np.arange(6)),
    })
    gridf = Grid(ds, face_connections=fc)
    rng = np.random.RandomState(15)
    q = GriddedArray(
        rng.rand(6, nz, n, n), ("face", "z", "y", "x"), name="q"
    )

    def sm3(a):
        return (a[..., :-2] + a[..., 1:-1] + a[..., 2:]) / 3.0

    kw = dict(axis=[("X",)], signature="(X:center)->(X:center)",
              boundary_width={"X": (1, 1)}, boundary="fill")
    mesh = make_mesh({"zm": 8})
    sg = ShardedGrid(gridf, mesh, {"z": "zm"})
    q_sh = shard_gridded(q, mesh, {"z": "zm"})
    e = gridf.apply_as_grid_ufunc(sm3, q, **kw)
    o = sg.apply_as_grid_ufunc(sm3, q_sh, **kw)
    assert o.dims == e.dims
    np.testing.assert_allclose(
        np.asarray(o.data), np.asarray(e.data), rtol=1e-12
    )
    cc = count_collectives(
        lambda d: sg.apply_as_grid_ufunc(
            sm3, GriddedArray(d, q.dims, name="q"), **kw
        ).data,
        q.data,
    )
    assert cc["total"] == 0, cc
