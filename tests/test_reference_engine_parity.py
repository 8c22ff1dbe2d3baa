"""Grid-ufunc engine tests ported by exact reference name
(/root/reference/xgcm/test/test_grid_ufunc.py:297-1307): application with and
without padding, manual in-ufunc padding, pad-after-func (cumsum), bound
boundary kwargs, and the reference's dask/map_overlap coverage mapped onto
the TPU analogs (jit tracing for laziness; mesh-sharded execution via GSPMD
or the explicit shard_map engine for chunked dims — SURVEY.md §2 #16/#17).

Strict improvements over the reference, noted per test:

- ``test_input_on_wrong_positions`` is xfail in the reference ("changed the
  test fixture"); ours passes against the real error messages.
- ``test_chunked_non_core_dims`` / ``test_chunked_core_dims_overlap_turned_off``
  are empty ``...`` stubs in the reference; here they are real tests.
- ``test_num_tasks_regression`` is an xfail NotImplementedError stub in the
  reference; here it pins the sharded diff's collective count.
- ``test_gave_axis_but_no_corresponding_boundary_width`` is xfail in the
  reference (TODO "should default to zero"); our engine does default missing
  axes to zero width, so it passes.
- ``test_only_some_core_dims_are_chunked`` is skipped in the reference; our
  sharded engine supports mixed sharded+local core dims, so it runs.
- ``TestDaskOverlap.test_multiple_outputs`` expects NotImplementedError in
  the reference (map_overlap can't do multi-output); our shard_map engine
  supports it, so the test asserts correct results instead.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from typing import Annotated, Tuple

from xgcm_tpu import (
    Dataset,
    Grid,
    GriddedArray,
    apply_as_grid_ufunc,
    as_grid_ufunc,
)
from xgcm_tpu.core.grid_ufunc import GridUFunc
from xgcm_tpu.parallel import (
    ShardedGrid,
    make_mesh,
    shard_gridded,
    sharded_apply_as_grid_ufunc,
)
from xgcm_tpu.utils import count_collectives


def create_1d_test_grid_ds(ax_name, length=9):
    """Native port of the reference fixture (test_grid_ufunc.py:219-252):
    all five positions on one axis."""
    return Dataset(
        coords={
            f"{ax_name}_c": (f"{ax_name}_c", np.arange(1.0, length + 1)),
            f"{ax_name}_g": (f"{ax_name}_g", np.arange(0.5, length)),
            f"{ax_name}_r": (f"{ax_name}_r", np.arange(1.5, length + 1)),
            f"{ax_name}_i": (f"{ax_name}_i", np.arange(1.5, length)),
            f"{ax_name}_o": (f"{ax_name}_o", np.arange(0.5, length + 1)),
        }
    )


def _coords_for(ax_name):
    return {
        ax_name: {
            "center": f"{ax_name}_c",
            "left": f"{ax_name}_g",
            "right": f"{ax_name}_r",
            "inner": f"{ax_name}_i",
            "outer": f"{ax_name}_o",
        }
    }


def create_1d_test_grid(ax_name, length=9):
    return Grid(
        create_1d_test_grid_ds(ax_name, length),
        coords=_coords_for(ax_name),
        autoparse_metadata=False,
    )


def create_2d_test_grid(ax_name_1, ax_name_2, length1=9, length2=11):
    ds1 = create_1d_test_grid_ds(ax_name_1, length1)
    ds2 = create_1d_test_grid_ds(ax_name_2, length2)
    merged = Dataset(coords={**ds1.coords, **ds2.coords})
    return Grid(
        merged,
        coords={**_coords_for(ax_name_1), **_coords_for(ax_name_2)},
        autoparse_metadata=False,
    )


class TestGridUFuncNoPadding:
    def test_input_on_wrong_positions(self):
        # xfail in the reference; passes here against our engine's errors.
        grid = create_1d_test_grid("depth")
        grid_no_outer = Grid(
            Dataset(
                coords={
                    "depth_c": ("depth_c", np.arange(1.0, 10)),
                    "depth_g": ("depth_g", np.arange(0.5, 9)),
                }
            ),
            coords={"depth": {"center": "depth_c", "left": "depth_g"}},
            autoparse_metadata=False,
        )
        da_g = GriddedArray(np.sin(np.arange(0.5, 9) * 2 * np.pi / 9), ("depth_g",))

        with pytest.raises(ValueError, match="does not exist in grid"):
            apply_as_grid_ufunc(
                lambda x: x,
                da_g,
                axis=[("depth",)],
                grid=grid_no_outer,
                signature="(X:outer)->()",
            )

        with pytest.raises(ValueError, match="Mismatch between signature"):
            apply_as_grid_ufunc(
                lambda x: x,
                da_g,
                axis=[("depth",)],
                grid=grid,
                signature="(X:center)->()",
            )

    def test_1d_unchanging_size_no_dask(self):
        def diff_center_to_left(a):
            return a - np.roll(a, shift=-1, axis=-1)

        grid = create_1d_test_grid("depth")
        a = np.sin(np.arange(1.0, 10) * 2 * np.pi / 9)
        da = GriddedArray(a, ("depth_c",))

        expected = a - np.roll(a, -1)

        # Test direct application
        result = apply_as_grid_ufunc(
            diff_center_to_left,
            da,
            axis=[("depth",)],
            grid=grid,
            signature="(X:center)->(X:left)",
        )
        assert result.dims == ("depth_g",)
        np.testing.assert_allclose(np.asarray(result.data), expected)

        # Test Grid method
        result = grid.apply_as_grid_ufunc(
            diff_center_to_left,
            da,
            axis=[("depth",)],
            signature="(X:center)->(X:left)",
        )
        np.testing.assert_allclose(np.asarray(result.data), expected)

        # Test decorator
        @as_grid_ufunc()
        def diff_center_to_left(
            a: Annotated[np.ndarray, "X:center"],
        ) -> Annotated[np.ndarray, "X:left"]:
            return a - np.roll(a, shift=-1, axis=-1)

        result = diff_center_to_left(grid, da, axis=[("depth",)])
        np.testing.assert_allclose(np.asarray(result.data), expected)

    def test_1d_changing_size_dask_parallelized(self):
        # dask="parallelized" (lazy graph execution) maps to jit tracing here.
        def interp_center_to_inner(a):
            return 0.5 * (a[..., :-1] + a[..., 1:])

        grid = create_1d_test_grid("depth")
        a = np.arange(10.0, 19.0)
        da = GriddedArray(a, ("depth_c",))
        expected = 0.5 * (a[:-1] + a[1:])

        # Test direct application (eager)
        result = apply_as_grid_ufunc(
            interp_center_to_inner,
            da,
            axis=[("depth",)],
            grid=grid,
            signature="(X:center)->(X:inner)",
            dask="parallelized",
        )
        assert result.dims == ("depth_i",)
        np.testing.assert_allclose(np.asarray(result.data), expected)

        # Test Grid method, under jit (the lazy-execution analog)
        @jax.jit
        def f(x):
            return grid.apply_as_grid_ufunc(
                interp_center_to_inner,
                GriddedArray(x, ("depth_c",)),
                axis=[("depth",)],
                signature="(X:center)->(X:inner)",
            ).data

        np.testing.assert_allclose(np.asarray(f(a)), expected)

        # Test decorator
        @as_grid_ufunc(dask="parallelized")
        def interp_center_to_inner(
            a: Annotated[np.ndarray, "X:center"],
        ) -> Annotated[np.ndarray, "X:inner"]:
            return 0.5 * (a[..., :-1] + a[..., 1:])

        result = interp_center_to_inner(grid, da, axis=[("depth",)])
        np.testing.assert_allclose(np.asarray(result.data), expected)

    def test_1d_overlap_dask_allowed(self):
        # The reference wraps the kernel in dask map_overlap; the TPU analog
        # is the explicit shard_map halo-exchange engine, asserted identical
        # to the eager engine (the dask-vs-eager oracle, SURVEY.md §4).
        def diff_center_to_left(a):
            return a[..., :-1] - a[..., 1:]

        n = 16
        grid = create_1d_test_grid("depth", length=n)
        a = np.sin(np.arange(1.0, n + 1) * 2 * np.pi / n)
        da = GriddedArray(a, ("depth_c",))
        expected = a - np.roll(a, -1)

        eager = apply_as_grid_ufunc(
            diff_center_to_left,
            da,
            axis=[("depth",)],
            grid=grid,
            signature="(X:center)->(X:left)",
            boundary_width={"X": (0, 1)},
        )
        np.testing.assert_allclose(np.asarray(eager.data), expected)

        mesh = make_mesh({"x": 4}, devices=jax.devices()[:4])
        sharded = sharded_apply_as_grid_ufunc(
            diff_center_to_left,
            da,
            axis=[("depth",)],
            grid=grid,
            signature="(X:center)->(X:left)",
            mesh=mesh,
            dim_to_mesh_axis={"depth_c": "x", "depth_g": "x"},
            boundary_width={"X": (0, 1)},
        )
        assert sharded.dims == ("depth_g",)
        np.testing.assert_array_equal(np.asarray(sharded.data), np.asarray(eager.data))

    def test_multiple_inputs(self):
        def inner_product_left_right(a, b):
            return jnp.inner(a, b)

        grid = create_1d_test_grid("depth")
        av = np.sin(np.arange(0.5, 9) * 2 * np.pi / 9)
        bv = np.cos(np.arange(1.5, 10) * 2 * np.pi / 9)
        a = GriddedArray(av, ("depth_g",))
        b = GriddedArray(bv, ("depth_r",))

        expected = np.inner(av, bv)

        # Test direct application
        result = apply_as_grid_ufunc(
            inner_product_left_right,
            a,
            b,
            axis=[("depth",), ("depth",)],
            grid=grid,
            signature="(X:left),(X:right)->()",
        )
        np.testing.assert_allclose(np.asarray(result.data), expected)

        # Test Grid method
        result = grid.apply_as_grid_ufunc(
            inner_product_left_right,
            a,
            b,
            axis=[("depth",), ("depth",)],
            signature="(X:left),(X:right)->()",
        )
        np.testing.assert_allclose(np.asarray(result.data), expected)

        # Test decorator (no return annotation -> scalar output)
        @as_grid_ufunc()
        def inner_product_left_right(
            a: Annotated[np.ndarray, "X:left"], b: Annotated[np.ndarray, "X:right"]
        ):
            return jnp.inner(a, b)

        result = inner_product_left_right(
            grid, a, b, axis=[("depth",), ("depth",)]
        )
        np.testing.assert_allclose(np.asarray(result.data), expected)

    def test_multiple_outputs(self):
        def diff_center_to_inner(a, axis):
            result = a - np.roll(a, shift=1, axis=axis)
            return np.delete(result, 0, axis)

        def grad_to_inner(a):
            return diff_center_to_inner(a, axis=-2), diff_center_to_inner(a, axis=-1)

        grid = create_2d_test_grid("lon", "lat")

        lon_c = np.arange(1.0, 10)
        lat_c = np.arange(1.0, 12)
        a = GriddedArray(
            np.add.outer(lon_c**2, lat_c**2), ("lon_c", "lat_c")
        )

        # d(lon^2)/dlon at inner = 2*lon_i; d(lat^2)/dlat at inner = 2*lat_i
        expected_u = np.broadcast_to(
            2 * np.arange(1.5, 9)[:, None], (8, 11)
        )
        expected_v = np.broadcast_to(2 * np.arange(1.5, 11)[None, :], (9, 10))

        # Test direct application
        u, v = apply_as_grid_ufunc(
            grad_to_inner,
            a,
            axis=[("lon", "lat")],
            grid=grid,
            signature="(X:center,Y:center)->(X:inner,Y:center),(X:center,Y:inner)",
        )
        assert u.dims == ("lon_i", "lat_c")
        assert v.dims == ("lon_c", "lat_i")
        np.testing.assert_allclose(np.asarray(u.data), expected_u)
        np.testing.assert_allclose(np.asarray(v.data), expected_v)

        # Test Grid method
        u, v = grid.apply_as_grid_ufunc(
            grad_to_inner,
            a,
            axis=[("lon", "lat")],
            signature="(X:center,Y:center)->(X:inner,Y:center),(X:center,Y:inner)",
        )
        np.testing.assert_allclose(np.asarray(u.data), expected_u)
        np.testing.assert_allclose(np.asarray(v.data), expected_v)

        # Test decorator
        @as_grid_ufunc()
        def grad_to_inner(
            a: Annotated[np.ndarray, "X:center,Y:center"],
        ) -> Tuple[
            Annotated[np.ndarray, "X:inner,Y:center"],
            Annotated[np.ndarray, "X:center,Y:inner"],
        ]:
            return diff_center_to_inner(a, axis=-2), diff_center_to_inner(a, axis=-1)

        u, v = grad_to_inner(grid, a, axis=[("lon", "lat")])
        np.testing.assert_allclose(np.asarray(u.data), expected_u)
        np.testing.assert_allclose(np.asarray(v.data), expected_v)


class TestGridUfuncWithPadding:
    def test_1d_padded_but_no_change_in_grid_position(self):
        def diff_center_to_center_second_order(a):
            return 0.5 * (a[..., 2:] - a[..., :-2])

        grid = create_1d_test_grid("depth")
        a = np.sin(np.arange(1.0, 10) * 2 * np.pi / 9)
        da = GriddedArray(a, ("depth_c",))

        expected = 0.5 * (a - np.roll(a, 2))

        result = apply_as_grid_ufunc(
            diff_center_to_center_second_order,
            da,
            axis=[("depth",)],
            grid=grid,
            signature="(X:center)->(X:center)",
            boundary_width={"X": (2, 0)},
        )
        assert result.dims == ("depth_c",)
        np.testing.assert_allclose(np.asarray(result.data), expected)

    def test_1d_unchanging_size_but_padded_dask_parallelized(self):
        """GH #430 analog: padding a core dim must not change the result when
        the computation is staged lazily (jit) rather than eagerly."""

        def diff_center_to_left(a):
            return a[..., 1:] - a[..., :-1]

        grid = create_1d_test_grid("depth")
        a = np.sin(np.arange(1.0, 10) * 2 * np.pi / 9)
        da = GriddedArray(a, ("depth_c",))

        expected = a - np.roll(a, 1)

        # Test direct application
        result = apply_as_grid_ufunc(
            diff_center_to_left,
            da,
            axis=[("depth",)],
            grid=grid,
            signature="(X:center)->(X:left)",
            boundary_width={"X": (1, 0)},
            dask="parallelized",
        )
        np.testing.assert_allclose(np.asarray(result.data), expected)

        # Test Grid method under jit
        @jax.jit
        def f(x):
            return grid.apply_as_grid_ufunc(
                diff_center_to_left,
                GriddedArray(x, ("depth_c",)),
                axis=[("depth",)],
                signature="(X:center)->(X:left)",
                boundary_width={"X": (1, 0)},
            ).data

        np.testing.assert_allclose(np.asarray(f(a)), expected)

        # Test decorator
        @as_grid_ufunc(
            "(X:center)->(X:left)",
            boundary_width={"X": (1, 0)},
            dask="parallelized",
        )
        def diff_center_to_left(a):
            return a[..., 1:] - a[..., :-1]

        result = diff_center_to_left(grid, da, axis=[("depth",)])
        np.testing.assert_allclose(np.asarray(result.data), expected)

    def test_2d_padding(self):
        def diff(a, axis):
            sl_hi = [slice(None)] * a.ndim
            sl_lo = [slice(None)] * a.ndim
            sl_hi[axis] = slice(1, None)
            sl_lo[axis] = slice(None, -1)
            return a[tuple(sl_hi)] - a[tuple(sl_lo)]

        def vort(u, v):
            """Returns an array 1 element smaller along both axis -1 & -2."""
            u_trimmed = u[..., 1:, :]
            v_trimmed = v[..., 1:]
            v_diff = diff(v_trimmed, axis=-2)
            u_diff = diff(u_trimmed, axis=-1)
            return v_diff - u_diff

        grid = create_2d_test_grid("lon", "lat")

        lon_g = np.arange(0.5, 9)
        lon_c = np.arange(1.0, 10)
        lat_g = np.arange(0.5, 11)
        lat_c = np.arange(1.0, 12)
        U = np.add.outer(lon_g**2, lat_c**3)
        V = np.add.outer(lon_c**3, lat_g**2)

        expected = (V - np.roll(V, 1, axis=0)) - (U - np.roll(U, 1, axis=1))

        result = grid.apply_as_grid_ufunc(
            vort,
            GriddedArray(U, ("lon_g", "lat_c")),
            GriddedArray(V, ("lon_c", "lat_g")),
            axis=2 * [("lon", "lat")],
            signature=(
                "(lon:left,lat:center),(lon:center,lat:left)->(lon:left,lat:left)"
            ),
            boundary_width={"lon": (1, 0), "lat": (1, 0)},
            dask="parallelized",
        )
        assert result.dims == ("lon_g", "lat_g")
        np.testing.assert_allclose(np.asarray(result.data), expected)


class TestPadManuallyInsideUfunc:
    """Tests that we can set boundary_width=None and instead manually pad
    inside the applied ufunc."""

    def test_1d_padded_but_no_change_in_grid_position(self):
        def diff_center_to_center_second_order(a):
            b = a[..., 2:]
            c = a[..., :-2]
            return 0.5 * (b - c)

        grid = create_1d_test_grid("depth")
        a = np.arange(1.0, 10) ** 2
        da = GriddedArray(a, ("depth_c",))

        expected = 0.5 * (a - np.roll(a, 2))

        def pad_args(func, pad_width):
            def padding_version_of_func(*args):
                padded_args = [
                    np.pad(np.asarray(x), pad_width=pad_width, mode="wrap")
                    for x in args
                ]
                return func(*padded_args)

            return padding_version_of_func

        result = apply_as_grid_ufunc(
            pad_args(diff_center_to_center_second_order, pad_width=[(2, 0)]),
            da,
            axis=[("depth",)],
            grid=grid,
            signature="(X:center)->(X:center)",
            boundary_width=None,
        )
        assert result.dims == ("depth_c",)
        np.testing.assert_allclose(np.asarray(result.data), expected)


class TestPadAfterUFunc:
    def _expected_cumsum_to_left(self, a):
        cum = np.roll(np.cumsum(a), 1)
        cum[0] = 0
        return cum

    def test_cumsum_dask(self):
        # dask="allowed" (lazy) maps to jit tracing of the pad-after path.
        def cumsum_center_to_left(a):
            return jnp.cumsum(a, axis=-1)[..., :-1]

        grid = create_1d_test_grid("depth")
        a = np.arange(1.0, 10) ** 2
        expected = self._expected_cumsum_to_left(a)

        @jax.jit
        def f(x):
            return apply_as_grid_ufunc(
                cumsum_center_to_left,
                GriddedArray(x, ("depth_c",)),
                axis=[("depth",)],
                grid=grid,
                signature="(X:center)->(X:left)",
                boundary_width={"X": (1, 0)},
                boundary="fill",
                fill_value=0,
                pad_before_func=False,
            ).data

        np.testing.assert_allclose(np.asarray(f(a)), expected)

    @pytest.mark.parametrize("jitted", [False, True])
    def test_cumsum_chunk_checking_bug(self, jitted):
        # Reference issue #507: cumsum on a center/outer grid must not trip
        # the boundary-chunk bookkeeping regardless of chunking (here: jit).
        ds = Dataset(
            coords={
                "Z": ("Z", np.arange(0.5, 10, 1)),
                "Zp1": ("Zp1", np.arange(11.0)),
            },
            data_vars={"drF": ("Z", np.ones(10) * 0.5)},
        )
        grid = Grid(
            ds,
            coords={"Z": {"center": "Z", "outer": "Zp1"}},
            autoparse_metadata=False,
        )
        drF = ds["drF"]

        def run(boundary):
            if jitted:
                return jax.jit(
                    lambda x: grid.cumsum(
                        GriddedArray(x, ("Z",)), "Z", boundary=boundary
                    ).data
                )(drF.data)
            return grid.cumsum(drF, "Z", boundary=boundary).data

        run("periodic")
        run("extend")


class TestDaskNoOverlap:
    def test_chunked_non_core_dims(self):
        # Stub (`...`) in the reference; a real test here: batch (non-core)
        # dim sharded over all 8 devices, op along the unsharded core dim —
        # embarrassingly parallel under GSPMD (reference component #16).
        grid = create_1d_test_grid("depth")
        a = np.random.rand(8, 9)
        da = GriddedArray(a, ("time", "depth_c"))
        expected = apply_as_grid_ufunc(
            lambda x: x[..., 1:] - x[..., :-1],
            da,
            axis=[("depth",)],
            grid=grid,
            signature="(X:center)->(X:left)",
            boundary_width={"X": (1, 0)},
        )

        mesh = make_mesh({"b": 8})
        sharded = shard_gridded(da, mesh, {"time": "b"})

        @jax.jit
        def f(x):
            return apply_as_grid_ufunc(
                lambda y: y[..., 1:] - y[..., :-1],
                GriddedArray(x, ("time", "depth_c")),
                axis=[("depth",)],
                grid=grid,
                signature="(X:center)->(X:left)",
                boundary_width={"X": (1, 0)},
            ).data

        np.testing.assert_allclose(
            np.asarray(f(sharded.data)), np.asarray(expected.data)
        )

    def test_chunked_core_dims_overlap_turned_off(self):
        # Stub (`...`) in the reference. Here: the core dim itself is
        # sharded but the op runs through the PLAIN engine under jit —
        # GSPMD inserts the communication (no explicit halo ring).
        n = 16
        grid = create_1d_test_grid("depth", length=n)
        a = np.random.rand(n)
        da = GriddedArray(a, ("depth_c",))
        expected = apply_as_grid_ufunc(
            lambda x: x[..., 1:] - x[..., :-1],
            da,
            axis=[("depth",)],
            grid=grid,
            signature="(X:center)->(X:left)",
            boundary_width={"X": (1, 0)},
        )

        mesh = make_mesh({"x": 8})
        sharded = shard_gridded(da, mesh, {"depth_c": "x"})

        @jax.jit
        def f(x):
            return apply_as_grid_ufunc(
                lambda y: y[..., 1:] - y[..., :-1],
                GriddedArray(x, ("depth_c",)),
                axis=[("depth",)],
                grid=grid,
                signature="(X:center)->(X:left)",
                boundary_width={"X": (1, 0)},
            ).data

        np.testing.assert_allclose(
            np.asarray(f(sharded.data)), np.asarray(expected.data)
        )


class TestDaskOverlap:
    def test_chunked_core_dims_unchanging_chunksize(self):
        def diff_center_to_left(a):
            return a[..., 1:] - a[..., :-1]

        n = 16
        grid = create_1d_test_grid("depth", length=n)
        a = np.sin(np.arange(1.0, n + 1) * 2 * np.pi / n)
        da = GriddedArray(a, ("depth_c",))
        expected = a - np.roll(a, 1)

        mesh = make_mesh({"x": 8})
        dim_map = {"depth_c": "x", "depth_g": "x"}

        # Test direct application
        result = sharded_apply_as_grid_ufunc(
            diff_center_to_left,
            da,
            axis=[("depth",)],
            grid=grid,
            signature="(X:center)->(X:left)",
            mesh=mesh,
            dim_to_mesh_axis=dim_map,
            boundary_width={"X": (1, 0)},
        )
        assert result.dims == ("depth_g",)
        np.testing.assert_allclose(np.asarray(result.data), expected)

        # Test ShardedGrid method (the grid.apply_as_grid_ufunc analog)
        sgrid = ShardedGrid(grid, mesh, dim_map)
        result = sgrid.apply_as_grid_ufunc(
            diff_center_to_left,
            da,
            axis=[("depth",)],
            signature="(X:center)->(X:left)",
            boundary_width={"X": (1, 0)},
        )
        np.testing.assert_allclose(np.asarray(result.data), expected)

    def test_num_tasks_regression(self):
        # xfail NotImplementedError stub in the reference; here it is a real
        # communication-budget bound: the ring-halo diff must cost exactly
        # one ppermute (width (1,0): one left-neighbor strip), not O(n).
        n = 16
        grid = create_1d_test_grid("depth", length=n)
        a = np.random.rand(n)
        mesh = make_mesh({"x": 8})

        def f(x):
            return sharded_apply_as_grid_ufunc(
                lambda y: y[..., 1:] - y[..., :-1],
                GriddedArray(x, ("depth_c",)),
                axis=[("depth",)],
                grid=grid,
                signature="(X:center)->(X:left)",
                mesh=mesh,
                dim_to_mesh_axis={"depth_c": "x", "depth_g": "x"},
                boundary_width={"X": (1, 0)},
            ).data

        counts = count_collectives(f, a)
        assert counts.get("ppermute", 0) == 1
        assert counts["total"] <= 2

    def test_gave_axis_but_no_corresponding_boundary_width(self):
        # xfail in the reference ("TODO this should default to zero"); our
        # engine does default a missing axis entry to zero width.
        grid = create_1d_test_grid("depth")
        a = np.random.rand(9)
        result = apply_as_grid_ufunc(
            lambda x: x + 1,
            GriddedArray(a, ("depth_g",)),
            axis=[("depth",)],
            grid=grid,
            signature="(X:left)->(X:left)",
            boundary_width={},
        )
        np.testing.assert_allclose(np.asarray(result.data), a + 1)

    def test_only_some_core_dims_are_chunked(self):
        # Skipped (NotImplementedError) in the reference; our sharded engine
        # supports mixed sharded+local core dims.
        grid = create_2d_test_grid("lon", "lat", length1=16, length2=8)

        def vort_like(a):
            return a[..., 1:, 1:] - a[..., :-1, :-1]

        a = np.random.rand(16, 8)
        da = GriddedArray(a, ("lon_c", "lat_c"))

        eager = apply_as_grid_ufunc(
            vort_like,
            da,
            axis=[("lon", "lat")],
            grid=grid,
            signature="(X:center,Y:center)->(X:left,Y:left)",
            boundary_width={"X": (1, 0), "Y": (1, 0)},
        )

        mesh = make_mesh({"x": 4}, devices=jax.devices()[:4])
        # only the lon dims are mesh-mapped; lat stays shard-local
        sharded = sharded_apply_as_grid_ufunc(
            vort_like,
            da,
            axis=[("lon", "lat")],
            grid=grid,
            signature="(X:center,Y:center)->(X:left,Y:left)",
            mesh=mesh,
            dim_to_mesh_axis={"lon_c": "x", "lon_g": "x"},
            boundary_width={"X": (1, 0), "Y": (1, 0)},
        )
        np.testing.assert_array_equal(
            np.asarray(sharded.data), np.asarray(eager.data)
        )

    def test_raise_when_ufunc_changes_chunksize(self):
        n = 16
        grid = create_1d_test_grid("depth", length=n)
        da = GriddedArray(np.random.rand(n + 1), ("depth_o",))
        mesh = make_mesh({"x": 4}, devices=jax.devices()[:4])

        with pytest.raises(NotImplementedError, match="changes the array length"):
            sharded_apply_as_grid_ufunc(
                lambda a: a[..., 1:] - a[..., :-1],
                da,
                axis=[("depth",)],
                grid=grid,
                signature="(X:outer)->(X:center)",
                mesh=mesh,
                dim_to_mesh_axis={"depth_o": "x", "depth_c": "x"},
                boundary_width={"X": (1, 0)},
            )

    def test_multiple_inputs(self):
        def multiply_left_right(a, b):
            return a * b

        n = 16
        grid = create_1d_test_grid("depth", length=n)
        av = np.sin(np.arange(0.5, n) * 2 * np.pi / n)
        bv = np.cos(np.arange(1.5, n + 1) * 2 * np.pi / n)
        expected = av * bv

        mesh = make_mesh({"x": 8})
        result = sharded_apply_as_grid_ufunc(
            multiply_left_right,
            GriddedArray(av, ("depth_g",)),
            GriddedArray(bv, ("depth_r",)),
            axis=[("depth",), ("depth",)],
            grid=grid,
            signature="(X:left),(X:right)->(X:center)",
            mesh=mesh,
            dim_to_mesh_axis={"depth_g": "x", "depth_r": "x", "depth_c": "x"},
            boundary_width=None,
        )
        assert result.dims == ("depth_c",)
        np.testing.assert_allclose(np.asarray(result.data), expected)

    def test_multiple_outputs(self):
        # The reference raises NotImplementedError (map_overlap cannot do
        # multi-output); our shard_map engine supports it — assert results.
        def diff_and_interp(a):
            return a[..., 1:] - a[..., :-1], 0.5 * (a[..., 1:] + a[..., :-1])

        n = 16
        grid = create_1d_test_grid("depth", length=n)
        a = np.random.rand(n)
        da = GriddedArray(a, ("depth_c",))

        d_eager, i_eager = apply_as_grid_ufunc(
            diff_and_interp,
            da,
            axis=[("depth",)],
            grid=grid,
            signature="(X:center)->(X:left),(X:left)",
            boundary_width={"X": (1, 0)},
        )

        mesh = make_mesh({"x": 8})
        d, i = sharded_apply_as_grid_ufunc(
            diff_and_interp,
            da,
            axis=[("depth",)],
            grid=grid,
            signature="(X:center)->(X:left),(X:left)",
            mesh=mesh,
            dim_to_mesh_axis={"depth_c": "x", "depth_g": "x"},
            boundary_width={"X": (1, 0)},
        )
        np.testing.assert_array_equal(np.asarray(d.data), np.asarray(d_eager.data))
        np.testing.assert_array_equal(np.asarray(i.data), np.asarray(i_eager.data))


class TestBoundary:
    def test_boundary_constant(self):
        def interp(a):
            return 0.5 * (a[..., :-1] + a[..., 1:])

        @as_grid_ufunc(
            signature="(X:center)->(X:left)",
            boundary_width={"X": (1, 0)},
            boundary="fill",
            fill_value=0,
        )
        def interp_center_to_left(a):
            return interp(a)

        grid = create_1d_test_grid("lat")
        arr = np.arange(9.0)
        da = GriddedArray(arr, ("lat_c",))

        # test that bound kwargs are used
        result = interp_center_to_left(grid, da, axis=[["lat"]])
        expected = interp(np.concatenate([[0], arr]))
        np.testing.assert_allclose(np.asarray(result.data), expected)

        # test that bound kwargs can be overridden at call time
        result = interp_center_to_left(
            grid, da, axis=[["lat"]], boundary="fill", fill_value=1
        )
        expected = interp(np.concatenate([[1], arr]))
        np.testing.assert_allclose(np.asarray(result.data), expected)


class TestMapOverlapGridops:
    def test_chunked_core_dims_unchanging_chunksize_center_to_right(self):
        # GH #438 analog: predefined gridops through the sharded surface.
        n = 16
        grid = create_1d_test_grid("depth", length=n)
        a = np.sin(np.arange(1.0, n + 1) * 2 * np.pi / n)
        da = GriddedArray(a, ("depth_c",))
        expected = np.roll(a, -1) - a

        mesh = make_mesh({"x": 8})
        sgrid = ShardedGrid(
            grid, mesh, {"depth_c": "x", "depth_g": "x", "depth_r": "x"}
        )
        result = sgrid.diff(da, axis="depth", to="right")
        assert result.dims == ("depth_r",)
        np.testing.assert_allclose(np.asarray(result.data), expected)

    def test_chunked_core_dims_unchanging_chunksize_center_to_right_2d(self):
        # GH #440 analog: 2D data, only the op axis sharded.
        grid = create_2d_test_grid("depth", "y", length1=16, length2=8)
        depth_c = np.arange(1.0, 17)
        y_c = np.arange(1.0, 9)
        a = np.add.outer(depth_c**2, y_c**2)
        da = GriddedArray(a, ("depth_c", "y_c"))
        expected = np.roll(a, -1, axis=0) - a

        mesh = make_mesh({"x": 8})
        sgrid = ShardedGrid(
            grid, mesh, {"depth_c": "x", "depth_g": "x", "depth_r": "x"}
        )
        result = sgrid.diff(da, axis="depth", to="right")
        assert result.dims == ("depth_r", "y_c")
        np.testing.assert_allclose(np.asarray(result.data), expected)

    @pytest.mark.parametrize("jitted", [False, True])
    def test_single_chunk_core_dims_center_to_outer(self, jitted):
        # Reference issue #518: interp to outer with boundary="extend".
        ds = Dataset(
            coords={
                "Z": ("Z", np.arange(0.5, 10, 1)),
                "Zp1": ("Zp1", np.arange(11.0)),
            },
            data_vars={"drF": ("Z", np.linspace(1, 10, num=10))},
        )
        grid = Grid(
            ds,
            coords={"Z": {"center": "Z", "outer": "Zp1"}},
            autoparse_metadata=False,
        )
        expected = np.concatenate(
            (np.array([1.0]), np.linspace(1.5, 9.5, num=9), np.array([10.0]))
        )

        if jitted:
            result = jax.jit(
                lambda x: grid.interp(
                    GriddedArray(x, ("Z",)), "Z", boundary="extend", to="outer"
                ).data
            )(ds["drF"].data)
            np.testing.assert_allclose(np.asarray(result), expected)
        else:
            result = grid.interp(ds["drF"], "Z", boundary="extend", to="outer")
            assert result.dims == ("Zp1",)
            np.testing.assert_allclose(np.asarray(result.data), expected)
