"""Dataset container tests: construction, access, npz round-trip."""

import numpy as np
import pytest

from xgcm_tpu import Dataset, GriddedArray


class TestConstruction:
    def test_coord_shorthand(self):
        ds = Dataset(coords={"x": ("x", np.arange(4.0))})
        assert ds.dims == {"x": 4}
        assert ds.coords["x"].dims == ("x",)

    def test_tuple_with_attrs(self):
        ds = Dataset(coords={"x": ("x", np.arange(4.0), {"axis": "X"})})
        assert ds.coords["x"].attrs == {"axis": "X"}

    def test_multidim_var(self):
        ds = Dataset(
            coords={"x": ("x", np.arange(3.0)), "y": ("y", np.arange(2.0))},
            data_vars={"t": (("y", "x"), np.zeros((2, 3)))},
        )
        assert ds["t"].dims == ("y", "x")
        assert ds.dims == {"x": 3, "y": 2}

    def test_conflicting_sizes(self):
        with pytest.raises(ValueError, match="conflicting sizes"):
            Dataset(
                coords={"x": ("x", np.arange(3.0))},
                data_vars={"t": (("x",), np.zeros(5))},
            )

    def test_extra_dims(self):
        ds = Dataset(dims={"t": 7})
        assert ds.dims == {"t": 7}

    def test_getitem_missing(self):
        ds = Dataset(coords={"x": ("x", np.arange(3.0))})
        with pytest.raises(KeyError):
            ds["nope"]

    def test_contains(self):
        ds = Dataset(
            coords={"x": ("x", np.arange(3.0))},
            data_vars={"v": (("x",), np.zeros(3))},
        )
        assert "x" in ds and "v" in ds and "q" not in ds


class TestPersistence:
    def test_roundtrip(self, tmp_path):
        ds = Dataset(
            coords={
                "x": ("x", np.arange(5.0), {"axis": "X"}),
                "area": (("y", "x"), np.random.rand(3, 5)),
                "y": ("y", np.arange(3.0)),
            },
            data_vars={"temp": (("y", "x"), np.random.rand(3, 5))},
            attrs={"Conventions": "SGRID"},
        )
        path = str(tmp_path / "ds.npz")
        ds.save(path)
        ds2 = Dataset.load(path)
        assert ds2.dims == ds.dims
        assert ds2.attrs == ds.attrs
        assert ds2.coords["x"].attrs == {"axis": "X"}
        np.testing.assert_allclose(
            np.asarray(ds2["temp"].data), np.asarray(ds["temp"].data)
        )
        np.testing.assert_allclose(
            np.asarray(ds2.coords["area"].data), np.asarray(ds.coords["area"].data)
        )

    def test_grid_from_loaded(self, tmp_path):
        from xgcm_tpu import Grid

        ds = Dataset(
            coords={
                "xc": ("xc", np.arange(6.0) + 0.5, {"axis": "X"}),
                "xg": ("xg", np.arange(6.0), {"axis": "X", "c_grid_axis_shift": -0.5}),
            }
        )
        path = str(tmp_path / "grid.npz")
        ds.save(path)
        grid = Grid(Dataset.load(path))
        assert grid.axes["X"].coords == {"center": "xc", "left": "xg"}


class TestMutation:
    def test_setitem(self):
        ds = Dataset(coords={"x": ("x", np.arange(4.0))})
        ds["v"] = (("x",), np.ones(4))
        assert "v" in ds
        with pytest.raises(ValueError, match="conflicting sizes"):
            ds["bad"] = (("x",), np.ones(5))

    def test_assign_returns_new(self):
        ds = Dataset(coords={"x": ("x", np.arange(4.0))})
        ds2 = ds.assign(v=(("x",), np.ones(4)))
        assert "v" in ds2 and "v" not in ds

    def test_assign_coords(self):
        ds = Dataset(coords={"x": ("x", np.arange(4.0))})
        ds2 = ds.assign_coords(x2=("x", np.arange(4.0) * 2))
        assert "x2" in ds2.coords and "x2" not in ds.coords

    def test_assign_coords_preserves_declared_dims(self):
        # a coordinate-less dim (e.g. a face dim) declared via the dims
        # kwarg must survive assign_coords, matching assign()
        ds = Dataset(coords={"x": ("x", np.arange(4.0))}, dims={"face": 6})
        ds2 = ds.assign_coords(x2=("x", np.arange(4.0) * 2))
        assert ds2.dims.get("face") == 6

    def test_setitem_then_set_metrics(self):
        from xgcm_tpu import Grid

        ds = Dataset(
            coords={
                "xc": ("xc", np.arange(5.0)),
                "xg": ("xg", np.arange(5.0)),
            }
        )
        grid = Grid(
            ds, coords={"X": {"center": "xc", "left": "xg"}},
            autoparse_metadata=False,
        )
        ds["dx"] = (("xc",), np.random.rand(5) + 1)
        grid.set_metrics(("X",), "dx")
        arr = GriddedArray(np.random.rand(5), ("xc",))
        m = grid.get_metric(arr, ("X",))
        np.testing.assert_allclose(np.asarray(m.data), np.asarray(ds["dx"].data))
