"""COMODO / SGRID metadata parser tests (mirrors reference
test_metadata_parsers.py + parser behaviour embedded in test_grid.py)."""

import numpy as np
import pytest

from xgcm_tpu import Dataset, Grid
from xgcm_tpu.parsers import cf, comodo, metadata, sgrid


def comodo_ds():
    n = 6
    return Dataset(
        coords={
            "XC": ("XC", np.arange(n) + 0.5, {"axis": "X"}),
            "XG": ("XG", np.arange(n) * 1.0, {"axis": "X", "c_grid_axis_shift": -0.5}),
            "YC": ("YC", np.arange(n) + 0.5, {"axis": "Y"}),
            "YR": ("YR", np.arange(n) + 1.0, {"axis": "Y", "c_grid_axis_shift": 0.5}),
            "ZC": ("ZC", np.arange(n) + 0.5, {"axis": "Z"}),
            "ZO": ("ZO", np.arange(n + 1) * 1.0, {"axis": "Z", "c_grid_axis_shift": -0.5}),
        }
    )


class TestComodo:
    def test_get_all_axes(self):
        assert comodo.get_all_axes(comodo_ds()) == {"X", "Y", "Z"}

    def test_positions(self):
        ds = comodo_ds()
        assert comodo.get_axis_positions_and_coords(ds, "X") == {
            "center": "XC",
            "left": "XG",
        }
        assert comodo.get_axis_positions_and_coords(ds, "Y") == {
            "center": "YC",
            "right": "YR",
        }
        # length n+1 -> outer regardless of shift value
        assert comodo.get_axis_positions_and_coords(ds, "Z") == {
            "center": "ZC",
            "outer": "ZO",
        }

    def test_inner_detection(self):
        n = 6
        ds = Dataset(
            coords={
                "ZC": ("ZC", np.arange(n) + 0.5, {"axis": "Z"}),
                "ZI": (
                    "ZI",
                    np.arange(n - 1) + 1.0,
                    {"axis": "Z", "c_grid_axis_shift": -0.5},
                ),
            }
        )
        assert comodo.get_axis_positions_and_coords(ds, "Z") == {
            "center": "ZC",
            "inner": "ZI",
        }

    def test_no_center_raises(self):
        n = 4
        ds = Dataset(
            coords={
                "XG": ("XG", np.arange(n) * 1.0, {"axis": "X", "c_grid_axis_shift": -0.5}),
            }
        )
        with pytest.raises(ValueError, match="center coordinate"):
            comodo.get_axis_positions_and_coords(ds, "X")

    def test_two_centers_raises(self):
        n = 4
        ds = Dataset(
            coords={
                "A": ("A", np.arange(n) * 1.0, {"axis": "X"}),
                "B": ("B", np.arange(n) * 1.0, {"axis": "X"}),
            }
        )
        with pytest.raises(ValueError, match="two coordinates without"):
            comodo.get_axis_positions_and_coords(ds, "X")

    def test_grid_autoparse(self):
        grid = Grid(comodo_ds())
        assert set(grid.axes) == {"X", "Y", "Z"}
        assert grid.axes["X"].coords == {"center": "XC", "left": "XG"}

    def test_autoparse_conflict_with_user_coords(self):
        with pytest.raises(ValueError, match="conflict with"):
            Grid(comodo_ds(), coords={"X": {"center": "XC"}})


def sgrid_2d_ds():
    nx, ny = 5, 4
    return Dataset(
        coords={
            "node_x": ("node_x", np.arange(nx + 1) * 1.0),
            "node_y": ("node_y", np.arange(ny + 1) * 1.0),
            "cell_x": ("cell_x", np.arange(nx) + 0.5),
            "cell_y": ("cell_y", np.arange(ny) + 0.5),
        },
        data_vars={
            "grid": (
                (),
                np.array(0),
                {
                    "cf_role": "grid_topology",
                    "topology_dimension": 2,
                    "node_dimensions": "node_x node_y",
                    "face_dimensions": (
                        "cell_x: node_x (padding: none) "
                        "cell_y: node_y (padding: none)"
                    ),
                },
            )
        },
        attrs={"Conventions": "SGRID-0.3.0"},
    )


class TestSgrid:
    def test_detection(self):
        assert sgrid.assert_valid_sgrid(sgrid_2d_ds())
        assert not sgrid.assert_valid_sgrid(comodo_ds())

    def test_get_grid_variable(self):
        assert sgrid.get_sgrid_grid(sgrid_2d_ds()) == "grid"

    def test_axes(self):
        assert sgrid.get_all_axes(sgrid_2d_ds()) == {"X", "Y"}

    def test_positions(self):
        ds = sgrid_2d_ds()
        assert sgrid.get_axis_positions_and_coords(ds, "X") == {
            "center": "cell_x",
            "outer": "node_x",
        }
        assert sgrid.get_axis_positions_and_coords(ds, "Y") == {
            "center": "cell_y",
            "outer": "node_y",
        }

    def test_padding_types(self):
        for pad, pos, n_node in [
            ("low", "right", 4),
            ("high", "left", 4),
            ("both", "inner", 3),
            ("none", "outer", 5),
        ]:
            ds = Dataset(
                coords={
                    "nodes": ("nodes", np.arange(n_node) * 1.0),
                    "cells": ("cells", np.arange(4) + 0.5),
                },
                data_vars={
                    "grid": (
                        (),
                        np.array(0),
                        {
                            "cf_role": "grid_topology",
                            "topology_dimension": 1,
                            "node_dimensions": "nodes",
                            "face_dimensions": f"cells: nodes (padding: {pad})",
                        },
                    )
                },
                attrs={"Conventions": "SGRID"},
            )
            assert sgrid.get_axis_positions_and_coords(ds, "X") == {
                "center": "cells",
                pos: "nodes",
            }

    def test_grid_autoparse_sgrid(self):
        grid = Grid(sgrid_2d_ds())
        assert set(grid.axes) == {"X", "Y"}
        assert grid.axes["X"].coords["center"] == "cell_x"

    def test_bad_topology_dimension(self):
        ds = sgrid_2d_ds()
        ds["grid"].attrs["topology_dimension"] = 4
        with pytest.raises(ValueError, match="1-3 spatial dimensions"):
            sgrid.get_all_axes(ds)

    def test_vertical_dimensions(self):
        ds = sgrid_2d_ds()
        ds["grid"].attrs["vertical_dimensions"] = "zc: zo (padding: none)"
        assert sgrid.get_all_axes(ds) == {"X", "Y", "Z"}
        assert sgrid.get_axis_positions_and_coords(ds, "Z") == {
            "center": "zc",
            "outer": "zo",
        }


class TestDispatch:
    def test_sgrid_takes_precedence(self):
        ds = sgrid_2d_ds()
        _, kwargs = metadata.parse_metadata(ds)
        assert "coords" in kwargs and "X" in kwargs["coords"]

    def test_comodo_fallback(self):
        _, kwargs = metadata.parse_metadata(comodo_ds())
        assert set(kwargs["coords"]) == {"X", "Y", "Z"}

    def test_plain_dataset_empty_coords(self):
        ds = Dataset(coords={"x": ("x", np.arange(4) * 1.0)})
        _, kwargs = metadata.parse_metadata(ds)
        assert kwargs == {"coords": {}}


def sgrid_3d_ds():
    nx, ny, nz = 4, 3, 5
    return Dataset(
        coords={
            "node_x": ("node_x", np.arange(nx + 1) * 1.0),
            "node_y": ("node_y", np.arange(ny + 1) * 1.0),
            "node_z": ("node_z", np.arange(nz + 1) * 1.0),
            "cell_x": ("cell_x", np.arange(nx) + 0.5),
            "cell_y": ("cell_y", np.arange(ny) + 0.5),
            "cell_z": ("cell_z", np.arange(nz) + 0.5),
        },
        data_vars={
            "grid": (
                (),
                np.array(0),
                {
                    "cf_role": "grid_topology",
                    "topology_dimension": 3,
                    "node_dimensions": "node_x node_y node_z",
                    "volume_dimensions": (
                        "cell_x: node_x (padding: none) "
                        "cell_y: node_y (padding: none) "
                        "cell_z: node_z (padding: none)"
                    ),
                },
            )
        },
        attrs={"Conventions": "SGRID"},
    )


class TestSgrid3D:
    def test_axes(self):
        assert sgrid.get_all_axes(sgrid_3d_ds()) == {"X", "Y", "Z"}

    def test_positions(self):
        ds = sgrid_3d_ds()
        assert sgrid.get_axis_positions_and_coords(ds, "Z") == {
            "center": "cell_z",
            "outer": "node_z",
        }

    def test_grid_construction(self):
        grid = Grid(sgrid_3d_ds())
        assert set(grid.axes) == {"X", "Y", "Z"}


# ---------------------------------------------------------------------------
# CF-conventions fallback parser (beyond reference: the reference stubs
# cf_parser, metadata_parsers.py:100-119, and never calls it)
# ---------------------------------------------------------------------------


def cf_ds():
    """CMIP/NEMO-style dataset: CF attrs only, no COMODO attrs anywhere."""
    nx, ny, nz = 6, 5, 4
    return Dataset(
        coords={
            "lon": ("lon", np.linspace(0.5, 5.5, nx),
                    {"standard_name": "longitude", "units": "degrees_east"}),
            "lat": ("lat", np.linspace(-2, 2, ny),
                    {"units": "degrees_north"}),
            "depth": ("depth", np.arange(nz) + 0.5,
                      {"units": "m", "positive": "down"}),
            "depth_bnds": ("depth_bnds", np.arange(nz + 1) * 1.0,
                           {"units": "m", "positive": "down"}),
            "time": ("time", np.arange(3) * 1.0,
                     {"units": "days since 2000-01-01"}),
        },
        data_vars={
            "thetao": (("time", "depth", "lat", "lon"),
                       np.zeros((3, nz, ny, nx))),
        },
    )


class TestCFParser:
    def test_get_all_axes(self):
        assert cf.get_all_axes(cf_ds()) == {"X", "Y", "Z", "T"}

    def test_standard_name_units_positive(self):
        ds = cf_ds()
        assert cf.get_axis_positions_and_coords(ds, "X") == {"center": "lon"}
        assert cf.get_axis_positions_and_coords(ds, "Y") == {"center": "lat"}
        assert cf.get_axis_positions_and_coords(ds, "T") == {"center": "time"}

    def test_center_outer_from_lengths(self):
        # depth (n, a data dim) + depth_bnds (n+1) -> center/outer
        assert cf.get_axis_positions_and_coords(cf_ds(), "Z") == {
            "center": "depth",
            "outer": "depth_bnds",
        }

    def test_inner_when_longer_coord_is_data_dim(self):
        ds = Dataset(
            coords={
                "z": ("z", np.arange(5) + 0.5, {"positive": "down"}),
                "zi": ("zi", np.arange(4) + 1.0, {"positive": "down"}),
            },
            data_vars={"w": (("z",), np.zeros(5))},
        )
        assert cf.get_axis_positions_and_coords(ds, "Z") == {
            "center": "z",
            "inner": "zi",
        }

    def test_cartesian_axis_mom6_style(self):
        ds = Dataset(
            coords={"xh": ("xh", np.arange(4) + 0.5, {"cartesian_axis": "X"})}
        )
        assert cf.get_all_axes(ds) == {"X"}

    def test_same_length_pair_is_ambiguous(self):
        ds = Dataset(
            coords={
                "lonc": ("lonc", np.arange(4) + 0.5, {"units": "degrees_east"}),
                "long": ("long", np.arange(4) * 1.0, {"units": "degrees_east"}),
            }
        )
        with pytest.raises(ValueError, match="not expressible in CF"):
            cf.get_axis_positions_and_coords(ds, "X")
        # the fallback parser skips the undecidable axis instead of raising
        _, kwargs = cf.cf_parser(ds)
        assert kwargs == {"coords": {}}

    def test_comodo_attrs_excluded(self):
        # coordinates with COMODO attrs are NOT CF candidates
        assert cf.get_all_axes(comodo_ds()) == set()

    def test_grid_construction_end_to_end(self):
        grid = Grid(cf_ds())
        assert set(grid.axes) == {"X", "Y", "Z", "T"}
        assert grid.axes["Z"].coords == {"center": "depth", "outer": "depth_bnds"}

    def test_comodo_axis_wins_cf_adds_missing(self):
        # X declared via COMODO, Y only via CF units: both parsed, COMODO
        # version of X kept
        ds = Dataset(
            coords={
                "XC": ("XC", np.arange(6) + 0.5, {"axis": "X"}),
                "XG": ("XG", np.arange(6) * 1.0,
                       {"axis": "X", "c_grid_axis_shift": -0.5}),
                "lat": ("lat", np.arange(5) * 1.0, {"units": "degrees_north"}),
            }
        )
        _, kwargs = metadata.parse_metadata(ds)
        assert kwargs["coords"]["X"] == {"center": "XC", "left": "XG"}
        assert kwargs["coords"]["Y"] == {"center": "lat"}

    def test_cf_never_overrides_claimed_dim(self):
        # a dim already claimed by a COMODO axis cannot be re-used by CF
        # even under a different axis letter
        ds = Dataset(
            coords={
                "XC": ("XC", np.arange(6) + 0.5,
                       {"axis": "W", "standard_name": "longitude"}),
            }
        )
        _, kwargs = metadata.parse_metadata(ds)
        assert set(kwargs["coords"]) == {"W"}

    def test_transform_on_cf_grid(self):
        # the autoparsed CF grid drives a real op end to end
        from xgcm_tpu import GriddedArray

        ds = cf_ds()
        grid = Grid(ds, periodic=False, autoparse_metadata=True)
        q = GriddedArray(np.arange(4) * 1.0 + 1.0, ("depth",), name="q")
        sig = GriddedArray(np.linspace(20, 30, 5), ("depth_bnds",), name="s")
        out = grid.transform(
            q, "Z", np.linspace(19, 31, 7), target_data=sig,
            method="conservative",
        )
        np.testing.assert_allclose(
            np.nansum(np.asarray(out.data)), float(np.sum(q.data))
        )


class TestCFBoundsSynthesis:
    """A CF `bounds` attribute pointing at a contiguous (n, 2) variable
    synthesizes an (n+1,) outer coordinate — how CMIP output becomes
    conservative-transform ready without explicit coords=."""

    @staticmethod
    def _cmip_ds(contiguous=True):
        nz = 5
        z_o = np.linspace(0.0, 100.0, nz + 1)
        bnds = np.stack([z_o[:-1], z_o[1:]], axis=-1)
        if not contiguous:
            bnds[2, 0] += 1.0  # gap between cells 1 and 2
        z_c = bnds.mean(axis=-1)
        return Dataset(
            coords={
                "lev": ("lev", z_c,
                        {"units": "m", "positive": "down",
                         "bounds": "lev_bnds"}),
            },
            data_vars={
                "lev_bnds": (("lev", "bnds"), bnds),
                "thetao": (("lev",), np.arange(nz) * 1.0),
            },
        )

    def test_outer_synthesized(self):
        ds = self._cmip_ds()
        _, kwargs = cf.cf_parser(ds)
        assert kwargs["coords"]["Z"] == {"center": "lev", "outer": "lev_outer"}

    def test_grid_carries_synthesized_coord(self):
        grid = Grid(self._cmip_ds(), periodic=False)
        assert grid.axes["Z"].coords == {"center": "lev", "outer": "lev_outer"}
        edges = np.asarray(grid._ds.coords["lev_outer"].data)
        np.testing.assert_allclose(edges, np.linspace(0.0, 100.0, 6))

    def test_noncontiguous_bounds_skipped(self):
        ds = self._cmip_ds(contiguous=False)
        _, kwargs = cf.cf_parser(ds)
        assert kwargs["coords"]["Z"] == {"center": "lev"}

    def test_conservative_transform_on_cmip_grid(self):
        from xgcm_tpu import GriddedArray

        grid = Grid(self._cmip_ds(), periodic=False)
        nz = 5
        q = GriddedArray(np.arange(nz) * 1.0 + 1.0, ("lev",), name="q")
        sig = GriddedArray(
            np.linspace(24.0, 28.0, nz + 1), ("lev_outer",), name="sigma"
        )
        out = grid.transform(
            q, "Z", np.linspace(23.5, 28.5, 6), target_data=sig,
            method="conservative",
        )
        np.testing.assert_allclose(
            np.nansum(np.asarray(out.data)), float(np.sum(q.data))
        )

    def test_outer_ops_on_cmip_grid(self):
        from xgcm_tpu import GriddedArray

        grid = Grid(self._cmip_ds(), periodic=False)
        q = GriddedArray(np.arange(5) * 1.0, ("lev",), name="q")
        out = grid.interp(q, "Z", to="outer", boundary="extend")
        assert out.dims == ("lev_outer",)
        assert out.shape == (6,)

    def test_datetime_bounds_do_not_crash_autoparse(self):
        """Non-numeric (datetime64) bounds — the other common CMIP bounds
        variable — must leave the axis center-only, not crash Grid()."""
        nt = 4
        t = np.arange("2000-01", "2000-05", dtype="datetime64[M]")
        tb = np.stack(
            [t, t + np.timedelta64(1, "M")], axis=-1
        )
        ds = Dataset(
            coords={
                "time": ("time", t,
                         {"standard_name": "time", "bounds": "time_bnds"}),
                "lev": ("lev", np.arange(3) + 0.5, {"positive": "down"}),
            },
            data_vars={"time_bnds": (("time", "bnds"), tb),
                       "q": (("time", "lev"), np.zeros((nt, 3)))},
        )
        grid = Grid(ds, periodic=False)
        assert grid.axes["T"].coords == {"center": "time"}

    def test_rejected_cf_axis_leaves_no_stray_outer_coord(self):
        """ADVICE r4: when parse_metadata REJECTS a CF axis (its name is
        already claimed by COMODO), the outer coordinate the CF parser
        synthesized from the bounds variable must NOT leak into the
        returned dataset — only accepted axes may assign new coords."""
        base = self._cmip_ds()
        ds = Dataset(
            coords={
                # COMODO claims axis "Z" first: CF's Z (from `lev`) loses
                "ZC": ("ZC", np.arange(4) + 0.5, {"axis": "Z"}),
                **{k: (v.dims[0], v.data, v.attrs)
                   for k, v in base.coords.items()},
            },
            data_vars={k: (v.dims, v.data, v.attrs)
                       for k, v in base.data_vars.items()},
        )
        out_ds, kwargs = metadata.parse_metadata(ds)
        assert kwargs["coords"]["Z"] == {"center": "ZC"}
        assert "lev_outer" not in out_ds.coords
        # the standalone CF parser (public parity name) still synthesizes:
        cf_ds_out, cf_kwargs = cf.cf_parser(base)
        assert "lev_outer" in cf_ds_out.coords

    def test_accepted_cf_axis_still_gets_outer_coord(self):
        # the fix must not break the accept path: no COMODO competition
        out_ds, kwargs = metadata.parse_metadata(self._cmip_ds())
        assert kwargs["coords"]["Z"] == {"center": "lev", "outer": "lev_outer"}
        assert "lev_outer" in out_ds.coords
