"""Synthetic grid fixtures, modelled on the reference's fixture library
(``xgcm/test/datasets.py``): in-memory datasets at every staggered position,
periodic and non-periodic variants, plus full B/C-grids with the complete
metric set used by the metric-aware operator tests."""

from __future__ import annotations

import numpy as np

from xgcm_tpu import Dataset, GriddedArray

N = 100


def dataset_1d_left(periodic=True):
    """1D grid with center + left positions."""
    ds = Dataset(
        coords={
            "XC": ("XC", np.arange(N) + 0.5, {"axis": "X"}),
            "XG": ("XG", np.arange(N), {"axis": "X", "c_grid_axis_shift": -0.5}),
        },
        data_vars={
            "data_c": ("XC", np.random.rand(N)),
            "data_g": ("XG", np.random.rand(N)),
        },
    )
    return ds


def dataset_1d_outer():
    ds = Dataset(
        coords={
            "XC": ("XC", np.arange(N) + 0.5, {"axis": "X"}),
            "XG": ("XG", np.arange(N + 1), {"axis": "X", "c_grid_axis_shift": -0.5}),
        },
        data_vars={
            "data_c": ("XC", np.random.rand(N)),
            "data_g": ("XG", np.random.rand(N + 1)),
        },
    )
    return ds


def dataset_1d_inner():
    ds = Dataset(
        coords={
            "XC": ("XC", np.arange(N) + 0.5, {"axis": "X"}),
            "XG": (
                "XG",
                np.arange(1, N),
                {"axis": "X", "c_grid_axis_shift": -0.5},
            ),
        },
        data_vars={
            "data_c": ("XC", np.random.rand(N)),
            "data_g": ("XG", np.random.rand(N - 1)),
        },
    )
    return ds


def dataset_2d_left():
    nx, ny = 9, 11
    ds = Dataset(
        coords={
            "XC": ("XC", np.arange(nx) + 0.5, {"axis": "X"}),
            "XG": ("XG", np.arange(nx), {"axis": "X", "c_grid_axis_shift": -0.5}),
            "YC": ("YC", np.arange(ny) + 0.5, {"axis": "Y"}),
            "YG": ("YG", np.arange(ny), {"axis": "Y", "c_grid_axis_shift": -0.5}),
        },
        data_vars={
            "data_c": (("YC", "XC"), np.random.rand(ny, nx)),
            "data_g": (("YG", "XG"), np.random.rand(ny, nx)),
        },
    )
    return ds


def datasets_grid_metric(grid_type: str):
    """Full 3D grid with the complete 18-metric set at B/C-grid positions
    (modelled on reference datasets.py:550-720)."""
    assert grid_type in ("B", "C")
    xt_dim, yt_dim, zt_dim = 4, 5, 6
    t = np.arange(2)

    rng = np.random.RandomState(1)

    def r(*shape):
        return rng.rand(*shape)

    u_vel = r(len(t), zt_dim, yt_dim, xt_dim)
    v_vel = r(len(t), zt_dim, yt_dim, xt_dim)
    wt = r(len(t), zt_dim, yt_dim, xt_dim)
    tracer = r(len(t), zt_dim, yt_dim, xt_dim)

    if grid_type == "B":
        u_dims = ("time", "zt", "yu", "xu")
        v_dims = ("time", "zt", "yu", "xu")
    else:
        u_dims = ("time", "zt", "yt", "xu")
        v_dims = ("time", "zt", "yu", "xt")

    coords = {
        "time": ("time", t),
        "xt": ("xt", np.arange(xt_dim) + 0.5),
        "xu": ("xu", np.arange(xt_dim) + 1.0),
        "yt": ("yt", np.arange(yt_dim) + 0.5),
        "yu": ("yu", np.arange(yt_dim) + 1.0),
        "zt": ("zt", np.arange(zt_dim) + 0.5),
        "zw": ("zw", np.arange(zt_dim) + 1.0),
        # metrics
        "dx_t": (("xt",), r(xt_dim) + 1.0),
        "dx_e": (("xu",), r(xt_dim) + 1.0),
        "dx_n": (("xt",), r(xt_dim) + 1.0),
        "dx_ne": (("xu",), r(xt_dim) + 1.0),
        "dy_t": (("yt",), r(yt_dim) + 1.0),
        "dy_e": (("yt",), r(yt_dim) + 1.0),
        "dy_n": (("yu",), r(yt_dim) + 1.0),
        "dy_ne": (("yu",), r(yt_dim) + 1.0),
        "dz_t": (("zt",), r(zt_dim) + 1.0),
        "dz_w": (("zw",), r(zt_dim) + 1.0),
        "area_t": (("yt", "xt"), r(yt_dim, xt_dim) + 1.0),
        "area_e": (("yt", "xu"), r(yt_dim, xt_dim) + 1.0),
        "area_n": (("yu", "xt"), r(yt_dim, xt_dim) + 1.0),
        "area_ne": (("yu", "xu"), r(yt_dim, xt_dim) + 1.0),
        "volume_t": (
            ("zt", "yt", "xt"),
            r(zt_dim, yt_dim, xt_dim) + 1.0,
        ),
    }

    ds = Dataset(
        coords=coords,
        data_vars={
            "u": (u_dims, u_vel),
            "v": (v_dims, v_vel),
            "wt": (("time", "zw", "yt", "xt"), wt),
            "tracer": (("time", "zt", "yt", "xt"), tracer),
        },
    )

    grid_coords = {
        "X": {"center": "xt", "right": "xu"},
        "Y": {"center": "yt", "right": "yu"},
        "Z": {"center": "zt", "right": "zw"},
    }

    metrics = {
        ("X",): ["dx_t", "dx_e", "dx_n", "dx_ne"],
        ("Y",): ["dy_t", "dy_e", "dy_n", "dy_ne"],
        ("Z",): ["dz_t", "dz_w"],
        ("X", "Y"): ["area_t", "area_e", "area_n", "area_ne"],
        ("X", "Y", "Z"): ["volume_t"],
    }

    return ds, grid_coords, metrics


def cubed_sphere_dataset(n=4):
    """6-face cubed-sphere layout with the face-connection table used by the
    reference's topology tests (test_faceconnections.py:71-127)."""
    ds = Dataset(
        coords={
            "x": ("x", np.arange(n) + 0.5, {"axis": "X"}),
            "xl": ("xl", np.arange(n), {"axis": "X", "c_grid_axis_shift": -0.5}),
            "y": ("y", np.arange(n) + 0.5, {"axis": "Y"}),
            "yl": ("yl", np.arange(n), {"axis": "Y", "c_grid_axis_shift": -0.5}),
            "face": ("face", np.arange(6)),
        },
        data_vars={
            "data_c": (
                ("face", "y", "x"),
                np.random.rand(6, n, n),
            ),
            "u": (("face", "y", "xl"), np.random.rand(6, n, n)),
            "v": (("face", "yl", "x"), np.random.rand(6, n, n)),
        },
    )

    face_connections = {
        "face": {
            0: {
                "X": ((3, "X", False), (1, "X", False)),
                "Y": ((4, "Y", False), (5, "Y", False)),
            },
            1: {
                "X": ((0, "X", False), (2, "X", False)),
                "Y": ((4, "X", False), (5, "X", True)),
            },
            2: {
                "X": ((1, "X", False), (3, "X", False)),
                "Y": ((4, "Y", True), (5, "Y", True)),
            },
            3: {
                "X": ((2, "X", False), (0, "X", False)),
                "Y": ((4, "X", True), (5, "X", False)),
            },
            4: {
                "X": ((3, "Y", True), (1, "Y", False)),
                "Y": ((2, "Y", True), (0, "Y", False)),
            },
            5: {
                "X": ((3, "Y", False), (1, "Y", True)),
                "Y": ((0, "Y", False), (2, "Y", True)),
            },
        }
    }
    return ds, face_connections


def llc_dataset(n=4):
    """13-face LLC (lat-lon-cap) layout — the MITgcm LLC4320-style topology
    that motivates the reference (README.rst; reference padding.py:70-335
    implements exactly these rotated connections).  Face-connection table as
    published for MITgcm LLC grids (xmitgcm/ECCOv4 convention): faces 0-5
    southern/equatorial, 6 the Arctic cap, 7-12 the rotated half.  Grid's
    mutual-consistency check (reference grid.py:346-389) validates the
    table at construction."""
    ds = Dataset(
        coords={
            "x": ("x", np.arange(n) + 0.5, {"axis": "X"}),
            "xl": ("xl", np.arange(n), {"axis": "X", "c_grid_axis_shift": -0.5}),
            "y": ("y", np.arange(n) + 0.5, {"axis": "Y"}),
            "yl": ("yl", np.arange(n), {"axis": "Y", "c_grid_axis_shift": -0.5}),
            "face": ("face", np.arange(13)),
        },
        data_vars={
            "data_c": (("face", "y", "x"), np.random.rand(13, n, n)),
            "u": (("face", "y", "xl"), np.random.rand(13, n, n)),
            "v": (("face", "yl", "x"), np.random.rand(13, n, n)),
        },
    )
    face_connections = {
        "face": {
            0: {"X": ((12, "Y", False), (3, "X", False)),
                "Y": (None, (1, "Y", False))},
            1: {"X": ((11, "Y", False), (4, "X", False)),
                "Y": ((0, "Y", False), (2, "Y", False))},
            2: {"X": ((10, "Y", False), (5, "X", False)),
                "Y": ((1, "Y", False), (6, "X", False))},
            3: {"X": ((0, "X", False), (9, "Y", False)),
                "Y": (None, (4, "Y", False))},
            4: {"X": ((1, "X", False), (8, "Y", False)),
                "Y": ((3, "Y", False), (5, "Y", False))},
            5: {"X": ((2, "X", False), (7, "Y", False)),
                "Y": ((4, "Y", False), (6, "Y", False))},
            6: {"X": ((2, "Y", False), (7, "X", False)),
                "Y": ((5, "Y", False), (10, "X", False))},
            7: {"X": ((6, "X", False), (8, "X", False)),
                "Y": ((5, "X", False), (10, "Y", False))},
            8: {"X": ((7, "X", False), (9, "X", False)),
                "Y": ((4, "X", False), (11, "Y", False))},
            9: {"X": ((8, "X", False), None),
                "Y": ((3, "X", False), (12, "Y", False))},
            10: {"X": ((6, "Y", False), (11, "X", False)),
                 "Y": ((7, "Y", False), (2, "X", False))},
            11: {"X": ((10, "X", False), (12, "X", False)),
                 "Y": ((8, "Y", False), (1, "X", False))},
            12: {"X": ((11, "X", False), None),
                 "Y": ((9, "Y", False), (0, "X", False))},
        }
    }
    return ds, face_connections
