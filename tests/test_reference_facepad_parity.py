"""Ports of the reference's TestPaddingFaceConnection suite by exact name
(reference test_padding.py:310-585), rewritten with numpy oracles.

Each test drives ``pad`` over a 2-face topology in one of the reference's
four connection geometries — right->left / right->right, same-axis /
swapped-axis — across the reference's seven boundary-width combinations
and both fill values.  The oracle mirrors the reference's construction:
pre-pad every *unconnected* side with the basic fill BC, then concatenate
the correctly-oriented slice of the (separately pre-padded) neighbour on
the connected side, flipping along the parallel axis for reversed links
and transposing for swapped-axis links (reference
``_prepad_right_*`` helpers, test_padding.py:141-306).
"""

import numpy as np
import pytest

from xgcm_tpu import Dataset, Grid, GriddedArray
from xgcm_tpu.core.padding import pad

N = 5

WIDTH_CASES = [
    {"X": (1, 1)},
    {"X": (1, 2)},
    {"X": (0, 1)},
    {"X": (1, 1), "Y": (1, 1)},
    {"X": (2, 2), "Y": (2, 2)},
    {"X": (0, 1), "Y": (1, 0)},
    {"X": (0, 2), "Y": (1, 0)},
]


def _faces_ds():
    return Dataset(
        coords={
            "x": ("x", np.arange(N, dtype=float), {"axis": "X"}),
            "xl": (
                "xl",
                np.arange(N) - 0.5,
                {"axis": "X", "c_grid_axis_shift": -0.5},
            ),
            "y": ("y", np.arange(N, dtype=float), {"axis": "Y"}),
            "yl": (
                "yl",
                np.arange(N) - 0.5,
                {"axis": "Y", "c_grid_axis_shift": -0.5},
            ),
            "face": ("face", np.arange(2.0)),
        }
    )


def _grid(face_connections):
    return Grid(
        _faces_ds(),
        face_connections=face_connections,
        boundary="fill",
    )


def _run(face_connections, boundary_width, fill_value, oracle):
    rng = np.random.RandomState(42)
    data = rng.rand(2, N, N)
    grid = _grid(face_connections)
    bw = dict(boundary_width)
    bw.setdefault("Y", (0, 0))

    da = GriddedArray(data, ("face", "y", "x"))
    result = pad(
        da,
        grid,
        boundary_width=bw,
        boundary="fill",
        fill_value=fill_value,
    )
    expected = oracle(data, bw["X"], bw["Y"], fill_value)
    np.testing.assert_allclose(np.asarray(result.data), expected)


def _P(a, xw, yw, fv):
    """constant-pad a (y, x) slab; fv=nan allowed"""
    return np.pad(a, ((yw[0], yw[1]), (xw[0], xw[1])), constant_values=fv)


def _empty_tail(a, axis, w):
    """last w entries along axis, empty when w == 0 (the reference's
    slice(-w, None if w else 0) idiom)."""
    if w == 0:
        return a[(slice(None),) * axis + (slice(0, 0),)]
    return a[(slice(None),) * axis + (slice(-w, None),)]


@pytest.mark.parametrize("fill_value", [np.nan, 0])
@pytest.mark.parametrize("boundary_width", WIDTH_CASES)
class TestPaddingFaceConnection:
    def test_face_connections_right_left_same_axis(
        self, boundary_width, fill_value
    ):
        fc = {
            "face": {
                0: {"X": (None, (1, "X", False))},
                1: {"X": ((0, "X", False), None)},
            }
        }

        def oracle(data, xw, yw, fv):
            f0p = _P(data[0], (xw[0], 0), yw, fv)
            f1p = _P(data[1], (0, xw[1]), yw, fv)
            f0e = np.concatenate([f0p, f1p[:, : xw[0 + 1]]], axis=1)
            f1e = np.concatenate([_empty_tail(f0p, 1, xw[0]), f1p], axis=1)
            return np.stack([f0e, f1e])

        _run(fc, boundary_width, fill_value, oracle)

    def test_face_connections_right_right_same_axis(
        self, boundary_width, fill_value
    ):
        fc = {
            "face": {
                0: {"X": (None, (1, "X", True))},
                1: {"X": (None, (0, "X", True))},
            }
        }

        def oracle(data, xw, yw, fv):
            f0p = _P(data[0], (xw[0], 0), yw, fv)
            f1p = _P(data[1], (xw[0], 0), yw, fv)
            f0add = _empty_tail(f1p, 1, xw[1])[:, ::-1]
            f1add = _empty_tail(f0p, 1, xw[1])[:, ::-1]
            f0e = np.concatenate([f0p, f0add], axis=1)
            f1e = np.concatenate([f1p, f1add], axis=1)
            return np.stack([f0e, f1e])

        _run(fc, boundary_width, fill_value, oracle)

    def test_face_connections_right_left_swap_axis(
        self, boundary_width, fill_value
    ):
        fc = {
            "face": {
                0: {"X": (None, (1, "Y", False))},
                1: {"Y": ((0, "X", False), None)},
            }
        }

        def oracle(data, xw, yw, fv):
            f0p = _P(data[0], (xw[0], 0), yw, fv)
            f1p = _P(data[1], xw, (0, yw[1]), fv)
            # swapped pre-pads (reference test_padding.py:193-236)
            f0ps = _P(data[0], (yw[0], 0), (xw[1], xw[0]), fv)
            f1ps = _P(data[1], (yw[1], yw[0]), (0, xw[1]), fv)
            f0add = f1ps[: xw[1], :][:, ::-1].T
            f1add = _empty_tail(f0ps, 1, yw[0])[::-1, :].T
            f0e = np.concatenate([f0p, f0add], axis=1)
            f1e = np.concatenate([f1add, f1p], axis=0)
            return np.stack([f0e, f1e])

        _run(fc, boundary_width, fill_value, oracle)

    def test_face_connections_right_right_swap_axis(
        self, boundary_width, fill_value
    ):
        fc = {
            "face": {
                0: {"X": (None, (1, "Y", True))},
                1: {"Y": (None, (0, "X", True))},
            }
        }

        def oracle(data, xw, yw, fv):
            f0p = _P(data[0], (xw[0], 0), yw, fv)
            f1p = _P(data[1], xw, (yw[0], 0), fv)
            # swapped pre-pads (reference test_padding.py:239-306)
            f0ps = _P(data[0], (yw[0], 0), xw, fv)
            f1ps = _P(data[1], yw, (xw[0], 0), fv)
            f0add = _empty_tail(f1ps, 0, xw[1])[::-1, :].T
            f1add = _empty_tail(f0ps, 1, yw[1])[:, ::-1].T
            f0e = np.concatenate([f0p, f0add], axis=1)
            f1e = np.concatenate([f1p, f1add], axis=0)
            return np.stack([f0e, f1e])

        _run(fc, boundary_width, fill_value, oracle)


def _vec_uv():
    """u on (face, xl, y), v on (face, x, yl) — the reference's C-grid
    vector layout (test_faceconnections.py:10-20).  Slab axis order is
    (x-like, y-like) for BOTH components."""
    rng = np.random.RandomState(7)
    return rng.rand(2, N, N), rng.rand(2, N, N)


def _run_vector(face_connections, boundary_width, fill_value, oracle_u,
                oracle_v):
    u_np, v_np = _vec_uv()
    grid = _grid(face_connections)
    bw = dict(boundary_width)
    bw.setdefault("Y", (0, 0))

    u = GriddedArray(u_np, ("face", "xl", "y"))
    v = GriddedArray(v_np, ("face", "x", "yl"))

    u_result = pad(
        {"X": u}, grid, boundary_width=bw, boundary="fill",
        fill_value=fill_value, other_component={"Y": v},
    )
    v_result = pad(
        {"Y": v}, grid, boundary_width=bw, boundary="fill",
        fill_value=fill_value, other_component={"X": u},
    )
    if isinstance(u_result, dict):
        (u_result,) = u_result.values()
    if isinstance(v_result, dict):
        (v_result,) = v_result.values()
    np.testing.assert_allclose(
        np.asarray(u_result.data),
        oracle_u(u_np, v_np, bw["X"], bw["Y"], fill_value),
    )
    np.testing.assert_allclose(
        np.asarray(v_result.data),
        oracle_v(u_np, v_np, bw["X"], bw["Y"], fill_value),
    )


def _head(a, axis, w):
    return a[(slice(None),) * axis + (slice(0, w),)]


@pytest.mark.parametrize("fill_value", [np.nan, 0])
@pytest.mark.parametrize("boundary_width", WIDTH_CASES)
class TestVectorPaddingFaceConnection:
    """Vector-component halo content for the four geometries (reference
    test_padding.py:587-1035).  Slabs are (x-like, y-like)-ordered; the
    reference's rename-then-concat steps become numpy transposes."""

    def test_vector_face_connections_right_left_same_axis(
        self, boundary_width, fill_value
    ):
        fc = {
            "face": {
                0: {"X": (None, (1, "X", False))},
                1: {"X": ((0, "X", False), None)},
            }
        }

        def _same_axis_rl(a, xw, yw, fv):
            f0p = _P(a[0].T, (xw[0], 0), yw, fv).T  # pad x on axis 0
            f1p = _P(a[1].T, (0, xw[1]), yw, fv).T
            f0e = np.concatenate([f0p, _head(f1p, 0, xw[1])], axis=0)
            f1e = np.concatenate([_empty_tail(f0p, 0, xw[0]), f1p], axis=0)
            return np.stack([f0e, f1e])

        _run_vector(
            fc, boundary_width, fill_value,
            lambda u, v, xw, yw, fv: _same_axis_rl(u, xw, yw, fv),
            lambda u, v, xw, yw, fv: _same_axis_rl(v, xw, yw, fv),
        )

    def test_vector_face_connections_right_right_same_axis(
        self, boundary_width, fill_value
    ):
        fc = {
            "face": {
                0: {"X": (None, (1, "X", True))},
                1: {"X": (None, (0, "X", True))},
            }
        }

        def _same_axis_rr(a, xw, yw, fv, sign):
            f0p = _P(a[0].T, (xw[0], 0), yw, fv).T
            f1p = _P(a[1].T, (xw[0], 0), yw, fv).T
            f0add = sign * _empty_tail(f1p, 0, xw[1])[::-1, :]
            f1add = sign * _empty_tail(f0p, 0, xw[1])[::-1, :]
            f0e = np.concatenate([f0p, f0add], axis=0)
            f1e = np.concatenate([f1p, f1add], axis=0)
            return np.stack([f0e, f1e])

        _run_vector(
            fc, boundary_width, fill_value,
            # orthogonal component u is negated on the reversed link;
            # tangential v is only strip-flipped
            lambda u, v, xw, yw, fv: _same_axis_rr(u, xw, yw, fv, -1.0),
            lambda u, v, xw, yw, fv: _same_axis_rr(v, xw, yw, fv, 1.0),
        )

    def test_vector_face_connections_right_left_swap_axis(
        self, boundary_width, fill_value
    ):
        fc = {
            "face": {
                0: {"X": (None, (1, "Y", False))},
                1: {"Y": ((0, "X", False), None)},
            }
        }

        def oracle_u(u, v, xw, yw, fv):
            xlo, xhi = xw
            ylo, yhi = yw
            u0p = np.pad(u[0], ((xlo, 0), (ylo, yhi)), constant_values=fv)
            u1p = np.pad(u[1], ((xlo, xhi), (0, yhi)), constant_values=fv)
            v0ps = np.pad(v[0], ((ylo, 0), (xhi, xlo)), constant_values=fv)
            v1ps = np.pad(v[1], ((yhi, ylo), (0, xhi)), constant_values=fv)
            # halo strips come from the PARTNER component on swap links
            f0add = (_head(v1ps, 1, xhi)[::-1, :]).T
            f1add = (-(_empty_tail(v0ps, 0, ylo)[:, ::-1])).T
            f0e = np.concatenate([u0p, f0add], axis=0)
            f1e = np.concatenate([f1add, u1p], axis=1)
            return np.stack([f0e, f1e])

        def oracle_v(u, v, xw, yw, fv):
            xlo, xhi = xw
            ylo, yhi = yw
            v0p = np.pad(v[0], ((xlo, 0), (ylo, yhi)), constant_values=fv)
            v1p = np.pad(v[1], ((xlo, xhi), (0, yhi)), constant_values=fv)
            u0ps = np.pad(u[0], ((ylo, 0), (xhi, xlo)), constant_values=fv)
            u1ps = np.pad(u[1], ((yhi, ylo), (0, xhi)), constant_values=fv)
            f0add = (-(_head(u1ps, 1, xhi)[::-1, :])).T
            f1add = (_empty_tail(u0ps, 0, ylo)[:, ::-1]).T
            f0e = np.concatenate([v0p, f0add], axis=0)
            f1e = np.concatenate([f1add, v1p], axis=1)
            return np.stack([f0e, f1e])

        _run_vector(fc, boundary_width, fill_value, oracle_u, oracle_v)

    def test_vector_face_connections_right_right_swap_axis(
        self, boundary_width, fill_value
    ):
        fc = {
            "face": {
                0: {"X": (None, (1, "Y", True))},
                1: {"Y": (None, (0, "X", True))},
            }
        }

        def oracle_u(u, v, xw, yw, fv):
            xlo, xhi = xw
            ylo, yhi = yw
            u0p = np.pad(u[0], ((xlo, 0), (ylo, yhi)), constant_values=fv)
            u1p = np.pad(u[1], ((xlo, xhi), (ylo, 0)), constant_values=fv)
            v0ps = np.pad(v[0], ((ylo, 0), (xlo, xhi)), constant_values=fv)
            v1ps = np.pad(v[1], ((ylo, yhi), (xlo, 0)), constant_values=fv)
            f0add = (-(_empty_tail(v1ps, 1, xhi)[:, ::-1])).T
            f1add = (_empty_tail(v0ps, 0, yhi)[::-1, :]).T
            f0e = np.concatenate([u0p, f0add], axis=0)
            f1e = np.concatenate([u1p, f1add], axis=1)
            return np.stack([f0e, f1e])

        def oracle_v(u, v, xw, yw, fv):
            xlo, xhi = xw
            ylo, yhi = yw
            v0p = np.pad(v[0], ((xlo, 0), (ylo, yhi)), constant_values=fv)
            v1p = np.pad(v[1], ((xlo, xhi), (ylo, 0)), constant_values=fv)
            u0ps = np.pad(u[0], ((ylo, 0), (xlo, xhi)), constant_values=fv)
            u1ps = np.pad(u[1], ((ylo, yhi), (xlo, 0)), constant_values=fv)
            f0add = (_empty_tail(u1ps, 1, xhi)[:, ::-1]).T
            f1add = (-(_empty_tail(u0ps, 0, yhi)[::-1, :])).T
            f0e = np.concatenate([v0p, f0add], axis=0)
            f1e = np.concatenate([v1p, f1add], axis=1)
            return np.stack([f0e, f1e])

        _run_vector(fc, boundary_width, fill_value, oracle_u, oracle_v)
