"""Randomised fuzz of the face-connected dispatch: every (op, axis,
boundary, layout, scalar/vector) draw must give identical results through
the fused fast path and the generic pad-and-concat engine, with restored
dim order.  The cubed sphere exercises swapped/reversed connections; the
LLC grid exercises uneven face counts and unconnected edges."""

import numpy as np
import pytest

from xgcm_tpu import Grid, GriddedArray
from xgcm_tpu.core import gridops

from .datasets import cubed_sphere_dataset

GENERIC = {
    "diff": gridops.diff_center_to_left,
    "interp": gridops.interp_center_to_left,
    "min": gridops.min_center_to_left,
    "max": gridops.max_center_to_left,
}


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_cubed_sphere_dispatch(seed):
    rng = np.random.RandomState(200 + seed)
    n = int(rng.choice([4, 5, 6, 8]))
    ds, fc = cubed_sphere_dataset(n=n)
    grid = Grid(ds, face_connections=fc, periodic=False)
    op = str(rng.choice(list(GENERIC)))
    axis = str(rng.choice(["X", "Y"]))
    boundary = str(rng.choice(["periodic", "fill", "extend", "extrapolate"]))
    fill = float(rng.randn())
    with_batch = bool(rng.rand() < 0.5)

    dims = ["face", "y", "x"]
    shape = [6, n, n]
    if with_batch:
        dims = ["time"] + dims
        shape = [3] + shape
    order = rng.permutation(len(dims))
    dims_p = tuple(np.array(dims)[order])
    shape_p = tuple(np.array(shape)[order])
    da = GriddedArray(rng.rand(*shape_p), dims_p)

    fused = getattr(grid, op)(
        da, axis, to="left", boundary=boundary, fill_value=fill
    )
    generic = GENERIC[op](
        grid, da, axis=[(axis,)], boundary=boundary, fill_value=fill
    )
    assert fused.dims == generic.dims
    np.testing.assert_allclose(
        np.asarray(fused.data), np.asarray(generic.data),
        err_msg=f"{op} {axis} {boundary} dims={dims_p}",
    )


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_cubed_sphere_vector_dispatch(seed):
    rng = np.random.RandomState(300 + seed)
    n = int(rng.choice([4, 6]))
    ds, fc = cubed_sphere_dataset(n=n)
    grid = Grid(ds, face_connections=fc, periodic=False)
    op = str(rng.choice(["diff", "interp"]))
    axis = str(rng.choice(["X", "Y"]))
    boundary = str(rng.choice(["fill", "extend", "periodic"]))
    vec_axis = str(rng.choice(["X", "Y"]))
    other_ax = "Y" if vec_axis == "X" else "X"

    arr = GriddedArray(rng.rand(6, n, n), ("face", "y", "x"), name="a")
    partner = GriddedArray(rng.rand(6, n, n), ("face", "y", "x"), name="b")
    fused = getattr(grid, op)(
        {vec_axis: arr}, axis, to="left", boundary=boundary,
        other_component={other_ax: partner},
    )
    generic = GENERIC[op](
        grid, {vec_axis: arr}, axis=[(axis,)], boundary=boundary,
        other_component={other_ax: partner},
    )
    assert fused.dims == generic.dims
    np.testing.assert_allclose(
        np.asarray(fused.data), np.asarray(generic.data),
        err_msg=f"{op} {vec_axis}-comp along {axis} ({boundary})",
    )


@pytest.mark.parametrize("seed", range(3))
def test_fuzz_llc_dispatch(seed):
    from xgcm_tpu.grids import llc_grid

    rng = np.random.RandomState(400 + seed)
    n = int(rng.choice([4, 8]))
    ds, grid = llc_grid(n=n)
    op = str(rng.choice(list(GENERIC)))
    axis = str(rng.choice(["X", "Y"]))
    boundary = str(rng.choice(["fill", "extend"]))
    da = GriddedArray(rng.rand(13, n, n), ("face", "y", "x"))
    fused = getattr(grid, op)(da, axis, to="left", boundary=boundary)
    generic = GENERIC[op](grid, da, axis=[(axis,)], boundary=boundary)
    assert fused.dims == generic.dims
    np.testing.assert_allclose(
        np.asarray(fused.data), np.asarray(generic.data),
        err_msg=f"LLC {op} {axis} {boundary}",
    )


def _sprinkle_nonfinite(rng, a):
    """Place NaN/inf at random positions, biased toward face edges (the
    halo sources): 0*NaN-style mask arithmetic anywhere in the halo
    machinery shows up as a fused-vs-generic NaN-footprint divergence."""
    flat = a.reshape(-1, *a.shape[-2:])
    ny, nx = a.shape[-2:]
    for _ in range(int(rng.randint(1, 5))):
        b = rng.randint(flat.shape[0])
        val = float(rng.choice([np.nan, np.inf, -np.inf]))
        if rng.rand() < 0.7:  # on an edge line
            side = rng.randint(4)
            if side == 0:
                flat[b, rng.randint(ny), 0] = val
            elif side == 1:
                flat[b, rng.randint(ny), nx - 1] = val
            elif side == 2:
                flat[b, 0, rng.randint(nx)] = val
            else:
                flat[b, ny - 1, rng.randint(nx)] = val
        else:
            flat[b, rng.randint(ny), rng.randint(nx)] = val
    return a


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_cubed_sphere_nonfinite(seed):
    """Fused == generic NaN/inf footprint, exactly — both at the small-n
    slice-fallback sizes and past the 128-lane windowed-extraction
    threshold (the bug class that survived until round 5: mask
    MULTIPLIES poison halos through 0*NaN)."""
    rng = np.random.RandomState(500 + seed)
    n = int(rng.choice([6, 8, 144, 160]))
    ds, fc = cubed_sphere_dataset(n=n)
    grid = Grid(ds, face_connections=fc, periodic=False)
    op = str(rng.choice(["diff", "interp"]))
    axis = str(rng.choice(["X", "Y"]))
    boundary = str(rng.choice(["periodic", "fill", "extend", "extrapolate"]))
    a = _sprinkle_nonfinite(rng, rng.rand(6, n, n))
    da = GriddedArray(a, ("face", "y", "x"))
    fused = getattr(grid, op)(da, axis, to="left", boundary=boundary)
    generic = GENERIC[op](grid, da, axis=[(axis,)], boundary=boundary)
    assert fused.dims == generic.dims
    np.testing.assert_array_equal(
        np.asarray(fused.data), np.asarray(generic.data),
        err_msg=f"{op} {axis} {boundary} n={n}",
    )


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_vector_nonfinite(seed):
    """Vector components: non-finite values on PARTNER edges must follow
    the generic engine's footprint through swapped/signed connections."""
    rng = np.random.RandomState(600 + seed)
    n = int(rng.choice([6, 144]))
    ds, fc = cubed_sphere_dataset(n=n)
    grid = Grid(ds, face_connections=fc, periodic=False)
    op = str(rng.choice(["diff", "interp"]))
    axis = str(rng.choice(["X", "Y"]))
    vec_axis = str(rng.choice(["X", "Y"]))
    other_ax = "Y" if vec_axis == "X" else "X"
    arr = GriddedArray(
        _sprinkle_nonfinite(rng, rng.rand(6, n, n)), ("face", "y", "x"),
        name="a",
    )
    partner = GriddedArray(
        _sprinkle_nonfinite(rng, rng.rand(6, n, n)), ("face", "y", "x"),
        name="b",
    )
    fused = getattr(grid, op)(
        {vec_axis: arr}, axis, to="left", boundary="fill",
        other_component={other_ax: partner},
    )
    generic = GENERIC[op](
        grid, {vec_axis: arr}, axis=[(axis,)], boundary="fill",
        other_component={other_ax: partner},
    )
    assert fused.dims == generic.dims
    np.testing.assert_array_equal(
        np.asarray(fused.data), np.asarray(generic.data),
        err_msg=f"{op} {vec_axis}-comp along {axis} n={n}",
    )
