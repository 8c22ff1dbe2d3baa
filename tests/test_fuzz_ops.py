"""Seeded randomized sweep: random shapes / position pairs / boundaries /
dim orders, all checked against the independent numpy oracle.  A cheap
property-style net over the whole op dispatch."""

import numpy as np
import pytest

from xgcm_tpu import Dataset, Grid, GriddedArray

from .reference_impl import WIDTHS, apply_op, cumsum_op

RNG = np.random.RandomState(1234)

POS_SIZES = {"center": 0, "left": 0, "right": 0, "inner": -1, "outer": +1}


def random_case(rng):
    op = rng.choice(["diff", "interp", "min", "max"])
    frm, to = list(WIDTHS.keys())[rng.randint(len(WIDTHS))]
    boundary = rng.choice(["periodic", "fill", "extend"])
    n = int(rng.randint(4, 20))
    n_extra = int(rng.randint(0, 3))
    extra_sizes = [int(rng.randint(1, 5)) for _ in range(n_extra)]
    core_pos = int(rng.randint(0, n_extra + 1))
    fill = float(rng.randn())
    return op, frm, to, boundary, n, extra_sizes, core_pos, fill


@pytest.mark.parametrize("trial", range(40))
def test_random_op_matches_oracle(trial):
    rng = np.random.RandomState(1000 + trial)
    op, frm, to, boundary, n, extra_sizes, core_pos, fill = random_case(rng)

    size_of = lambda pos: n + POS_SIZES[pos]
    dim_of = {"center": "xc"}
    other_dim = "xg"
    pos2dim = {frm: "xc" if frm == "center" else "xg"}
    pos2dim[to] = "xc" if to == "center" else "xg"

    coords = {
        d: (d, np.arange(size_of(p), dtype=float))
        for p, d in pos2dim.items()
    }
    extra_dims = [f"e{i}" for i in range(len(extra_sizes))]
    ds = Dataset(coords=coords, dims=dict(zip(extra_dims, extra_sizes)))
    grid = Grid(
        ds, coords={"X": pos2dim}, boundary=boundary,
        autoparse_metadata=False,
    )

    # build array with the core dim at a random position among extras
    dims = list(extra_dims)
    dims.insert(core_pos, pos2dim[frm])
    shape = [dict(zip(extra_dims, extra_sizes))[d] if d in extra_dims
             else size_of(frm) for d in dims]
    a = rng.randn(*shape)
    da = GriddedArray(a, dims)

    result = getattr(grid, op)(da, "X", to=to, fill_value=fill)

    # oracle acts along the last axis
    a_last = np.moveaxis(a, core_pos, -1)
    expected = apply_op(op, a_last, frm, to, boundary=boundary, fill_value=fill)
    expected = np.moveaxis(expected, -1, core_pos)

    expected_dims = list(dims)
    expected_dims[core_pos] = pos2dim[to]
    assert result.dims == tuple(expected_dims)
    np.testing.assert_allclose(
        np.asarray(result.data), expected, rtol=1e-12, atol=1e-12
    )


@pytest.mark.parametrize("trial", range(15))
def test_random_cumsum_matches_oracle(trial):
    rng = np.random.RandomState(7000 + trial)
    pairs = [
        ("center", "left"), ("center", "right"), ("center", "inner"),
        ("center", "outer"), ("left", "center"), ("right", "center"),
        ("inner", "center"), ("outer", "center"),
    ]
    frm, to = pairs[rng.randint(len(pairs))]
    boundary = rng.choice(["fill", "extend"])
    n = int(rng.randint(4, 16))

    size_of = lambda pos: n + POS_SIZES[pos]
    pos2dim = {frm: "xc" if frm == "center" else "xg",
               to: "xc" if to == "center" else "xg"}
    coords = {
        d: (d, np.arange(size_of(p), dtype=float)) for p, d in pos2dim.items()
    }
    grid = Grid(
        Dataset(coords=coords), coords={"X": pos2dim}, boundary=boundary,
        autoparse_metadata=False,
    )
    a = rng.randn(size_of(frm))
    result = grid.cumsum(GriddedArray(a, (pos2dim[frm],)), "X", to=to)
    expected = cumsum_op(a, frm, to, boundary=boundary)
    np.testing.assert_allclose(np.asarray(result.data), expected, rtol=1e-12)
