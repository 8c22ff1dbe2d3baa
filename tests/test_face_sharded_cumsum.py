"""Face-sharded cumsum: explicit per-face plan instead of the GSPMD
fallthrough (VERDICT r2 item 10).

Single-device ``Grid.cumsum`` supports face grids whose connections do not
swap axes (the trim makes faces non-square, and the assembly — ours and
the reference's xarray concat alike — fails on swapped links; the
reference has no face-connected cumsum tests at all).  The sharded path
must match single-device exactly where it works, raise cleanly where it
cannot, and never gather whole faces."""

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

from .datasets import cubed_sphere_dataset


def _ring(ny=8, nx=12, reversed_link=False, periodic_y=True):
    ds = Dataset(coords={
        "x": ("x", np.arange(nx) + 0.5, {"axis": "X"}),
        "xl": ("xl", np.arange(nx) * 1.0,
               {"axis": "X", "c_grid_axis_shift": -0.5}),
        "y": ("y", np.arange(ny) + 0.5, {"axis": "Y"}),
        "yl": ("yl", np.arange(ny) * 1.0,
               {"axis": "Y", "c_grid_axis_shift": -0.5}),
        "face": ("face", np.arange(4)),
    })
    if reversed_link:
        fc = {"face": {
            0: {"X": (None, (1, "X", False))},
            1: {"X": ((0, "X", False), (2, "X", True))},
            2: {"X": ((3, "X", False), (1, "X", True))},
            3: {"X": (None, (2, "X", False))},
        }}
    else:
        fc = {"face": {
            0: {"X": ((3, "X", False), (1, "X", False))},
            1: {"X": ((0, "X", False), (2, "X", False))},
            2: {"X": ((1, "X", False), (3, "X", False))},
            3: {"X": ((2, "X", False), (0, "X", False))},
        }}
    grid = Grid(ds, face_connections=fc)
    rng = np.random.RandomState(3)
    da = GriddedArray(rng.rand(4, ny, nx), ("face", "y", "x"), name="c")
    return grid, da


def _match(s, e):
    assert s.dims == e.dims
    np.testing.assert_allclose(np.asarray(s.data), np.asarray(e.data),
                               rtol=1e-12)


class TestFaceShardedCumsum:
    @pytest.mark.parametrize("axis", ["X", "Y"])
    @pytest.mark.parametrize("boundary", ["fill", "extend", "periodic"])
    def test_ring_matches_single_device(self, axis, boundary):
        grid, da = _ring()
        mesh = make_mesh({"f": 4}, devices=jax.devices()[:4])
        sh = shard_gridded(da, mesh, {"face": "f"})
        s = sharded_face_cumsum(
            grid, sh, axis, mesh, "f", "X", "Y", to="left",
            boundary=boundary,
        )
        e = grid.cumsum(da, axis, to="left", boundary=boundary)
        _match(s, e)

    def test_reversed_links(self):
        grid, da = _ring(reversed_link=True)
        mesh = make_mesh({"f": 4}, devices=jax.devices()[:4])
        sh = shard_gridded(da, mesh, {"face": "f"})
        s = sharded_face_cumsum(
            grid, sh, "X", mesh, "f", "X", "Y", to="left", boundary="fill"
        )
        e = grid.cumsum(da, "X", to="left", boundary="fill")
        _match(s, e)

    @pytest.mark.parametrize("axis", ["X", "Y"])
    def test_interior_sharded(self, axis):
        """Rows sharded over a second mesh axis: the prefix sum offsets
        ride an all_gather of block totals, the shift element a strip
        exchange."""
        grid, da = _ring()
        mesh = make_mesh({"f": 4, "r": 2}, devices=jax.devices()[:8])
        sh = shard_gridded(da, mesh, {"face": "f", "y": "r"})
        s = sharded_face_cumsum(
            grid, sh, axis, mesh, "f", "X", "Y", to="left",
            boundary="fill", interior_mesh_axis="r",
        )
        e = grid.cumsum(da, axis, to="left", boundary="fill")
        _match(s, e)

    def test_interior_sharded_bool(self):
        """Bool cumsum (land-mask counting) with the SUMMED dim sharded:
        the cross-shard prefix offset must keep the cumsum's int dtype —
        casting it to the block's bool dtype clamps every offset to 0/1.
        Only this configuration reaches the offset path (the face-only
        tests never set interior_mesh_axis), so it pins the face twin of
        the halo.py fix."""
        grid, _ = _ring()
        da = GriddedArray(
            np.random.RandomState(7).rand(4, 8, 12) > 0.4,
            ("face", "y", "x"), name="m",
        )
        mesh = make_mesh({"f": 4, "r": 2}, devices=jax.devices()[:8])
        sh = shard_gridded(da, mesh, {"face": "f", "y": "r"})
        s = sharded_face_cumsum(
            grid, sh, "Y", mesh, "f", "X", "Y", to="left",
            boundary="fill", interior_mesh_axis="r",
        )
        e = grid.cumsum(da, "Y", to="left", boundary="fill")
        assert np.asarray(s.data).dtype == np.asarray(e.data).dtype
        _match(s, e)

    def test_noshift_pair(self):
        """left -> center needs no pad at all (reference grid.py:1131)."""
        grid, _ = _ring()
        rng = np.random.RandomState(5)
        da = GriddedArray(rng.rand(4, 8, 12), ("face", "y", "xl"), name="u")
        mesh = make_mesh({"f": 4}, devices=jax.devices()[:4])
        sh = shard_gridded(da, mesh, {"face": "f"})
        s = sharded_face_cumsum(
            grid, sh, "X", mesh, "f", "X", "Y", to="center", boundary="fill"
        )
        e = grid.cumsum(da, "X", to="center", boundary="fill")
        _match(s, e)

    def test_through_sharded_grid(self):
        grid, da = _ring()
        mesh = make_mesh({"f": 4}, devices=jax.devices()[:4])
        sg = ShardedGrid(grid, mesh, {"face": "f"})
        s = sg.cumsum(sg.shard(da), "X", to="left", boundary="fill")
        e = grid.cumsum(da, "X", to="left", boundary="fill")
        _match(s, e)

    def test_swap_connections_raise(self):
        ds, fc = cubed_sphere_dataset(n=8)
        grid = Grid(ds, face_connections=fc)
        da = ds["data_c"]
        mesh = make_mesh({"f": 6}, devices=jax.devices()[:6])
        sh = shard_gridded(da, mesh, {"face": "f"})
        with pytest.raises(NotImplementedError, match="swap"):
            sharded_face_cumsum(
                grid, sh, "X", mesh, "f", "X", "Y", to="left",
                boundary="fill",
            )

    def test_collective_cost_is_strips_only(self):
        """The plan issues strip collectives only — no all-to-all, and the
        gathered strip stack is O(w * L) per face, not a face gather."""
        grid, da = _ring()
        mesh = make_mesh({"f": 4}, devices=jax.devices()[:4])

        def run(d):
            ga = GriddedArray(d, da.dims, name="c")
            return sharded_face_cumsum(
                grid, ga, "X", mesh, "f", "X", "Y", to="left",
                boundary="fill",
            ).data

        jaxpr = jax.make_jaxpr(run)(da.data)

        def walk(jx, found):
            for eqn in jx.eqns:
                found.append(eqn)
                for v in eqn.params.values():
                    inner = getattr(v, "jaxpr", None)
                    if inner is not None and hasattr(inner, "eqns"):
                        walk(inner, found)
                    elif hasattr(v, "eqns"):
                        walk(v, found)
            return found

        eqns = walk(jaxpr.jaxpr, [])
        assert not any("all_to_all" in e.primitive.name for e in eqns)
        gathers = [e for e in eqns if "all_gather" in e.primitive.name]
        # exactly one strip-stack gather; each gathered operand is the
        # (fpd, 4, w, Lmax) canonical stack — tiny next to a (fpd, ny, nx)
        # face block
        assert len(gathers) == 1, [str(g) for g in gathers]
        (g,) = gathers
        strip_elems = int(np.prod(g.invars[0].aval.shape))
        face_elems = int(np.prod(da.data.shape[-2:]))
        assert strip_elems < face_elems
