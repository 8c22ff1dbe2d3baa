"""Opt-in reassociated (telescoped) conservative transform.

``transform(..., method="conservative", reassociate=True)`` selects a
telescoped cumulative-mass accumulator inside the fused TPU kernel
(``ops/pallas_transform._conservative_kernel``): instead of differencing
each cell's mass fractions inside the loop, it accumulates F at all m bin
edges and differences once after the loop.  Mathematically identical to
the exact kernel; the f32 sums are REASSOCIATED, so results agree with
the default only to float-summation tolerance (~1e-6 abs on 50-cell
columns) — measured 5-22% faster on v5e (BASELINE.md round 4).

The default stays bit-exact vs the XLA formulation (the bench.py
hardware gate); this suite pins the opt-in variant's semantics in
interpret mode: NaN rules, degenerate cells, bin flips, conservation,
gradients, and the API contract (conservative-only, accepted everywhere
``transform`` is).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from xgcm_tpu import Dataset, Grid, GriddedArray
from xgcm_tpu.ops.pallas_transform import (
    conservative_fused,
    conservative_fused_ad,
    conservative_fused_multi,
)
from xgcm_tpu.ops.transform import _conservative_rebin

pytestmark = pytest.mark.quick


def _fixture(cols=64, n=12, m=9, seed=0, with_nans=True):
    """Columns with NaN bounds, NaN data, and degenerate (zero-thickness)
    cells — the cases the kernel's sentinel/step-function folds must get
    right."""
    rng = np.random.default_rng(seed)
    th = np.sort(rng.uniform(0.0, 10.0, (cols, n + 1)).astype(np.float32), -1)
    ph = rng.uniform(-1.0, 1.0, (cols, n)).astype(np.float32)
    if with_nans:
        th[0, 3] = np.nan          # single-NaN bound -> homogeneous cell
        th[1, 4] = th[1, 5]        # degenerate cell
        th[2, 0] = th[2, 1] = np.nan  # double-NaN bound -> empty cell
        ph[3, 2] = np.nan          # NaN data -> excluded cell
    edges = np.linspace(0.0, 10.0, m).astype(np.float32)
    return th, ph, edges


def _oracle(th, ph, edges):
    out, cnt = _conservative_rebin(
        jnp.asarray(ph),
        jnp.asarray(th[..., :-1]),
        jnp.asarray(th[..., 1:]),
        jnp.asarray(edges),
    )
    return np.asarray(jnp.where(cnt > 0, out, jnp.nan))


def _assert_close(a, b, atol=5e-6):
    a, b = np.asarray(a), np.asarray(b)
    np.testing.assert_array_equal(np.isnan(a), np.isnan(b))
    np.testing.assert_allclose(
        np.nan_to_num(a), np.nan_to_num(b), rtol=1e-5, atol=atol
    )


class TestReassociatedKernel:
    def test_matches_oracle_with_nans_and_degenerates(self):
        th, ph, edges = _fixture()
        with pltpu.force_tpu_interpret_mode():
            fast = conservative_fused(
                jnp.asarray(th), jnp.asarray(ph), jnp.asarray(edges),
                reassociate=True,
            )
        _assert_close(fast, _oracle(th, ph, edges))

    def test_same_nan_pattern_as_exact_kernel(self):
        """The untouched-bin -> NaN rule and every exclusion rule are
        UNCHANGED by reassociation — only the mass sums reassociate."""
        th, ph, edges = _fixture(seed=3)
        with pltpu.force_tpu_interpret_mode():
            exact = conservative_fused(
                jnp.asarray(th), jnp.asarray(ph), jnp.asarray(edges)
            )
            fast = conservative_fused(
                jnp.asarray(th), jnp.asarray(ph), jnp.asarray(edges),
                reassociate=True,
            )
        _assert_close(fast, exact)

    def test_conserves_total_mass(self):
        th, ph, edges = _fixture(with_nans=False)
        # bins spanning all cells: total deposited mass == total input mass
        edges = np.linspace(-1.0, 11.0, 13).astype(np.float32)
        with pltpu.force_tpu_interpret_mode():
            fast = conservative_fused(
                jnp.asarray(th), jnp.asarray(ph), jnp.asarray(edges),
                reassociate=True,
            )
        np.testing.assert_allclose(
            np.nansum(np.asarray(fast), axis=-1), ph.sum(-1), rtol=1e-5,
            atol=1e-5,
        )

    def test_multi_variable(self):
        th, ph, edges = _fixture(seed=5)
        with pltpu.force_tpu_interpret_mode():
            outs = conservative_fused_multi(
                jnp.asarray(th),
                (jnp.asarray(ph), jnp.asarray(2.0 * ph)),
                jnp.asarray(edges),
                reassociate=True,
            )
        oracle = _oracle(th, ph, edges)
        _assert_close(outs[0], oracle)
        _assert_close(outs[1], 2.0 * oracle)

    def test_gradients_flow(self):
        th, ph, edges = _fixture(with_nans=False)
        with pltpu.force_tpu_interpret_mode():
            g_fast = jax.grad(
                lambda p: jnp.nansum(
                    conservative_fused_ad(
                        jnp.asarray(th), p, jnp.asarray(edges), True
                    )
                )
            )(jnp.asarray(ph))
            g_exact = jax.grad(
                lambda p: jnp.nansum(
                    conservative_fused_ad(
                        jnp.asarray(th), p, jnp.asarray(edges), False
                    )
                )
            )(jnp.asarray(ph))
        # the backward pass differentiates the SAME exact jnp formulation
        # either way (reassociate is forward-only)
        np.testing.assert_array_equal(np.asarray(g_fast), np.asarray(g_exact))


NZ = 12


@pytest.fixture()
def zgrid():
    zc = np.arange(NZ) + 0.5
    zo = np.arange(NZ + 1, dtype=float)
    ds = Dataset(coords={"zc": ("zc", zc), "zo": ("zo", zo)})
    grid = Grid(
        ds,
        coords={"Z": {"center": "zc", "outer": "zo"}},
        periodic=False,
        autoparse_metadata=False,
    )
    return ds, grid


class TestReassociateAPI:
    def test_conservative_accepts_flag(self, zgrid):
        """On the XLA fallback path (CPU) the flag is a no-op by
        construction: identical results, flag threaded without error."""
        ds, grid = zgrid
        da = GriddedArray(np.random.default_rng(0).random(NZ), ("zc",), name="q")
        sigma = GriddedArray(np.linspace(20, 30, NZ + 1), ("zo",), name="sigma")
        bins = np.linspace(19, 31, 7)
        base = grid.transform(
            da, "Z", bins, target_data=sigma, method="conservative"
        )
        fast = grid.transform(
            da, "Z", bins, target_data=sigma, method="conservative",
            reassociate=True,
        )
        np.testing.assert_array_equal(
            np.asarray(base.data), np.asarray(fast.data)
        )

    def test_linear_rejects_flag(self, zgrid):
        ds, grid = zgrid
        da = GriddedArray(np.random.default_rng(1).random(NZ), ("zc",))
        with pytest.raises(ValueError, match="only applies to method='conservative'"):
            grid.transform(da, "Z", np.array([1.0, 2.0]), reassociate=True)

    def test_transform_multi_threads_flag(self, zgrid):
        ds, grid = zgrid
        rng = np.random.default_rng(2)
        das = [
            GriddedArray(rng.random(NZ), ("zc",), name=f"v{i}")
            for i in range(2)
        ]
        sigma = GriddedArray(np.linspace(20, 30, NZ + 1), ("zo",), name="sigma")
        bins = np.linspace(19, 31, 7)
        base = grid.transform_multi(
            das, "Z", bins, target_data=sigma, method="conservative"
        )
        fast = grid.transform_multi(
            das, "Z", bins, target_data=sigma, method="conservative",
            reassociate=True,
        )
        for b, f in zip(base, fast):
            np.testing.assert_array_equal(np.asarray(b.data), np.asarray(f.data))

    def test_transform_multi_linear_rejects_flag(self, zgrid):
        ds, grid = zgrid
        da = GriddedArray(np.random.default_rng(3).random(NZ), ("zc",))
        with pytest.raises(ValueError, match="only applies to method='conservative'"):
            grid.transform_multi(
                [da, da], "Z", np.array([1.0, 2.0]), reassociate=True
            )


def test_sharded_transform_accepts_flag():
    """ShardedGrid.transform forwards reassociate; sharded == unsharded ==
    exact on the CPU XLA path (the flag only changes the TPU kernel)."""
    import jax

    from xgcm_tpu.parallel import ShardedGrid, make_mesh, shard_gridded

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    ncol = 16
    ds = Dataset(
        coords={
            "zc": ("zc", np.arange(NZ) + 0.5),
            "zo": ("zo", np.arange(NZ + 1, dtype=float)),
            "col": ("col", np.arange(ncol) * 1.0),
        }
    )
    grid = Grid(
        ds,
        coords={"Z": {"center": "zc", "outer": "zo"}},
        periodic=False,
        autoparse_metadata=False,
    )
    rng = np.random.default_rng(4)
    da = GriddedArray(rng.random((NZ, ncol)), ("zc", "col"), name="q")
    sig = GriddedArray(
        np.sort(rng.random((NZ + 1, ncol)), axis=0) * 10, ("zo", "col"),
        name="s",
    )
    bins = np.linspace(-1.0, 11.0, 7)

    base = grid.transform(
        da, "Z", bins, target_data=sig, method="conservative"
    )
    mesh = make_mesh({"m": min(8, len(jax.devices()))})
    sgrid = ShardedGrid(grid, mesh, {"col": "m"})
    out = sgrid.transform(
        shard_gridded(da, mesh, {"col": "m"}), "Z", bins,
        target_data=shard_gridded(sig, mesh, {"col": "m"}),
        method="conservative", reassociate=True,
    )
    a, b = np.asarray(base.data), np.asarray(out.data)
    np.testing.assert_array_equal(np.isnan(a), np.isnan(b))
    np.testing.assert_allclose(np.nan_to_num(a), np.nan_to_num(b))
