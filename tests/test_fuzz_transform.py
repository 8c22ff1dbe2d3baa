"""Seeded differential fuzz of the fused transform kernels.

Random columns with random NaN injection (bounds, data), random
degenerate (zero-thickness) cells, ascending/descending columns, and
increasing/decreasing targets — every case checked interpret-mode
against the XLA formulations that bench.py's hardware gate holds the
compiled kernels bit-exact to.  A property net over the kernel
semantics the fixed-case tests in test_pallas_transform.py pin
point-wise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from xgcm_tpu.ops.pallas_transform import (
    _fused_ref_jnp,
    conservative_fused,
    interp_linear_fused,
)
from xgcm_tpu.ops.transform import _conservative_rebin


def _assert_same(a, b, atol=1e-5):
    a, b = np.asarray(a), np.asarray(b)
    np.testing.assert_array_equal(np.isnan(a), np.isnan(b))
    np.testing.assert_allclose(
        np.nan_to_num(a), np.nan_to_num(b), rtol=1e-5, atol=atol
    )


def _random_columns(rng, cols, n, descending=False):
    th = np.sort(rng.uniform(0.0, 30.0, (cols, n)).astype(np.float32), -1)
    if descending:
        th = th[:, ::-1].copy()
    ph = rng.uniform(-2.0, 2.0, (cols, n)).astype(np.float32)
    # random NaN data cells (~5%)
    ph[rng.random((cols, n)) < 0.05] = np.nan
    return th, ph


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_linear_kernel_vs_jnp_replica(seed):
    rng = np.random.default_rng(9000 + seed)
    cols = int(rng.integers(2, 5)) * 16
    n = int(rng.integers(6, 50))
    m = int(rng.integers(2, 40))
    descending = bool(rng.integers(0, 2))
    mask_edges = bool(rng.integers(0, 2))
    th, ph = _random_columns(rng, cols, n, descending)
    tt = np.sort(rng.uniform(-3.0, 33.0, m).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        out = interp_linear_fused(
            jnp.asarray(th), jnp.asarray(ph), jnp.asarray(tt),
            tile_cols=16, mask_edges=mask_edges,
        )
    exp = _fused_ref_jnp(
        jnp.asarray(th), jnp.asarray(ph), jnp.asarray(tt),
        mask_edges=mask_edges,
    )
    _assert_same(out, exp)


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("reassociate", [False, True])
def test_fuzz_conservative_kernel_vs_oracle(seed, reassociate):
    rng = np.random.default_rng(7000 + seed)
    cols = int(rng.integers(2, 5)) * 16
    n = int(rng.integers(4, 40))
    m = int(rng.integers(3, 30))
    th = np.sort(rng.uniform(0.0, 20.0, (cols, n + 1)).astype(np.float32), -1)
    ph = rng.uniform(-2.0, 2.0, (cols, n)).astype(np.float32)
    # random NaN bounds (~4%), NaN data (~5%), degenerate cells (~5%)
    th[rng.random((cols, n + 1)) < 0.04] = np.nan
    ph[rng.random((cols, n)) < 0.05] = np.nan
    deg = rng.random((cols, n)) < 0.05
    for c, k in zip(*np.nonzero(deg)):
        th[c, k + 1] = th[c, k]
    edges = np.sort(rng.uniform(-1.0, 21.0, m).astype(np.float32))
    edges = np.unique(edges)
    if edges.shape[0] < 2:
        edges = np.array([0.0, 20.0], np.float32)
    with pltpu.force_tpu_interpret_mode():
        out = conservative_fused(
            jnp.asarray(th), jnp.asarray(ph), jnp.asarray(edges),
            reassociate=reassociate,
        )
    exp, cnt = _conservative_rebin(
        jnp.asarray(ph),
        jnp.asarray(th[:, :-1]),
        jnp.asarray(th[:, 1:]),
        jnp.asarray(edges),
    )
    exp = jnp.where(cnt > 0, exp, jnp.nan)
    _assert_same(out, exp)


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_conservative_mass_conservation(seed):
    """Bins spanning every (valid) cell: deposited mass equals the summed
    valid input mass per column, both kernel variants."""
    rng = np.random.default_rng(5000 + seed)
    cols, n = 32, int(rng.integers(5, 30))
    th = np.sort(rng.uniform(0.0, 20.0, (cols, n + 1)).astype(np.float32), -1)
    ph = rng.uniform(-2.0, 2.0, (cols, n)).astype(np.float32)
    edges = np.linspace(-1.0, 21.0, 11).astype(np.float32)
    for reassoc in (False, True):
        with pltpu.force_tpu_interpret_mode():
            out = conservative_fused(
                jnp.asarray(th), jnp.asarray(ph), jnp.asarray(edges),
                reassociate=reassoc,
            )
        np.testing.assert_allclose(
            np.nansum(np.asarray(out), -1), ph.sum(-1), rtol=1e-4, atol=1e-4
        )
