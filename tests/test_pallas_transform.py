"""Pallas linear-transform column kernel: interpreter-mode correctness
(compiled-mode equivalence + throughput are checked on real TPU by
bench.py).  The kernel must be np.interp-exact inside the knot range;
edge clamps and NaN masking live in the jnp wrapper."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from xgcm_tpu.ops.pallas_transform import (
    _membership_jnp,
    interp_linear_columns,
    interp_linear_columns_ad,
)


def _columns(cols=64, n=50, seed=0):
    rng = np.random.RandomState(seed)
    th = np.sort(rng.rand(cols, n).astype(np.float32), -1) * 30
    ph = rng.rand(cols, n).astype(np.float32)
    return th, ph


class TestKernel:
    def test_matches_np_interp_inside_range(self):
        th, ph = _columns()
        tt = np.linspace(1, 29, 36).astype(np.float32)
        with pltpu.force_tpu_interpret_mode():
            out = np.asarray(
                interp_linear_columns(
                    jnp.asarray(th), jnp.asarray(ph), jnp.asarray(tt),
                    tile_cols=16,
                )
            )
        for c in range(th.shape[0]):
            exp = np.interp(tt, th[c], ph[c])
            inside = (tt >= th[c, 0]) & (tt < th[c, -1])
            np.testing.assert_allclose(
                out[c][inside], exp[inside], rtol=1e-5, atol=1e-6
            )

    def test_matches_jnp_membership_reference(self):
        th, ph = _columns(seed=5)
        tt = np.linspace(-2, 33, 24).astype(np.float32)
        with pltpu.force_tpu_interpret_mode():
            out = interp_linear_columns(
                jnp.asarray(th), jnp.asarray(ph), jnp.asarray(tt),
                tile_cols=16,
            )
        ref = _membership_jnp(jnp.asarray(th), jnp.asarray(ph), jnp.asarray(tt))
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6
        )

    def test_nan_tail_sanitised_columns(self):
        """+inf-sanitised NaN tails: targets beyond the last valid knot get
        that knot's value (slope-0 trailing interval; the wrapper's edge
        clamp yields the identical value)."""
        th, ph = _columns(cols=16, n=10, seed=2)
        th_s = th.copy()
        th_s[:, 7:] = np.inf  # sanitised NaN region
        tt = np.linspace(0, 40, 12).astype(np.float32)
        with pltpu.force_tpu_interpret_mode():
            out = np.asarray(
                interp_linear_columns(
                    jnp.asarray(th_s), jnp.asarray(ph), jnp.asarray(tt),
                    tile_cols=8,
                )
            )
        for c in range(16):
            exp = np.interp(tt, th[c, :7], ph[c, :7])
            # below-range targets are the wrapper's edge-clamp job
            sel = tt >= th[c, 0]
            np.testing.assert_allclose(
                out[c][sel], exp[sel], rtol=1e-5, atol=1e-6
            )

    def test_grad_flows_through_custom_vjp(self):
        th, ph = _columns(cols=16, n=12, seed=3)
        tt = np.linspace(1, 29, 8).astype(np.float32)

        def loss_pallas(p):
            with pltpu.force_tpu_interpret_mode():
                return jnp.sum(
                    interp_linear_columns_ad(
                        jnp.asarray(th), p, jnp.asarray(tt)
                    )
                )

        def loss_ref(p):
            return jnp.sum(
                _membership_jnp(jnp.asarray(th), p, jnp.asarray(tt))
            )

        g = jax.grad(loss_pallas)(jnp.asarray(ph))
        g_ref = jax.grad(loss_ref)(jnp.asarray(ph))
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(g_ref), rtol=1e-5, atol=1e-6
        )

    @pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
    def test_dtypes(self, dtype):
        th, ph = _columns(cols=16, n=10, seed=4)
        tt = np.linspace(1, 29, 8).astype(np.float32)
        th_j = jnp.asarray(th, dtype=dtype)
        ph_j = jnp.asarray(ph, dtype=dtype)
        tt_j = jnp.asarray(tt, dtype=dtype)
        with pltpu.force_tpu_interpret_mode():
            out = interp_linear_columns(th_j, ph_j, tt_j, tile_cols=8)
        assert str(out.dtype) == dtype
