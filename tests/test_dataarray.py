"""GriddedArray unit tests: construction, labeled ops, broadcasting,
pytree behaviour."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xgcm_tpu import GriddedArray


class TestConstruction:
    def test_dims_mismatch(self):
        with pytest.raises(ValueError, match="dims"):
            GriddedArray(np.zeros((2, 3)), ("a",))

    def test_duplicate_dims(self):
        with pytest.raises(ValueError, match="duplicate"):
            GriddedArray(np.zeros((2, 2)), ("a", "a"))

    def test_sizes(self):
        g = GriddedArray(np.zeros((2, 3)), ("y", "x"))
        assert g.sizes == {"y": 2, "x": 3}
        assert g.get_axis_num("x") == 1
        with pytest.raises(KeyError):
            g.get_axis_num("q")

    def test_size_and_values(self):
        g = GriddedArray(np.arange(6.0).reshape(2, 3), ("y", "x"))
        assert g.size == 6
        v = g.values
        assert isinstance(v, np.ndarray)
        np.testing.assert_array_equal(v, np.arange(6.0).reshape(2, 3))

    def test_from_gridded(self):
        g = GriddedArray(np.arange(3.0), ("x",), name="a")
        h = GriddedArray(g, ("y",))
        assert h.dims == ("y",)


class TestLabeledOps:
    def test_isel_slice_and_int(self):
        g = GriddedArray(np.arange(12.0).reshape(3, 4), ("y", "x"))
        s = g.isel({"x": slice(1, 3)})
        assert s.dims == ("y", "x") and s.shape == (3, 2)
        p = g.isel({"y": 1})
        assert p.dims == ("x",) and p.shape == (4,)

    def test_transpose(self):
        g = GriddedArray(np.arange(6.0).reshape(2, 3), ("y", "x"))
        t = g.transpose("x", "y")
        assert t.shape == (3, 2)
        with pytest.raises(ValueError):
            g.transpose("x", "q")

    def test_rename_dims(self):
        g = GriddedArray(np.zeros((2,)), ("x",))
        assert g.rename_dims({"x": "xl"}).dims == ("xl",)

    def test_flip(self):
        g = GriddedArray(np.arange(4.0), ("x",))
        np.testing.assert_allclose(np.asarray(g.flip("x").data), [3, 2, 1, 0])

    def test_move_dims_last(self):
        g = GriddedArray(np.zeros((2, 3, 4)), ("a", "b", "c"))
        assert g.move_dims_last(["a"]).dims == ("b", "c", "a")


class TestBroadcastArithmetic:
    def test_aligned_by_name(self):
        a = GriddedArray(np.ones((2, 3)), ("y", "x"))
        b = GriddedArray(np.arange(3.0), ("x",))
        out = a + b
        assert out.dims == ("y", "x")
        np.testing.assert_allclose(np.asarray(out.data)[0], [1, 2, 3])

    def test_transposed_operand(self):
        rng = np.random.RandomState(0)
        a = GriddedArray(rng.rand(2, 3), ("y", "x"))
        b = GriddedArray(rng.rand(3, 2), ("x", "y"))
        out = a * b
        assert out.dims == ("y", "x")
        np.testing.assert_allclose(
            np.asarray(out.data), np.asarray(a.data) * np.asarray(b.data).T
        )

    def test_outer_broadcast(self):
        a = GriddedArray(np.arange(2.0), ("y",))
        b = GriddedArray(np.arange(3.0), ("x",))
        out = a * b
        assert out.dims == ("y", "x")
        assert out.shape == (2, 3)

    def test_scalar_ops(self):
        a = GriddedArray(np.ones(3), ("x",))
        np.testing.assert_allclose(np.asarray((2 * a + 1).data), 3.0)
        np.testing.assert_allclose(np.asarray((1 - a).data), 0.0)
        np.testing.assert_allclose(np.asarray((-a).data), -1.0)
        np.testing.assert_allclose(np.asarray((1 / a).data), 1.0)

    def test_abs_pow(self):
        a = GriddedArray(np.array([-2.0, 3.0]), ("x",))
        np.testing.assert_allclose(np.asarray(abs(a).data), [2.0, 3.0])
        np.testing.assert_allclose(np.asarray((a ** 2).data), [4.0, 9.0])
        b = GriddedArray(np.array([2.0, 2.0]), ("x",))
        np.testing.assert_allclose(np.asarray((abs(a) ** b).data), [4.0, 9.0])

    def test_reductions(self):
        a = GriddedArray(np.arange(6.0).reshape(2, 3), ("y", "x"))
        assert a.sum("x").dims == ("y",)
        assert a.mean(["x", "y"]).dims == ()
        np.testing.assert_allclose(float(a.sum().data), 15.0)

    def test_cumsum(self):
        a = GriddedArray(np.ones(4), ("x",))
        np.testing.assert_allclose(np.asarray(a.cumsum("x").data), [1, 2, 3, 4])


class TestPytree:
    def test_flatten_roundtrip(self):
        g = GriddedArray(jnp.arange(4.0), ("x",), name="v")
        leaves, treedef = jax.tree_util.tree_flatten(g)
        assert len(leaves) == 1
        g2 = jax.tree_util.tree_unflatten(treedef, leaves)
        assert g2.dims == ("x",) and g2.name == "v"

    def test_jit_through_pytree(self):
        g = GriddedArray(jnp.arange(4.0), ("x",))

        @jax.jit
        def f(garr):
            return garr.with_data(garr.data * 2)

        out = f(g)
        assert out.dims == ("x",)
        np.testing.assert_allclose(np.asarray(out.data), [0, 2, 4, 6])


class TestMesh:
    def test_partition_spec(self):
        from xgcm_tpu.parallel import partition_spec

        spec = partition_spec(("y", "x"), {"x": "mx"})
        assert tuple(spec) == (None, "mx")

    def test_make_mesh_and_shard(self):
        import jax as _jax

        if len(_jax.devices()) < 8:
            pytest.skip("needs 8 devices")
        from xgcm_tpu.parallel import make_mesh, replicate, shard_gridded

        mesh = make_mesh({"a": 2, "b": 4})
        assert mesh.shape == {"a": 2, "b": 4}
        g = GriddedArray(np.zeros((4, 8)), ("y", "x"))
        s = shard_gridded(g, mesh, {"x": "b"})
        assert s.data.sharding.spec == (None, "b")
        r = replicate(g, mesh)
        assert tuple(r.data.sharding.spec) == ()


class TestMaskOps:
    """Comparison masks, where/clip/fillna — the everyday xarray idioms."""

    def _pair(self):
        a = GriddedArray(np.array([[1.0, -2.0], [np.nan, 4.0]]), ("y", "x"))
        b = GriddedArray(np.array([0.0, 3.0]), ("x",))
        return a, b

    def test_comparisons_broadcast_align(self):
        a, b = self._pair()
        m = a > b
        assert m.dims == ("y", "x")
        np.testing.assert_array_equal(
            np.asarray(m.data), [[True, False], [False, True]]
        )
        np.testing.assert_array_equal(
            np.asarray((a <= 1.0).data), [[True, True], [False, False]]
        )
        eq = a == a
        assert eq.dims == ("y", "x")  # mask, not bool

    def test_where_scalar_and_gridded_cond(self):
        a, b = self._pair()
        w = a.where(a > 0)
        np.testing.assert_allclose(
            np.asarray(w.data), [[1.0, np.nan], [np.nan, 4.0]]
        )
        w2 = a.where(a > b, other=-1.0)
        np.testing.assert_allclose(
            np.asarray(w2.data), [[1.0, -1.0], [-1.0, 4.0]]
        )

    def test_fillna_clip_isnan_mod_floordiv(self):
        a, _ = self._pair()
        np.testing.assert_allclose(
            np.asarray(a.fillna(0.0).data), [[1.0, -2.0], [0.0, 4.0]]
        )
        np.testing.assert_allclose(
            np.asarray(a.clip(min=0.0).data), [[1.0, 0.0], [np.nan, 4.0]]
        )
        np.testing.assert_array_equal(
            np.asarray(a.isnan().data), [[False, False], [True, False]]
        )
        c = GriddedArray(np.array([5.0, 7.0]), ("x",))
        np.testing.assert_allclose(np.asarray((c % 2.0).data), [1.0, 1.0])
        np.testing.assert_allclose(np.asarray((c // 2.0).data), [2.0, 3.0])

    def test_unhashable_like_xarray(self):
        a, _ = self._pair()
        with pytest.raises(TypeError):
            hash(a)
