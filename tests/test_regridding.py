"""Legacy vertical regridder vs a literal digitize+bincount oracle."""

import numpy as np

from xgcm_tpu import GriddedArray
from xgcm_tpu.ops.regridding import regrid_vertical


def oracle(q, tr, trlevs, axis=0):
    q = np.moveaxis(q, axis, 0)
    tr = np.moveaxis(tr, axis, 0)
    nbins = len(trlevs) - 1
    nr = q.shape[0]
    npts = int(np.prod(q.shape[1:])) if q.ndim > 1 else 1
    qf = q.reshape(nr, npts)
    tf = tr.reshape(nr, npts)
    idx = np.digitize(tf, trlevs) - 1
    idx[idx < 0] = 0
    idx[idx >= nbins] = nbins - 1
    out = np.zeros((nbins, npts))
    for n in range(npts):
        out[:, n] = np.bincount(idx[:, n], weights=qf[:, n], minlength=nbins)[
            :nbins
        ]
    out = out.reshape((nbins,) + q.shape[1:])
    return np.moveaxis(out, 0, axis)


def test_matches_oracle_1d():
    nz = 20
    rng = np.random.RandomState(0)
    q = rng.rand(nz)
    tr = rng.rand(nz) * 10
    levs = np.linspace(0, 10, 6)
    out = regrid_vertical(
        GriddedArray(q, ("z",), name="q"),
        GriddedArray(tr, ("z",), name="theta"),
        levs,
        "z",
    )
    assert out.dims == ("theta_coord",)
    np.testing.assert_allclose(np.asarray(out.data), oracle(q, tr, levs))


def test_matches_oracle_3d_middle_axis():
    rng = np.random.RandomState(1)
    q = rng.rand(3, 12, 4)
    tr = rng.rand(3, 12, 4) * 5 - 1  # includes out-of-range values
    levs = np.linspace(0, 4, 5)
    out = regrid_vertical(
        GriddedArray(q, ("y", "z", "x"), name="q"),
        GriddedArray(tr, ("y", "z", "x"), name="sigma"),
        levs,
        "z",
    )
    assert out.dims == ("y", "sigma_coord", "x")
    np.testing.assert_allclose(
        np.asarray(out.data), oracle(q, tr, levs, axis=1), rtol=1e-12
    )


def test_total_conserved():
    rng = np.random.RandomState(2)
    q = rng.rand(30)
    tr = rng.rand(30) * 100  # everything clips into the bins
    levs = np.linspace(0, 100, 11)
    out = regrid_vertical(
        GriddedArray(q, ("z",), name="q"),
        GriddedArray(tr, ("z",), name="t"),
        levs,
        "z",
    )
    np.testing.assert_allclose(float(np.sum(np.asarray(out.data))), q.sum())


def test_regrid_vertical_nan_confined_to_own_bin():
    """A NaN tracer value must reach only ITS bin (np.bincount semantics,
    reference regridding.py:33-74) — a one-hot einsum would spread it to
    every bin through 0*NaN."""
    import numpy as np

    from xgcm_tpu.ops.regridding import _regrid_vertical

    rng = np.random.RandomState(0)
    q = rng.rand(4, 10)
    tr = np.sort(rng.rand(4, 10), axis=-1)
    q[1, 3] = np.nan
    levs = np.linspace(0.0, 1.0, 6)
    out = np.asarray(_regrid_vertical(q, tr, levs, axis=-1))
    nan_cols = np.isnan(out).sum(axis=-1)
    assert nan_cols[1] == 1     # exactly the bin holding tr[1, 3]
    assert (nan_cols[[0, 2, 3]] == 0).all()
