"""Determinism guards.

The reference had a hash-seed-dependent halo bug (axes iterated in `set`
order — xgcm GH #712, whats-new 'non-deterministic, hash-seed-dependent halo
values').  xgcm_tpu iterates edges in sorted order by construction; these
tests pin that contract: results must be identical regardless of the
insertion order of the face-connection dictionaries."""

import numpy as np

from xgcm_tpu import Grid, GriddedArray
from xgcm_tpu.core.padding import pad

from .datasets import cubed_sphere_dataset


def _shuffled_connections(fc, seed):
    """Rebuild the connection dict with a different insertion order."""
    rng = np.random.RandomState(seed)
    facedim = list(fc)[0]
    faces = list(fc[facedim].items())
    order = rng.permutation(len(faces))
    out = {}
    for i in order:
        f, links = faces[i]
        keys = list(links)
        rng.shuffle(keys)
        out[f] = {k: links[k] for k in keys}
    return {facedim: out}


def test_halo_invariant_to_connection_dict_order():
    ds, fc = cubed_sphere_dataset(n=5)
    field = GriddedArray(np.random.rand(6, 5, 5), ("face", "y", "x"))

    results = []
    for seed in (0, 1, 2):
        grid = Grid(
            ds,
            face_connections=_shuffled_connections(fc, seed),
            periodic=False,
        )
        p = pad(
            field, grid, {"X": (1, 1), "Y": (1, 1)},
            boundary="fill", fill_value=np.nan,
        )
        results.append(np.asarray(p.data))

    np.testing.assert_array_equal(results[0], results[1])
    np.testing.assert_array_equal(results[0], results[2])


def test_op_invariant_to_connection_dict_order():
    ds, fc = cubed_sphere_dataset(n=5)
    field = GriddedArray(np.random.rand(6, 5, 5), ("face", "y", "x"))
    outs = []
    for seed in (3, 4):
        grid = Grid(
            ds, face_connections=_shuffled_connections(fc, seed),
            periodic=False,
        )
        outs.append(np.asarray(grid.diff(field, "Y", boundary="fill").data))
    np.testing.assert_array_equal(outs[0], outs[1])
