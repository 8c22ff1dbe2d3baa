"""Device-mesh helpers.

The reference's distribution model is dask chunking (SURVEY.md §2 #16-#19);
xgcm_tpu distributes through ``jax.sharding``: build a Mesh, shard gridded
arrays by mapping *dimension names* to mesh axes, and either

* just ``jit`` the grid ops — XLA's SPMD partitioner inserts the halo
  collectives automatically (the "broadcast-dim parallel" and simple
  domain-decomposition cases), or
* use :mod:`xgcm_tpu.parallel.halo` for the explicit ``shard_map`` +
  ``ppermute`` fast path over ICI.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..core.dataarray import GriddedArray

__all__ = ["make_mesh", "partition_spec", "shard_gridded", "replicate"]


def make_mesh(axes: Mapping[str, int], devices=None) -> Mesh:
    """Create a Mesh with named axes, e.g. ``make_mesh({"x": 4, "batch": 2})``.

    Uses all available devices by default; total mesh size must divide the
    device count evenly (trailing devices are dropped if needed).
    """
    if devices is None:
        devices = jax.devices()
    size = int(np.prod(list(axes.values())))
    if size > len(devices):
        raise ValueError(
            f"mesh {dict(axes)} needs {size} devices but only "
            f"{len(devices)} available"
        )
    dev_array = np.array(devices[:size]).reshape(tuple(axes.values()))
    return Mesh(dev_array, tuple(axes.keys()))


def partition_spec(
    dims: Sequence[str], dim_to_mesh_axis: Mapping[str, str]
) -> PartitionSpec:
    """PartitionSpec for an array with named dims, given a dim->mesh-axis map."""
    return PartitionSpec(*(dim_to_mesh_axis.get(d) for d in dims))


def shard_gridded(
    garr: GriddedArray,
    mesh: Mesh,
    dim_to_mesh_axis: Mapping[str, str],
    uneven_ok: tuple = (),
) -> GriddedArray:
    """Place a GriddedArray onto the mesh, sharding the named dims.

    Dims whose size does not divide their mesh axis stay replicated and
    WARN — silent replication would hide a misconfigured mesh.  Name dims
    where uneven replication is intended in ``uneven_ok`` to suppress the
    warning (e.g. a 13-face dim over 8 devices, which the face-sharded
    ops dummy-pad internally)."""
    import warnings

    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    mapping = {}
    for d, ax in dim_to_mesh_axis.items():
        if ax is None or d not in garr.dims:
            continue
        if garr.sizes[d] % sizes[ax] == 0:
            mapping[d] = ax
        elif d not in uneven_ok:
            warnings.warn(
                f"dim {d!r} (size {garr.sizes[d]}) does not divide mesh "
                f"axis {ax!r} (size {sizes[ax]}); replicating instead of "
                f"sharding (pass uneven_ok=({d!r},) if intended — the "
                "face-sharded ops dummy-pad uneven face counts "
                "internally)",
                UserWarning,
            )
    spec = partition_spec(garr.dims, mapping)
    sharding = NamedSharding(mesh, spec)
    return garr.with_data(jax.device_put(garr.data, sharding))


def replicate(garr: GriddedArray, mesh: Mesh) -> GriddedArray:
    """Fully replicate a GriddedArray over the mesh."""
    sharding = NamedSharding(mesh, PartitionSpec())
    return garr.with_data(jax.device_put(garr.data, sharding))
