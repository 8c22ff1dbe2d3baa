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

__all__ = [
    "make_mesh",
    "make_multihost_mesh",
    "init_distributed",
    "partition_spec",
    "shard_gridded",
    "replicate",
]


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


def init_distributed(**kwargs) -> bool:
    """Initialize the JAX multi-process runtime (multi-host / multi-slice).

    Thin, idempotent wrapper over ``jax.distributed.initialize``: on TPU
    pods the coordinator address, process count, and process id are
    auto-detected from the environment, so ``init_distributed()`` with no
    arguments is the whole setup; elsewhere pass ``coordinator_address`` /
    ``num_processes`` / ``process_id`` through.  Returns True when the
    runtime was initialized by this call, False when it already was (or
    when running single-process, where initialization is unnecessary).

    This is the TPU-native analog of the reference's
    ``dask.distributed.Client`` bootstrap (SURVEY.md §2 #19): after it,
    ``jax.devices()`` is the GLOBAL device list and the meshes below span
    all hosts — collectives ride ICI within a slice and DCN across
    slices.
    """
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        # already-initialized (idempotence): JAX raises
        # "distributed.initialize should only be called once." on the
        # second call
        msg = str(e).lower()
        if "already" in msg or "only be called once" in msg:
            return False
        # "must be called before any JAX calls": benign for the
        # argument-less convenience call from a single-process program
        # whose backend is already up (nothing to distribute) — but a
        # caller who PASSED coordinator kwargs explicitly wanted
        # multi-process, and silently skipping would degrade the pod
        # job to per-host single-process mode: propagate there
        if "must be called before" in msg and not kwargs:
            # The no-arg call is also the documented happy path ON A POD
            # (auto-detection).  If the environment says this is a
            # multi-process job, returning False here would silently run
            # per-host single-process — make that loud.
            import os
            import warnings

            _pod_markers = (
                "COORDINATOR_ADDRESS",
                "JAX_COORDINATOR_ADDRESS",
                "MEGASCALE_COORDINATOR_ADDRESS",
                "TPU_WORKER_HOSTNAMES",
                "TPU_PROCESS_ADDRESSES",
            )
            found = [m for m in _pod_markers if os.environ.get(m)]
            if found:
                warnings.warn(
                    "init_distributed() was called after JAX was already "
                    "used, so the multi-process runtime could NOT be "
                    f"initialized — but the environment ({', '.join(found)})"
                    " looks like a multi-host job. This process will run "
                    "per-host single-process. Call init_distributed() "
                    "before any other JAX API.",
                    RuntimeWarning,
                )
            return False
        raise
    except ValueError as e:
        # ONLY the no-coordinator case means "single-process run";
        # other ValueErrors (e.g. coordinator given but process_id
        # missing) are misconfigurations that must not silently
        # degrade a pod job to per-host single-process mode
        if "coordinator_address" in str(e):
            return False
        raise
    return True


def make_multihost_mesh(
    axes: Mapping[str, int],
    devices=None,
    dcn_axes: "Mapping[str, int] | None" = None,
) -> Mesh:
    """Create a Mesh over ALL processes' devices, ICI-topology-aware.

    Unlike :func:`make_mesh` (which reshapes the device list in order),
    this uses ``jax.experimental.mesh_utils`` to assign devices so that
    neighboring mesh coordinates are ICI neighbors — on a TPU slice the
    halo ``ppermute`` rings then ride physical links instead of hopping
    arbitrary devices.

    For multi-slice (DCN-connected) jobs pass ``dcn_axes``: a mapping of
    mesh-axis name -> number of slices for the axes that should span
    slices (typically the batch/face axis; keep halo-exchange axes inside
    a slice).  DCN-spanning axes are placed OUTERMOST, matching
    ``mesh_utils.create_hybrid_device_mesh`` semantics.

    Call :func:`init_distributed` first in multi-process jobs so
    ``jax.devices()`` is global.
    """
    from jax.experimental import mesh_utils

    if devices is None:
        devices = jax.devices()
    size = int(np.prod(list(axes.values())))
    if dcn_axes:
        unknown = set(dcn_axes) - set(axes)
        if unknown:
            raise ValueError(
                f"dcn_axes {sorted(unknown)} are not mesh axes "
                f"({sorted(axes)})"
            )
        for a, n_slices in dcn_axes.items():
            if axes[a] % n_slices:
                raise ValueError(
                    f"dcn axis {a!r}: size {axes[a]} does not divide into "
                    f"{n_slices} slices"
                )
        if size != len(devices):
            raise ValueError(
                f"mesh {dict(axes)} needs exactly the global device count "
                f"({len(devices)}); got {size}"
            )
        # hybrid mesh: per-slice (ICI) shape x cross-slice (DCN) shape,
        # DCN axes outermost in the same axis order
        names = list(dcn_axes) + [a for a in axes if a not in dcn_axes]
        ici_shape = [
            axes[a] // dcn_axes[a] if a in dcn_axes else axes[a]
            for a in names
        ]
        dcn_shape = [dcn_axes.get(a, 1) for a in names]
        dev_array = mesh_utils.create_hybrid_device_mesh(
            ici_shape, dcn_shape, devices=devices
        )
        return Mesh(dev_array, tuple(names))
    if size != len(devices):
        raise ValueError(
            f"mesh {dict(axes)} needs exactly the global device count "
            f"({len(devices)}); got {size} — make_multihost_mesh spans "
            "every device (use make_mesh for partial meshes)"
        )
    dev_array = mesh_utils.create_device_mesh(
        tuple(axes.values()), devices=np.asarray(devices)
    )
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
