"""xgcm_tpu: a TPU-native finite-volume analysis framework for staggered
(Arakawa) grid datasets, built from scratch on JAX/XLA/Pallas.

Provides the full capability surface of xgcm (position-aware interp / diff /
min / max / cumsum, metric-weighted calculus, vertical coordinate transform,
multi-face topologies with halo exchange) re-designed TPU-first: stencils are
fused XLA/Pallas kernels over HBM-resident arrays, prefix sums are parallel
scans, and distribution happens through ``jax.sharding`` meshes with
``ppermute``/``all_gather`` halo collectives instead of dask task graphs.
"""

from .core.axis import Axis
from .core.dataarray import GriddedArray
from .core.dataset import Dataset
from .core.grid import Grid
from .core.grid_ufunc import GridUFunc, apply_as_grid_ufunc, as_grid_ufunc
from .core.signature import GridUFuncSignature

__version__ = "0.5.0"

__all__ = [
    "Axis",
    "Dataset",
    "Grid",
    "GriddedArray",
    "GridUFunc",
    "GridUFuncSignature",
    "apply_as_grid_ufunc",
    "as_grid_ufunc",
    "__version__",
]
