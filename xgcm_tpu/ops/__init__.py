# NOTE: only leaf modules here. diagnostics/regridding import core.grid,
# and core.gridops imports ops.stencils, so importing them eagerly would
# create a circular import; reach them as xgcm_tpu.ops.diagnostics etc.
from . import fused, stencils  # noqa: F401
