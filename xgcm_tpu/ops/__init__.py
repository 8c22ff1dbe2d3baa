from . import fused, stencils, transform  # noqa: F401
from .diagnostics import cgrid_diagnostics  # noqa: F401
from .regridding import regrid_vertical  # noqa: F401
