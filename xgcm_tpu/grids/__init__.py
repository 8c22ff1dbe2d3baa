"""Model-grid-family constructors.

The reference documents its model families through example notebooks
(MITgcm, ECCOv4/LLC, MOM6, NEMO — reference ``mkdocs.yml:79-83``); users
assemble each grid by hand from the model's output conventions.  These
factories build the equivalent synthetic grids natively — correct staggering
convention, metric set, and (for the cubed sphere) face topology — so every
family is one call away.
"""

from .families import (  # noqa: F401
    CUBED_SPHERE_CONNECTIONS,
    LLC_CONNECTIONS,
    cubed_sphere_grid,
    llc_grid,
    mitgcm_c_grid,
    mom6_symmetric_grid,
    nemo_c_grid,
)

__all__ = [
    "mitgcm_c_grid",
    "nemo_c_grid",
    "mom6_symmetric_grid",
    "cubed_sphere_grid",
    "llc_grid",
    "CUBED_SPHERE_CONNECTIONS",
    "LLC_CONNECTIONS",
]
