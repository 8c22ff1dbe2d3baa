"""Convention-dispatch for automatic grid construction.

Hierarchy (reference ``metadata_parsers.py:4-45``): SGRID when the dataset
declares it, otherwise COMODO.  A CF-conventions hook is stubbed for future
expansion, mirroring the reference placeholder.
"""

from __future__ import annotations

from ..core.dataset import Dataset
from . import comodo, sgrid


def parse_metadata(ds: Dataset):
    """Returns (ds, grid_kwargs) extracted from dataset metadata."""
    if sgrid.assert_valid_sgrid(ds):
        return parse_sgrid(ds)
    return parse_comodo(ds)


def parse_sgrid(ds: Dataset):
    parsed_coords = {}
    for ax_name in sgrid.get_all_axes(ds):
        parsed_coords[ax_name] = sgrid.get_axis_positions_and_coords(ds, ax_name)
    return ds, {"coords": parsed_coords}


def parse_comodo(ds: Dataset):
    # NOTE: like the reference (metadata_parsers.py:74-97), a "coords" key is
    # returned even when no axes were found, so passing explicit `coords`
    # together with autoparse_metadata=True raises a conflict error.
    parsed_coords = {}
    for ax_name in comodo.get_all_axes(ds):
        parsed_coords[ax_name] = comodo.get_axis_positions_and_coords(ds, ax_name)
    return ds, {"coords": parsed_coords}


def cf_parser(ds: Dataset):
    """Placeholder for CF-conventions parsing (reference
    metadata_parsers.py:100-119)."""
    return ds, {}
