"""Independent numpy oracle for golden-value operator tests.

Implements the expected staggered-grid operator semantics directly with numpy
padding + slicing, so every xgcm_tpu op can be checked against a simple,
readable second implementation (the reference's own golden-test style,
SURVEY.md §4)."""

from __future__ import annotations

import numpy as np

PAD_MODE = {"periodic": "wrap", "fill": "constant", "extend": "edge", None: "wrap",
            "extrapolate": "extrapolate"}


def pad_np(a, widths, boundary, fill_value=0.0, axis=-1):
    if widths == (0, 0):
        return a
    pad_spec = [(0, 0)] * a.ndim
    pad_spec[axis] = widths
    mode = PAD_MODE[boundary]
    if mode == "constant":
        return np.pad(a, pad_spec, mode=mode, constant_values=fill_value)
    if mode == "extrapolate":
        a = np.moveaxis(a, axis, -1)
        lw, rw = widths
        parts = []
        if lw:
            ks = np.arange(lw, 0, -1)
            parts.append(a[..., :1] - ks * (a[..., 1:2] - a[..., :1]))
        parts.append(a)
        if rw:
            ks = np.arange(1, rw + 1)
            parts.append(a[..., -1:] + ks * (a[..., -1:] - a[..., -2:-1]))
        return np.moveaxis(np.concatenate(parts, axis=-1), -1, axis)
    return np.pad(a, pad_spec, mode=mode)


KERNELS = {
    "diff": lambda a: a[..., 1:] - a[..., :-1],
    "interp": lambda a: 0.5 * (a[..., :-1] + a[..., 1:]),
    "min": lambda a: np.minimum(a[..., :-1], a[..., 1:]),
    "max": lambda a: np.maximum(a[..., :-1], a[..., 1:]),
}

# boundary widths per (from, to) position pair — the reference op table
# (gridops.py:20-216)
WIDTHS = {
    ("center", "left"): (1, 0),
    ("left", "center"): (0, 1),
    ("center", "right"): (0, 1),
    ("right", "center"): (1, 0),
    ("center", "outer"): (1, 1),
    ("outer", "center"): (0, 0),
    ("center", "inner"): (0, 0),
    ("inner", "center"): (1, 1),
}


def apply_op(op, a, frm, to, boundary="periodic", fill_value=0.0):
    """Expected result of a 1D staggered op along the last axis."""
    widths = WIDTHS[(frm, to)]
    padded = pad_np(np.asarray(a, dtype=float), widths, boundary, fill_value)
    return KERNELS[op](padded)


def cumsum_op(a, frm, to, boundary="periodic", fill_value=0.0):
    """Expected result of grid.cumsum (reference grid.py:1123-1166)."""
    a = np.asarray(a, dtype=float)
    c = np.cumsum(a, axis=-1)
    if (frm, to) in (("center", "right"), ("left", "center")):
        return c
    if (frm, to) in (("center", "left"), ("right", "center")):
        return pad_np(c[..., :-1], (1, 0), boundary, fill_value)
    if (frm, to) in (("center", "inner"), ("outer", "center")):
        return c[..., :-1]
    if (frm, to) in (("center", "outer"), ("inner", "center")):
        return pad_np(c, (1, 0), boundary, fill_value)
    raise ValueError(f"invalid cumsum shift {frm}->{to}")
