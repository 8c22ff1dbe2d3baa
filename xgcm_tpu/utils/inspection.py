"""Communication-cost inspection: count collectives in a jitted program.

The reference planned (but never implemented) a dask task-count
regression bound (reference test_grid_ufunc.py:1084-1088, a permanently
xfail'd placeholder).  The TPU-native analog is the number of collective
operations a compiled program issues over ICI — the quantity that
actually prices a sharded expression.  :func:`count_collectives` traces a
function and counts collective primitives recursively through nested
jaxprs (pjit/shard_map/scan bodies), so tests and users can pin exact
communication budgets, e.g.::

    n = count_collectives(lambda u, v: sgrid.diff(v, "X") - sgrid.diff(u, "Y"),
                          u.data, v.data)
    assert n["total"] <= 2      # one one-sided ring exchange per diff

Used by tests/test_apply_many.py to assert the multi-op API matches the
hand-fused diagnostics program's collective count.
"""

from __future__ import annotations

from typing import Callable, Dict, Sequence

import jax

__all__ = ["count_collectives", "COLLECTIVE_PRIMITIVES"]

# substring-matched against primitive names; covers the XLA collectives
# JAX emits for explicit SPMD programs (ppermute, all_gather, psum,
# all_to_all, reduce_scatter and their tuple/batched variants)
COLLECTIVE_PRIMITIVES = (
    "ppermute",
    "all_gather",
    "all_to_all",
    "psum",
    "reduce_scatter",
    "pmax",
    "pmin",
)


def _walk(jaxpr, names, counts) -> None:
    for eqn in jaxpr.eqns:
        pname = eqn.primitive.name
        if any(s in pname for s in names):
            counts[pname] = counts.get(pname, 0) + 1
        for v in eqn.params.values():
            inner = getattr(v, "jaxpr", None)
            if inner is not None and hasattr(inner, "eqns"):
                _walk(inner, names, counts)
            elif hasattr(v, "eqns"):
                _walk(v, names, counts)
            elif isinstance(v, (tuple, list)):
                for item in v:
                    inner = getattr(item, "jaxpr", None)
                    if inner is not None and hasattr(inner, "eqns"):
                        _walk(inner, names, counts)
                    elif hasattr(item, "eqns"):
                        _walk(item, names, counts)


def count_collectives(
    fn: Callable,
    *args,
    names: Sequence[str] = COLLECTIVE_PRIMITIVES,
    **kwargs,
) -> Dict[str, int]:
    """Trace ``fn(*args, **kwargs)`` and count collective primitives.

    Returns a dict of per-primitive counts plus a ``"total"`` key.  Counts
    are STATIC (per trace, not per execution): a collective inside a
    ``lax.scan`` body counts once, mirroring how the jaxpr prices the
    program's communication structure.  Primitives are matched by
    substring against ``names``.
    """
    jaxpr = jax.make_jaxpr(fn)(*args, **kwargs)
    counts: Dict[str, int] = {}
    _walk(jaxpr.jaxpr, tuple(names), counts)
    counts["total"] = sum(counts.values())
    return counts
