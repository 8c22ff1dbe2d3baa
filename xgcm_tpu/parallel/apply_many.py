"""Multi-op halo amortisation: arbitrary grid-ufunc chains, one exchange.

A chain of sharded ops pays one collective round each —
``sgrid.diff(v, "X") - sgrid.diff(u, "Y")`` is two shard_maps and two
exchange rounds.  :func:`sharded_apply_many` runs ANY list of grid-ufunc
applications inside ONE ``shard_map``, padding each distinct input array
once per axis at the maximum width any op requests and slicing the cached
halo down per op — so the whole chain issues exactly the collectives of
one combined exchange (the generalisation of the hand-fused
:func:`~xgcm_tpu.parallel.diagnostics.sharded_cgrid_diagnostics`, which
covers only the fixed zeta/div/ke output set).

The reference has no analog: under dask every op materialises its own
``map_overlap`` ghost cells (reference grid_ufunc.py:990-1066); here the
ICI neighbour exchange is a first-class object that chains share.

Results equal running each op through
:func:`~xgcm_tpu.parallel.sharded_ufunc.sharded_apply_as_grid_ufunc`
separately (tests/test_apply_many.py asserts both the values and the
collective count against the hand-fused diagnostics program).
"""

from __future__ import annotations

from typing import Any, Mapping, Optional, Sequence

import jax.numpy as jnp

from jax import shard_map
from jax.sharding import Mesh, PartitionSpec

from ..core.dataarray import GriddedArray
from ..core.grid import Grid
from ..core.grid_ufunc import (
    _identify_dummy_axes_with_real_axes,
    _maybe_unpack_vector_component,
    apply_as_grid_ufunc,
)
from ..core.padding import pad
from ..core.signature import GridUFuncSignature
from .halo import ring_halo_pad
from .mesh import partition_spec
from .sharded_ufunc import (
    _LENGTH_PRESERVING,
    _FaceSetup,
    _local_grid,
    _output_dims,
    _sharded_axes_of,
)

__all__ = ["sharded_apply_many"]


def _convert_spec_arrays(spec: Mapping[str, Any]) -> Mapping[str, Any]:
    """Convert xarray DataArrays in a spec's ``args``/``other_component``
    to native containers (same entry-point bridge as Grid ops)."""
    from ..adapters.xarray_adapter import as_native

    def conv(a):
        if isinstance(a, dict):
            return {k: as_native(v) for k, v in a.items()}
        if isinstance(a, (list, tuple)):
            return type(a)(conv(x) for x in a)
        return as_native(a)

    out = dict(spec)
    for key in ("args", "other_component"):
        if key in out and out[key] is not None:
            out[key] = conv(out[key])
    return out


def _normalize_spec(spec: Mapping[str, Any], grid: Grid) -> Mapping[str, Any]:
    """Expand a name-based spec (``op="diff", axis="X", to=...``) into the
    full func/signature/boundary_width form by selecting the same gridops
    kernel the 1-D dispatch uses (reference grid.py:1545-1590)."""
    if "func" in spec:
        return spec
    from ..core import gridops
    from ..core.grid import _select_grid_ufunc

    name = spec["op"]
    if name == "cumsum":
        raise ValueError(
            "cumsum is not batchable (prefix sums need their own collective "
            "plan); use ShardedGrid.cumsum / sharded_cumsum directly"
        )
    args = spec["args"]
    da = args[0] if isinstance(args, (list, tuple)) else args
    comp = next(iter(da.values())) if isinstance(da, dict) else da
    ax_name = spec["axis"]
    if not isinstance(ax_name, str):
        raise ValueError(
            "name-based specs take a single axis name (got "
            f"{ax_name!r}); pass explicit func/signature for multi-axis ops"
        )
    ax = grid.axes[ax_name]
    from_pos, _ = ax._get_position_name(comp)
    to_pos = spec.get("to") or ax.default_shifts[from_pos]
    sig = GridUFuncSignature.from_string(
        f"({ax_name}:{from_pos})->({ax_name}:{to_pos})"
    )
    grid_ufunc, remaining = _select_grid_ufunc(
        name, sig, module=gridops, boundary=spec.get("boundary"),
        fill_value=spec.get("fill_value"),
    )
    new = {
        k: v for k, v in spec.items()
        if k not in ("op", "to", "boundary", "fill_value")
    }
    new["func"] = grid_ufunc.ufunc
    new["signature"] = grid_ufunc.signature
    new["boundary_width"] = grid_ufunc.boundary_width
    new["axis"] = [(ax_name,)]
    new["boundary"] = remaining.get("boundary")
    new["fill_value"] = remaining.get("fill_value")
    return new


class _OpPlan:
    """Resolved static bookkeeping for one op in the batch."""

    def __init__(self, spec: Mapping[str, Any], grid: Grid):
        self.func = spec["func"]
        args = spec["args"]
        if not isinstance(args, (list, tuple)):
            args = [args]
        self.args = list(args)
        axis = spec["axis"]
        if isinstance(axis, str):
            axis = [(axis,)]
        self.axis = [tuple(a) for a in axis]
        sig = spec["signature"]
        self.sig = (
            sig
            if isinstance(sig, GridUFuncSignature)
            else GridUFuncSignature.from_string(sig)
        )
        self.boundary_width = dict(spec.get("boundary_width") or {})
        self.kwargs = dict(spec.get("kwargs") or {})

        ocs = spec.get("other_component")
        if ocs is None or isinstance(ocs, dict):
            ocs = [ocs]
        ocs = list(ocs)
        if len(ocs) < len(self.args):
            ocs += [None] * (len(self.args) - len(ocs))
        self.ocs = ocs

        self.bc = grid._complete_user_kwargs_using_axis_defaults(
            spec.get("boundary"), "boundary"
        )
        self.fv = grid._complete_user_kwargs_using_axis_defaults(
            spec.get("fill_value"), "fill_value"
        )

        dummy_to_real = _identify_dummy_axes_with_real_axes(
            self.sig.in_ax_names, self.axis
        )
        self.out_ax_names = [
            [dummy_to_real[ax] for ax in arg] for arg in self.sig.out_ax_names
        ]
        self.real_widths = {
            dummy_to_real[ax]: tuple(w)
            for ax, w in self.boundary_width.items()
        }
        self.in_core_dims = [
            [grid.axes[n].coords[p] for n, p in zip(arg_ns, arg_ps)]
            for arg_ns, arg_ps in zip(self.axis, self.sig.in_ax_positions)
        ]
        self.out_core_dims = [
            [grid.axes[n].coords[p] for n, p in zip(arg_ns, arg_ps)]
            for arg_ns, arg_ps in zip(
                self.out_ax_names, self.sig.out_ax_positions
            )
        ]
        self.single_out = len(self.out_core_dims) == 1

    def bc_key(self, slot: int, vec_axis, partner_slot) -> tuple:
        """Pad-cache key: same input + same resolved BCs + same vector
        role → the pads are positionally identical at any width."""
        return (
            slot,
            vec_axis,
            partner_slot,
            tuple(sorted((a, self.bc[a], float(self.fv[a])) for a in self.bc)),
        )


def sharded_apply_many(
    op_specs: Sequence[Mapping[str, Any]],
    *,
    grid: Grid,
    mesh: Mesh,
    dim_to_mesh_axis: Mapping[str, str],
):
    """Apply a batch of grid ufuncs in one shard_map with shared halos.

    Each entry of ``op_specs`` is a dict with keys ``func``, ``args``
    (array or list; single-entry dicts mark vector components), ``axis``,
    ``signature``, ``boundary_width``, and optionally ``boundary``,
    ``fill_value``, ``other_component``, ``kwargs``.  Built-in ops can be
    named instead: ``dict(op="diff", args=v, axis="X", to="left",
    boundary="fill")`` selects the gridops kernel exactly like
    ``ShardedGrid.diff`` would (cumsum excepted — prefix sums have their
    own collective plan).  Returns a list with one entry per op (a
    GriddedArray, or a tuple for multi-output ufuncs), each equal to the
    corresponding single-op :func:`sharded_apply_as_grid_ufunc` call.
    """
    op_specs = [
        _normalize_spec(_convert_spec_arrays(spec), grid) for spec in op_specs
    ]
    face_setup = None
    first = None
    for spec in op_specs:
        a0 = spec["args"]
        a0 = a0[0] if isinstance(a0, (list, tuple)) else a0
        first = _maybe_unpack_vector_component(a0)
        break
    if grid._face_connections is not None:
        if dim_to_mesh_axis.get(grid._facedim) is not None:
            face_setup = _FaceSetup(
                grid, mesh, dim_to_mesh_axis,
                first_arg_dims=tuple(getattr(first, "dims", ())),
            )
        else:
            # face dim local on every shard: the ring route below serves
            # sharded NON-connected axes; a sharded face-connected dim has
            # no shard-local halo (same rule as the single-op engine)
            conn_dims = {
                d
                for links in grid._face_connections[grid._facedim].values()
                for a in links
                for d in grid.axes[a].coords.values()
            }
            bad = sorted(conn_dims & set(dim_to_mesh_axis))
            if bad:
                raise NotImplementedError(
                    f"sharding the face-connected dims {bad} requires the "
                    f"face dim {grid._facedim!r} mapped to a mesh axis too"
                )
            if any(
                isinstance(
                    s["args"][0]
                    if isinstance(s["args"], (list, tuple))
                    else s["args"],
                    dict,
                )
                for s in op_specs
            ):
                raise NotImplementedError(
                    "vector components on a face-connected grid require "
                    "the face dim mesh-mapped"
                )

    plans = [_OpPlan(spec, grid) for spec in op_specs]
    axis_to_mesh_axis = _sharded_axes_of(grid, dim_to_mesh_axis)

    restricted = set(axis_to_mesh_axis)
    if face_setup is not None:
        restricted |= {face_setup.x_axis, face_setup.y_axis}
    for plan in plans:
        for arg_ns, arg_ps in zip(
            list(plan.axis) + plan.out_ax_names,
            list(plan.sig.in_ax_positions) + list(plan.sig.out_ax_positions),
        ):
            for n, p in zip(arg_ns, arg_ps):
                if n in restricted and p not in _LENGTH_PRESERVING:
                    raise NotImplementedError(
                        f"cannot shard along axis {n!r}: position {p!r} "
                        f"changes the array length"
                    )

    local_grid = _local_grid(
        grid, mesh, axis_to_mesh_axis,
        # faces-local route: shards hold whole faces, so local
        # pads of connected axes must assemble cross-face halos
        keep_face_connections=face_setup is None,
    )
    sharded_dims = {
        dim: axis_to_mesh_axis[name]
        for name, ax in grid.axes.items()
        if name in axis_to_mesh_axis
        for dim in ax.coords.values()
    }
    full_map = {**dict(dim_to_mesh_axis), **sharded_dims}

    # ---- dedupe inputs into slots (by buffer identity) ------------------
    slots: list = []  # GriddedArrays (face-padded when needed)
    slot_of: dict = {}  # id(data) -> slot index

    def _slot(ga: GriddedArray) -> int:
        key = id(ga.data)
        if key not in slot_of:
            g = face_setup.pad_face_dim(ga) if face_setup is not None else ga
            slot_of[key] = len(slots)
            slots.append(g)
        return slot_of[key]

    op_arg_slots = []  # per op: [(slot, vec_axis_or_None, partner_slot)]
    for plan in plans:
        entries = []
        for a, oc in zip(plan.args, plan.ocs):
            vec_axis = None
            partner_slot = None
            if isinstance(a, dict):
                [vec_axis] = list(a.keys())
                if oc is not None:
                    [pk] = list(oc.keys())
                    partner_slot = (pk, _slot(oc[pk]))
            entries.append(
                (_slot(_maybe_unpack_vector_component(a)), vec_axis,
                 partner_slot)
            )
        op_arg_slots.append(entries)

    # ---- per (slot, bc-key): max requested widths across all ops --------
    max_widths: dict = {}
    for plan, entries in zip(plans, op_arg_slots):
        for (slot, vec_axis, partner_slot) in entries:
            key = plan.bc_key(slot, vec_axis, partner_slot)
            cur = max_widths.setdefault(key, {})
            for axname, (lw, rw) in plan.real_widths.items():
                clw, crw = cur.get(axname, (0, 0))
                cur[axname] = (max(clw, lw), max(crw, rw))

    in_specs = [partition_spec(s.dims, full_map) for s in slots]
    per_op_out_dims = []
    out_specs = []
    for plan, entries in zip(plans, op_arg_slots):
        arg_dims = [slots[e[0]].dims for e in entries]
        odims = _output_dims(
            arg_dims, plan.in_core_dims, plan.out_core_dims, plan.sig
        )
        per_op_out_dims.append(odims)
        out_specs.extend(partition_spec(d, full_map) for d in odims)

    plan_inputs = ()
    plan_specs = ()
    if face_setup is not None:
        plan_inputs = face_setup.plan_params
        plan_specs = (PartitionSpec(face_setup.face_mesh_axis),) * len(
            plan_inputs
        )

    def local(*raw):
        raw_slots = raw[: len(slots)]
        plan_local = raw[len(slots) :] if face_setup is not None else None
        local_slots = [
            GriddedArray(r, s.dims, name=s.name)
            for r, s in zip(raw_slots, slots)
        ]
        raw_to_slot = {id(g.data): k for k, g in enumerate(local_slots)}
        pad_cache: dict = {}

        def cached_pad(plan: _OpPlan):
            def _pad_fn(a, grid, boundary_width, boundary, fill_value,
                        other_component=None):
                da = _maybe_unpack_vector_component(a)
                k = raw_to_slot[id(da.data)]
                vec_axis = None
                partner_slot = None
                if isinstance(a, dict):
                    [vec_axis] = list(a.keys())
                    if other_component is not None:
                        [pk] = list(other_component.keys())
                        partner_slot = (
                            pk, raw_to_slot[id(other_component[pk].data)]
                        )
                key = plan.bc_key(k, vec_axis, partner_slot)
                widths = max_widths.get(key, {})
                if key not in pad_cache:
                    pad_cache[key] = _pad_at(
                        a, widths, plan, other_component
                    )
                padded = pad_cache[key]
                # slice the max-width halo down to this op's widths (halo
                # content is positional, so inner offsets are identical)
                for axname, (mlw, mrw) in widths.items():
                    lw, rw = boundary_width.get(axname, (0, 0))
                    if (mlw, mrw) == (lw, rw):
                        continue
                    dim = local_grid.axes[axname]._get_position_name(padded)[1]
                    n = padded.sizes[dim] - mlw - mrw
                    padded = padded.isel(
                        {dim: slice(mlw - lw, mlw + n + rw)}
                    )
                return padded

            return _pad_fn

        def _pad_at(a, widths, plan: _OpPlan, other_component):
            """One full-width pad of a distinct input (ring/face/local)."""
            da = _maybe_unpack_vector_component(a)
            if face_setup is not None:
                fs = face_setup
                from .face_sharded import face_halo_pad_widths

                other_widths = {
                    n: w for n, w in widths.items()
                    if n not in (fs.x_axis, fs.y_axis)
                }
                # sharded non-face axes need ring halos, not the global
                # BC (same split as the non-face branch below)
                other_local = {
                    n: w for n, w in other_widths.items()
                    if n not in axis_to_mesh_axis
                }
                if any(w != (0, 0) for w in other_local.values()):
                    da = pad(
                        da, grid=local_grid, boundary_width=other_local,
                        boundary=plan.bc, fill_value=plan.fv,
                    )
                for n, w in other_widths.items():
                    if n not in axis_to_mesh_axis or w == (0, 0):
                        continue
                    dim = local_grid.axes[n]._get_position_name(da)[1]
                    da = da.with_data(
                        ring_halo_pad(
                            da.data, da.get_axis_num(dim), w,
                            axis_to_mesh_axis[n], plan.bc[n],
                            float(plan.fv[n]),
                        )
                    )
                wx = tuple(widths.get(fs.x_axis, (0, 0)))
                wy = tuple(widths.get(fs.y_axis, (0, 0)))
                if wx == (0, 0) and wy == (0, 0):
                    return da
                vec_code = None
                pblock = None
                if isinstance(a, dict):
                    [vec_axis] = list(a.keys())
                    vec_code = 0 if vec_axis == fs.x_axis else 1
                    (_, partner), = other_component.items()
                    _, pydim = local_grid.axes[fs.y_axis]._get_position_name(
                        partner
                    )
                    _, pxdim = local_grid.axes[fs.x_axis]._get_position_name(
                        partner
                    )
                    prest = [
                        d for d in partner.dims
                        if d not in (fs.facedim, pydim, pxdim)
                    ]
                    pblock = partner.transpose(
                        *prest, fs.facedim, pydim, pxdim
                    ).data
                _, ydim = local_grid.axes[fs.y_axis]._get_position_name(da)
                _, xdim = local_grid.axes[fs.x_axis]._get_position_name(da)
                rest = [
                    d for d in da.dims if d not in (fs.facedim, ydim, xdim)
                ]
                ordered = da.transpose(*rest, fs.facedim, ydim, xdim)
                padded = face_halo_pad_widths(
                    ordered.data, plan_local, wx, wy, fs.face_mesh_axis,
                    plan.bc[fs.x_axis], plan.bc[fs.y_axis],
                    float(plan.fv[fs.x_axis]), float(plan.fv[fs.y_axis]),
                    fs.x_axis, fs.y_axis,
                    interior_mesh_axis=fs.interior_mesh_axis,
                    partner_block=pblock, vector_axis_code=vec_code,
                    interior_mesh_axis_x=fs.interior_mesh_axis_x,
                )
                return GriddedArray(padded, ordered.dims, name=da.name)

            local_bw = {
                n: w for n, w in widths.items()
                if n not in axis_to_mesh_axis and w != (0, 0)
            }
            if local_bw:
                da = pad(
                    da, grid=local_grid, boundary_width=local_bw,
                    boundary=plan.bc, fill_value=plan.fv,
                )
            for n, w in widths.items():
                if n not in axis_to_mesh_axis or w == (0, 0):
                    continue
                dim = local_grid.axes[n]._get_position_name(da)[1]
                da = da.with_data(
                    ring_halo_pad(
                        da.data, da.get_axis_num(dim), w,
                        axis_to_mesh_axis[n], plan.bc[n], float(plan.fv[n]),
                    )
                )
            return da

        outs = []
        for plan, entries, odims in zip(plans, op_arg_slots, per_op_out_dims):
            local_args = []
            local_ocs = []
            for (slot, vec_axis, partner_slot), oc in zip(entries, plan.ocs):
                ga = local_slots[slot]
                if vec_axis is not None:
                    ga = {vec_axis: ga}
                local_args.append(ga)
                if partner_slot is not None:
                    pk, pslot = partner_slot
                    local_ocs.append({pk: local_slots[pslot]})
                else:
                    local_ocs.append(None)
            # one pad fn per op; all ops share the pad cache
            res = apply_as_grid_ufunc(
                plan.func,
                *local_args,
                axis=plan.axis,
                grid=local_grid,
                signature=plan.sig,
                boundary_width=plan.boundary_width,
                boundary=plan.bc,
                fill_value=plan.fv,
                other_component=local_ocs,
                _pad_fn=cached_pad(plan),
                **plan.kwargs,
            )
            if plan.single_out:
                res = (res,)
            outs.extend(
                r.transpose(*dims).data for r, dims in zip(res, odims)
            )
        return tuple(outs)

    f = shard_map(
        local,
        mesh=mesh,
        in_specs=tuple(in_specs) + tuple(plan_specs),
        out_specs=tuple(out_specs),
    )
    raw_out = f(*(s.data for s in slots), *plan_inputs)

    results = []
    i = 0
    for plan, entries, odims in zip(plans, op_arg_slots, per_op_out_dims):
        name = slots[entries[0][0]].name if entries else None
        rs = []
        for dims in odims:
            r = GriddedArray(raw_out[i], dims, name=name)
            if face_setup is not None:
                r = face_setup.trim_face_dim(r)
            rs.append(r)
            i += 1
        results.append(rs[0] if plan.single_out else tuple(rs))
    return results
