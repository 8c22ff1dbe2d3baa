"""Fused Pallas TPU kernel for the linear vertical transform.

One kernel computes the FULL ``interp_1d_linear`` semantics for
(cols, n) columns onto a shared (m,) target vector: the per-column
monotonicity flip (reference xgcm transform.py:27-31), NaN sanitisation,
per-interval slopes, exact last-writer-wins interval selection, the
np.interp edge clamps, and optional edge masking — all in-VMEM.  HBM
traffic is theta + phi in (one XLA transpose each), out out.

Why fused: the XLA prep it replaces was 2.6x the kernel cost at the
512^2 x 50 benchmark shape — the one-hot column flip alone measured
2.6 ms (TPU gathers via take_along_axis are milliseconds; argmax one-hot
extraction takes several full passes over HBM), and the sanitise/slope/
clamp epilogue another ~0.8 ms, vs ~1.4 ms for the membership loop
itself.

Descending columns are handled by NEGATION instead of index reversal:
-theta of a descending column is ascending in the SAME index order, the
lerp ``ph_lo + (t_eff - th_lo_eff) * s_eff`` is sign-invariant, and the
membership rule in effective space ([th_k*d <= t*d < th_{k+1}*d))
selects the identical interval as np.interp on the flipped array.  Two
inputs OUTSIDE the reference's defined contract (monotonic coordinate
with NaN only in contiguous masked runs at the column ends) can
observably differ from the XLA flip path: (a) interior DUPLICATE theta
knots with differing phi hit np.interp's tie-break from the other side
(negation keeps original index order, flipping reverses it); (b) an
interior NaN knot in a DESCENDING column sanitises in place here but is
carried to the other end by the index reversal there.  Both paths are
deterministic; the reference's own numba kernel feeds such columns to
np.interp unchecked.

Kernel layout (see also CLAUDE.md "Mosaic/Pallas restrictions"): columns
ride the LANES ((n, C) blocks of the transposed inputs), targets ride
the sublanes of the (m, C) accumulators, and the knot loop is sequential
over n with NO lane reductions (a masked-lane-reduction variant measured
10x slower).  Per-column scalar state (direction, first/last valid knot,
range) is (1, C) rows, costing ~1/m of a main-loop step each.

Semantics match the reference numba kernel's np.interp core
(xgcm transform.py:15-41) as specified by tests/test_transform*; the
pure-jnp replica :func:`_fused_ref_jnp` is both the interpret-mode test
oracle and the custom-VJP backward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "interp_linear_fused",
    "interp_linear_fused_ad",
    "interp_linear_fused_T",
    "interp_linear_fused_T_ad",
    "interp_linear_fused_multi",
    "interp_linear_fused_multi_ad",
    "supports_fused_transform",
    "conservative_fused",
    "conservative_fused_ad",
    "conservative_fused_T",
    "conservative_fused_T_ad",
    "supports_fused_conservative",
]


def supports_fused_transform(phi, theta, target, nv: int = 1) -> bool:
    """Kernel constraints: TPU backend, 2D (cols, n) columns with a shared
    (m,) or per-column (cols, m) target, f32/bf16 data, n and m small
    enough to tile in VMEM.  ``nv`` is the number of variables sharing one
    multi-kernel pass (each adds its own phi tile, output tile, and (m, C)
    accumulators, so the single-tile budget scales with it)."""
    if jax.default_backend() != "tpu":
        return False
    if phi.ndim != 2 or theta.ndim != 2 or target.ndim not in (1, 2):
        return False
    if phi.shape != theta.shape:
        return False
    if target.ndim == 2 and target.shape[0] != phi.shape[0]:
        return False
    if phi.shape[-1] < 2 or phi.shape[-1] > 256 or target.shape[-1] > 256:
        return False
    # Mosaic needs lane blocks of 128 (or one block spanning the array):
    # odd column counts run single-tile, so cap the VMEM ALL single-tile
    # blocks (theta + phi in, output and any per-column target out) may
    # claim, not just the inputs; the multi kernel carries nv phi tiles,
    # nv outputs and ~3 (m, C) accumulators per variable, charged here as
    # nv times the single-variable share
    if phi.shape[0] % 128 != 0 and phi.shape[0] * nv * (
        2 * phi.shape[-1] + 2 * target.shape[-1]
    ) > 262144:
        return False
    if any(
        a.dtype not in (jnp.float32, jnp.bfloat16)
        for a in (phi, theta, target)
    ):
        return False
    return True


def _shifted(x, fill):
    """x shifted left by one along the last axis, padded with `fill`."""
    pad = jnp.full_like(x[..., :1], fill)
    return jnp.concatenate([x[..., 1:], pad], axis=-1)


def _fused_kernel(
    th_ref, ph_ref, t_ref, out_ref, *, n, m, mask_edges, check_flip,
    shared_target=True,
):
    """One (n, C) tile of raw columns -> (m, C) finished output.

    All per-column scalar prep (first/last valid knot, direction, NaN
    sanitisation, per-interval slopes) is VECTORISED over full (n, C)
    tiles — a sequential row-at-a-time scan wastes 7/8 sublanes and
    measured ~20% of the whole kernel.  Only the membership loop itself
    is sequential over knots (its accumulators are (m, C)).

    ``shared_target=False`` reads an (m, C) per-column target block (a
    spatially varying target coordinate, reference
    transform.py:346-349) — every broadcast below degrades gracefully
    to elementwise (m, C) arithmetic."""
    f32 = jnp.float32
    if shared_target:
        t = t_ref[:, 0:1].astype(f32)  # (m, 1) shared targets
    else:
        t = t_ref[:, :].astype(f32)  # (m, C) per-column targets
    C = th_ref.shape[1]
    inf = f32(jnp.inf)
    # Finite NaN sentinel: the masked accumulations below multiply
    # unselected rows by 0, and real-TPU IEEE gives 0*inf = NaN (interpret
    # mode silently differs here) — 3e38 is beyond any physical coordinate,
    # and intervals reaching it are forced to slope 0 exactly.
    big = f32(3.0e38)

    th_t = th_ref[:, :].astype(f32)  # (n, C)
    ph_raw = ph_ref[:, :].astype(f32)
    th_nan = jnp.isnan(th_t)
    valid = ~th_nan
    ph_nan = jnp.isnan(ph_raw)
    ph_t = jnp.where(ph_nan, 0.0, ph_raw)  # sanitised phi (FMA-safe)
    # NaN data at a VALID theta knot must propagate NaN into bracketing
    # targets (np.interp semantics); inside the theta-NaN masked region it
    # must not (those intervals resolve through the edge clamps)
    nan_f = (ph_nan & valid).astype(f32)

    # ---- vectorised first/last-valid extraction + range + any-valid ----
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, C), 0)
    fidx = jnp.min(jnp.where(valid, iota, n), axis=0, keepdims=True)
    lidx = jnp.max(jnp.where(valid, iota, -1), axis=0, keepdims=True)
    eq_f = iota == fidx
    eq_l = iota == lidx

    def _pick(eq, x):
        return jnp.sum(jnp.where(eq, x, 0.0), axis=0, keepdims=True)

    first_th = _pick(eq_f, jnp.where(valid, th_t, 0.0))
    first_ph = _pick(eq_f, ph_raw)  # raw: genuinely-NaN data clamps NaN
    last_th = _pick(eq_l, jnp.where(valid, th_t, 0.0))
    last_ph = _pick(eq_l, ph_raw)
    th_min = jnp.min(jnp.where(valid, th_t, inf), axis=0, keepdims=True)
    th_max = jnp.max(jnp.where(valid, th_t, -inf), axis=0, keepdims=True)
    seen = fidx < n  # (1, C)

    if check_flip:
        desc = last_th < first_th
        dsign = jnp.where(desc, f32(-1.0), f32(1.0))
    else:
        desc = jnp.zeros((1, C), jnp.bool_)
        dsign = jnp.ones((1, C), f32)

    # ---- vectorised effective knots + per-interval slopes ----
    th_e_full = jnp.where(th_nan, big, th_t * dsign)  # (n, C)
    dth = th_e_full[1:, :] - th_e_full[:-1, :]
    ok = (dth > 0) & (th_e_full[1:, :] < big)
    s_full = jnp.where(
        ok, (ph_t[1:, :] - ph_t[:-1, :]) / jnp.where(ok, dth, 1.0), 0.0
    )
    # interval-touches-NaN-data indicator: endpoint k or k+1 is NaN data
    # at a valid theta knot.  FOLDED into the slope: NaN-touching
    # intervals carry slope + HUGE, and the epilogue turns a selected
    # s_sel >= HUGE/2 into NaN — one accumulator (and one FMA per knot)
    # fewer in the main loop, measured +8% end to end.  Caveat: a LEGIT
    # slope >= 5e34 (a finite phi jump over a ~1e-35-thin interval) would
    # false-NaN; no physical coordinate system gets within 30 orders of
    # magnitude of that.
    npair = jnp.maximum(nan_f[1:, :], nan_f[:-1, :])  # (n-1, C)
    HUGE = f32(1.0e35)
    s_fold = s_full + npair * HUGE

    # ---- main membership loop in effective (direction-normalised) space.
    # The selected interval is the LAST knot k with th_e_k <= t_eff
    # (duplicate knots match only the last; NaN knots sanitise to `big` so
    # they never fire for physical targets and the edge clamps below
    # overwrite out-of-range rows), realised as LAST-WRITER-WINS predicated
    # selects: TH/PH/S = where(h_k, row_k, prev).  Selection moves no
    # arithmetic onto the values, so results are bitwise identical to the
    # falling-edge one-hot FMA loop this replaces — at ~8 vreg-row ops per
    # knot instead of ~14 (each (1, C) row broadcast against the (m, C)
    # accumulators costs a full-height op on this hardware; 3 selects +
    # 1 compare is the floor for exact np.interp-rounding selection).
    # The tail half-open interval [th_e_{n-1}, +inf) joins the loop as a
    # final slope-0 row (its NaN-data indicator folded like every other).
    t_eff = t * dsign  # (m, C)
    s_loop = jnp.concatenate(
        [s_fold, nan_f[n - 1 : n, :] * HUGE], axis=0
    )  # (n, C)
    TH = jnp.zeros((m, C), f32)
    PH = jnp.zeros((m, C), f32)
    S = jnp.zeros((m, C), f32)
    for k in range(n):
        h = th_e_full[k : k + 1, :] <= t_eff
        TH = jnp.where(h, th_e_full[k : k + 1, :], TH)
        PH = jnp.where(h, ph_t[k : k + 1, :], PH)
        S = jnp.where(h, s_loop[k : k + 1, :], S)
    is_nan_sel = S >= HUGE * f32(0.5)
    out = PH + (t_eff - TH) * jnp.where(is_nan_sel, 0.0, S)

    # ---- np.interp edge clamps + NaN masking (original-space) ----
    # NaN-data propagation first; out-of-range targets still clamp to the
    # (possibly NaN) first/last data value, like np.interp's fp[0]/fp[-1]
    out = jnp.where(is_nan_sel, f32(jnp.nan), out)
    lo_ph = jnp.where(desc, last_ph, first_ph)  # value at the min-theta end
    hi_ph = jnp.where(desc, first_ph, last_ph)
    out = jnp.where(t < th_min, lo_ph, out)
    out = jnp.where(t >= th_max, hi_ph, out)
    out = jnp.where(seen, out, f32(jnp.nan))
    if mask_edges:
        out = jnp.where((t < th_min) | (t > th_max), f32(jnp.nan), out)
    out_ref[:, :] = out.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("mask_edges", "check_flip", "tile_cols")
)
def interp_linear_fused_T(
    thT: jax.Array,
    phT: jax.Array,
    target: jax.Array,
    mask_edges: bool = False,
    check_flip: bool = True,
    tile_cols: int = 256,
) -> jax.Array:
    """Lanes-major core of :func:`interp_linear_fused`: (n, cols) RAW
    columns (the kernel's native layout — columns ride the lanes) onto
    (m,) shared or (m, cols) per-column targets, returning (m, cols).

    This is the layout-aware entry (VERDICT r2 item 4): callers whose data
    already lives transform-dim-first pay ZERO XLA transposes on the hot
    path; :func:`interp_linear_fused` wraps it with the (cols, n)
    transposes for the conventional layout.
    """
    n, cols = thT.shape
    m = target.shape[0] if target.ndim == 2 else target.shape[-1]
    shared_target = target.ndim == 1
    # lane blocks must be multiples of 128, or a single block spanning the
    # whole array (Mosaic block-shape rule)
    C = max(tile_cols, 128)
    while cols % C and C > 128:
        C //= 2
    if cols % C:
        C = cols
    grid = cols // C
    if shared_target:
        t_col = jnp.broadcast_to(
            target.astype(jnp.float32).reshape(m, 1), (m, 8)
        )
        t_spec = pl.BlockSpec(
            (m, 8), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
    else:
        t_col = target.astype(jnp.float32)  # (m, cols), already lanes-major
        t_spec = pl.BlockSpec(
            (m, C), lambda i: (0, i), memory_space=pltpu.VMEM
        )

    tile = lambda i: (0, i)  # noqa: E731
    return pl.pallas_call(
        functools.partial(
            _fused_kernel, n=n, m=m,
            mask_edges=mask_edges, check_flip=check_flip,
            shared_target=shared_target,
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((n, C), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((n, C), tile, memory_space=pltpu.VMEM),
            t_spec,
        ],
        out_specs=pl.BlockSpec((m, C), tile, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, cols), phT.dtype),
    )(thT, phT, t_col)


def interp_linear_fused(
    theta: jax.Array,
    phi: jax.Array,
    target: jax.Array,
    mask_edges: bool = False,
    check_flip: bool = True,
    tile_cols: int = 256,
) -> jax.Array:
    """np.interp of (cols, n) RAW columns (NaNs allowed, either direction)
    onto (m,) shared OR (cols, m) per-column targets, returning the
    finished (cols, m) result — edge clamps and NaN masking included (the
    full semantics of :func:`xgcm_tpu.ops.transform.interp_1d_linear`).

    ``check_flip=False`` mirrors ``bypass_checks=True`` (assume ascending).
    The transposes here are the only XLA work on the hot path; the
    lanes-major core :func:`interp_linear_fused_T` skips them.
    """
    t = target if target.ndim == 1 else target.T
    return interp_linear_fused_T(
        theta.T, phi.T, t, mask_edges=mask_edges, check_flip=check_flip,
        tile_cols=tile_cols,
    ).T


def _fused_ref_jnp(theta, phi, target, mask_edges=False, check_flip=True):
    """Differentiable pure-jnp replica of the fused kernel (negation
    formulation) — the custom-VJP backward and the interpret-mode test
    oracle.  Operates on raw (cols, n) columns like the kernel."""
    f32 = jnp.promote_types(phi.dtype, jnp.float32)
    th = theta.astype(f32)
    ph_raw = phi.astype(f32)
    ph_nan = jnp.isnan(ph_raw)
    ph = jnp.where(ph_nan, 0.0, ph_raw)
    t = target.astype(f32)
    if t.ndim == 1:
        t = t[None, :]  # (1, m) shared; (cols, m) stays per-column
    n = th.shape[-1]
    valid = ~jnp.isnan(th)
    iota = jnp.arange(n)
    first_idx = jnp.argmax(valid, axis=-1)
    last_idx = n - 1 - jnp.argmax(valid[..., ::-1], axis=-1)
    th0 = jnp.nan_to_num(th)

    def _at(x, idx):
        return jnp.sum(
            jnp.where(iota == idx[..., None], x, 0.0), -1, keepdims=True
        )

    first_th, first_ph = _at(th0, first_idx), _at(ph_raw, first_idx)
    last_th, last_ph = _at(th0, last_idx), _at(ph_raw, last_idx)
    if check_flip:
        desc = last_th < first_th
        dsign = jnp.where(desc, -1.0, 1.0)
    else:
        desc = jnp.zeros_like(first_th, dtype=bool)
        dsign = jnp.ones_like(first_th)
    th_e = jnp.where(valid, th * dsign, jnp.inf)
    t_eff = t * dsign  # (cols, m)
    th_e_n = _shifted(th_e, jnp.inf)
    ph_n = _shifted(ph, 0.0)
    dth = th_e_n - th_e
    ok = (dth > 0) & (dth < jnp.inf)
    slope = jnp.where(ok, (ph_n - ph) / jnp.where(ok, dth, 1.0), 0.0)
    memb = (th_e[..., None, :] <= t_eff[..., :, None]) & ~(
        th_e_n[..., None, :] <= t_eff[..., :, None]
    )

    def sel(x):
        return jnp.sum(jnp.where(memb, x[..., None, :], 0.0), axis=-1)

    out = sel(ph) + (t_eff - sel(th_e)) * sel(slope)
    # NaN data at a valid theta knot propagates into bracketing targets
    # (np.interp semantics), mirroring the kernel's indicator accumulator
    nan_f = (ph_nan & valid).astype(f32)
    npair = jnp.maximum(_shifted(nan_f, 0.0), nan_f)
    out = jnp.where(sel(npair) > 0, jnp.nan, out)
    th_min = jnp.min(jnp.where(valid, th, jnp.inf), -1, keepdims=True)
    th_max = jnp.max(jnp.where(valid, th, -jnp.inf), -1, keepdims=True)
    lo_ph = jnp.where(desc, last_ph, first_ph)
    hi_ph = jnp.where(desc, first_ph, last_ph)
    out = jnp.where(t < th_min, lo_ph, out)
    out = jnp.where(t >= th_max, hi_ph, out)
    out = jnp.where(jnp.any(valid, -1, keepdims=True), out, jnp.nan)
    if mask_edges:
        out = jnp.where((t < th_min) | (t > th_max), jnp.nan, out)
    return out.astype(phi.dtype)


# ---------------------------------------------------------------------------
# Multi-variable fused linear kernel: V phi variables remapped onto the
# same theta/targets in one pass.  The membership compare depends only on
# theta and the targets, so it is computed ONCE and shared — per-knot cost
# is 4 + 4V vreg-row ops instead of 8V for V separate calls, and theta's
# HBM traffic and transpose are paid once.  This is the density-space
# analysis pattern: remap T, S, u, v, ... onto the same sigma surfaces.
# ---------------------------------------------------------------------------


def _fused_multi_kernel(*refs, n, m, nv, mask_edges, check_flip):
    th_ref = refs[0]
    ph_refs = refs[1 : 1 + nv]
    t_ref = refs[1 + nv]
    out_refs = refs[2 + nv :]
    f32 = jnp.float32
    t = t_ref[:, 0:1].astype(f32)
    C = th_ref.shape[1]
    inf = f32(jnp.inf)
    big = f32(3.0e38)

    th_t = th_ref[:, :].astype(f32)
    th_nan = jnp.isnan(th_t)
    valid = ~th_nan
    ph_raws = [r[:, :].astype(f32) for r in ph_refs]
    ph_nans = [jnp.isnan(p) for p in ph_raws]
    ph_ts = [
        jnp.where(pn, 0.0, p) for pn, p in zip(ph_nans, ph_raws)
    ]
    nan_fs = [(pn & valid).astype(f32) for pn in ph_nans]

    iota = jax.lax.broadcasted_iota(jnp.int32, (n, C), 0)
    fidx = jnp.min(jnp.where(valid, iota, n), axis=0, keepdims=True)
    lidx = jnp.max(jnp.where(valid, iota, -1), axis=0, keepdims=True)
    eq_f = iota == fidx
    eq_l = iota == lidx

    def _pick(eq, x):
        return jnp.sum(jnp.where(eq, x, 0.0), axis=0, keepdims=True)

    first_th = _pick(eq_f, jnp.where(valid, th_t, 0.0))
    last_th = _pick(eq_l, jnp.where(valid, th_t, 0.0))
    first_phs = [_pick(eq_f, p) for p in ph_raws]  # raw: NaN clamps NaN
    last_phs = [_pick(eq_l, p) for p in ph_raws]
    th_min = jnp.min(jnp.where(valid, th_t, inf), axis=0, keepdims=True)
    th_max = jnp.max(jnp.where(valid, th_t, -inf), axis=0, keepdims=True)
    seen = fidx < n

    if check_flip:
        desc = last_th < first_th
        dsign = jnp.where(desc, f32(-1.0), f32(1.0))
    else:
        desc = jnp.zeros((1, C), jnp.bool_)
        dsign = jnp.ones((1, C), f32)

    th_e_full = jnp.where(th_nan, big, th_t * dsign)
    dth = th_e_full[1:, :] - th_e_full[:-1, :]
    ok = (dth > 0) & (th_e_full[1:, :] < big)
    inv_dth = jnp.where(ok, 1.0 / jnp.where(ok, dth, 1.0), 0.0)
    # NaN-interval indicator folded into each variable's slope (see the
    # single-variable kernel): drops one accumulator PER VARIABLE from
    # the loop (3 + 2V FMAs per knot instead of 3 + 3V)
    HUGE = f32(1.0e35)
    s_fulls = [
        (p[1:, :] - p[:-1, :]) * inv_dth
        + jnp.maximum(nf[1:, :], nf[:-1, :]) * HUGE
        for p, nf in zip(ph_ts, nan_fs)
    ]

    # last-writer-wins predicated selects (see the single-variable kernel):
    # the compare is shared, each variable adds 2 selects per knot — 4 + 4V
    # vreg-row ops per knot vs the one-hot FMA loop's ~8 + 5V
    t_eff = t * dsign
    s_loops = [
        jnp.concatenate([s, nf[n - 1 : n, :] * HUGE], axis=0)
        for s, nf in zip(s_fulls, nan_fs)
    ]
    TH = jnp.zeros((m, C), f32)
    PHs = [jnp.zeros((m, C), f32) for _ in range(nv)]
    Ss = [jnp.zeros((m, C), f32) for _ in range(nv)]
    for k in range(n):
        h = th_e_full[k : k + 1, :] <= t_eff
        TH = jnp.where(h, th_e_full[k : k + 1, :], TH)
        for v in range(nv):
            PHs[v] = jnp.where(h, ph_ts[v][k : k + 1, :], PHs[v])
            Ss[v] = jnp.where(h, s_loops[v][k : k + 1, :], Ss[v])
    w = t_eff - TH
    below = t < th_min
    above = t >= th_max
    if mask_edges:
        edge_nan = below | (t > th_max)
    for v in range(nv):
        is_nan_sel = Ss[v] >= HUGE * f32(0.5)
        out = PHs[v] + w * jnp.where(is_nan_sel, 0.0, Ss[v])
        out = jnp.where(is_nan_sel, f32(jnp.nan), out)
        lo_ph = jnp.where(desc, last_phs[v], first_phs[v])
        hi_ph = jnp.where(desc, first_phs[v], last_phs[v])
        out = jnp.where(below, lo_ph, out)
        out = jnp.where(above, hi_ph, out)
        out = jnp.where(seen, out, f32(jnp.nan))
        if mask_edges:
            out = jnp.where(edge_nan, f32(jnp.nan), out)
        out_refs[v][:, :] = out.astype(out_refs[v].dtype)


@functools.partial(
    jax.jit, static_argnames=("mask_edges", "check_flip", "tile_cols")
)
def interp_linear_fused_multi_T(
    thT: jax.Array,
    phTs,
    target: jax.Array,
    mask_edges: bool = False,
    check_flip: bool = True,
    tile_cols: int = 128,
):
    """Lanes-major core of :func:`interp_linear_fused_multi`: (n, cols)
    inputs, tuple of (m, cols) outputs, zero XLA transposes."""
    phTs = tuple(phTs)
    nv = len(phTs)
    n, cols = thT.shape
    (m,) = target.shape
    C = max(tile_cols, 128)
    while cols % C and C > 128:
        C //= 2
    if cols % C:
        C = cols
    grid = cols // C
    t_col = jnp.broadcast_to(
        target.astype(jnp.float32).reshape(m, 1), (m, 8)
    )

    tile = lambda i: (0, i)  # noqa: E731
    nC_spec = pl.BlockSpec((n, C), tile, memory_space=pltpu.VMEM)
    mC_spec = pl.BlockSpec((m, C), tile, memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(
            _fused_multi_kernel, n=n, m=m, nv=nv,
            mask_edges=mask_edges, check_flip=check_flip,
        ),
        grid=(grid,),
        in_specs=[nC_spec] * (1 + nv) + [
            pl.BlockSpec((m, 8), lambda i: (0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=[mC_spec] * nv,
        out_shape=[
            jax.ShapeDtypeStruct((m, cols), p.dtype) for p in phTs
        ],
    )(thT, *phTs, t_col)
    return tuple(outs)


def interp_linear_fused_multi(
    theta: jax.Array,
    phis,
    target: jax.Array,
    mask_edges: bool = False,
    check_flip: bool = True,
    tile_cols: int = 128,
):
    """np.interp of several (cols, n) phi variables onto the same raw theta
    columns and shared (m,) targets in ONE kernel pass; returns a tuple of
    (cols, m) results with full :func:`interp_linear_fused` semantics."""
    outs = interp_linear_fused_multi_T(
        theta.T, tuple(p.T for p in phis), target,
        mask_edges=mask_edges, check_flip=check_flip, tile_cols=tile_cols,
    )
    return tuple(o.T for o in outs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def interp_linear_fused_multi_ad(theta, phis, target, mask_edges, check_flip):
    """Differentiable front for the multi-variable kernel (backward
    differentiates the per-variable jnp replica)."""
    return interp_linear_fused_multi(
        theta, phis, target, mask_edges=mask_edges, check_flip=check_flip
    )


def _ilfm_fwd(theta, phis, target, mask_edges, check_flip):
    return (
        interp_linear_fused_multi(
            theta, phis, target, mask_edges=mask_edges, check_flip=check_flip
        ),
        (theta, phis, target),
    )


def _ilfm_bwd(mask_edges, check_flip, res, gs):
    theta, phis, target = res
    th_g = jnp.zeros_like(theta)
    tg_g = jnp.zeros_like(target)
    ph_gs = []
    for p, g in zip(phis, gs):
        _, vjp = jax.vjp(
            lambda th, ph, tt: _fused_ref_jnp(
                th, ph, tt, mask_edges=mask_edges, check_flip=check_flip
            ),
            theta, p, target,
        )
        a, b, c = vjp(g)
        th_g = th_g + a
        tg_g = tg_g + c
        ph_gs.append(b)
    return th_g, tuple(ph_gs), tg_g


interp_linear_fused_multi_ad.defvjp(_ilfm_fwd, _ilfm_bwd)


# ---------------------------------------------------------------------------
# Fused conservative rebin kernel.  Same layout and fusion strategy as the
# linear kernel; evaluates the cumulative-mass formulation of
# ops.transform._conservative_rebin (out[j] = F_up(edge_{j+1}) -
# F_lo(edge_j), F(x) = sum_k phi_k * clip((x - tmin_k)/thick_k, 0, 1),
# degenerate cells as step functions inclusive on BOTH edges) entirely
# in-VMEM, including the NaN-cell rules and the untouched-bin -> NaN mask.
# ---------------------------------------------------------------------------


def supports_fused_conservative(phi, theta, edges, nv: int = 1) -> bool:
    """Kernel constraints: TPU, 2D (cols, n) cells with (cols, n+1) bounds,
    shared increasing 1D bin edges, f32/bf16.  ``nv`` scales the
    single-tile VMEM budget for the multi-variable kernel (see
    :func:`supports_fused_transform`)."""
    if jax.default_backend() != "tpu":
        return False
    if phi.ndim != 2 or theta.ndim != 2 or edges.ndim != 1:
        return False
    if theta.shape != (phi.shape[0], phi.shape[1] + 1):
        return False
    if phi.shape[-1] < 1 or phi.shape[-1] > 255 or edges.shape[0] > 256:
        return False
    if edges.shape[0] < 2:
        return False
    if any(
        a.dtype not in (jnp.float32, jnp.bfloat16)
        for a in (phi, theta, edges)
    ):
        return False
    # single-tile odd-cols case: bound ALL blocks (bounds + cells + output)
    if phi.shape[0] % 128 != 0 and phi.shape[0] * nv * (
        2 * phi.shape[-1] + 1 + edges.shape[0]
    ) > 262144:
        return False
    return True


def _conservative_kernel(th_ref, ph_ref, e_ref, out_ref, *, n, m, reassoc=False):
    """One (n+1, C) bounds + (n, C) cells tile -> (m-1, C) rebinned output.

    Per-cell scalar state (bounds, thickness, degeneracy, weight) is
    vectorised over (n, C) tiles; the accumulation loop is sequential over
    cells with (m, C) work per cell, mirroring the linear kernel.

    ``reassoc=True`` telescopes the mass accumulation: instead of
    differencing each cell's cumulative-mass fractions inside the loop
    (``out += w * (frac[1:] - frac[:m-1])``), it accumulates
    ``F += w * frac`` at all m edges and differences ONCE after the loop.
    Mathematically identical; the floating-point sum is REASSOCIATED, so
    results differ from the exact kernel (and the XLA oracle) by f32
    summation order only (~1e-6 abs on 50-cell columns) — measured 5-22%
    faster on v5e because the per-cell dependency chain on the output
    accumulator is one op shorter.  Opt-in via
    ``transform(..., reassociate=True)``; the default stays bit-exact
    against the XLA path (the bench.py hardware gate)."""
    f32 = jnp.float32
    C = th_ref.shape[1]
    e = e_ref[:, 0:1].astype(f32)  # (m, 1) bin edges, increasing

    th = th_ref[:, :].astype(f32)  # (n+1, C)
    ph_raw = ph_ref[:, :].astype(f32)  # (n, C)
    t1 = th[:-1, :]
    t2 = th[1:, :]
    t1n = jnp.isnan(t1)
    t2n = jnp.isnan(t2)
    cell_empty = t1n & t2n
    tmin = jnp.where(t1n, t2, jnp.where(t2n, t1, jnp.minimum(t1, t2)))
    tmax = jnp.where(t1n, t2, jnp.where(t2n, t1, jnp.maximum(t1, t2)))
    valid = ~jnp.isnan(ph_raw) & ~cell_empty
    w_full = jnp.where(valid, jnp.where(jnp.isnan(ph_raw), 0.0, ph_raw), 0.0)
    # SENTINEL validity: invalid cells get tmin = tmax = +1e38, so they
    # never start (e - tmin < 0 everywhere) and never end — the overlap
    # counts below need no separate validity factor, dropping the vf
    # broadcast + multiply from the loop.  Their mass term is w = 0 through
    # a degenerate (thick = 0) step far above every bin edge.
    BIGS = f32(1.0e38)
    tmin = jnp.where(valid, tmin, BIGS)
    tmax = jnp.where(valid, tmax, BIGS)
    thick = tmax - tmin
    deg_full = thick == 0.0
    # degenerate cells take a HUGE slope instead of 0: clip((e-tmin)*BIG)
    # IS their step function (exclusive at e == tmin on both edges), so the
    # mass term carries them too and the loop needs no separate g_up/g_lo
    # pair — only the inclusive-upper-edge correction wdeg * (e_up == tmin)
    # below (the boundary case the reference counts into BOTH bins,
    # transform.py:117-120).  The clip yields the same 0.0/1.0 values the
    # step comparisons produced whenever |e - tmin| > ~3.4e-39 (so that
    # (e-tmin)*3e38 saturates past 1); like the linear kernel's HUGE fold,
    # coordinates within ~30 orders of magnitude of the f32 denormal range
    # are outside the contract (no physical coordinate system is).
    big_slope = f32(3.0e38)
    inv_full = jnp.where(
        deg_full, big_slope, 1.0 / jnp.where(deg_full, 1.0, thick)
    )
    wdeg_full = w_full * deg_full.astype(f32)

    # all-m-edges broadcast: frac at every edge in ONE clip sweep, then
    # difference a static sublane-shifted slice — 4 (m, C) ops per cell
    # where the separate up/lo evaluation cost 8.  The overlap counts
    # reuse the same z = e - tmin rows: started(e_up) == (z_up >= 0),
    # ended-below(e_lo) == (e_lo > tmax), and count = #started - #ended
    # (every ended cell started first, real or sentinel alike), so the
    # per-cell count work is two compares + two mask-adds.
    one = f32(1.0)
    zero = f32(0.0)
    e_all = jnp.broadcast_to(e, (m, C))

    out = jnp.zeros((m - 1, C), f32)
    F = jnp.zeros((m, C), f32)       # reassoc: cumulative mass at ALL edges
    G = jnp.zeros((m - 1, C), f32)   # cells started at-or-below e_up
    L = jnp.zeros((m - 1, C), f32)   # cells ended strictly below e_lo
    for k in range(n):
        tmin_k = tmin[k : k + 1, :]
        inv_k = inv_full[k : k + 1, :]
        w_k = w_full[k : k + 1, :]
        wdeg_k = wdeg_full[k : k + 1, :]
        tmax_k = tmax[k : k + 1, :]
        z = e_all - tmin_k  # (m, C)
        frac_all = jnp.clip(z * inv_k, 0.0, 1.0)
        z_up = z[1:, :]
        if reassoc:
            F = F + w_k * frac_all
        else:
            out = out + w_k * (frac_all[1:, :] - frac_all[: m - 1, :])
        out = out + wdeg_k * jnp.where(z_up == zero, one, zero)
        G = G + jnp.where(z_up >= zero, one, zero)
        L = L + jnp.where(e_all[: m - 1, :] > tmax_k, one, zero)
    if reassoc:
        out = out + (F[1:, :] - F[: m - 1, :])
    out = jnp.where(G - L > zero, out, f32(jnp.nan))
    out_ref[:, :] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_cols", "reassociate"))
def conservative_fused_T(
    thT: jax.Array,
    phT: jax.Array,
    edges: jax.Array,
    tile_cols: int = 128,
    reassociate: bool = False,
) -> jax.Array:
    """Lanes-major core of :func:`conservative_fused`: (n+1, cols) raw
    bounds + (n, cols) cells into shared increasing bins, returning
    (m-1, cols) — no XLA transposes on the hot path (the layout-aware
    entry, VERDICT r2 item 4).  ``reassociate=True`` selects the
    telescoped mass accumulator (see :func:`_conservative_kernel`)."""
    n1, cols = thT.shape
    n = n1 - 1
    (m,) = edges.shape
    C = max(tile_cols, 128)
    while cols % C and C > 128:
        C //= 2
    if cols % C:
        C = cols
    grid = cols // C
    e_col = jnp.broadcast_to(edges.astype(jnp.float32).reshape(m, 1), (m, 8))

    tile = lambda i: (0, i)  # noqa: E731
    return pl.pallas_call(
        functools.partial(_conservative_kernel, n=n, m=m, reassoc=reassociate),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((n + 1, C), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((n, C), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m - 1, C), tile, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m - 1, cols), phT.dtype),
    )(thT, phT, e_col)


def conservative_fused(
    theta: jax.Array,
    phi: jax.Array,
    edges: jax.Array,
    tile_cols: int = 128,
    reassociate: bool = False,
) -> jax.Array:
    """Conservative rebin of (cols, n) cells with (cols, n+1) RAW bounds
    (NaNs allowed) into (m-1,) shared increasing bins, returning the
    finished (cols, m-1) result with untouched bins NaN — the full
    semantics of :func:`xgcm_tpu.ops.transform.interp_1d_conservative`
    for increasing targets (decreasing targets flip outside)."""
    return conservative_fused_T(
        theta.T, phi.T, edges, tile_cols=tile_cols, reassociate=reassociate
    ).T


def _conservative_multi_kernel(*refs, n, m, nv, reassoc=False):
    """Multi-variable conservative rebin: every fraction/step/count term
    depends only on theta, so V variables share the whole selection and
    each costs just two extra FMAs per cell.  ``reassoc`` telescopes each
    variable's mass accumulator exactly as in
    :func:`_conservative_kernel` (reassociated f32 sums, opt-in)."""
    th_ref = refs[0]
    ph_refs = refs[1 : 1 + nv]
    e_ref = refs[1 + nv]
    out_refs = refs[2 + nv :]
    f32 = jnp.float32
    C = th_ref.shape[1]
    e = e_ref[:, 0:1].astype(f32)

    th = th_ref[:, :].astype(f32)
    t1 = th[:-1, :]
    t2 = th[1:, :]
    t1n = jnp.isnan(t1)
    t2n = jnp.isnan(t2)
    cell_empty = t1n & t2n
    tmin0 = jnp.where(t1n, t2, jnp.where(t2n, t1, jnp.minimum(t1, t2)))
    tmax0 = jnp.where(t1n, t2, jnp.where(t2n, t1, jnp.maximum(t1, t2)))

    ph_raws = [r[:, :].astype(f32) for r in ph_refs]
    valids = [~jnp.isnan(p) & ~cell_empty for p in ph_raws]
    ws = [
        jnp.where(v, jnp.where(jnp.isnan(p), 0.0, p), 0.0)
        for v, p in zip(valids, ph_raws)
    ]
    # per-variable validity differs only through NaN phi; the geometry
    # (tmin/tmax/deg/inv) must ignore cells invalid for ALL variables the
    # same way the single kernel does per variable.  Use per-variable
    # masks for w/count but a shared sanitised geometry: a cell's bounds
    # are well-defined whenever its theta pair isn't double-NaN, and
    # cells excluded for one variable contribute 0 through w/vf.
    geom_valid = ~cell_empty
    tmin = jnp.where(geom_valid, tmin0, 0.0)
    tmax = jnp.where(geom_valid, tmax0, 0.0)
    thick = tmax - tmin
    deg_full = thick == 0.0
    # degenerate cells ride the mass term via a huge slope (see the
    # single-variable kernel); only the inclusive-upper-edge correction
    # remains separate
    big_slope = f32(3.0e38)
    inv_full = jnp.where(
        deg_full, big_slope, 1.0 / jnp.where(deg_full, 1.0, thick)
    )
    vfs = [v.astype(f32) for v in valids]
    wdegs = [w * deg_full.astype(f32) for w in ws]

    e_all = jnp.broadcast_to(e, (m, C))
    e_up = e_all[1:, :]
    e_lo = e_all[: m - 1, :]

    outs = [jnp.zeros((m - 1, C), f32) for _ in range(nv)]
    Fs = [jnp.zeros((m, C), f32) for _ in range(nv)]  # reassoc accumulators
    counts = [jnp.zeros((m - 1, C), f32) for _ in range(nv)]
    for k in range(n):
        tmin_k = tmin[k : k + 1, :]
        tmax_k = tmax[k : k + 1, :]
        inv_k = inv_full[k : k + 1, :]
        frac_all = jnp.clip((e_all - tmin_k) * inv_k, 0.0, 1.0)
        if not reassoc:
            dfrac = frac_all[1:, :] - frac_all[: m - 1, :]
        corr = (e_up == tmin_k).astype(f32)
        g_up = (e_up >= tmin_k).astype(f32)
        h = (e_lo <= tmax_k).astype(f32)
        overlap = g_up * h
        for v in range(nv):
            if reassoc:
                Fs[v] = Fs[v] + ws[v][k : k + 1, :] * frac_all
                outs[v] = outs[v] + wdegs[v][k : k + 1, :] * corr
            else:
                outs[v] = (
                    outs[v]
                    + ws[v][k : k + 1, :] * dfrac
                    + wdegs[v][k : k + 1, :] * corr
                )
            counts[v] = counts[v] + vfs[v][k : k + 1, :] * overlap
    for v in range(nv):
        o = outs[v]
        if reassoc:
            o = o + (Fs[v][1:, :] - Fs[v][: m - 1, :])
        o = jnp.where(counts[v] > 0, o, f32(jnp.nan))
        out_refs[v][:, :] = o.astype(out_refs[v].dtype)


@functools.partial(jax.jit, static_argnames=("tile_cols", "reassociate"))
def conservative_fused_multi_T(
    thT: jax.Array,
    phTs,
    edges: jax.Array,
    tile_cols: int = 128,
    reassociate: bool = False,
):
    """Lanes-major core of :func:`conservative_fused_multi`: (n+1, cols)
    bounds + (n, cols) variables, tuple of (m-1, cols) outputs, zero XLA
    transposes."""
    phTs = tuple(phTs)
    nv = len(phTs)
    n, cols = phTs[0].shape
    (m,) = edges.shape
    C = max(tile_cols, 128)
    while cols % C and C > 128:
        C //= 2
    if cols % C:
        C = cols
    grid = cols // C
    e_col = jnp.broadcast_to(edges.astype(jnp.float32).reshape(m, 1), (m, 8))

    tile = lambda i: (0, i)  # noqa: E731
    outs = pl.pallas_call(
        functools.partial(
            _conservative_multi_kernel, n=n, m=m, nv=nv, reassoc=reassociate
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((n + 1, C), tile, memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((n, C), tile, memory_space=pltpu.VMEM)
        ] * nv + [
            pl.BlockSpec((m, 8), lambda i: (0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=[
            pl.BlockSpec((m - 1, C), tile, memory_space=pltpu.VMEM)
        ] * nv,
        out_shape=[
            jax.ShapeDtypeStruct((m - 1, cols), p.dtype) for p in phTs
        ],
    )(thT, *phTs, e_col)
    return tuple(outs)


def conservative_fused_multi(
    theta: jax.Array,
    phis,
    edges: jax.Array,
    tile_cols: int = 128,
    reassociate: bool = False,
):
    """Conservative rebin of several (cols, n) variables with the SAME
    (cols, n+1) raw bounds into shared increasing bins, one kernel pass;
    returns a tuple of (cols, m-1) results with full
    :func:`conservative_fused` semantics per variable."""
    outs = conservative_fused_multi_T(
        theta.T,
        tuple(p.T for p in phis),
        edges,
        tile_cols=tile_cols,
        reassociate=reassociate,
    )
    return tuple(o.T for o in outs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conservative_fused_multi_ad(theta, phis, edges, reassociate=False):
    """Differentiable front for the multi-variable conservative kernel.
    ``reassociate`` only affects the forward kernel (the backward
    differentiates the exact jnp formulation either way)."""
    return conservative_fused_multi(theta, phis, edges, reassociate=reassociate)


def _cfm_fwd(theta, phis, edges, reassociate=False):
    return (
        conservative_fused_multi(theta, phis, edges, reassociate=reassociate),
        (theta, phis, edges),
    )


def _cfm_bwd(reassociate, res, gs):
    theta, phis, edges = res
    from .transform import _conservative_rebin

    def ref(th, ph, ed):
        out, cnt = _conservative_rebin(ph, th[..., :-1], th[..., 1:], ed)
        return jnp.where(cnt > 0, out, jnp.nan)

    th_g = jnp.zeros_like(theta)
    ed_g = jnp.zeros_like(edges)
    ph_gs = []
    for p, g in zip(phis, gs):
        _, vjp = jax.vjp(ref, theta, p, edges)
        a, b, c = vjp(g)
        th_g = th_g + a
        ed_g = ed_g + c
        ph_gs.append(b)
    return th_g, tuple(ph_gs), ed_g


conservative_fused_multi_ad.defvjp(_cfm_fwd, _cfm_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conservative_fused_ad(theta, phi, edges, reassociate=False):
    """Differentiable front for the fused conservative kernel (backward
    differentiates the jnp formulation in ops.transform).  ``reassociate``
    selects the telescoped forward kernel (reassociated f32 sums)."""
    return conservative_fused(theta, phi, edges, reassociate=reassociate)


def _cf_fwd(theta, phi, edges, reassociate=False):
    return (
        conservative_fused(theta, phi, edges, reassociate=reassociate),
        (theta, phi, edges),
    )


def _cf_bwd(reassociate, res, g):
    theta, phi, edges = res
    from .transform import _conservative_rebin

    def ref(th, ph, ed):
        out, cnt = _conservative_rebin(ph, th[..., :-1], th[..., 1:], ed)
        return jnp.where(cnt > 0, out, jnp.nan)

    _, vjp = jax.vjp(ref, theta, phi, edges)
    return vjp(g)


conservative_fused_ad.defvjp(_cf_fwd, _cf_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def interp_linear_fused_ad(theta, phi, target, mask_edges, check_flip):
    """Differentiable front for the fused kernel: forward runs Pallas,
    backward differentiates the identical jnp formulation (pallas_call has
    no autodiff rule; transform gradients are rare enough that the
    recompute cost is irrelevant)."""
    return interp_linear_fused(
        theta, phi, target, mask_edges=mask_edges, check_flip=check_flip
    )


def _ilf_fwd(theta, phi, target, mask_edges, check_flip):
    return (
        interp_linear_fused(
            theta, phi, target, mask_edges=mask_edges, check_flip=check_flip
        ),
        (theta, phi, target),
    )


def _ilf_bwd(mask_edges, check_flip, res, g):
    theta, phi, target = res
    _, vjp = jax.vjp(
        lambda th, ph, tt: _fused_ref_jnp(
            th, ph, tt, mask_edges=mask_edges, check_flip=check_flip
        ),
        theta, phi, target,
    )
    return vjp(g)


interp_linear_fused_ad.defvjp(_ilf_fwd, _ilf_bwd)


# ---------------------------------------------------------------------------
# Differentiable fronts for the lanes-major (_T) kernel entries: same
# replica-vjp backward as the conventional-layout fronts, with the
# transposes composed into the replica (they appear only on the backward
# pass — the forward hot path stays transpose-free).
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def interp_linear_fused_T_ad(thT, phT, target, mask_edges, check_flip):
    """Differentiable front for :func:`interp_linear_fused_T`."""
    return interp_linear_fused_T(
        thT, phT, target, mask_edges=mask_edges, check_flip=check_flip
    )


def _ilfT_fwd(thT, phT, target, mask_edges, check_flip):
    return (
        interp_linear_fused_T(
            thT, phT, target, mask_edges=mask_edges, check_flip=check_flip
        ),
        (thT, phT, target),
    )


def _ilfT_bwd(mask_edges, check_flip, res, g):
    thT, phT, target = res

    def ref(th_t, ph_t, tt):
        t2 = tt if tt.ndim == 1 else tt.T
        return _fused_ref_jnp(
            th_t.T, ph_t.T, t2, mask_edges=mask_edges, check_flip=check_flip
        ).T

    _, vjp = jax.vjp(ref, thT, phT, target)
    return vjp(g)


interp_linear_fused_T_ad.defvjp(_ilfT_fwd, _ilfT_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conservative_fused_T_ad(thT, phT, edges, reassociate=False):
    """Differentiable front for :func:`conservative_fused_T`."""
    return conservative_fused_T(thT, phT, edges, reassociate=reassociate)


def _cfT_fwd(thT, phT, edges, reassociate=False):
    return (
        conservative_fused_T(thT, phT, edges, reassociate=reassociate),
        (thT, phT, edges),
    )


def _cfT_bwd(reassociate, res, g):
    thT, phT, edges = res
    from .transform import _conservative_rebin

    def ref(th_t, ph_t, ed):
        th = th_t.T
        out, cnt = _conservative_rebin(
            ph_t.T, th[..., :-1], th[..., 1:], ed
        )
        return jnp.where(cnt > 0, out, jnp.nan).T

    _, vjp = jax.vjp(ref, thT, phT, edges)
    return vjp(g)


conservative_fused_T_ad.defvjp(_cfT_fwd, _cfT_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def interp_linear_fused_multi_T_ad(thT, phTs, target, mask_edges, check_flip):
    """Differentiable front for :func:`interp_linear_fused_multi_T`."""
    return interp_linear_fused_multi_T(
        thT, phTs, target, mask_edges=mask_edges, check_flip=check_flip
    )


def _ilfmT_fwd(thT, phTs, target, mask_edges, check_flip):
    return (
        interp_linear_fused_multi_T(
            thT, phTs, target, mask_edges=mask_edges, check_flip=check_flip
        ),
        (thT, phTs, target),
    )


def _ilfmT_bwd(mask_edges, check_flip, res, gs):
    thT, phTs, target = res
    th_g = jnp.zeros_like(thT)
    tg_g = jnp.zeros_like(target)
    ph_gs = []
    for p, g in zip(phTs, gs):
        _, vjp = jax.vjp(
            lambda th_t, ph_t, tt: _fused_ref_jnp(
                th_t.T, ph_t.T, tt, mask_edges=mask_edges,
                check_flip=check_flip,
            ).T,
            thT, p, target,
        )
        a, b, c = vjp(g)
        th_g = th_g + a
        tg_g = tg_g + c
        ph_gs.append(b)
    return th_g, tuple(ph_gs), tg_g


interp_linear_fused_multi_T_ad.defvjp(_ilfmT_fwd, _ilfmT_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conservative_fused_multi_T_ad(thT, phTs, edges, reassociate=False):
    """Differentiable front for :func:`conservative_fused_multi_T`."""
    return conservative_fused_multi_T(thT, phTs, edges, reassociate=reassociate)


def _cfmT_fwd(thT, phTs, edges, reassociate=False):
    return (
        conservative_fused_multi_T(thT, phTs, edges, reassociate=reassociate),
        (thT, phTs, edges),
    )


def _cfmT_bwd(reassociate, res, gs):
    thT, phTs, edges = res
    from .transform import _conservative_rebin

    def ref(th_t, ph_t, ed):
        th = th_t.T
        out, cnt = _conservative_rebin(ph_t.T, th[..., :-1], th[..., 1:], ed)
        return jnp.where(cnt > 0, out, jnp.nan).T

    th_g = jnp.zeros_like(thT)
    ed_g = jnp.zeros_like(edges)
    ph_gs = []
    for p, g in zip(phTs, gs):
        _, vjp = jax.vjp(ref, thT, p, edges)
        a, b, c = vjp(g)
        th_g = th_g + a
        ed_g = ed_g + c
        ph_gs.append(b)
    return th_g, tuple(ph_gs), ed_g


conservative_fused_multi_T_ad.defvjp(_cfmT_fwd, _cfmT_bwd)
