"""Pallas TPU kernel for the linear vertical transform.

The XLA path (:func:`xgcm_tpu.ops.transform.interp_1d_linear`) lowers the
(cols, m, n) interval-membership reduction through a padded
(cols, 40-sublane, 128-lane) intermediate — measured ~9.6 ms for the
512^2 x 50 -> 36 benchmark column set (~1.4 Ggps), 30x off the HBM
roofline (inputs + outputs total ~140 MB).  This kernel keeps everything
in VMEM: each grid step loads a (C, n) tile of columns, builds the
telescoped per-interval intercept/slope differences in-register, and
accumulates the m target outputs with an unrolled loop of
compare + FMA + masked lane-reductions.  HBM traffic is exactly
theta + phi in, out out.

Scope (checked by :func:`supports_pallas_transform`): TPU backend, 2D
(cols, n) columns, shared 1D targets, f32/bf16.  Monotonicity flip, NaN
sanitisation, and the np.interp edge clamps stay in the jnp wrapper
(they are O(cols·n) elementwise, off the critical path).

Semantics match the reference numba kernel's np.interp core
(xgcm transform.py:15-41) exactly as specified by tests/test_transform*.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["interp_linear_columns", "supports_pallas_transform"]


def supports_pallas_transform(phi, theta, target) -> bool:
    """Kernel constraints: TPU, 2D column layout, shared 1D target."""
    if jax.default_backend() != "tpu":
        return False
    if phi.ndim != 2 or theta.ndim != 2 or target.ndim != 1:
        return False
    if phi.shape != theta.shape:
        return False
    if phi.shape[-1] < 2 or phi.shape[-1] > 256 or target.shape[0] > 256:
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


def _membership_jnp(theta_s, phi_s, target):
    """Pure-jnp exact interval-membership interpolation — the
    differentiable fallback used as the custom-VJP reference for the
    kernel.  Each target matches exactly ONE interval
    [theta_k, theta_{k+1}) with theta_{k+1} > t (duplicate knots match
    only the last, +inf-sanitised NaN regions match the trailing
    half-open interval whose slope resolves to 0), so the masked sums
    below are exact single-term selections and the final lerp is
    bit-for-bit np.interp arithmetic."""
    dtype = jnp.promote_types(phi_s.dtype, jnp.float32)
    th = theta_s.astype(dtype)
    ph = phi_s.astype(dtype)
    th_n = _shifted(th, jnp.inf)
    ph_n = _shifted(ph, 0.0)
    t_ = target.astype(dtype)[None, :, None]
    m = (th[:, None, :] <= t_) & (th_n[:, None, :] > t_)

    def sel(x):
        return jnp.sum(jnp.where(m, x[:, None, :], 0.0), axis=-1)

    th_lo, th_hi = sel(th), sel(th_n)
    ph_lo, ph_hi = sel(ph), sel(ph_n)
    dth = th_hi - th_lo
    w = (target.astype(dtype)[None, :] - th_lo) / dth
    w = jnp.where(jnp.isfinite(w), w, 0.0)
    out = ph_lo + w * (ph_hi - ph_lo)
    return out.astype(phi_s.dtype)


def _kernel(th_ref, ph_ref, s_ref, t_ref, out_ref, *, n, m):
    """One tile of columns, transposed layout: blocks th/ph/s are (n, C)
    with columns in lanes and targets (m, 1) in sublanes; accumulators
    live in (m, C) registers.  The knot loop is sequential-over-n with NO
    lane reductions (a per-target masked-lane-reduction variant measured
    10x slower — reductions dominate), one fresh step compare per knot
    (the membership indicator [th_k <= t] & ![th_{k+1} <= t] reuses the
    previous iteration's compare), and FMA accumulation of the exactly
    selected (th_lo, ph_lo, slope).  Exactly one interval matches each
    target, so the accumulators are exact single-term selections and the
    final lerp is np.interp arithmetic."""
    t = t_ref[:, 0:1]  # (m, 1)
    C = th_ref.shape[1]
    dtype = out_ref.dtype
    th_lo = jnp.zeros((m, C), dtype)
    ph_lo = jnp.zeros((m, C), dtype)
    s_sel = jnp.zeros((m, C), dtype)
    cs = th_ref[0:1, :] <= t  # (m, C) step for k = 0
    for k in range(n - 1):
        cs_next = th_ref[k + 1 : k + 2, :] <= t
        c = (cs & ~cs_next).astype(dtype)
        th_lo = th_lo + c * th_ref[k : k + 1, :]
        ph_lo = ph_lo + c * ph_ref[k : k + 1, :]
        s_sel = s_sel + c * s_ref[k : k + 1, :]
        cs = cs_next
    # trailing half-open interval [th_{n-1}, +inf): slope 0 (the np.interp
    # edge clamp overwrites these targets anyway)
    cl = cs.astype(dtype)
    th_lo = th_lo + cl * th_ref[n - 1 : n, :]
    ph_lo = ph_lo + cl * ph_ref[n - 1 : n, :]
    out_ref[:, :] = ph_lo + (t - th_lo) * s_sel


@functools.partial(jax.jit, static_argnames=("tile_cols",))
def interp_linear_columns(
    theta_s: jax.Array,
    phi_s: jax.Array,
    target: jax.Array,
    tile_cols: int = 512,
) -> jax.Array:
    """Raw telescoped interpolation sum for (cols, n) columns onto (m,)
    shared targets; inputs must already be sanitised (NaN theta -> +inf,
    NaN phi -> 0) and monotonicity-flipped.  Returns (cols, m) BEFORE the
    np.interp edge clamps (the jnp wrapper applies those).
    """
    cols, n = theta_s.shape
    (m,) = target.shape
    dtype = jnp.promote_types(phi_s.dtype, jnp.float32)
    th = theta_s.astype(dtype)
    ph = phi_s.astype(dtype)
    # per-interval slopes (exact per-interval constants selected one-hot;
    # invalid intervals — equal knots, +inf-sanitised NaN regions — get 0)
    dth = th[:, 1:] - th[:, :-1]
    ok = jnp.isfinite(dth) & (dth > 0)
    slope = jnp.where(
        ok, (ph[:, 1:] - ph[:, :-1]) / jnp.where(ok, dth, 1.0), 0.0
    )
    s_full = jnp.concatenate([slope, jnp.zeros_like(slope[:, :1])], 1)

    # transposed layout (n, cols): columns ride the lanes; XLA fuses these
    # transposes into the elementwise prep above
    thT, phT, sT = th.T, ph.T, s_full.T

    C = tile_cols
    while cols % C:
        C //= 2
    grid = cols // C
    t_col = jnp.broadcast_to(target.astype(dtype).reshape(m, 1), (m, 8))

    tile = lambda i: (0, i)  # noqa: E731
    out = pl.pallas_call(
        functools.partial(_kernel, n=n, m=m),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((n, C), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((n, C), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((n, C), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, C), tile, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, cols), dtype),
    )(thT, phT, sT, t_col)
    return out.T.astype(phi_s.dtype)


@jax.custom_vjp
def interp_linear_columns_ad(theta_s, phi_s, target):
    """Differentiable front for the kernel: forward runs Pallas, backward
    differentiates the identical jnp formulation (pallas_call has no
    autodiff rule; transform gradients are rare enough that the recompute
    cost is irrelevant)."""
    return interp_linear_columns(theta_s, phi_s, target)


def _ilc_fwd(theta_s, phi_s, target):
    return interp_linear_columns(theta_s, phi_s, target), (
        theta_s, phi_s, target,
    )


def _ilc_bwd(res, g):
    theta_s, phi_s, target = res
    _, vjp = jax.vjp(_membership_jnp, theta_s, phi_s, target)
    return vjp(g)


interp_linear_columns_ad.defvjp(_ilc_fwd, _ilc_bwd)
