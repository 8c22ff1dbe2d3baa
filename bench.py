#!/usr/bin/env python
"""xgcm_tpu benchmark harness.

Measures the BASELINE.json headline workload — C-grid relative vorticity
(diff + metric ops) — plus the vertical transform, on the default JAX
backend (the real TPU under the driver), and compares against a single-core
numpy implementation of the identical arithmetic (the reference xgcm's
compute core is numpy slice arithmetic; xarray/dask are not installed in
this image, so the numpy path stands in for the reference per BASELINE.md).

Timing methodology: K applications are chained inside one jitted
``lax.fori_loop`` (each iteration's input depends on the previous output),
so a single dispatch covers K kernel executions — per-call host/tunnel RPC
latency does not pollute the measurement.

Prints ONE JSON line:
    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ..., "detail": ...}
"""

import json
import pathlib
import sys
import time

import numpy as np

_BASELINE_JSON = pathlib.Path(__file__).resolve().parent / "BASELINE.json"


def _log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)

K = 30  # chained iterations per timed dispatch


def numpy_vorticity(u, v, inv_dx, inv_dy):
    """Reference-equivalent numpy path: two padded diffs + arithmetic,
    mirroring xgcm's diff_center_to_left kernel (gridops.py:23-29) with
    periodic padding."""
    vp = np.concatenate([v[:, -1:], v], axis=1)
    dvdx = vp[:, 1:] - vp[:, :-1]
    up = np.concatenate([u[-1:, :], u], axis=0)
    dudy = up[1:, :] - up[:-1, :]
    return dvdx * inv_dx[None, :] - dudy * inv_dy[:, None]


# --------------------------------------------------------------- baseline pin
#
# The reference publishes no numbers (SURVEY.md §6) and xarray/dask are not
# installed in this image, so the reference-side baseline is a single-core
# numpy implementation of the identical arithmetic — favourable to the
# reference, whose compute core is numpy slice arithmetic UNDER xarray/dask
# overhead (gridops.py:23-29, transform.py:15-142).  Because this host's CPU
# throughput drifts ±10-15% run to run, the baseline is PINNED: measured once
# as the median of >=5 interleaved rounds per config (``--pin-baseline``),
# recorded in BASELINE.json["published"], and every subsequent bench run
# reports vs_baseline against the pinned value (the live re-measurement is
# printed separately as a drift check).


def _np_tutorial_1d():
    """Config 1: 1D periodic 128-pt diff+interp+cumsum center->left."""
    n = 128
    a = np.random.RandomState(3).rand(n).astype(np.float64)

    def run():
        ap = np.concatenate([a[-1:], a])
        d = ap[1:] - ap[:-1]
        i = 0.5 * (ap[1:] + ap[:-1])
        c = np.cumsum(a)[:-1]
        return d, i, c

    return run, 3 * n


def _np_vorticity_2048():
    """Config 2: C-grid vorticity, 2048x2048 f32 (the headline denominator)."""
    rng = np.random.RandomState(0)
    n = 2048
    u = rng.rand(n, n).astype(np.float32)
    v = rng.rand(n, n).astype(np.float32)
    ix = (rng.rand(n) + 1.0).astype(np.float32)
    iy = (rng.rand(n) + 1.0).astype(np.float32)
    return (lambda: numpy_vorticity(u, v, ix, iy)), n * n


def _np_integrate_2048():
    """Config 3: area-weighted integrate, 2048x2048 f32."""
    rng = np.random.RandomState(1)
    n = 2048
    tr = rng.rand(n, n).astype(np.float32)
    area = rng.rand(n, n).astype(np.float32)
    return (lambda: (tr * area).sum()), n * n


def _np_transform_linear():
    """Config 4a: linear depth->density remap, 50 levels x 16384 columns.

    Per-column ``np.interp`` — the exact core of the reference's numba
    kernel (transform.py:33) — which beats a dense vectorized numpy
    formulation at this shape."""
    rng = np.random.RandomState(2)
    nz, ncol, m = 50, 16384, 36
    theta = np.sort(rng.rand(ncol, nz).astype(np.float32), -1) * 30
    phi = rng.rand(ncol, nz).astype(np.float32)
    tgt = np.linspace(1, 29, m).astype(np.float32)

    def run():
        out = np.empty((ncol, m), np.float32)
        for c in range(ncol):
            out[c] = np.interp(tgt, theta[c], phi[c])
        return out

    return run, ncol * nz


def _np_transform_conservative():
    """Config 4b: conservative remap via vectorized overlap weights
    (favourable stand-in for the reference's O(n*m) per-column numba loop,
    transform.py:88-142)."""
    rng = np.random.RandomState(4)
    nz, ncol, m = 50, 16384, 36
    edges = np.sort(rng.rand(ncol, nz + 1).astype(np.float32), -1) * 30
    lo, hi = edges[:, :-1, None], edges[:, 1:, None]
    phi = rng.rand(ncol, nz).astype(np.float32)
    tedges = np.linspace(0, 30, m + 1).astype(np.float32)
    tlo, thi = tedges[:-1][None, None], tedges[1:][None, None]

    def run():
        w = np.clip(
            np.minimum(hi, thi) - np.maximum(lo, tlo), 0, None
        ) / (hi - lo)
        return np.einsum("cz,czm->cm", phi, w)

    return run, ncol * nz


def _np_face_diff():
    """Config 5: cross-face diff on 6 x 1024^2 faces.  Compute-equivalent
    stand-in: per-face padded diff with a copied neighbour strip (the
    reference's halo assembly is xarray slice+concat per edge on top of
    this, padding.py:157-315 — so this is favourable to the reference)."""
    rng = np.random.RandomState(5)
    n = 1024
    f = rng.rand(6, n, n).astype(np.float32)

    def run():
        strips = f[np.roll(np.arange(6), 1), :, -1:]  # neighbour edge strip
        fp = np.concatenate([strips, f], axis=2)
        return fp[:, :, 1:] - fp[:, :, :-1]

    return run, 6 * n * n


_BASELINE_CONFIGS = {
    "tutorial_1d_128": _np_tutorial_1d,
    "vorticity_2048": _np_vorticity_2048,
    "integrate_2048": _np_integrate_2048,
    "transform_linear_50x16384": _np_transform_linear,
    "transform_conservative_50x16384": _np_transform_conservative,
    "cubed_sphere_diff_6x1024": _np_face_diff,
}


def measure_numpy_baseline(name, rounds=5, inner=3):
    """Median over `rounds` of best-of-`inner` throughput (gridpoints/s)."""
    run, gp = _BASELINE_CONFIGS[name]()
    run()  # warm (allocator, page faults)
    per_round = []
    for _ in range(rounds):
        best = float("inf")
        for _ in range(inner):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        per_round.append(gp / best)
    return float(np.median(per_round)), per_round


def pin_baseline(rounds=5):
    """Measure all configs with INTERLEAVED rounds (so host drift hits every
    config equally) and write the medians to BASELINE.json["published"]."""
    import datetime
    import os

    runs = {k: fn() for k, fn in _BASELINE_CONFIGS.items()}
    for run, _ in runs.values():
        run()  # warm all
    samples = {k: [] for k in runs}
    for r in range(rounds):
        for k, (run, gp) in runs.items():
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                run()
                best = min(best, time.perf_counter() - t0)
            samples[k].append(gp / best)
        _log(f"pin round {r + 1}/{rounds} done")

    doc = json.loads(_BASELINE_JSON.read_text())
    published = {
        k: {
            "Ggps": round(float(np.median(v)) / 1e9, 4),
            "spread": [round(min(v) / 1e9, 4), round(max(v) / 1e9, 4)],
        }
        for k, v in samples.items()
    }
    published["_meta"] = {
        "method": (
            f"single-core numpy reference-equivalent arithmetic; median of "
            f"{rounds} interleaved rounds (best-of-3 each); favourable to "
            f"the reference for the slice-arithmetic configs (no xarray/"
            f"dask overhead).  CAVEAT: the two transform configs stand in "
            f"for numba @guvectorize kernels (transform.py:15-142) which "
            f"JIT-compile the per-column loops — on a fast core numba "
            f"could beat these numpy stand-ins by 5-20x, so treat the "
            f"transform multipliers as upper bounds."
        ),
        "host_cpus": os.cpu_count(),
        "date": datetime.date.today().isoformat(),
    }
    doc["published"] = published
    _BASELINE_JSON.write_text(json.dumps(doc, indent=2) + "\n")
    for k, v in published.items():
        if not k.startswith("_"):
            _log(f"pinned {k}: {v['Ggps']} Ggps (spread {v['spread']})")
    return published


def _pinned_baseline_Ggps(name="vorticity_2048"):
    try:
        doc = json.loads(_BASELINE_JSON.read_text())
        return float(doc["published"][name]["Ggps"])
    except (OSError, KeyError, ValueError, TypeError):
        return None


def main():
    import jax
    import jax.numpy as jnp

    # persistent compilation cache: compiles dominate bench wall time
    # (~40-90 s each over the remote helper) and are never measured
    try:
        jax.config.update(
            "jax_compilation_cache_dir", "/tmp/xgcm_tpu_jax_cache"
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import xgcm_tpu as xt
    from xgcm_tpu.ops import pallas_stencils as ps

    backend = jax.default_backend()

    # 8192^2 amortises this device's ~1.1 ms fixed per-dispatch-step overhead
    # (measured: marginal HBM bandwidth ~500 GB/s; at 4096^2 the overhead
    # dominates and understates throughput ~1.6x)
    ny, nx = 8192, 8192
    rng = np.random.RandomState(0)
    u_np = rng.rand(ny, nx).astype(np.float32)
    v_np = rng.rand(ny, nx).astype(np.float32)
    inv_dx_np = (rng.rand(nx) + 1.0).astype(np.float32)
    inv_dy_np = (rng.rand(ny) + 1.0).astype(np.float32)

    _log(f"backend={backend}; staging arrays to device")
    u = jnp.asarray(u_np)
    v = jnp.asarray(v_np)
    inv_dx = jnp.asarray(inv_dx_np)
    inv_dy = jnp.asarray(inv_dy_np)

    # --- framework path: vorticity through the public Grid API ---
    ds = xt.Dataset(
        coords={
            "xc": ("xc", np.arange(nx, dtype=np.float32)),
            "xg": ("xg", np.arange(nx, dtype=np.float32)),
            "yc": ("yc", np.arange(ny, dtype=np.float32)),
            "yg": ("yg", np.arange(ny, dtype=np.float32)),
        }
    )
    grid = xt.Grid(
        ds,
        coords={
            "X": {"center": "xc", "left": "xg"},
            "Y": {"center": "yc", "left": "yg"},
        },
        autoparse_metadata=False,
    )

    def api_vorticity(u, v, ix, iy):
        # C-grid velocities: u on (yc, xg), v on (yg, xc); both diffs land
        # on the vorticity corner point (yg, xg)
        uu = xt.GriddedArray(u, ("yc", "xg"))
        vv = xt.GriddedArray(v, ("yg", "xc"))
        dvdx = grid.diff(vv, "X")
        dudy = grid.diff(uu, "Y")
        gix = xt.GriddedArray(ix, ("xg",))
        giy = xt.GriddedArray(iy, ("yg",))
        return (dvdx * gix - dudy * giy).data

    def chained(vort_fn):
        # feed the output straight back as the next input: per-iteration
        # traffic is exactly read(u) + read(v) + write(z) — the op's true
        # lower bound.  (An `u + eps*z` update would add a whole extra
        # read+write pass for any non-XLA-fused path.)
        @jax.jit
        def run(u, v, ix, iy):
            def body(_, uu):
                return vort_fn(uu, v, ix, iy)
            return jnp.sum(jax.lax.fori_loop(0, K, body, u))
        return run

    workload_defs = {}
    probes = {}
    probe_defs = {}

    def time_chained(f, *args, reps=3, register=None, pattern=None):
        # best-of-N, and registered workloads are RE-timed in the end-of-run
        # drift-guard pass exactly like the probes: back-to-back reps all
        # land in one drift window, so a workload timed in a slow window
        # systematically understates its roofline fraction (r3's
        # cubed-sphere 0.884, and this run's own llc dip, were exactly
        # this artifact) — the guard gives probes and workloads the same
        # two-window best.
        # `pattern` names the workload's roofline probe: it is re-timed
        # immediately BEFORE and AFTER the workload (best-of-adjacent, r4
        # VERDICT item 3), so probe and workload share a drift window and
        # fractions cannot exceed 1.0 by timing-skew alone.
        if pattern is not None:
            _retime_probe(pattern)
        float(f(*args))  # compile + sync
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(*args))
            dt = (time.perf_counter() - t0) / K
            best = dt if best is None else min(best, dt)
        if register is not None:
            workload_defs[register] = (f, args, best, pattern)
        if pattern is not None:
            _retime_probe(pattern)
        return best

    def _retime_probe(name, reps=2):
        """Re-run an already-compiled probe; keep the max bandwidth seen.

        Roofline probes are CEILINGS by construction (strictly less work
        than their workload), so the best measurement across windows is
        the demonstrated ceiling; taking the max is drift-robustness, not
        flattery.  Strip-modelled FLOOR probes also come through here: for
        those the max tightens the floor measurement, and a fraction that
        stays >1 after re-timing means the op genuinely beats the modelled
        program (possible and reported honestly), not probe error."""
        if name not in probe_defs:
            return
        fn, bpi, args = probe_defs[name]
        try:
            t = time_chained(fn, *args, reps=reps)
            val = bpi / t / 1e9
            if probes.get(name) is None or val > probes[name]:
                probes[name] = val
        except Exception:
            pass

    def workload_time(name, default=None):
        if name in workload_defs:
            return workload_defs[name][2]
        return default

    jnp.asarray(0.0).block_until_ready()

    # --- measured per-pattern rooflines (VERDICT r2 item 7): one probe per
    # ACCESS PATTERN under the identical chained harness, so every
    # workload's roofline fraction compares against the bandwidth its own
    # pattern can actually sustain (a single 1R+1W probe understates
    # read-dominated patterns and produced fractions > 1):
    #   stream  = 1 read + 1 write   (a + 1)          -> 1-in-1-out ops
    #   three   = 2 reads + 1 write  (v - a)          -> 2-in-1-out stencils
    #   reduce2 = 2 reads + 0 writes (acc += sum(u*v)) -> weighted reduces
    # (assumed nominal bandwidths overstate what's reachable: the stream
    # probe measures ~286 GB/s on this v5e-1 tunnel vs the chip's ~819 GB/s
    # spec; bf16 transactions are narrower still)
    @jax.jit
    def _stream(x):
        def body(_, a):
            return a + jnp.float32(1.0)
        return jnp.sum(jax.lax.fori_loop(0, K, body, x)[::1024, ::1024])

    @jax.jit
    def _three(x, y):
        def body(_, a):
            return y - a
        return jnp.sum(jax.lax.fori_loop(0, K, body, x)[::1024, ::1024])

    @jax.jit
    def _reduce2(x, y):
        def body(_, acc):
            return acc + jnp.sum(x * (y + jnp.float32(1e-30) * acc))
        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    @jax.jit
    def _stream_bf16(x):
        def body(_, a):
            return a + jnp.bfloat16(1.0)
        return jnp.sum(
            jax.lax.fori_loop(0, K, body, x)[::1024, ::1024].astype(
                jnp.float32
            )
        )

    @jax.jit
    def _three_bf16(x, y):
        def body(_, a):
            return y - a
        return jnp.sum(
            jax.lax.fori_loop(0, K, body, x)[::1024, ::1024].astype(
                jnp.float32
            )
        )

    # Stencil workloads read their neighbours through SHIFTED windows, and
    # shifted reads are intrinsically slower than aligned streams on this
    # chip (lane/sublane rotates serialize against the load pipeline):
    # measured same-run at 8192^2, a lane+sublane-shifted 3-array pattern
    # sustains only 0.74-0.80 of the aligned 3-array probe, and a shifted
    # 1-in-1-out only ~0.81 of the aligned stream at 6x2048^2.  No
    # implementation of a stencil can beat the shifted probe, so stencil
    # workloads take their roofline from it (same principle as the
    # per-pattern probes: compare each workload against what ITS access
    # pattern can sustain, not against a pattern it cannot have).
    @jax.jit
    def _shifted_three(x, y):
        def body(_, a):
            return jnp.roll(y, 1, axis=1) - jnp.roll(a, 1, axis=0)
        return jnp.sum(jax.lax.fori_loop(0, K, body, x)[::1024, ::1024])

    @jax.jit
    def _shifted_three_bf16(x, y):
        def body(_, a):
            return jnp.roll(y, 1, axis=1) - jnp.roll(a, 1, axis=0)
        return jnp.sum(
            jax.lax.fori_loop(0, K, body, x)[::1024, ::1024].astype(
                jnp.float32
            )
        )

    # --- VPU compute-rate probe.  The transform kernels are VPU-bound,
    # not stream-bound (exact np.interp semantics without gathers is an
    # O(n*m) compare+FMA sweep per column), so comparing them against a
    # bandwidth probe misstates how close they run to the hardware.  This
    # probe measures the sustained elementwise vector-op rate (alternating
    # FMA / max so the affine chain cannot be algebraically collapsed;
    # constants passed as traced scalars so nothing folds): the transform
    # workloads report their main-loop op rate as a fraction of THIS.
    R_VPU = 512

    @jax.jit
    def _vpu(x, c1, c2, lo):
        def body(_, a):
            for _ in range(R_VPU // 2):
                a = a * c1 + c2
                a = jnp.maximum(a, lo)
            return a
        return jnp.sum(jax.lax.fori_loop(0, K, body, x)[::1024, ::1024])

    # select-mix variant: the transform kernels' loops are cmp +
    # broadcast + select heavy, and that mix measurably issues a few
    # percent better than the FMA/max chain above (r5: multi4 measured
    # real_op_frac 1.034 against the FMA probe alone — the kernel cannot
    # out-run the VPU, so the FMA probe under-measured the ceiling for
    # ITS op mix).  The reported VPU ceiling is the max of both probes.
    # Op accounting matches the kernels' real-op convention: mul+add is
    # ONE fused FMA row op, so each step is 3 ops (cmp, fma, select) —
    # R_VPU_SEL per body call below.
    R_VPU_SEL = 3 * (R_VPU // 4)

    @jax.jit
    def _vpu_sel(x, c1, c2, lo):
        def body(_, a):
            for _ in range(R_VPU // 4):
                h = a > lo                        # cmp
                a = jnp.where(h, a * c1 + c2, a)  # fma + select
            return a
        return jnp.sum(jax.lax.fori_loop(0, K, body, x)[::1024, ::1024])

    def _probe(name, fn, bytes_per_iter, *args):
        try:
            t = time_chained(fn, *args)
            probes[name] = bytes_per_iter / t / 1e9
            probe_defs[name] = (fn, bytes_per_iter, args)
            _unit = "Gop/s" if name.startswith("vpu") else "GB/s"
            _log(f"{name} probe: {probes[name]:.0f} {_unit}")
        except Exception as e:
            _log(f"{name} probe failed: {e}")
            probes[name] = None

    _log("compiling per-pattern roofline probes")
    _probe("stream_f32", _stream, 2 * ny * nx * 4, u)
    _probe("three_f32", _three, 3 * ny * nx * 4, u, v)
    _probe("shifted_three_f32", _shifted_three, 3 * ny * nx * 4, u, v)
    _probe("reduce2_f32", _reduce2, 2 * ny * nx * 4, u, v)
    u16 = u.astype(jnp.bfloat16)
    v16 = v.astype(jnp.bfloat16)
    _probe("stream_bf16", _stream_bf16, 2 * ny * nx * 2, u16)
    _probe("three_bf16", _three_bf16, 3 * ny * nx * 2, u16, v16)
    _probe(
        "shifted_three_bf16", _shifted_three_bf16, 3 * ny * nx * 2, u16, v16
    )
    # value recorded is Gop/s, not GB/s: "bytes_per_iter" = ops per iter
    _probe(
        "vpu_f32_Gops", _vpu, R_VPU * ny * nx,
        u, jnp.float32(0.999999), jnp.float32(1e-6), jnp.float32(-3e38),
    )
    _probe(
        "vpu_sel_f32_Gops", _vpu_sel, R_VPU_SEL * ny * nx,
        u, jnp.float32(0.999999), jnp.float32(1e-6), jnp.float32(-3e38),
    )
    hbm_gbps = probes.get("stream_f32")

    def _vpu_ceiling():
        vals = [probes.get("vpu_f32_Gops"), probes.get("vpu_sel_f32_Gops")]
        vals = [v for v in vals if v]
        return max(vals) if vals else None

    _log("compiling chained Grid-API vorticity")
    t_api = time_chained(chained(api_vorticity), u, v, inv_dx, inv_dy,
                         register="vorticity_api", pattern="shifted_three_f32")
    _log(f"api path: {t_api*1e3:.3f} ms/iter")

    # --- fused Pallas kernel (TPU only) ---
    t_pallas = None
    _log("compiling fused Pallas vorticity")
    if ps.supports_pallas(u, v):
        try:
            zp = ps.fused_vorticity(u, v, inv_dx, inv_dy, tile_rows=64)
            za = jax.jit(api_vorticity)(u, v, inv_dx, inv_dy)
            if float(jnp.max(jnp.abs(zp - za))) < 1e-4:
                t_pallas = time_chained(
                    chained(lambda a, b, c, d: ps.fused_vorticity(a, b, c, d, tile_rows=64)),
                    u, v, inv_dx, inv_dy,
                    register="vorticity_pallas", pattern="shifted_three_f32",
                )
        except Exception:
            t_pallas = None

    _log(f"pallas path: {t_pallas and t_pallas*1e3} ms/iter")
    t_best = min(x for x in (t_api, t_pallas) if x is not None)
    gps = ny * nx / t_best

    # --- bf16 variant (halved HBM traffic): best of XLA API path and the
    # Pallas kernel (bf16 now rides the same kernels via in-register f32
    # upcasts for the neighbour rolls), with a bit-exactness check of the
    # Pallas result against the XLA bf16 path before trusting its timing ---
    def chained_bf16(vort_fn):
        @jax.jit
        def run(u, v, ix, iy):
            def body(_, uu):
                return vort_fn(uu, v, ix, iy)
            return jnp.sum(
                jax.lax.fori_loop(0, K, body, u).astype(jnp.float32)
            )
        return run

    _log("compiling bf16 vorticity")
    gps_bf16 = None
    bf16_pallas_exact = None
    try:
        bf16_args = tuple(
            a.astype(jnp.bfloat16) for a in (u, v, inv_dx, inv_dy)
        )
        t_bf16_api = time_chained(chained_bf16(api_vorticity), *bf16_args,
                                  register="vorticity_bf16_api", pattern="shifted_three_bf16")
        _log(f"bf16 api path: {t_bf16_api*1e3:.3f} ms/iter")
        t_bf16_pallas = None
        if ps.supports_pallas(bf16_args[0], bf16_args[1]):
            try:
                zp = ps.fused_vorticity(*bf16_args, tile_rows=64)
                za = jax.jit(api_vorticity)(*bf16_args)
                bf16_pallas_exact = bool(
                    jnp.all(
                        zp.astype(jnp.float32) == za.astype(jnp.float32)
                    )
                )
                _log(f"bf16 pallas == XLA bit-exact: {bf16_pallas_exact}")
                if bf16_pallas_exact or float(
                    jnp.max(jnp.abs(zp.astype(jnp.float32) - za.astype(jnp.float32)))
                ) < 1e-1:
                    t_bf16_pallas = time_chained(
                        chained_bf16(
                            lambda a, b, c, d: ps.fused_vorticity(
                                a, b, c, d, tile_rows=64
                            )
                        ),
                        *bf16_args,
                    )
                    _log(f"bf16 pallas path: {t_bf16_pallas*1e3:.3f} ms/iter")
            except Exception as e:
                _log(f"bf16 pallas failed ({e}); XLA bf16 only")
        t_bf16 = min(x for x in (t_bf16_api, t_bf16_pallas) if x is not None)
        gps_bf16 = ny * nx / t_bf16
    except Exception as e:
        _log(f"bf16 bench failed: {e}")
        gps_bf16 = None

    # --- numpy baseline: PINNED value from BASELINE.json["published"]
    # (measured once by `bench.py --pin-baseline`, median of interleaved
    # rounds); the live re-measurement below is only a drift check — the
    # host CPU drifts ±10-15% run to run, which used to swing the headline
    # multiplier 146x-859x on noise alone ---
    gps_numpy_pinned = _pinned_baseline_Ggps("vorticity_2048")
    gps_numpy_live, _rounds = measure_numpy_baseline("vorticity_2048")
    if gps_numpy_pinned is not None:
        # headline uses the LARGER of pinned and live (r4 VERDICT item 2):
        # the conservative multiplier, immune to a stale or loaded-host pin
        gps_numpy = max(gps_numpy_pinned * 1e9, gps_numpy_live)
        _log(
            f"numpy baseline: pinned {gps_numpy_pinned:.4f} Ggps, "
            f"live {gps_numpy_live / 1e9:.4f} (drift "
            f"{gps_numpy_live / (gps_numpy_pinned * 1e9):.2f}x); "
            f"headline denominator = max of the two"
        )
    else:
        gps_numpy = gps_numpy_live
        _log(
            "numpy baseline: NO pinned value in BASELINE.json - run "
            "`python bench.py --pin-baseline`; using live measurement"
        )

    # --- secondary: vertical transform (linear, 50 -> 36 levels) THROUGH
    # THE PUBLIC API: grid.transform on a non-periodic Z grid.  The
    # HEADLINE runs the lanes-major (zc, col) layout — the TPU-native
    # orientation grid.transform serves transpose-free (VERDICT r2 item
    # 4); the conventional (col, zc) layout is timed alongside to show
    # the round-trip cost it avoids ---
    nz, ncol = 50, 512 * 512
    theta_np = np.sort(rng.rand(ncol, nz).astype(np.float32), axis=-1) * 30
    phi_np = rng.rand(ncol, nz).astype(np.float32)
    theta = jnp.asarray(theta_np)
    phi = jnp.asarray(phi_np)
    thetaT = jnp.asarray(theta_np.T.copy())
    phiT = jnp.asarray(phi_np.T.copy())
    targets = jnp.asarray(np.linspace(1, 29, 36).astype(np.float32))

    ds_z = xt.Dataset(
        coords={
            "zc": ("zc", np.arange(nz, dtype=np.float32)),
            "zo": ("zo", np.arange(nz + 1, dtype=np.float32)),
        }
    )
    grid_z = xt.Grid(
        ds_z,
        coords={"Z": {"center": "zc", "outer": "zo"}},
        periodic=False,
        autoparse_metadata=False,
    )

    @jax.jit
    def tr_chained(p, t, tt):
        # serialise iterations through the tiny target vector (adding a
        # scalar-dependent epsilon) so the big per-column inputs stay
        # loop-invariant and no extra array-update pass is paid.
        # (zc, col) layout: the kernel's native orientation, zero XLA
        # transposes on the hot path, output (s, col) in place
        def body(_, acc):
            out = grid_z.transform(
                xt.GriddedArray(p, ("zc", "col"), name="phi"),
                "Z",
                tt + jnp.float32(1e-12) * acc,
                target_data=xt.GriddedArray(t, ("zc", "col"), name="theta"),
                method="linear",
                mask_edges=True,
            ).data
            # serialisation needs A dependency, not a full reduce: one
            # output row keeps the chain honest without charging the
            # workload an extra pass over the (s, col) output that the
            # stencil workloads' feed-back chains never pay
            return jnp.nansum(out[0:1, :])
        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    @jax.jit
    def tr_colmajor_chained(p, t, tt):
        # conventional (col, zc) layout: pays the layout round-trip
        def body(_, acc):
            out = grid_z.transform(
                xt.GriddedArray(p, ("col", "zc"), name="phi"),
                "Z",
                tt + jnp.float32(1e-12) * acc,
                target_data=xt.GriddedArray(t, ("col", "zc"), name="theta"),
                method="linear",
                mask_edges=True,
            ).data
            return jnp.nansum(out[0:1, :])
        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    # real-hardware correctness gate for the fused transform kernels:
    # compiled-mode (not interpret-mode) semantics on a NaN/descending
    # fixture must match the generic XLA formulation bit-for-bit — the CPU
    # test suite cannot catch Mosaic-only divergences (e.g. 0*inf)
    transform_kernels_exact = None
    try:
        from xgcm_tpu.ops.pallas_transform import (
            _fused_ref_jnp,
            conservative_fused,
            interp_linear_fused,
            supports_fused_transform,
        )
        from xgcm_tpu.ops.transform import _conservative_rebin

        thc = np.sort(rng.rand(1024, 20).astype(np.float32), -1) * 30
        phc = rng.rand(1024, 20).astype(np.float32)
        thc[0:128, 14:] = np.nan
        thc[128:256, :5] = np.nan
        thc[256:384, :] = np.nan
        thc[384:512] = thc[384:512, ::-1]
        ttc = jnp.asarray(np.linspace(-3, 34, 17).astype(np.float32))
        if supports_fused_transform(
            jnp.asarray(phc), jnp.asarray(thc), ttc
        ):
            lin = interp_linear_fused(
                jnp.asarray(thc), jnp.asarray(phc), ttc, mask_edges=True
            )
            lin_ref = _fused_ref_jnp(
                jnp.asarray(thc), jnp.asarray(phc), ttc, mask_edges=True
            )
            thb2 = np.sort(rng.rand(1024, 13).astype(np.float32), -1) * 20
            phb2 = rng.rand(1024, 12).astype(np.float32)
            thb2[0:128, 9:] = np.nan
            thb2[128:256, 5] = thb2[128:256, 4]
            ed2_np = np.linspace(-2, 23, 17).astype(np.float32)
            # degenerate cell sitting EXACTLY on a bin edge: exercises the
            # folded-step inclusive-upper-edge correction on hardware
            thb2[400:416, 7] = ed2_np[5]
            thb2[400:416, 6] = ed2_np[5]
            ed2 = jnp.asarray(ed2_np)
            cons = conservative_fused(
                jnp.asarray(thb2), jnp.asarray(phb2), ed2
            )
            cref, ccnt = _conservative_rebin(
                jnp.asarray(phb2), jnp.asarray(thb2[:, :-1]),
                jnp.asarray(thb2[:, 1:]), ed2,
            )
            cref = jnp.where(ccnt > 0, cref, jnp.nan)

            def _same(a, b):
                a, b = np.asarray(a), np.asarray(b)
                return bool(
                    np.array_equal(np.nan_to_num(a, nan=-7.25),
                                   np.nan_to_num(b, nan=-7.25))
                )

            transform_kernels_exact = _same(lin, lin_ref) and _same(cons, cref)
            _log(f"fused transform kernels == XLA bit-exact: "
                 f"{transform_kernels_exact}")
    except Exception as e:
        _log(f"transform kernel exactness check failed: {e}")

    _log("compiling chained transform (lanes-major layout, public API)")
    try:
        t_tr = time_chained(tr_chained, phiT, thetaT, targets,
                            register="transform_linear", pattern="vpu_f32_Gops")
        transform_gps = ncol * nz / t_tr
    except Exception as e:
        _log(f"transform bench failed: {e}")
        transform_gps = None

    _log("compiling chained transform (conventional layout)")
    try:
        t_tr_cm = time_chained(tr_colmajor_chained, phi, theta, targets,
                               register="transform_colmajor", pattern="vpu_f32_Gops")
        transform_colmajor_gps = ncol * nz / t_tr_cm
    except Exception as e:
        _log(f"colmajor transform bench failed: {e}")
        transform_colmajor_gps = None

    # --- multi-variable transform: 4 tracers onto the same surfaces in one
    # fused kernel (the density-space analysis pattern), lanes-major ---
    phis4T = tuple(
        jnp.asarray(rng.rand(nz, ncol).astype(np.float32)) for _ in range(4)
    )

    @jax.jit
    def trm_chained(t, ps, tt):
        def body(_, acc):
            outs = grid_z.transform_multi(
                [xt.GriddedArray(p, ("zc", "col"), name="p") for p in ps],
                "Z",
                tt + jnp.float32(1e-12) * acc,
                target_data=xt.GriddedArray(t, ("zc", "col"), name="theta"),
                method="linear",
            )
            return sum(jnp.nansum(o.data[0:1, :]) for o in outs)
        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    _log("compiling chained 4-variable transform_multi (lanes-major)")
    try:
        t_trm = time_chained(trm_chained, thetaT, phis4T, targets,
                             register="transform_multi", pattern="vpu_f32_Gops")
        transform_multi_gps = 4 * ncol * nz / t_trm
    except Exception as e:
        _log(f"transform_multi bench failed: {e}")
        transform_multi_gps = None

    # --- conservative transform (cumulative-mass rebin) THROUGH THE API,
    # lanes-major (zo, col) bounds + (zc, col) cells ---
    theta_bT = jnp.asarray(
        np.sort(rng.rand(ncol, nz + 1).astype(np.float32), axis=-1).T.copy()
        * 30
    )
    bins_np = np.linspace(-1, 31, 37).astype(np.float32)

    bins_j = jnp.asarray(bins_np)

    @jax.jit
    def cons_chained(p, t):
        def body(_, acc):
            out = grid_z.transform(
                xt.GriddedArray(p, ("zc", "col"), name="phi"),
                "Z",
                bins_j + jnp.float32(1e-12) * acc,
                target_data=xt.GriddedArray(t, ("zo", "col"), name="theta"),
                method="conservative",
            ).data
            return jnp.nansum(out[0:1, :])
        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    _log("compiling chained conservative transform (lanes-major)")
    try:
        t_cons = time_chained(cons_chained, phiT, theta_bT,
                              register="conservative", pattern="vpu_f32_Gops")
        conservative_gps = ncol * nz / t_cons
    except Exception as e:
        _log(f"conservative bench failed: {e}")
        conservative_gps = None

    # opt-in reassociated (telescoped-accumulator) variant: same op, f32
    # sums reassociated (docs/performance.md); reported in detail only
    @jax.jit
    def cons_reassoc_chained(p, t):
        def body(_, acc):
            out = grid_z.transform(
                xt.GriddedArray(p, ("zc", "col"), name="phi"),
                "Z",
                bins_j + jnp.float32(1e-12) * acc,
                target_data=xt.GriddedArray(t, ("zo", "col"), name="theta"),
                method="conservative",
                reassociate=True,
            ).data
            return jnp.nansum(out[0:1, :])
        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    _log("compiling chained conservative transform (reassociate=True)")
    try:
        t_cons_r = time_chained(cons_reassoc_chained, phiT, theta_bT,
                                register="conservative_reassoc", pattern="vpu_f32_Gops")
        conservative_reassoc_gps = ncol * nz / t_cons_r
    except Exception as e:
        _log(f"reassociated conservative bench failed: {e}")
        conservative_reassoc_gps = None

    # --- 4-variable conservative transform_multi: the shared-geometry
    # kernel (19-op geometry serves V variables at +4 real ops each,
    # BASELINE.md) — the recommended multi-tracer budget pattern.  Tracked
    # per round so README's aggregate number regenerates from bench
    # (r4 VERDICT item 4).
    @jax.jit
    def consm_chained(t, ps, bins):
        def body(_, acc):
            outs = grid_z.transform_multi(
                [xt.GriddedArray(p, ("zc", "col"), name="p") for p in ps],
                "Z",
                bins + jnp.float32(1e-12) * acc,
                target_data=xt.GriddedArray(t, ("zo", "col"), name="theta"),
                method="conservative",
            )
            return sum(jnp.nansum(o.data[0:1, :]) for o in outs)
        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    _log("compiling chained 4-variable conservative transform_multi")
    try:
        t_consm = time_chained(consm_chained, theta_bT, phis4T, bins_j,
                               register="conservative_multi",
                               pattern="vpu_f32_Gops")
        conservative_multi_gps = 4 * ncol * nz / t_consm
    except Exception as e:
        _log(f"conservative transform_multi bench failed: {e}")
        conservative_multi_gps = None

    # --- config 3: metric-weighted integrate THROUGH THE PUBLIC API:
    # grid.integrate resolves the ("X","Y") metric from the registry
    # (get_metric condition 1) and does the NaN-aware weighted reduce ---
    area = jnp.asarray((rng.rand(ny, nx) + 1.0).astype(np.float32))

    @jax.jit
    def integ_chained(t, area_arr):
        # the Grid (and its 268 MB metric) is built INSIDE the trace from a
        # traced argument — closing over it would bake the metric into the
        # HLO as a constant (the remote compiler rejects the request size).
        # Grid construction is pure static bookkeeping, free at runtime.
        ds_m = xt.Dataset(
            coords={
                "xc": ("xc", np.arange(nx, dtype=np.float32)),
                "yc": ("yc", np.arange(ny, dtype=np.float32)),
            },
            data_vars={"area": (("yc", "xc"), area_arr)},
        )
        grid_m = xt.Grid(
            ds_m,
            coords={"X": {"center": "xc"}, "Y": {"center": "yc"}},
            metrics={("X", "Y"): ["area"]},
            autoparse_metadata=False,
        )

        # scalar carry: the epsilon-shift fuses into integrate's reduce, so
        # per-iteration traffic is exactly read(tracer) + read(area)
        def body(_, acc):
            return grid_m.integrate(
                xt.GriddedArray(t + jnp.float32(1e-20) * acc, ("yc", "xc")),
                ["X", "Y"],
            ).data
        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    _log("compiling chained integrate (public grid.integrate API)")
    try:
        t_int = time_chained(integ_chained, u, area, register="integrate", pattern="reduce2_f32")
        integrate_gps = ny * nx / t_int
    except Exception as e:
        _log(f"integrate bench failed: {e}")
        integrate_gps = None

    # --- config 5: cubed-sphere cross-face diff (gather-halo path) ---
    try:
        from tests.datasets import cubed_sphere_dataset
    except ImportError:  # driver may run bench outside the repo root
        cubed_sphere_dataset = None

    # shared per-shape probe body for the (face, ny, nx) workloads (shapes
    # differ per call; jit re-specialises).  A cross-face stencil must
    # (a) read its neighbours through a lane-shifted window AND (b)
    # re-read the four one-wide edge strips of every face to assemble
    # halos — and lane-COLUMN extraction pays full HBM tiles (~512 B per
    # 4 B element), ~10% of the whole pass at 6x2048².  No implementation
    # of the op can avoid either, so the pattern probe includes both
    # (same principle as the r3 shifted-probe refinement: compare each
    # workload against what ITS OWN access pattern can sustain).  The
    # probe realises the pattern as strips + cross-face take + the
    # concat-form shifted subtract — the fastest of five formulations
    # measured on-device (r4 study, BASELINE.md): the previous iota-where
    # fix-up construct throttled the PROBE to ~0.6x of what every real
    # implementation sustains (frac 1.46 in r4's first bench run), and
    # an epsilon-coupled `sum(strips)` broadcast serialises the passes —
    # the halo here is a genuine data dependency of the first lane
    # column only, exactly like the op.
    # r5 probe-methodology fix: a probe must be the FASTEST realization
    # of a floor pattern.  The r4 probe modelled the halo strips (stack 4
    # edges + select-sum) and measurably OVERCHARGED — workloads beat it
    # (fracs 1.03-1.05); an r5 single-strip gather variant was WORSE (a
    # slow formulation is not a ceiling: cs frac 1.47).  The defensible
    # floor is the irreducible traffic alone: every byte read once
    # through a shifted window per face, every byte written once — a
    # pure per-face roll.  Cross-face strip fetches are part of each
    # workload's measured gap to this probe, not excused into it.
    @jax.jit
    def _shifted_stream_faces(d):
        def body(_, a):
            nb = jnp.concatenate(
                [a[..., :, -1:], a[..., :, :-1]], axis=-1
            )
            return a - nb
        return jnp.sum(
            jax.lax.fori_loop(0, K, body, d)[:, ::512, ::512]
        )

    # 2-in-1-out variant of the faces probe for the C-grid vorticity
    # workload: BOTH operands are read through shifted windows (one lane-,
    # one sublane-shifted, like dv/dx - du/dy) and both need their
    # cross-face halo strips re-read; one output written.  The memory-
    # pattern floor of a cross-face vorticity — no implementation of the
    # op can move fewer bytes or avoid the shifts/strips.
    # 2-in-1-out floor for the face vorticity: one lane-shifted read, one
    # sublane-shifted read, one write (pure per-face rolls; see
    # _shifted_stream_faces for why strips are not modelled)
    @jax.jit
    def _shifted_three_faces(x, y):
        def body(_, a):
            nb_y = jnp.concatenate(
                [y[..., :, -1:], y[..., :, :-1]], axis=-1
            )
            nb_a = jnp.concatenate(
                [a[..., -1:, :], a[..., :-1, :]], axis=-2
            )
            return (y - nb_y) - (a - nb_a)
        return jnp.sum(
            jax.lax.fori_loop(0, K, body, x)[:, ::512, ::512]
        )

    # strip-MODELLED companions: same pattern PLUS the four cross-face
    # edge strips built the way the shipped op builds them (windowed
    # one-hot SELECT for columns — round 5 replaced the r4 stack
    # formulation, whose column slices paid a full-field relayout copy —
    # then a per-face take + side select into the halos).  NOT roofline
    # ceilings; reported as FLOOR diagnostics: workload >= floor means a
    # hand-written XLA program doing the modelled strip work cannot beat
    # the public-API op.
    def _modeled_strips(arr):
        # the shipped extraction itself, so the floor stays definitionally
        # in sync with the op (hand-copying it is how the r4 floor went
        # stale when the formulation changed)
        from xgcm_tpu.ops.fused import _column_as_row

        ny_, nx_ = arr.shape[-2:]
        return jnp.stack(
            [
                _column_as_row(arr, 0),
                _column_as_row(arr, nx_ - 1),
                arr[..., 0, :],
                arr[..., ny_ - 1, :],
            ],
            axis=-2,
        )

    def _modeled_halo(arr):
        nf = arr.shape[-3]
        src = jnp.take(
            _modeled_strips(arr), jnp.roll(jnp.arange(nf), 1), axis=-3
        )
        side_sel = jnp.arange(4) == jnp.ones((nf, 1), jnp.int32)
        return jnp.sum(
            jnp.where(
                side_sel[:, :, None], src, jnp.asarray(0.0, arr.dtype)
            ),
            axis=-2,
        )

    @jax.jit
    def _strip_modeled_stream_faces(d):
        def body(_, a):
            halo = _modeled_halo(a)
            nb = jnp.concatenate(
                [halo[..., :, None], a[..., :, :-1]], axis=-1
            )
            return a - nb
        return jnp.sum(
            jax.lax.fori_loop(0, K, body, d)[:, ::512, ::512]
        )

    @jax.jit
    def _strip_modeled_three_faces(x, y):
        def body(_, a):
            ha, hy = _modeled_halo(a), _modeled_halo(y)
            nb_a = jnp.concatenate(
                [ha[..., None, :], a[..., :-1, :]], axis=-2
            )
            nb_y = jnp.concatenate(
                [hy[..., :, None], y[..., :, :-1]], axis=-1
            )
            return (y - nb_y) - (a - nb_a)
        return jnp.sum(
            jax.lax.fori_loop(0, K, body, x)[:, ::512, ::512]
        )

    nface = 2048
    cs_gps = None
    if cubed_sphere_dataset is not None:
        ds_cs, fc = cubed_sphere_dataset(n=nface)
        grid_cs = xt.Grid(ds_cs, face_connections=fc, periodic=False)
        cs_data = jnp.asarray(rng.rand(6, nface, nface).astype(np.float32))

        # per-SHAPE shifted-stream probe: achievable bandwidth depends on
        # the array shape (6x2048^2 streams ~26 Ggps-equivalent here vs
        # ~36 at 8192^2) AND a cross-face diff must read its neighbour
        # through a lane-shifted window (~0.81 of the aligned stream,
        # measured same-run), so the face workloads compare against a
        # shifted 1-in-1-out probe at their own shape
        _probe(
            "shifted_stream_f32_cs", _shifted_stream_faces,
            2 * 6 * nface * nface * 4, cs_data,
        )
        _probe(
            "strip_modeled_stream_f32_cs", _strip_modeled_stream_faces,
            2 * 6 * nface * nface * 4, cs_data,
        )

        @jax.jit
        def cs_chained(d):
            # diff is length-preserving: feed the output straight back
            def body(_, dd):
                return grid_cs.diff(
                    xt.GriddedArray(dd, ("face", "y", "x")), "X",
                    boundary="fill",
                ).data
            return jnp.sum(jax.lax.fori_loop(0, K, body, d))

        _log("compiling chained cubed-sphere diff")
        try:
            t_cs = time_chained(cs_chained, cs_data, register="cs_diff", pattern="shifted_stream_f32_cs")
            cs_gps = 6 * nface * nface / t_cs
        except Exception as e:
            _log(f"cubed-sphere bench failed: {e}")
            cs_gps = None

    # --- LLC (lat-lon-cap) 13-face topology: the BASELINE.json north-star
    # grid layout (LLC4320-class analysis); same fused face-shift path ---
    llc_gps = None
    n_llc = 1024  # hoisted: the post-drift-guard rebind and the roofline
    # accounting below must use the SAME size as the workload
    try:
        from xgcm_tpu.grids import llc_grid

        ds_llc, grid_llc = llc_grid(n=n_llc)
        llc_data = jnp.asarray(
            rng.rand(13, n_llc, n_llc).astype(np.float32)
        )

        _probe(
            "shifted_stream_f32_llc", _shifted_stream_faces,
            2 * 13 * n_llc * n_llc * 4, llc_data,
        )
        _probe(
            "strip_modeled_stream_f32_llc", _strip_modeled_stream_faces,
            2 * 13 * n_llc * n_llc * 4, llc_data,
        )

        @jax.jit
        def llc_chained(d):
            def body(_, dd):
                return grid_llc.diff(
                    xt.GriddedArray(dd, ("face", "y", "x")), "X",
                    boundary="fill",
                ).data
            return jnp.sum(jax.lax.fori_loop(0, K, body, d))

        _log("compiling chained LLC 13-face diff")
        t_llc = time_chained(llc_chained, llc_data, register="llc_diff", pattern="shifted_stream_f32_llc")
        llc_gps = 13 * n_llc * n_llc / t_llc
    except Exception as e:
        _log(f"LLC bench failed: {e}")
        llc_gps = None

    # --- north-star scale: LLC4320-class single level (13 x 4320^2 f32,
    # ~971 MB per field; BASELINE.json north_star; the reference's own
    # motivation is LLC4320 output, README.rst:35-38).  C-grid vorticity
    # through the PUBLIC vector API with cross-face sign rules — the
    # flagship op at the flagship scale (r4 VERDICT item 1).
    llc4320_gps = None
    n_43 = 4320
    try:
        from xgcm_tpu.grids import llc_grid as _llc_grid_43

        ds_43, grid_43 = _llc_grid_43(n=n_43)
        # generate the 971 MB fields ON DEVICE: staging them over the
        # tunnel is slower than computing the bits, and only the access
        # pattern matters for throughput
        _gen43 = jax.jit(
            lambda k: jax.random.uniform(k, (13, n_43, n_43), jnp.float32)
        )
        ku, kv = jax.random.split(jax.random.PRNGKey(7))
        u43 = _gen43(ku)
        v43 = _gen43(kv)
        u43.block_until_ready()

        _probe(
            "shifted_three_f32_llc4320", _shifted_three_faces,
            3 * 13 * n_43 * n_43 * 4, u43, v43,
        )
        _probe(
            "strip_modeled_three_f32_llc4320", _strip_modeled_three_faces,
            3 * 13 * n_43 * n_43 * 4, u43, v43,
        )

        @jax.jit
        def llc4320_chained(uu, vv):
            # dv/dx - du/dy onto the corner point, vector halos at the
            # rotated cap seams (same call shape as examples/llc_analysis);
            # the corner-point result feeds back as next iteration's u, so
            # per-iteration traffic is read(u) + read(v) + write(zeta)
            def body(_, zz):
                u_g = xt.GriddedArray(zz, ("face", "y", "xl"))
                v_g = xt.GriddedArray(vv, ("face", "yl", "x"))
                z = grid_43.diff(
                    {"X": v_g}, "X", other_component={"Y": u_g}
                ) - grid_43.diff(
                    {"Y": u_g}, "Y", other_component={"X": v_g}
                )
                return z.data
            return jnp.sum(
                jax.lax.fori_loop(0, K, body, uu)[:, ::512, ::512]
            )

        _log("compiling chained LLC4320-scale vorticity (13x4320^2)")
        t_43 = time_chained(
            llc4320_chained, u43, v43,
            register="llc4320_vorticity",
            pattern="shifted_three_f32_llc4320",
        )
        llc4320_gps = 13 * n_43 * n_43 / t_43
        _log(f"llc4320 vorticity: {llc4320_gps/1e9:.2f} Ggps")
    except Exception as e:
        _log(f"LLC4320 bench failed: {e}")
        llc4320_gps = None

    # Re-time every probe now that all workloads have run and take the max
    # of the two measurements as the ceiling: probe and workload timings
    # are minutes apart and the host drifts ±10-15% within a run, so a
    # single early probe measurement can read BELOW what the pattern
    # sustains at workload time (producing nonsense fractions > 1).  The
    # max is the best the pattern demonstrably achieved this run — still a
    # measured number, just drift-robust.
    _log("re-timing probes post-workloads (drift guard)")
    for _name, (_fn, _bpi, _args) in probe_defs.items():
        try:
            _t = time_chained(_fn, *_args)
            _second = _bpi / _t / 1e9
            if probes.get(_name) is None or _second > probes[_name]:
                probes[_name] = _second
        except Exception:
            pass
    hbm_gbps = probes.get("stream_f32") or hbm_gbps

    # ... and re-time every registered workload in this same window (best
    # of the two windows kept) with its own probe timed ADJACENT (before +
    # after, via pattern=), so probes and workloads are drift-matched
    _log("re-timing workloads (drift guard)")
    for _name in list(workload_defs):
        _fn, _args, _best, _pat = workload_defs[_name]
        try:
            _t = time_chained(_fn, *_args, reps=2, pattern=_pat)
            workload_defs[_name] = (
                _fn, _args, min(_best, _t), _pat
            )
        except Exception:
            pass

    # rebind the per-workload gps values from the drift-guarded times
    _wt = workload_time
    t_api = _wt("vorticity_api", t_api)
    t_pallas = _wt("vorticity_pallas", t_pallas)
    t_best = min(x for x in (t_api, t_pallas) if x is not None)
    gps = ny * nx / t_best
    if _wt("vorticity_bf16_api") or _wt("vorticity_bf16_pallas"):
        _tb = [x for x in (_wt("vorticity_bf16_api"),
                           _wt("vorticity_bf16_pallas")) if x is not None]
        if _tb and gps_bf16:
            gps_bf16 = max(gps_bf16, ny * nx / min(_tb))
    if _wt("transform_linear"):
        transform_gps = ncol * nz / _wt("transform_linear")
    if _wt("transform_colmajor"):
        transform_colmajor_gps = ncol * nz / _wt("transform_colmajor")
    if _wt("transform_multi"):
        transform_multi_gps = 4 * ncol * nz / _wt("transform_multi")
    if _wt("conservative"):
        conservative_gps = ncol * nz / _wt("conservative")
    if _wt("conservative_reassoc"):
        conservative_reassoc_gps = ncol * nz / _wt("conservative_reassoc")
    if _wt("integrate"):
        integrate_gps = ny * nx / _wt("integrate")
    if _wt("conservative_multi"):
        conservative_multi_gps = 4 * ncol * nz / _wt("conservative_multi")
    if _wt("cs_diff"):
        cs_gps = 6 * nface * nface / _wt("cs_diff")
    if _wt("llc_diff"):
        llc_gps = 13 * n_llc * n_llc / _wt("llc_diff")
    if _wt("llc4320_vorticity"):
        llc4320_gps = 13 * n_43 * n_43 / _wt("llc4320_vorticity")

    # --- effective HBM bandwidth per workload (roofline accounting) ---
    # minimum bytes each workload must move, / measured time; each
    # workload's fraction is taken against the probe measuring ITS OWN
    # access pattern under the same chained-loop harness (VERDICT r2 item
    # 7: one probe per pattern so no fraction can exceed 1 by comparing a
    # read-dominated op against a 1R+1W probe)
    N = ny * nx

    def _bw(bytes_moved, gps_value, points, pattern):
        if not gps_value:
            return None
        ceiling = probes.get(pattern) or hbm_gbps or 500.0
        gbps = bytes_moved * (gps_value / points) / 1e9
        return {
            "GBps": round(gbps, 1),
            "roofline_frac": round(gbps / ceiling, 3),
            "pattern": pattern,
        }

    def _build_bandwidth():
        return {
            # read u + v through shifted stencil windows, write zeta
            "vorticity_f32": _bw(3 * N * 4, gps, N, "shifted_three_f32"),
            "vorticity_bf16": _bw(
                3 * N * 2, gps_bf16, N, "shifted_three_bf16"
            ),
            # read phi + theta, write (36, ncol): ~2 reads + small write
            "transform_linear": _bw(
                (2 * ncol * nz + ncol * 36) * 4, transform_gps, ncol * nz,
                "reduce2_f32",
            ),
            "transform_conservative": _bw(
                (ncol * nz + ncol * (nz + 1) + ncol * 36) * 4,
                conservative_gps, ncol * nz, "reduce2_f32",
            ),
            # read tracer + area metric, no array write: 2-read reduce
            "integrate": _bw(2 * N * 4, integrate_gps, N, "reduce2_f32"),
            # read + write all faces through a shifted window, at the
            # workload's own shape
            "cubed_sphere_diff": _bw(
                2 * 6 * nface * nface * 4, cs_gps, 6 * nface * nface,
                "shifted_stream_f32_cs",
            ),
            "llc13_diff": _bw(
                2 * 13 * n_llc * n_llc * 4, llc_gps, 13 * n_llc * n_llc,
                "shifted_stream_f32_llc",
            ),
            # read u + v through shifted windows + strips, write zeta
            "llc4320_vorticity": _bw(
                3 * 13 * n_43 * n_43 * 4, llc4320_gps, 13 * n_43 * n_43,
                "shifted_three_f32_llc4320",
            ),
        }

    bandwidth = _build_bandwidth()

    # --- compute-side roofline for the VPU-bound transform kernels ---
    # Two op models per workload:
    #  * "useful" — the algorithmically necessary (m, C) ops visible in the
    #    jnp kernel source (compare + selects / FMAs), the same conservative
    #    basis r1-r3 reported;
    #  * "real" — every vector-register-row operation the hardware actually
    #    executes per loop step, including the (1, C) -> (m, C) sublane
    #    broadcasts of the per-knot rows (measured full-height cost on this
    #    chip: the r3 kernel's 5-op useful count ran at vpu_frac 0.32
    #    precisely because ~14 real ops backed it) and the 8-sublane padding
    #    of the m-row accumulators (m=36 -> 40).  real_op_frac is the
    #    honest "how close to the hardware wall" number; the remaining gap
    #    is DMA overlap + prep/epilogue.
    # Counts from the kernel bodies (ops/pallas_transform.py):
    #  linear last-writer-select loop: useful 4/knot (cmp + 3 where),
    #    real 8/knot (adds 4 broadcast rows) x n knots (tail folded in);
    #  multi: useful 2 + 2V, real 4 + 4V;
    #  conservative: useful 14/cell (z, frac mul+clip2, mass FMA+diff,
    #    corr cmp+sel+FMA, counts 2x(cmp+sel+add)), real 19 (5 broadcasts).
    m_t = 36
    m_pad = 40  # 36 targets / 37 edges pad to the 8-sublane boundary

    def _vpu_frac(ops_per_call, real_ops_per_call, gps_value,
                  points_per_call):
        vpu_ceiling = _vpu_ceiling()
        if not gps_value or not vpu_ceiling:
            return None
        achieved = ops_per_call * gps_value / points_per_call / 1e9
        real = real_ops_per_call * gps_value / points_per_call / 1e9
        return {
            "achieved_Gops": round(achieved, 1),
            "vpu_frac": round(achieved / vpu_ceiling, 3),
            "real_op_frac": round(real / vpu_ceiling, 3),
        }

    def _build_transform_compute():
        vpu_ceiling = _vpu_ceiling()
        return {
            "vpu_probe_Gops": round(vpu_ceiling, 1) if vpu_ceiling else None,
            "transform_linear": _vpu_frac(
                4 * nz * m_t * ncol, 8 * nz * m_pad * ncol,
                transform_gps, ncol * nz,
            ),
            "transform_multi4": _vpu_frac(
                (2 + 2 * 4) * nz * m_t * ncol,
                (4 + 4 * 4) * nz * m_pad * ncol,
                transform_multi_gps, 4 * ncol * nz,
            ),
            "transform_conservative": _vpu_frac(
                14 * nz * m_t * ncol, 19 * nz * m_pad * ncol,
                conservative_gps, ncol * nz,
            ),
            # shared geometry + per-variable accumulation (BASELINE.md
            # conservative-ceiling study: "the same 19-op geometry serves
            # V variables at +4 ops each"): real 15+4V (=19 at V=1),
            # useful 10+4V (=14 at V=1)
            "transform_conservative_multi4": _vpu_frac(
                (10 + 4 * 4) * nz * m_t * ncol,
                (15 + 4 * 4) * nz * m_pad * ncol,
                conservative_multi_gps, 4 * ncol * nz,
            ),
        }

    transform_compute = _build_transform_compute()

    # floor-diagnostic specs (bytes, gps, points, pattern); shared by the
    # reconciliation pass and the result dict so both see the same numbers
    _floor_specs = {
        "cs_vs_strip_modeled_floor": (
            2 * 6 * nface * nface * 4, cs_gps, 6 * nface * nface,
            "strip_modeled_stream_f32_cs",
        ),
        "llc13_vs_strip_modeled_floor": (
            2 * 13 * n_llc * n_llc * 4, llc_gps, 13 * n_llc * n_llc,
            "strip_modeled_stream_f32_llc",
        ),
        "llc4320_vs_strip_modeled_floor": (
            3 * 13 * n_43 * n_43 * 4, llc4320_gps, 13 * n_43 * n_43,
            "strip_modeled_three_f32_llc4320",
        ),
    }

    def _floor_frac(bytes_moved, gps_value, points, pattern):
        if not gps_value or not probes.get(pattern):
            return None
        return bytes_moved * (gps_value / points) / 1e9 / probes[pattern]

    # --- reconciliation pass (r4 VERDICT item 3): a fraction > 1.0 is
    # physically impossible (every probe does strictly less work than its
    # workload), so it PROVES the probe under-measured its ceiling in the
    # windows it got.  Re-time just the offending probes — never the
    # workloads — until every fraction is <= 1.0 or three attempts are
    # spent (then report the >1 honestly).  Floor fractions are included:
    # >1 there is merely POSSIBLE (the op can genuinely beat the modelled
    # program) but is usually the floor probe catching a slow window, so
    # re-time it too — a genuine beat survives the re-timing.
    for _attempt in range(3):
        over = set()
        for entry in bandwidth.values():
            if entry and entry["roofline_frac"] > 1.0:
                over.add(entry["pattern"])
        for key, entry in transform_compute.items():
            if isinstance(entry, dict) and (
                entry["real_op_frac"] > 1.0 or entry["vpu_frac"] > 1.0
            ):
                over.add("vpu_f32_Gops")
                over.add("vpu_sel_f32_Gops")
        for spec in _floor_specs.values():
            fr = _floor_frac(*spec)
            if fr is not None and fr > 1.0:
                over.add(spec[3])
        if not over:
            break
        _log(f"reconciliation: re-timing under-measured probes {sorted(over)}")
        for p in sorted(over):
            _retime_probe(p, reps=3)
        bandwidth = _build_bandwidth()
        transform_compute = _build_transform_compute()

    result = {
        "metric": (
            "C-grid vorticity throughput, 8192x8192 f32, "
            f"{backend} (best of Grid-API jit / fused Pallas)"
        ),
        "value": round(gps / 1e9, 3),
        "unit": "Ggridpoints/s",
        # conservative multiplier: numerator / max(pinned, live) numpy
        # baseline (both denominators in detail)
        "vs_baseline": round(gps / gps_numpy, 2),
        "detail": {
            "api_ms_per_iter": round(t_api * 1e3, 4),
            "pallas_ms_per_iter": (
                round(t_pallas * 1e3, 4) if t_pallas else None
            ),
            "vorticity_bf16_Ggps": round(gps_bf16 / 1e9, 3) if gps_bf16 else None,
            "bf16_pallas_bitexact_vs_xla": bf16_pallas_exact,
            "transform_kernels_bitexact_vs_xla": transform_kernels_exact,
            "numpy_baseline_pinned_Ggps": (
                round(gps_numpy_pinned, 4) if gps_numpy_pinned else None
            ),
            "numpy_baseline_live_Ggps": round(gps_numpy_live / 1e9, 4),
            "baseline_drift": (
                round(gps_numpy_live / (gps_numpy_pinned * 1e9), 3)
                if gps_numpy_pinned else None
            ),
            "vs_baseline_pinned": (
                round(gps / (gps_numpy_pinned * 1e9), 2)
                if gps_numpy_pinned else None
            ),
            "vs_baseline_live": round(gps / gps_numpy_live, 2),
            "transform_linear_Ggps": round(transform_gps / 1e9, 3) if transform_gps else None,
            "transform_linear_colmajor_Ggps": (
                round(transform_colmajor_gps / 1e9, 3)
                if transform_colmajor_gps else None
            ),
            "transform_multi4_Ggps": (
                round(transform_multi_gps / 1e9, 3)
                if transform_multi_gps else None
            ),
            "transform_conservative_Ggps": round(conservative_gps / 1e9, 3) if conservative_gps else None,
            "transform_conservative_reassoc_Ggps": round(conservative_reassoc_gps / 1e9, 3) if conservative_reassoc_gps else None,
            "transform_conservative_multi4_Ggps": (
                round(conservative_multi_gps / 1e9, 3)
                if conservative_multi_gps else None
            ),
            "integrate_Ggps": round(integrate_gps / 1e9, 3) if integrate_gps else None,
            "cubed_sphere_diff_Ggps": (
                round(cs_gps / 1e9, 3) if cs_gps else None
            ),
            "llc13_diff_Ggps": (
                round(llc_gps / 1e9, 3) if llc_gps else None
            ),
            "llc4320_vorticity_Ggps": (
                round(llc4320_gps / 1e9, 3) if llc4320_gps else None
            ),
            # floor diagnostics (NOT roofline ceilings): workload GB/s
            # over the strip-MODELLED probes — >= 1.0 means the
            # public-API op meets/beats a hand-written XLA program of
            # the same pattern including the modelled cross-face strips
            **{
                name: (round(fr, 3) if fr is not None else None)
                for name, spec in _floor_specs.items()
                for fr in (_floor_frac(*spec),)
            },
            "effective_bandwidth": bandwidth,
            "transform_compute": transform_compute,
            "measured_stream_GBps": round(hbm_gbps, 1) if hbm_gbps else None,
            # bandwidth probes in GB/s; the vpu_* probe in Gop/s
            "pattern_probes": {
                k: (round(v, 1) if v else None) for k, v in probes.items()
            },
            "backend": backend,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    if "--pin-baseline" in sys.argv[1:]:
        pin_baseline()
    else:
        main()
