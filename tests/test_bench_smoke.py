"""Smoke checks for the benchmark harness: the module stays importable and
its numpy baseline matches the framework's arithmetic (keeps bench.py from
silently rotting between rounds — the driver runs it headless)."""

import importlib.util
import pathlib

import numpy as np

from xgcm_tpu import Dataset, Grid, GriddedArray

_BENCH = pathlib.Path(__file__).resolve().parents[1] / "bench.py"


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bench_importable():
    mod = _load_bench()
    assert callable(mod.main)
    assert mod.K > 0


def test_numpy_baseline_matches_framework():
    mod = _load_bench()
    n = 12
    rng = np.random.RandomState(0)
    u = rng.rand(n, n).astype(np.float32)
    v = rng.rand(n, n).astype(np.float32)
    ix = (rng.rand(n) + 1).astype(np.float32)
    iy = (rng.rand(n) + 1).astype(np.float32)

    baseline = mod.numpy_vorticity(u, v, ix, iy)

    ds = Dataset(
        coords={
            "xc": ("xc", np.arange(n, dtype=np.float32)),
            "xg": ("xg", np.arange(n, dtype=np.float32)),
            "yc": ("yc", np.arange(n, dtype=np.float32)),
            "yg": ("yg", np.arange(n, dtype=np.float32)),
        }
    )
    grid = Grid(
        ds,
        coords={
            "X": {"center": "xc", "left": "xg"},
            "Y": {"center": "yc", "left": "yg"},
        },
        autoparse_metadata=False,
    )
    uu = GriddedArray(u, ("yc", "xg"))
    vv = GriddedArray(v, ("yg", "xc"))
    zeta = (
        grid.diff(vv, "X") * GriddedArray(ix, ("xg",))
        - grid.diff(uu, "Y") * GriddedArray(iy, ("yg",))
    )
    np.testing.assert_allclose(
        np.asarray(zeta.data), baseline, rtol=1e-6, atol=1e-6
    )


def test_pinned_baseline_recorded():
    """BASELINE.json['published'] is populated (SURVEY §6 deliverable) and
    bench.py reads the pinned headline denominator from it."""
    import json

    mod = _load_bench()
    doc = json.loads((_BENCH.parent / "BASELINE.json").read_text())
    published = doc.get("published", {})
    for key in mod._BASELINE_CONFIGS:
        assert key in published, f"config {key} not pinned"
        assert published[key]["Ggps"] > 0
    pinned = mod._pinned_baseline_Ggps("vorticity_2048")
    assert pinned is not None and pinned > 0
