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


def test_readme_perf_numbers_regenerate_from_bench():
    """Every number in README's Performance table must name its bench
    JSON field (in backticks) and match BENCH_LATEST.json — README perf
    claims regenerate from the artifact, they are never hand-typed
    (r4 VERDICT item 4)."""
    import json
    import re

    root = _BENCH.parent
    latest = root / "BENCH_LATEST.json"
    assert latest.exists(), (
        "BENCH_LATEST.json missing - refresh it from the most recent "
        "`python bench.py` output line"
    )
    bench = json.loads(latest.read_text())
    flat = dict(bench.get("detail", {}))
    flat["value"] = bench.get("value")
    flat["vs_baseline"] = bench.get("vs_baseline")

    readme = (root / "README.md").read_text()
    m = re.search(r"## Performance(.*?)\n## ", readme, flags=re.S)
    assert m, "README lost its Performance section"
    section = m.group(1)

    # every `field = number` citation in the table must exist in the
    # artifact and match it to the printed precision
    cites = re.findall(
        r"`((?:[a-z0-9_]+_Ggps|value|vs_baseline[a-z_]*))` *= *"
        r"\*{0,2}([0-9.]+)\*{0,2}",
        section,
    )
    assert len(cites) >= 8, (
        f"README perf table lost its bench-field citations ({cites})"
    )
    for field, quoted in cites:
        assert field in flat and flat[field] is not None, field
        actual = float(flat[field])
        q = float(quoted)
        assert abs(actual - q) <= 10 ** (-_decimals(quoted)) / 2 + 1e-9, (
            field, quoted, actual,
        )


def _decimals(s):
    return len(s.split(".")[1]) if "." in s else 0
