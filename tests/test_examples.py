"""Every example script must execute end-to-end (CPU)."""

import pathlib
import runpy

import jax
import pytest

EXAMPLES = sorted(
    (pathlib.Path(__file__).resolve().parents[1] / "examples").glob("*.py")
)


@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.stem)
def test_example_runs(path):
    if "sharded" in path.stem and len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    runpy.run_path(str(path), run_name="__main__")
