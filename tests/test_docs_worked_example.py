"""docs/worked_example.md is executable documentation: every ```python
block runs top to bottom in one shared namespace (the page promises
exactly that), with its inline assertions as the checks."""

import pathlib
import re

import jax
import pytest

DOC = pathlib.Path(__file__).resolve().parents[1] / "docs" / "worked_example.md"

pytestmark = pytest.mark.quick


def _blocks():
    text = DOC.read_text()
    return re.findall(r"```python\n(.*?)```", text, flags=re.S)


def test_worked_example_runs_end_to_end():
    if len(jax.devices()) < 2:
        pytest.skip("the scale-out section needs multiple devices")
    blocks = _blocks()
    assert len(blocks) >= 8, "the page lost its code blocks"
    ns = {}
    source = "\n\n".join(blocks)
    code = compile(source, str(DOC), "exec")
    exec(code, ns)
    # spot-check the narrative actually produced the advertised objects
    assert ns["temp_on_sigma"].dims == ("YC", "XC", "sigma")
    assert ns["n_tr"]["total"] == 0
