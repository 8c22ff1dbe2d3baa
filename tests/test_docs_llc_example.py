"""docs/llc_example.md is executable documentation: every ```python
block runs top to bottom in one shared namespace."""

import pathlib
import re

import jax
import numpy as np
import pytest

DOC = pathlib.Path(__file__).resolve().parents[1] / "docs" / "llc_example.md"

pytestmark = pytest.mark.quick


def _blocks():
    text = DOC.read_text()
    return re.findall(r"```python\n(.*?)```", text, flags=re.S)


def test_llc_example_runs_end_to_end():
    if len(jax.devices()) < 2:
        pytest.skip("the faces-on-devices section needs multiple devices")
    blocks = _blocks()
    assert len(blocks) >= 5, "the page lost its code blocks"
    ns = {}
    source = "\n\n".join(blocks)
    code = compile(source, str(DOC), "exec")
    exec(code, ns)
    # the narrative produced the advertised objects
    assert ns["zeta"].dims == ("face", "yl", "xl")
    assert np.asarray(ns["g_sharded"].data).shape == (13, 8, 8)
