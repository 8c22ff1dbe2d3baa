"""docs/transform.md is executable documentation: every ```python block
runs top to bottom in one shared namespace (the page promises exactly
that), with its inline assertions as the checks."""

import pathlib
import re

import pytest

DOC = pathlib.Path(__file__).resolve().parents[1] / "docs" / "transform.md"

pytestmark = pytest.mark.quick


def _blocks():
    text = DOC.read_text()
    return re.findall(r"```python\n(.*?)```", text, flags=re.S)


def test_transform_doc_runs_end_to_end():
    blocks = _blocks()
    assert len(blocks) >= 9, "the page lost its code blocks"
    ns = {}
    source = "\n\n".join(blocks)
    code = compile(source, str(DOC), "exec")
    exec(code, ns)
    assert ns["t_sigma"].dims == ("y", "x", "sigma")
    assert ns["t_var"].shape == (16, 32, 8)
