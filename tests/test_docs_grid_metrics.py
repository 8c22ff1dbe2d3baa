"""docs/grid_metrics.md is executable documentation: every ```python
block runs top to bottom in one shared namespace, with its inline
assertions as the checks."""

import pathlib
import re
import warnings

import pytest

DOC = (
    pathlib.Path(__file__).resolve().parents[1] / "docs" / "grid_metrics.md"
)

pytestmark = pytest.mark.quick


def _blocks():
    text = DOC.read_text()
    return re.findall(r"```python\n(.*?)```", text, flags=re.S)


def test_grid_metrics_doc_runs_end_to_end():
    blocks = _blocks()
    assert len(blocks) >= 7, "the page lost its code blocks"
    ns = {}
    source = "\n\n".join(blocks)
    code = compile(source, str(DOC), "exec")
    with warnings.catch_warnings():
        # the derivative section intentionally exercises the
        # auto-interp-with-warning metric path
        warnings.simplefilter("ignore")
        exec(code, ns)
    assert ns["dfdx"].dims == ("xg",)
