"""Packaging metadata consistency: the version is declared in four places
(pyproject.toml, xgcm_tpu.__version__, CITATION.cff, the newest
docs/whats-new.md section) and they must agree."""

import pathlib
import re

import pytest

import xgcm_tpu

pytestmark = pytest.mark.quick

ROOT = pathlib.Path(__file__).resolve().parent.parent


def test_version_consistent_everywhere():
    v = xgcm_tpu.__version__

    pyproject = (ROOT / "pyproject.toml").read_text()
    assert re.search(
        rf'^version = "{re.escape(v)}"$', pyproject, re.MULTILINE
    ), f"pyproject.toml version != __version__ ({v})"

    citation = (ROOT / "CITATION.cff").read_text()
    assert re.search(
        rf"^version: {re.escape(v)}$", citation, re.MULTILINE
    ), f"CITATION.cff version != __version__ ({v})"

    whats_new = (ROOT / "docs" / "whats-new.md").read_text()
    first_section = re.search(r"^## ([0-9][^\s]*)", whats_new, re.MULTILINE)
    assert first_section and first_section.group(1) == v, (
        f"newest whats-new section {first_section and first_section.group(1)}"
        f" != __version__ ({v})"
    )


def test_manifest_covers_package_and_docs():
    manifest = (ROOT / "MANIFEST.in").read_text()
    for needle in ("xgcm_tpu *.py", "docs *.md", "LICENSE"):
        assert needle in manifest
