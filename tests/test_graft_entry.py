"""Driver entry points stay green: entry() compiles single-chip, and
dryrun_multichip runs the fully-sharded step on the virtual mesh."""

import importlib.util
import pathlib

import jax
import numpy as np
import pytest

_ENTRY = pathlib.Path(__file__).resolve().parents[1] / "__graft_entry__.py"


def _load():
    spec = importlib.util.spec_from_file_location("graft_entry", _ENTRY)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_jits_and_runs():
    ge = _load()
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert len(out) == 3
    for o in out:
        assert np.all(np.isfinite(np.asarray(o)))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dryrun_multichip_8():
    ge = _load()
    ge.dryrun_multichip(8)


@pytest.mark.skipif(len(jax.devices()) < 6, reason="needs 6 virtual devices")
def test_dryrun_multichip_6_face_sharded():
    ge = _load()
    ge.dryrun_multichip(6)
