"""Signature parsing / equivalence tests (mirrors the coverage of reference
test_grid_ufunc.py:20-214, 1309-1334)."""

import numpy as np
import pytest
from typing import Tuple

try:
    from typing import Annotated
except ImportError:
    from typing_extensions import Annotated

from xgcm_tpu import GridUFuncSignature, as_grid_ufunc
from xgcm_tpu.core.signature import parse_signature_string


class TestParseFromString:
    @pytest.mark.parametrize(
        "sig,expected",
        [
            ("(X:center)->(X:left)", ([("X",)], [("center",)], [("X",)], [("left",)])),
            ("(X:center)->()", ([("X",)], [("center",)], [()], [()])),
            (
                "(X:left),(X:right)->(Y:center)",
                ([("X",), ("X",)], [("left",), ("right",)], [("Y",)], [("center",)]),
            ),
            (
                "(X:center,Y:center)->(X:left,Y:left)",
                (
                    [("X", "Y")],
                    [("center", "center")],
                    [("X", "Y")],
                    [("left", "left")],
                ),
            ),
            (
                "(X:center)->(X:left),(X:right)",
                ([("X",)], [("center",)], [("X",), ("X",)], [("left",), ("right",)]),
            ),
        ],
    )
    def test_parse(self, sig, expected):
        in_names, in_pos, out_names, out_pos = parse_signature_string(sig)
        assert (in_names, in_pos, out_names, out_pos) == (
            [tuple(x) for x in expected[0]],
            [tuple(x) for x in expected[1]],
            [tuple(x) for x in expected[2]],
            [tuple(x) for x in expected[3]],
        )

    def test_whitespace_tolerated(self):
        a = GridUFuncSignature.from_string("(X:center) -> (X:left)")
        b = GridUFuncSignature.from_string("(X:center)->(X:left)")
        assert str(a) == str(b)

    @pytest.mark.parametrize(
        "bad",
        [
            "(X:centre)->(X:left)",
            "(X;center)->(X:left)",
            "X:center->X:left",
            "(X:center)(X:left)",
            "->(X:left)",
        ],
    )
    def test_invalid(self, bad):
        with pytest.raises(ValueError, match="Not a valid grid ufunc signature"):
            GridUFuncSignature.from_string(bad)

    def test_roundtrip_str(self):
        s = "(X:center,Y:left)->(X:left)"
        assert str(GridUFuncSignature.from_string(s)) == s


class TestEquivalence:
    def test_dummy_rename_equivalent(self):
        a = GridUFuncSignature.from_string("(X:center)->(X:left)")
        b = GridUFuncSignature.from_string("(Z:center)->(Z:left)")
        assert a.equivalent(b)

    def test_position_mismatch(self):
        a = GridUFuncSignature.from_string("(X:center)->(X:left)")
        b = GridUFuncSignature.from_string("(X:center)->(X:right)")
        assert not a.equivalent(b)

    def test_different_structure(self):
        a = GridUFuncSignature.from_string("(X:center)->(X:left)")
        b = GridUFuncSignature.from_string("(X:center),(X:center)->(X:left)")
        assert not a.equivalent(b)

    def test_two_axes_equivalence(self):
        a = GridUFuncSignature.from_string("(X:center,Y:left)->(Y:left)")
        b = GridUFuncSignature.from_string("(A:center,B:left)->(B:left)")
        assert a.equivalent(b)

    def test_two_axes_crossed_not_equivalent(self):
        a = GridUFuncSignature.from_string("(X:center,Y:left)->(X:left)")
        b = GridUFuncSignature.from_string("(A:center,B:left)->(B:left)")
        assert not a.equivalent(b)


class TestParseFromTypeHints:
    def test_simple_hints(self):
        @as_grid_ufunc()
        def diff(
            a: Annotated[np.ndarray, "X:center"],
        ) -> Annotated[np.ndarray, "X:left"]:
            return a

        assert str(diff.signature) == "(X:center)->(X:left)"

    def test_multiple_returns(self):
        @as_grid_ufunc()
        def func(
            a: Annotated[np.ndarray, "X:center"],
        ) -> Tuple[Annotated[np.ndarray, "X:left"], Annotated[np.ndarray, "X:right"]]:
            return a, a

        assert str(func.signature) == "(X:center)->(X:left),(X:right)"

    def test_both_raises(self):
        with pytest.raises(ValueError, match="only one of"):

            @as_grid_ufunc(signature="(X:center)->(X:left)")
            def diff(
                a: Annotated[np.ndarray, "X:center"],
            ) -> Annotated[np.ndarray, "X:left"]:
                return a

    def test_neither_raises(self):
        with pytest.raises(ValueError, match="through either type hints"):

            @as_grid_ufunc()
            def diff(a):
                return a

    def test_nested_and_multigroup_parentheses_accepted(self):
        # ADVICE r4: the reference's findall-based extractor
        # (reference grid_ufunc.py:340-352) tolerates any paren nesting
        # around the pair list — "((X:center))" and "(X:center),(Y:left)"
        # must parse identically to the bare spelling
        @as_grid_ufunc()
        def f(
            a: Annotated[np.ndarray, "((X:center))"],
            b: Annotated[np.ndarray, "(X:left),(Y:left)"],
        ) -> Annotated[np.ndarray, "(X:left)"]:
            return a

        assert str(f.signature) == "(X:center),(X:left,Y:left)->(X:left)"

    def test_unbalanced_parentheses_rejected(self):
        with pytest.raises(ValueError, match="signature annotation"):

            @as_grid_ufunc()
            def f(
                a: Annotated[np.ndarray, "(X:center"],
            ) -> Annotated[np.ndarray, "X:left"]:
                return a
