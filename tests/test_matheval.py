"""Math parser + unit conversion tests pinning the reference behavior
(MathParser.java / Units.java + units.csv): evaluation semantics,
US-locale DecimalFormat quirks (grouping, HALF_UP vs HALF_EVEN,
integer-digit truncation), and every temperature branch."""

import math

import pytest
from hypothesis import given, settings, strategies as st

from marginaliasearch_ray.functions import matheval as me


# (expression, eval value or None-for-raise, formatted string)
EVAL_CASES = [
    ("3+5", 8.0, "8"),
    ("1+(300+log(5))", 301 + math.log(5), "302.609438"),
    ("sqrt(1+300)", math.sqrt(301), "17.349352"),
    ("sqrt(pi)", math.sqrt(math.pi), "1.772454"),
    ("3+5-5", 3.0, "3"),
    ("3+-5+5", 3.0, "3"),
    ("3+-5+log 5", -2 + math.log(5), "-0.390562"),
    ("(3.5 + 2)*3", 16.5, "16.5"),
    ("-pi", -math.pi, "-3.141593"),
    ("2*3+4*5", 26.0, "26"),
    ("2^3^2", 64.0, "64"),  # left-associative list folding
    ("2^10", 1024.0, "1,024"),  # US grouping
    ("10/4", 2.5, "2.5"),
    ("100-20-30", 50.0, "50"),
    ("8/2/2", 2.0, "2"),
    ("sqrt 16", 4.0, "4"),  # juxtaposed function application
    ("3.5", 3.5, "3.5"),  # trivial fast path
    (".5", 0.5, "0.5"),
    ("e", math.e, "2.718282"),
]


@pytest.mark.parametrize("expr,val,formatted", EVAL_CASES)
def test_eval(expr, val, formatted):
    assert me.eval_math(expr) == pytest.approx(val, abs=0, rel=1e-15)
    assert me.eval_math_formatted(expr) == formatted


def test_nan_paths():
    # x/0 and %0 yield NaN (BiExpression:368-380); log of a negative
    # does too (Math.log semantics)
    assert math.isnan(me.eval_math("1/0"))
    assert math.isnan(me.eval_math("log -5"))
    assert me.eval_math_formatted("1/0") == "NaN"


def test_ieee_edges():
    # Java Math semantics: log(0) = -inf, pow overflow = inf, sqrt of
    # a negative = NaN — never Python math-module exceptions
    assert me.eval_math("log 0") == -math.inf
    assert me.eval_math("10^1000") == math.inf
    assert math.isnan(me.eval_math("sqrt(0-2)"))
    assert me.eval_math_formatted("10^1000") == "∞"


def test_parse_errors_format_empty():
    # evalFormatted catches ParseException + NumberFormatException -> ""
    assert me.eval_math_formatted("3..5+1") == ""
    assert me.eval_math_formatted("3 ? 5") == ""
    assert me.eval_math_formatted("foo") == ""  # unknown identifier
    assert me.eval_math_formatted("3\t+5") == ""  # isSpaceChar: no tabs
    assert me.eval_math_formatted("²") == ""  # not a Java digit


def test_unbalanced_and_unevaluable_raise():
    # IllegalArgumentException analogs PROPAGATE out of evalFormatted
    with pytest.raises(me.MathEvalError):
        me.eval_math_formatted("(3+5")
    with pytest.raises(me.MathEvalError):
        me.eval_math("3+5)")
    # the negate pass skips '-' after '^' (not in "+-%*/A"), leaving an
    # unevaluable bare token — identical failure in the reference
    with pytest.raises(me.MathEvalError):
        me.eval_math("0^-1")
    # "2pi" splits into [2, pi]: the constants-map "2pi" entry is
    # unreachable in the reference too -> unevaluable group
    with pytest.raises(ValueError):
        me.eval_math("2pi")
    # log10/log2 are dead switch branches: alpha runs stop at digits
    with pytest.raises(ValueError):
        me.eval_math("log10(1000)")


# UnitsTest.java cases with the exact DecimalFormat output quirks:
# maxIntegerDigits = 1+trunc(log10) suppresses the integer part of
# sub-1 results (".0333"), maxFractionDigits = 1+sigFigs-trunc(log10)
# clamps at 0, grouping is on, rounding is HALF_EVEN
CONVERT_CASES = [
    ("3.33", "cm", "m", ".0333 m"),
    ("10", "km", "ft", "32,808 ft"),
    ("10", "oz", "tons", ".000283 metric tons"),
    ("10", "pc", "in", "12,148,336,929,133,858,816 in"),
    ("2.5", "hours", "min", "150 min"),
    ("50", "K", "K", "50 K"),  # same-unit echoes the input string
    ("50", "F", "K", "283.1 K"),
    ("50", "C", "K", "323.1 K"),
    ("50", "K", "F", "-369.7 F"),
    ("50", "F", "F", "50 F"),
    ("50", "C", "F", "122 F"),
    ("50", "K", "C", "-223.1 C"),
    ("50", "F", "C", "10 C"),
    ("50", "C", "C", "50 C"),
    ("1000", "Meters", "KM", "1 km"),  # alias lookup is case-blind
]


@pytest.mark.parametrize("v,f,t,expected", CONVERT_CASES)
def test_convert(v, f, t, expected):
    assert me.convert_unit(v, f, t) == expected


def test_convert_rejects():
    assert me.convert_unit("5", "kg", "mile") is None  # type mismatch
    assert me.convert_unit("5", "xx", "m") is None  # unknown unit
    assert me.convert_unit("nonsense", "cm", "m") is None  # bad value


def _ref_fold(nums, ops):
    """Independent twin of the reference's precedence folding: one pass
    per operator group (^ then */ then +-), each left-associative, with
    the engine's IEEE '^' and NaN-on-/0 semantics."""
    import numpy as np

    vals, rest = list(nums), list(ops)
    for group in ("^", "*/", "+-"):
        i = 0
        while i < len(rest):
            op = rest[i]
            if op not in group:
                i += 1
                continue
            a, b = vals[i], vals[i + 1]
            if op == "^":
                with np.errstate(all="ignore"):
                    r = float(np.power(np.float64(a), np.float64(b)))
            elif op == "*":
                r = a * b
            elif op == "/":
                r = math.nan if b == 0 else a / b
            elif op == "+":
                r = a + b
            else:
                r = a - b
            vals[i:i + 2] = [r]
            del rest[i]
    return vals[0]


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=-20, max_value=20),
    st.lists(
        st.tuples(
            st.sampled_from("+-*/^"),
            st.integers(min_value=-20, max_value=20),
        ),
        min_size=1,
        max_size=8,
    ),
)
def test_chain_precedence_property(first, tail):
    """Random operator chains (negative literals exercise the negate
    pass at every position) must fold exactly like the independent
    precedence twin.  '^' never gets a negative literal: the negate
    pass skips '-' after '^' in the reference too, so "0^-1" is an
    IllegalArgumentException there as well — pinned separately."""
    tail = [(op, abs(n) if op == "^" else n) for op, n in tail]
    expr = str(first) + "".join(f"{op}{n}" for op, n in tail)
    got = me.eval_math(expr)
    want = _ref_fold([first] + [n for _op, n in tail],
                     [op for op, _n in tail])
    assert (math.isnan(got) and math.isnan(want)) or got == want, (
        expr, got, want
    )


def test_huge_and_boundary_formatting():
    # >= 23 integer digits must format, not raise InvalidOperation
    assert me.eval_math_formatted("10^22") == \
        "10,000,000,000,000,000,000,000"
    # float log10 rounds UP at a power-of-10 boundary, handing the
    # formatter max_int = digits + 1 — must be a no-op, not a slice
    # that drops the leading digits
    got = me.convert_unit("0.9999999999999999", "km", "m")
    assert got is not None and got.startswith("999.")
    # direct truncation semantics: low-order digits kept VERBATIM
    assert me._decimal_format(105.0, max_int=2, max_frac=0) == "05"
    assert me._decimal_format(105.0, max_int=5, max_frac=0) == "105"


def test_convert_value_numeric():
    assert me.convert_unit_value(10.0, "km", "m") == 10000.0
    assert me.convert_unit_value(50.0, "C", "K") == 323.15
    assert me.convert_unit_value(1.0, "day", "s") == 864000.0  # sic
    assert me.convert_unit_value(1.0, "kg", "m") is None
