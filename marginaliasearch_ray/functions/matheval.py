"""Math expression evaluator + unit conversion (assistant math function).

Reference semantics (``code/functions/math``):

- ``MathParser.java:44-61`` — trivial-decimal fast path, then tokenize /
  parenthesize / negate / functions / binary ``^`` then ``*/`` then
  ``+-`` (left-associative list folding), evaluated over a tiny token
  tree.  ``evalFormatted`` (:30-42) formats with US-locale grouping,
  HALF_UP, max 6 fraction digits, and returns "" on parse errors.
- ``MathParser.java:390-410`` — functions sqrt/log/log10/log2/cos/sin/
  tan; ``log`` is the natural log.  Division and modulo by zero yield
  NaN (:368-380).
- ``MathParser.java:20`` — constants e/pi (the "2pi" map entry is
  unreachable: the tokenizer splits "2pi" into a number and an alpha
  token, which then fails to evaluate — mirrored faithfully).
- ``Units.java:48-91`` — alias-insensitive unit lookup from the
  units.csv table; same-unit echoes the input string; cross-type
  returns nothing; TEMPERATURE uses the affine C/F/K formulas (:93-119)
  and everything else ``base_from * value / base_to``; the output is
  formatted by a fresh DecimalFormat (grouping, HALF_EVEN — unlike the
  parser's HALF_UP) with ``maximumIntegerDigits = 1 + (int)log10(v)``
  (high-order digits TRUNCATE; 0 suppresses the integer part entirely,
  e.g. ".0333 m") and ``maximumFractionDigits = 1 + sigFigs -
  (int)log10(v)`` where sigFigs counts digit characters of the input
  string (:121-123), both clamped at 0.

The unit table transcribes the reference's resource
(``functions/math/resources/units.csv`` — standard physical conversion
factors; quirks like day = 864 000 s are preserved for behavior
parity and flagged inline).
"""

from __future__ import annotations

import math
import re
import unicodedata
from decimal import ROUND_HALF_EVEN, ROUND_HALF_UP, Decimal

import numpy as np

_TRIVIAL_RE = re.compile(r"([0-9]+\.[0-9]*|\.[0-9]+)")

CONSTANTS = {"e": math.e, "pi": math.pi, "2pi": 2 * math.pi}


def _ieee(fn):
    """Wrap a numpy scalar kernel so domain/overflow follow IEEE-754 —
    Java's Math.* semantics: log(0) = -inf, log(-x) = NaN, sqrt(-x) =
    NaN, pow overflow = ±inf — where Python's math module raises."""
    def call(v: float) -> float:
        with np.errstate(all="ignore"):
            return float(fn(np.float64(v)))
    return call


_FUNCTIONS = {
    "sqrt": _ieee(np.sqrt),
    "log": _ieee(np.log),
    "log10": _ieee(np.log10),
    "log2": _ieee(lambda v: np.log(v) / np.log(np.float64(2.0))),
    "cos": math.cos,
    "sin": math.sin,
    "tan": math.tan,
}


class MathParseError(ValueError):
    """ParseException analog (malformed number / unknown character) —
    caught by eval_math_formatted, which returns ''."""


class MathNumberError(ValueError):
    """NumberFormatException analog (unparseable numeric token) — also
    caught by eval_math_formatted."""


class MathEvalError(ValueError):
    """IllegalArgumentException analog (unbalanced parentheses,
    unevaluable token group, unknown function) — NOT caught by
    eval_math_formatted, mirroring the reference's error contract."""


# --- token tree (Token / StringToken / UniExpression / GroupExpression /
#     BiExpression, MathParser.java:242-411) ---------------------------------


class _Tok:
    __slots__ = ("type",)

    def __init__(self, type_: str):
        self.type = type_

    def evaluate(self) -> float:
        raise MathEvalError(f"Can't evaluate {self!r}")

    def transform(self, mapper) -> None:
        pass


class _Str(_Tok):
    __slots__ = ("value",)

    def __init__(self, type_: str, value: str):
        super().__init__(type_)
        self.value = value

    def evaluate(self) -> float:
        cv = CONSTANTS.get(self.value)
        if cv is not None:
            return cv
        try:
            return float(self.value)
        except ValueError:  # Double.parseDouble -> NumberFormatException
            raise MathNumberError(self.value) from None


class _Uni(_Tok):
    __slots__ = ("arg",)

    def __init__(self, type_: str, arg: _Tok):
        super().__init__(type_)
        self.arg = arg

    def evaluate(self) -> float:
        if self.type == "~":
            return -self.arg.evaluate()
        raise MathEvalError(f"Can't evaluate {self!r}")

    def transform(self, mapper) -> None:
        self.arg.transform(mapper)


class _Group(_Tok):
    __slots__ = ("args",)

    def __init__(self, args: list):
        super().__init__(" ")
        self.args = args

    def evaluate(self) -> float:
        if len(self.args) == 1:
            return self.args[0].evaluate()
        raise MathEvalError(f"Can't evaluate {self!r}")

    def transform(self, mapper) -> None:
        self.args = mapper(self.args)


class _Bi(_Tok):
    __slots__ = ("left", "right")

    def __init__(self, type_: str, left: _Tok, right: _Tok):
        super().__init__(type_)
        self.left = left
        self.right = right

    def transform(self, mapper) -> None:
        self.left.transform(mapper)
        self.right.transform(mapper)

    def evaluate(self) -> float:
        rv = self.right.evaluate()
        t = self.type
        if t == "+":
            return self.left.evaluate() + rv
        if t == "-":
            return self.left.evaluate() - rv
        if t == "*":
            return self.left.evaluate() * rv
        if t == "/":
            if rv == 0:
                return math.nan
            return self.left.evaluate() / rv
        if t == "%":
            if rv == 0:
                return math.nan
            return math.fmod(self.left.evaluate(), rv)  # Java % semantics
        if t == "^":
            # Java Math.pow: overflow -> ±inf, bad domain -> NaN (the
            # math-module version raises instead)
            with np.errstate(all="ignore"):
                return float(
                    np.power(np.float64(self.left.evaluate()),
                             np.float64(rv))
                )
        if t == "F":
            fn = _FUNCTIONS.get(self.left.value.lower())
            if fn is None:
                raise MathEvalError(f"Can't evaluate {self!r}")
            return fn(rv)
        raise MathEvalError(f"Can't evaluate {self!r}")


def _tokenize(expr: str) -> list:
    toks: list[_Tok] = []
    i, n = 0, len(expr)
    while i < n:
        c = expr[i]
        if c in "()+-/*^":
            toks.append(_Tok(c))
            i += 1
        elif "0" <= c <= "9":
            # ASCII digits only: Java's Character.isDigit admits all
            # Unicode Nd, but those then fail Double.parseDouble ->
            # NumberFormatException -> "" — same formatted outcome as
            # the ParseException this branch-miss produces here.
            # str.isdigit would be WIDER than Java (it admits No-class
            # superscripts Java rejects).
            j = i + 1
            has_period = False
            while j < n:
                c2 = expr[j]
                if "0" <= c2 <= "9":
                    j += 1
                    continue
                if c2 == ".":
                    if not has_period:
                        has_period = True
                        j += 1
                        continue
                    raise MathParseError(f"Malformatted number in {expr}")
                break
            toks.append(_Str("0", expr[i:j]))
            i = j
        elif c.isalpha():
            j = i + 1
            while j < n and expr[j].isalpha():
                j += 1
            s = expr[i:j]
            toks.append(_Str("C" if s in CONSTANTS else "A", s))
            i = j
        elif c == " " or unicodedata.category(c) == "Zs":
            # Character.isSpaceChar: Unicode space separators ONLY —
            # tabs/newlines are a ParseException in the reference
            i += 1
        else:
            raise MathParseError(f"{expr} at {i}")
    return toks


def _parenthesize(toks: list) -> list:
    i = 0
    while i < len(toks):
        t = toks[i]
        if t.type == ")":
            # IllegalArgumentException in the reference — NOT the
            # swallowed ParseException class
            raise MathEvalError("Unbalanced parentheses")
        if t.type == "(":
            depth = 0
            j = i + 1
            while j < len(toks):
                t2 = toks[j]
                if t2.type == "(":
                    depth += 1
                elif t2.type == ")":
                    if depth == 0:
                        break
                    depth -= 1
                j += 1
            if j == len(toks):
                raise MathEvalError("Unbalanced parentheses")
            toks[i] = _Group(_parenthesize(toks[i + 1:j]))
            del toks[i + 1:j + 1]
        i += 1
    return toks


def _negate(toks: list) -> list:
    if not toks:
        return toks
    for t in toks:
        t.transform(_negate)
    i = 0
    while i < len(toks) - 1:
        t = toks[i]
        if t.type != "-":
            i += 1
            continue
        if i == 0:
            toks[0] = _Uni("~", toks[1])
            del toks[1]
            continue
        if toks[i - 1].type in "+-%*/A":
            toks[i] = _Uni("~", toks[i + 1])
            del toks[i + 1]
            continue
        i += 1
    return toks


def _functions(toks: list) -> list:
    if not toks:
        return toks
    for t in toks:
        t.transform(_functions)
    i = 0
    while i < len(toks) - 1:
        if toks[i].type != "A":
            i += 1
            continue
        toks[i] = _Bi("F", toks[i], toks[i + 1])
        del toks[i + 1]
    return toks


def _binary(toks: list, operators: str) -> list:
    for t in toks:
        t.transform(lambda ts: _binary(ts, operators))
    i = 1
    while i < len(toks) - 1:
        t = toks[i]
        if t.type in operators:
            toks[i] = _Bi(t.type, toks[i - 1], toks[i + 1])
            del toks[i + 1]
            del toks[i - 1]
            # Java sets i=i-1 and the for-loop increments it back: the
            # merged node lands at i-1 and scanning resumes at i
            continue
        i += 1
    return toks


def eval_math(expr: str) -> float:
    """MathParser.eval: parse and evaluate ``expr`` to a double."""
    if _TRIVIAL_RE.fullmatch(expr):
        return float(expr)
    toks = _tokenize(expr)
    toks = _parenthesize(toks)
    toks = _negate(toks)
    toks = _functions(toks)
    toks = _binary(toks, "^")
    toks = _binary(toks, "*/")
    toks = _binary(toks, "+-")
    return _Group(toks).evaluate()


def _group_digits(s: str) -> str:
    out = []
    for k, ch in enumerate(reversed(s)):
        if k and k % 3 == 0:
            out.append(",")
        out.append(ch)
    return "".join(reversed(out))


def _decimal_format(
    v: float,
    *,
    max_int: int = 309,
    max_frac: int = 3,
    rounding=ROUND_HALF_EVEN,
) -> str:
    """java.text.DecimalFormat replica for the subset the math function
    uses: US grouping, min 0 fraction digits, high-order integer digits
    TRUNCATED past ``max_int`` (0 suppresses the integer part), decimal
    rounding over the double's exact binary expansion."""
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "∞" if v > 0 else "-∞"
    max_int = max(0, max_int)
    max_frac = max(0, max_frac)
    neg = v < 0 or (v == 0 and math.copysign(1.0, v) < 0)
    # widen the context: the default 28-digit precision raises
    # InvalidOperation for doubles with >= 23 integer digits, where
    # Java DecimalFormat formats any double (max ~309 digits)
    import decimal

    with decimal.localcontext() as ctx:
        ctx.prec = 340 + max_frac
        d = Decimal(abs(v)).quantize(
            Decimal(1).scaleb(-max_frac), rounding=rounding
        )
    sign = "-" if neg and d != 0 else ""
    text = format(d, "f")
    int_part, _, frac_part = text.partition(".")
    frac_part = frac_part.rstrip("0")
    # maxIntegerDigits truncation keeps the LOW-ORDER digits verbatim
    # (Java formats 105 with max 2 int digits as "05", not "5").  The
    # start index must clamp at 0: float log10 rounds up at power-of-10
    # boundaries, so the Units caller can pass max_int = digits + 1 —
    # an unclamped negative start would silently DROP leading digits
    int_part = (
        int_part[max(0, len(int_part) - max_int):] if max_int else ""
    )
    shown = _group_digits(int_part) if int_part else ""
    if frac_part:
        return f"{sign}{shown}.{frac_part}"
    if not shown:  # maxIntegerDigits == 0 and no fraction survives
        return f"{sign}0" if max_int else f"{sign}"
    return f"{sign}{shown}"


def eval_math_formatted(expr: str) -> str:
    """MathParser.evalFormatted: US grouping, HALF_UP, max 6 fraction
    digits; '' when the expression fails to parse."""
    try:
        if _TRIVIAL_RE.fullmatch(expr):
            v = float(expr)
        else:
            v = eval_math(expr)
    except (MathParseError, MathNumberError):
        # ParseException / NumberFormatException -> "" (:38-41);
        # MathEvalError (IllegalArgumentException) propagates
        return ""
    return _decimal_format(
        v, max_frac=6, rounding=ROUND_HALF_UP
    )


# --- units (Units.java + resources/units.csv) -------------------------------

# (base_value, type, display_name, aliases... — aliases include the
# display name, lookups lowercase).  Transcribed from the reference
# table; day = 864000 s and deciliter = 1e-4 m^3 are the reference's
# own (physically wrong) constants, kept for parity.
_UNIT_ROWS: list[tuple[float, str, tuple[str, ...]]] = [
    (30856775800000000.0, "DISTANCE", ("pc", "parsec", "parsecs")),
    (9460500000000000.0, "DISTANCE", ("ly", "light years", "light year")),
    (149597870700.0, "DISTANCE", ("au", "astronomical unit")),
    (1000.0, "DISTANCE", ("km", "kilometers", "kilometer")),
    (1.0, "DISTANCE", ("m", "meters", "meter")),
    (0.1, "DISTANCE", ("dm", "decimeters", "decimeter")),
    (0.01, "DISTANCE", ("cm", "centimeters", "centimeter")),
    (0.001, "DISTANCE", ("mm", "millimeters", "millimeter")),
    (0.9144, "DISTANCE", ("yd", "yards", "yard")),
    (0.0254, "DISTANCE", ("in", "inches", "inch")),
    (0.3048, "DISTANCE", ("ft", "feet", "foot")),
    (1609.344, "DISTANCE", ("miles", "mile")),
    (1852.0, "DISTANCE", ("nautical miles", "nautical mile")),
    (201.168, "DISTANCE", ("furlong", "furlongs")),
    (1.0, "WEIGHT", ("kg", "kilograms", "kilogram")),
    (0.001, "WEIGHT", ("g", "grams", "gram")),
    (1000.0, "WEIGHT", ("metric tons", "ton", "tons", "tonne", "tonnes")),
    (907.185, "WEIGHT",
     ("short tons", "short ton", "imperial ton", "imperial tons")),
    (0.45359237, "WEIGHT", ("lb", "lbs", "pounds")),
    (0.0283495231, "WEIGHT", ("oz", "ounces", "ounce")),
    (1.0, "AREA", ("m^2", "square meters", "square meter")),
    (0.01, "AREA", ("dm^2", "square decimeters", "square decimeter")),
    (0.0001, "AREA", ("cm^2", "square centimeters", "square centimeter")),
    (0.000001, "AREA", ("mm^2", "square millimeters", "square millimeter")),
    (1000000.0, "AREA", ("km^2", "square kilometers", "square kilometer")),
    (4046.9, "AREA", ("ac", "acre", "acres")),
    (2589988.1103360, "AREA", ("sq mi", "mi^2", "square miles",
                               "square mile")),
    (258.99881103360, "AREA", ("hectares", "hectare")),
    (0.09290304, "AREA", ("ft^2", "square foot", "square feet")),
    (0.83612736, "AREA", ("yd^2", "square yard", "square yards")),
    (0.00064516, "AREA", ("in^2", "square inch", "square inches")),
    (1.0, "VOLUME", ("m^3", "cubic meter", "cubic meters")),
    (1000000000.0, "VOLUME", ("km^3", "cubic kilometer",
                              "cubic kilometers")),
    (0.001, "VOLUME", ("L", "l", "dm^3", "liter", "liters",
                       "cubic decimeter")),
    (0.0001, "VOLUME", ("dl", "deciliter", "deciliters")),
    (0.0001, "VOLUME", ("cl", "centiliter", "centiliters")),
    (0.00001, "VOLUME", ("ml", "milliliter", "milliliters")),
    (0.000001, "VOLUME", ("cm^3", "cc", "cubic centimeter",
                          "cubic centimeters")),
    (0.000000001, "VOLUME", ("mm^3", "cubic millimeter",
                             "cubic millimeters")),
    (0.000236588237, "VOLUME", ("us cup", "cup", "cups")),
    (0.0000295735296, "VOLUME", ("fl.oz.", "fl oz", "fluid ounces",
                                 "fluid ounce")),
    (0.028316846592, "VOLUME", ("ft^3", "cubic foot", "cubic feet")),
    (0.000016387064, "VOLUME", ("in^3", "cubic inch", "cubic inches")),
    (0.764554857984, "VOLUME", ("yd^3", "cubic yard", "cubic yards")),
    (0.000473176473, "VOLUME", ("US pint", "pint", "pints")),
    (0.00378541178, "VOLUME", ("gallon", "gallons")),
    (1.0, "TEMPERATURE", ("C", "c", "celsius", "centigrade")),
    (0.0, "TEMPERATURE", ("F", "f", "fahrenheit")),
    (0.0, "TEMPERATURE", ("K", "k", "kelvin", "kelvins")),
    (1.0, "TIME", ("S", "s", "second", "seconds")),
    (0.001, "TIME", ("ms", "millisecond")),
    (60.0, "TIME", ("min", "minutes")),
    (3600.0, "TIME", ("hour", "hours")),
    (864000.0, "TIME", ("day", "days")),  # sic — reference constant
    (604800.0, "TIME", ("week", "weeks")),
    (31557600.0, "TIME", ("year", "years")),
    (315576000.0, "TIME", ("decade", "decades")),
    (3155760000.0, "TIME", ("century", "centuries")),
    (1.0, "ANGLE", ("degree", "degrees")),
    (57.2957795, "ANGLE", ("radians", "radian")),
]


class _Unit:
    __slots__ = ("base", "type", "name")

    def __init__(self, base: float, type_: str, name: str):
        self.base = base
        self.type = type_
        self.name = name


_UNITS_BY_NAME: dict[str, _Unit] = {}
for _base, _type, _aliases in _UNIT_ROWS:
    _u = _Unit(_base, _type, _aliases[0])
    for _a in _aliases:
        _UNITS_BY_NAME[_a.lower()] = _u


def convert_unit_value(
    value: float, from_name: str, to_name: str
) -> float | None:
    """The numeric conversion only: base_from * v / base_to, or the
    affine temperature formulas; None for unknown/mismatched units."""
    fu = _UNITS_BY_NAME.get(from_name.lower())
    tu = _UNITS_BY_NAME.get(to_name.lower())
    if fu is None or tu is None or fu.type != tu.type:
        return None
    if fu is tu:
        return value
    if fu.type == "TEMPERATURE":
        return _convert_temperature(value, fu.name, tu.name)
    return fu.base * value / tu.base


def _convert_temperature(v: float, f: str, t: str) -> float:
    if f == "C":
        if t == "K":
            return v + 273.15
        if t == "F":
            return 32.0 + 9 * v / 5
    elif f == "F":
        if t == "C":
            return 5 * (v - 32.0) / 9
        if t == "K":
            return 5 * (v - 32.0) / 9 + 273.15
    elif f == "K":
        if t == "C":
            return v - 273.15
        if t == "F":
            return 32.0 + 9 * (v - 273.15) / 5
    return 0.0  # same-name falls out earlier; unknown pairs -> 0 (Java)


def convert_unit(value: str, from_name: str, to_name: str) -> str | None:
    """Units.convert: the formatted service response ("<num> <unit>"),
    or None (Optional.empty) for unknown units or type mismatches."""
    fu = _UNITS_BY_NAME.get(from_name.lower())
    tu = _UNITS_BY_NAME.get(to_name.lower())
    if fu is None or tu is None:
        return None
    if fu is tu:
        return f"{value} {fu.name}"
    if fu.type != tu.type:
        return None
    try:
        v = eval_math(value)
    except (MathParseError, ValueError):
        return None
    if fu.type == "TEMPERATURE":
        converted = _convert_temperature(v, fu.name, tu.name)
    else:
        converted = fu.base * v / tu.base
    negative = converted < 0
    if negative:
        converted = -converted
    # (int) Math.log10: truncation toward zero; converted == 0 would be
    # an int-overflow artifact in Java — render plain 0 instead
    int_fraction = int(math.log10(converted)) if converted > 0 else 0
    sig_figs = sum(ch.isdigit() for ch in value)
    out = _decimal_format(
        converted,
        max_int=1 + int_fraction,
        max_frac=1 + sig_figs - int_fraction,
    )
    return ("-" if negative else "") + out + " " + tu.name
