"""The expressions module — Lucene's JavaScript-like expression language
(lucene/expressions/src/java/org/apache/lucene/expressions/js/
Javascript.g4 + JavascriptCompiler.java) compiled to three targets:

  * evaluate(node, vars)        — a Python mirror of the JVM bytecode the
                                  reference emits (the semantic spec)
  * to_spark_column(node, b)    — a pyspark Column (whole-stage codegen,
                                  JVM-side; the engine execution path)
  * to_duckdb_sql(node, b)      — SQL for the correctness-gate oracle

Grammar and precedence are the reference's exactly: primary / unary
(! ~ + -) / * / % / + - / << >> >>> / < <= > >= / == != / & / ^ / | /
&& / || / right-assoc ?:. Numeric literals: DECIMAL is a double, HEX
and OCTAL are longs.

Type semantics replicate JavascriptCompiler's desired-type stack, NOT
JavaScript's: every arithmetic/comparison operand is coerced to double,
bitwise operands to long (d2l = saturating truncation), shift counts to
int, and — the reference's sharpest edge — TRUTHINESS contexts (!, &&,
||, and the ?: condition) coerce through d2i, so `0.5 && 1` is FALSE
(the condition truncates to int 0) and booleans materialize as 1/0 in
the surrounding context's type. The 25-function table is
JavascriptCompiler.properties (java.lang.Math + MathUtil.acosh/asinh/
atanh/log + SloppyMath.haversinKilometers).

The reference compiles through ANTLR + ASM (jars this sandbox lacks),
so there is no compiled-binary pin for this module; the verification
tier is the Python-mirror unit tests (tests/test_expressions.py,
including the d2i/d2l saturation and truthiness edges) plus the DuckDB
value oracle on the gate's `expression` function_query variant.

Bindings (SimpleBindings.java): a dict name -> Column / SQL fragment;
unbound variables raise, like SimpleBindings.validate.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass

_INT_MIN, _INT_MAX = -(2**31), 2**31 - 1
_LONG_MIN, _LONG_MAX = -(2**63), 2**63 - 1

FUNCTIONS: dict[str, int] = {
    "abs": 1, "acos": 1, "acosh": 1, "asin": 1, "asinh": 1, "atan": 1,
    "atan2": 2, "atanh": 1, "ceil": 1, "cos": 1, "cosh": 1, "exp": 1,
    "floor": 1, "haversin": 4, "ln": 1, "log10": 1, "logn": 2, "max": 2,
    "min": 2, "pow": 2, "sin": 1, "sinh": 1, "sqrt": 1, "tan": 1,
    "tanh": 1,
}


@dataclass(frozen=True)
class Node:
    kind: str  # num / var / call / unary / bin / cond
    op: str = ""
    args: tuple = ()
    value: float = 0.0  # exact int for is_long literals (hex/octal)
    is_long: bool = False
    name: str = ""


class ExpressionError(ValueError):
    pass


# ---------------------------------------------------------------------------
# Lexer

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>[ \t\n\r]+)
  | (?P<hex>0[xX][0-9a-fA-F]+)
  | (?P<octal>0[0-7]+)
  | (?P<decimal>(?:(?:0|[1-9][0-9]*)(?:\.[0-9]*)?|\.[0-9]+)(?:[eE][+\-]?[0-9]+)?)
  | (?P<variable>[_$a-zA-Z][_$a-zA-Z0-9]*(?:\[(?:'(?:\\'|\\\\|[^\\'])*?'|"(?:\\"|\\\\|[^\\"])*?"|0|[1-9][0-9]*)\])*
      (?:\.[_$a-zA-Z][_$a-zA-Z0-9]*(?:\[(?:'(?:\\'|\\\\|[^\\'])*?'|"(?:\\"|\\\\|[^\\"])*?"|0|[1-9][0-9]*)\])*)*)
  | (?P<op><<|>>>|>>|<=|>=|==|!=|&&|\|\||[()!,~*/%+\-<>&^|?:])
    """,
    re.VERBOSE,
)


def _lex(src: str) -> list[tuple[str, str]]:
    toks: list[tuple[str, str]] = []
    pos = 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise ExpressionError(
                f"Invalid expression '{src}': unexpected character at {pos}"
            )
        pos = m.end()
        kind = m.lastgroup
        if kind != "ws":
            toks.append((kind, m.group(0)))
    toks.append(("eof", ""))
    return toks


# ---------------------------------------------------------------------------
# Parser (precedence climbing, levels per Javascript.g4 rule order)

class _Parser:
    def __init__(self, src: str):
        self.src = src
        self.toks = _lex(src)
        self.i = 0

    def peek(self) -> tuple[str, str]:
        return self.toks[self.i]

    def next(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, text: str) -> None:
        k, v = self.next()
        if v != text:
            raise ExpressionError(
                f"Invalid expression '{self.src}': expected {text!r}, got {v!r}"
            )

    def parse(self) -> Node:
        node = self.conditional()
        if self.peek()[0] != "eof":
            raise ExpressionError(
                f"Invalid expression '{self.src}': trailing input "
                f"{self.peek()[1]!r}"
            )
        return node

    def conditional(self) -> Node:
        cond = self.boolor()
        if self.peek() == ("op", "?"):
            self.next()
            then = self.conditional()
            self.expect(":")
            other = self.conditional()
            return Node("cond", args=(cond, then, other))
        return cond

    def _binary(self, ops: tuple[str, ...], sub) -> Node:
        node = sub()
        while self.peek()[0] == "op" and self.peek()[1] in ops:
            op = self.next()[1]
            node = Node("bin", op=op, args=(node, sub()))
        return node

    def boolor(self):
        return self._binary(("||",), self.booland)

    def booland(self):
        return self._binary(("&&",), self.bwor)

    def bwor(self):
        return self._binary(("|",), self.bwxor)

    def bwxor(self):
        return self._binary(("^",), self.bwand)

    def bwand(self):
        return self._binary(("&",), self.eqne)

    def eqne(self):
        return self._binary(("==", "!="), self.comp)

    def comp(self):
        return self._binary(("<", "<=", ">", ">="), self.shift)

    def shift(self):
        return self._binary(("<<", ">>", ">>>"), self.addsub)

    def addsub(self):
        return self._binary(("+", "-"), self.muldiv)

    def muldiv(self):
        return self._binary(("*", "/", "%"), self.unary)

    def unary(self) -> Node:
        k, v = self.peek()
        if k == "op" and v in ("!", "~", "+", "-"):
            self.next()
            return Node("unary", op=v, args=(self.unary(),))
        return self.primary()

    def primary(self) -> Node:
        k, v = self.next()
        if k == "op" and v == "(":
            node = self.conditional()
            self.expect(")")
            return node
        if k == "hex":
            return Node("num", value=int(v, 16), is_long=True)
        if k == "octal":
            return Node("num", value=int(v, 8), is_long=True)
        if k == "decimal":
            return Node("num", value=float(v))
        if k == "variable":
            if self.peek() == ("op", "("):
                self.next()
                args = []
                if self.peek() != ("op", ")"):
                    args.append(self.conditional())
                    while self.peek() == ("op", ","):
                        self.next()
                        args.append(self.conditional())
                self.expect(")")
                if v not in FUNCTIONS:
                    raise ExpressionError(
                        f"Invalid expression '{self.src}': Unrecognized "
                        f"function call ({v})."
                    )
                if len(args) != FUNCTIONS[v]:
                    raise ExpressionError(
                        f"Invalid expression '{self.src}': Expected "
                        f"({FUNCTIONS[v]}) arguments for function call "
                        f"({v}), but found ({len(args)})."
                    )
                return Node("call", name=v, args=tuple(args))
            return Node("var", name=v)
        raise ExpressionError(
            f"Invalid expression '{self.src}': unexpected token {v!r}"
        )


def parse_expression(src: str) -> Node:
    return _Parser(src).parse()


def expression_variables(node: Node) -> set[str]:
    out: set[str] = set()

    def walk(n: Node) -> None:
        if n.kind == "var":
            out.add(n.name)
        for a in n.args:
            walk(a)

    walk(node)
    return out


# ---------------------------------------------------------------------------
# Python evaluator — the JVM-bytecode mirror (the semantic reference)

def _d2l(x: float) -> int:
    if math.isnan(x):
        return 0
    if x >= _LONG_MAX:
        return _LONG_MAX
    if x <= _LONG_MIN:
        return _LONG_MIN
    return int(x)


def _d2i(x: float) -> int:
    if math.isnan(x):
        return 0
    if x >= _INT_MAX:
        return _INT_MAX
    if x <= _INT_MIN:
        return _INT_MIN
    return int(x)


def _l2i(x: int) -> int:
    x &= 0xFFFFFFFF
    return x - 0x100000000 if x >= 0x80000000 else x


def _to_signed64(x: int) -> int:
    x &= 0xFFFFFFFFFFFFFFFF
    return x - 0x10000000000000000 if x >= 0x8000000000000000 else x


def _haversin_km(lat1: float, lon1: float, lat2: float, lon2: float) -> float:
    # SloppyMath.haversinKilometers' formula in plain doubles (the
    # reference's table-driven sin/cos differ by <1e-9 relative)
    to_rad = math.pi / 180.0
    x1, x2 = lat1 * to_rad, lat2 * to_rad
    h1 = 1.0 - math.cos(x1 - x2)
    h2 = 1.0 - math.cos((lon1 - lon2) * to_rad)
    h = h1 + math.cos(x1) * math.cos(x2) * h2
    return 6371.0087714 * 0.5 * 2.0 * math.asin(min(1.0, math.sqrt(h * 0.5)))


def _call(name: str, a: list[float]) -> float:
    try:
        if name == "abs":
            return abs(a[0])
        if name == "ceil":
            return math.ceil(a[0]) * 1.0 if not math.isnan(a[0]) and math.isfinite(a[0]) else a[0]
        if name == "floor":
            return math.floor(a[0]) * 1.0 if not math.isnan(a[0]) and math.isfinite(a[0]) else a[0]
        if name == "ln":
            return math.log(a[0]) if a[0] > 0 else (
                float("-inf") if a[0] == 0 else float("nan"))
        if name == "log10":
            return math.log10(a[0]) if a[0] > 0 else (
                float("-inf") if a[0] == 0 else float("nan"))
        if name == "logn":
            base, x = a
            num = math.log(x) if x > 0 else (
                float("-inf") if x == 0 else float("nan"))
            den = math.log(base) if base > 0 else (
                float("-inf") if base == 0 else float("nan"))
            return num / den if den != 0 else float("nan")
        if name == "max":  # Java Math.max: NaN wins
            return (
                float("nan") if math.isnan(a[0]) or math.isnan(a[1])
                else max(a[0], a[1])
            )
        if name == "min":
            return (
                float("nan") if math.isnan(a[0]) or math.isnan(a[1])
                else min(a[0], a[1])
            )
        if name == "pow":
            return math.pow(a[0], a[1])
        if name == "sqrt":
            return math.sqrt(a[0]) if a[0] >= 0 else float("nan")
        if name == "haversin":
            return _haversin_km(*a)
        if name in ("acosh",):
            return math.acosh(a[0]) if a[0] >= 1 else float("nan")
        if name in ("atanh",):
            return math.atanh(a[0]) if -1 < a[0] < 1 else (
                math.copysign(float("inf"), a[0]) if abs(a[0]) == 1
                else float("nan"))
        if name in ("acos", "asin"):
            return getattr(math, name)(a[0]) if -1 <= a[0] <= 1 else float("nan")
        if name == "atan2":
            return math.atan2(a[0], a[1])
        return getattr(math, name)(a[0])
    except (ValueError, OverflowError):
        return float("nan")


def evaluate(node: Node, variables: dict[str, float]) -> float:
    """Evaluate with the compiled-class semantics; returns a double."""
    return float(_eval(node, variables, "double"))


def _truthy(node: Node, v: dict[str, float]) -> bool:
    # truthiness contexts evaluate the operand at desired type INT
    return _eval(node, v, "int") != 0


def _eval(node: Node, v: dict[str, float], desired: str):
    if node.kind == "num":
        if node.is_long:
            return _cast_from_long(int(node.value), desired)
        return _cast_from_double(node.value, desired)
    if node.kind == "var":
        if node.name not in v:
            raise ExpressionError(f"Invalid reference '{node.name}'.")
        return _cast_from_double(float(v[node.name]), desired)
    if node.kind == "call":
        args = [_eval(a, v, "double") for a in node.args]
        return _cast_from_double(_call(node.name, args), desired)
    if node.kind == "unary":
        if node.op == "!":
            return _bool(not _truthy(node.args[0], v), desired)
        if node.op == "~":
            return _cast_from_long(
                _to_signed64(~_eval(node.args[0], v, "long")), desired)
        if node.op == "+":
            return _eval(node.args[0], v, desired)
        return _cast_from_double(-_eval(node.args[0], v, "double"), desired)
    if node.kind == "cond":
        if _truthy(node.args[0], v):
            return _eval(node.args[1], v, desired)
        return _eval(node.args[2], v, desired)
    # binary
    op = node.op
    le, ri = node.args
    if op in ("*", "/", "%", "+", "-"):
        a, b = _eval(le, v, "double"), _eval(ri, v, "double")
        if op == "*":
            r = a * b
        elif op == "/":
            r = (
                a / b if b != 0
                else (float("nan") if a == 0 or math.isnan(a)
                      else math.copysign(float("inf"), a) * math.copysign(1.0, b))
            )
        elif op == "%":
            r = math.fmod(a, b) if b != 0 and not math.isinf(a) else (
                float("nan") if b == 0 or math.isinf(a) else a)
        elif op == "+":
            r = a + b
        else:
            r = a - b
        return _cast_from_double(r, desired)
    if op in ("<<", ">>", ">>>"):
        a = _eval(le, v, "long")
        s = _eval(ri, v, "int") & 63
        if op == "<<":
            r = _to_signed64(a << s)
        elif op == ">>":
            r = a >> s
        else:
            r = (a & 0xFFFFFFFFFFFFFFFF) >> s
            r = _to_signed64(r)
        return _cast_from_long(r, desired)
    if op in ("&", "|", "^"):
        a, b = _eval(le, v, "long"), _eval(ri, v, "long")
        r = a & b if op == "&" else (a | b if op == "|" else a ^ b)
        return _cast_from_long(_to_signed64(r), desired)
    if op in ("<", "<=", ">", ">=", "==", "!="):
        a, b = _eval(le, v, "double"), _eval(ri, v, "double")
        if math.isnan(a) or math.isnan(b):
            res = op == "!="
        else:
            res = {
                "<": a < b, "<=": a <= b, ">": a > b,
                ">=": a >= b, "==": a == b, "!=": a != b,
            }[op]
        return _bool(res, desired)
    if op == "&&":
        return _bool(_truthy(le, v) and _truthy(ri, v), desired)
    if op == "||":
        return _bool(_truthy(le, v) or _truthy(ri, v), desired)
    raise ExpressionError(f"unknown operator {op!r}")


def _bool(truth: bool, desired: str):
    if desired == "double":
        return 1.0 if truth else 0.0
    return 1 if truth else 0


def _cast_from_double(x: float, desired: str):
    if desired == "double":
        return x
    if desired == "long":
        return _d2l(x)
    return _d2i(x)


def _cast_from_long(x: int, desired: str):
    if desired == "double":
        return float(x)
    if desired == "long":
        return x
    return _l2i(x)


# ---------------------------------------------------------------------------
# Spark Column compiler

_SPARK_FN = {
    "abs": "abs", "acos": "acos", "acosh": "acosh", "asin": "asin",
    "asinh": "asinh", "atan": "atan", "atan2": "atan2", "atanh": "atanh",
    "cos": "cos", "cosh": "cosh", "exp": "exp", "ln": "log",
    "log10": "log10", "pow": "pow", "sin": "sin", "sinh": "sinh",
    "sqrt": "sqrt", "tan": "tan", "tanh": "tanh",
}


def to_spark_column(node: Node, bindings: dict):
    """Compile to a pyspark Column (all-JVM, codegen'd). NaN ordering in
    comparisons follows Spark SQL, not Java dcmp — keep NaN out of
    comparison operands (the evaluator is the Java-exact reference)."""
    from pyspark.sql import functions as F

    def col(n: Node, desired: str):
        if n.kind == "num":
            if n.is_long:
                v = F.lit(int(n.value)).cast("long")
                return _c_from_long(v, desired)
            return _c_from_double(F.lit(float(n.value)), desired)
        if n.kind == "var":
            if n.name not in bindings:
                raise ExpressionError(f"Invalid reference '{n.name}'.")
            return _c_from_double(bindings[n.name].cast("double"), desired)
        if n.kind == "call":
            args = [col(a, "double") for a in n.args]
            if n.name in _SPARK_FN:
                r = getattr(F, _SPARK_FN[n.name])(*args)
            elif n.name == "ceil":
                r = F.ceil(args[0]).cast("double")
            elif n.name == "floor":
                r = F.floor(args[0]).cast("double")
            elif n.name == "logn":
                r = F.log(args[1]) / F.log(args[0])
            elif n.name == "max":
                r = F.greatest(*args)
            elif n.name == "min":
                r = F.least(*args)
            elif n.name == "haversin":
                to_rad = F.lit(math.pi / 180.0)
                lat1, lon1, lat2, lon2 = args
                x1, x2 = lat1 * to_rad, lat2 * to_rad
                h = (
                    (F.lit(1.0) - F.cos(x1 - x2))
                    + F.cos(x1) * F.cos(x2)
                    * (F.lit(1.0) - F.cos((lon1 - lon2) * to_rad))
                )
                r = (
                    F.lit(6371.0087714 * 0.5 * 2.0)
                    * F.asin(F.least(F.lit(1.0), F.sqrt(h * F.lit(0.5))))
                )
            else:  # pragma: no cover
                raise ExpressionError(f"Unrecognized function call ({n.name}).")
            return _c_from_double(r, desired)
        if n.kind == "unary":
            if n.op == "!":
                return _c_bool(~truthy(n.args[0]), desired)
            if n.op == "~":
                return _c_from_long(
                    F.bitwise_not(col(n.args[0], "long")), desired)
            if n.op == "+":
                return col(n.args[0], desired)
            return _c_from_double(-col(n.args[0], "double"), desired)
        if n.kind == "cond":
            return F.when(
                truthy(n.args[0]), col(n.args[1], desired)
            ).otherwise(col(n.args[2], desired))
        op = n.op
        le, ri = n.args
        if op in ("*", "/", "%", "+", "-"):
            a, b = col(le, "double"), col(ri, "double")
            if op == "/":
                # ANSI Spark errors on /0; Java doubles give inf/nan.
                # try_divide avoids the error; the when() restores the
                # Java values (positive-zero divisor sign assumed)
                r = F.when(
                    b == 0.0,
                    F.when(a.isNaN() | (a == 0.0), F.lit(float("nan")))
                    .otherwise(F.signum(a) * F.lit(float("inf"))),
                ).otherwise(F.try_divide(a, b))
            elif op == "%":
                r = F.when(b == 0.0, F.lit(float("nan"))).otherwise(
                    F.try_mod(a, b))
            else:
                r = {"*": a * b, "+": a + b, "-": a - b}[op]
            return _c_from_double(r, desired)
        if op in ("<<", ">>", ">>>"):
            a, b = col(le, "long"), col(ri, "int")
            fn = {"<<": "shiftleft", ">>": "shiftright",
                  ">>>": "shiftrightunsigned"}[op]
            return _c_from_long(F.call_function(fn, a, b), desired)
        if op in ("&", "|", "^"):
            a, b = col(le, "long"), col(ri, "long")
            r = {"&": a.bitwiseAND(b), "|": a.bitwiseOR(b),
                 "^": a.bitwiseXOR(b)}[op]
            return _c_from_long(r, desired)
        if op in ("<", "<=", ">", ">=", "==", "!="):
            a, b = col(le, "double"), col(ri, "double")
            r = {"<": a < b, "<=": a <= b, ">": a > b, ">=": a >= b,
                 "==": a == b, "!=": a != b}[op]
            return _c_bool(r, desired)
        if op == "&&":
            return _c_bool(truthy(le) & truthy(ri), desired)
        if op == "||":
            return _c_bool(truthy(le) | truthy(ri), desired)
        raise ExpressionError(f"unknown operator {op!r}")

    def truthy(n: Node):
        return col(n, "int") != 0

    def _c_from_double(c, desired: str):
        if desired == "double":
            return c
        return c.cast("long" if desired == "long" else "int")

    def _c_from_long(c, desired: str):
        if desired == "double":
            return c.cast("double")
        if desired == "long":
            return c
        return c.cast("int")

    def _c_bool(c, desired: str):
        from pyspark.sql import functions as F2

        one = F2.when(c, 1).otherwise(0)
        return one.cast("double") if desired == "double" else one

    return col(node, "double")


# ---------------------------------------------------------------------------
# DuckDB SQL compiler (for the gate oracle)

_SQL_FN = {
    "abs": "abs", "acos": "acos", "asin": "asin", "atan": "atan",
    "atan2": "atan2", "cos": "cos", "exp": "exp", "ln": "ln",
    "log10": "log10", "pow": "pow", "sin": "sin", "sqrt": "sqrt",
    "tan": "tan",
}


def to_duckdb_sql(node: Node, bindings: dict[str, str]) -> str:
    """Compile to a DuckDB scalar expression. Covers the exact-arithmetic
    subset (+ - * / % comparisons ?: && || ! & | ^ ~ shifts, abs/sqrt/
    floor/ceil/min/max/pow and the plain trig) — enough for oracle
    expressions; transcendental ULP parity is the caller's concern."""

    def trunc_long(s: str) -> str:
        return f"CAST(trunc({s}) AS BIGINT)"

    def sql(n: Node, desired: str) -> str:
        if n.kind == "num":
            if n.is_long:
                v = str(int(n.value))
                return v if desired != "double" else f"CAST({v} AS DOUBLE)"
            v = repr(n.value)
            if desired == "double":
                return f"CAST({v} AS DOUBLE)"
            return trunc_long(v)
        if n.kind == "var":
            if n.name not in bindings:
                raise ExpressionError(f"Invalid reference '{n.name}'.")
            b = f"CAST(({bindings[n.name]}) AS DOUBLE)"
            return b if desired == "double" else trunc_long(b)
        if n.kind == "call":
            args = [sql(a, "double") for a in n.args]
            if n.name in _SQL_FN:
                r = f"{_SQL_FN[n.name]}({', '.join(args)})"
            elif n.name == "ceil":
                r = f"CAST(ceil({args[0]}) AS DOUBLE)"
            elif n.name == "floor":
                r = f"CAST(floor({args[0]}) AS DOUBLE)"
            elif n.name == "max":
                r = f"greatest({args[0]}, {args[1]})"
            elif n.name == "min":
                r = f"least({args[0]}, {args[1]})"
            elif n.name == "logn":
                r = f"(ln({args[1]}) / ln({args[0]}))"
            else:
                raise ExpressionError(
                    f"function {n.name} not mapped for the SQL oracle")
            return r if desired == "double" else trunc_long(r)
        if n.kind == "unary":
            if n.op == "!":
                return boolean(f"NOT ({truthy(n.args[0])})", desired)
            if n.op == "~":
                r = f"(~({sql(n.args[0], 'long')}))"
                return r if desired != "double" else f"CAST({r} AS DOUBLE)"
            if n.op == "+":
                return sql(n.args[0], desired)
            r = f"(-({sql(n.args[0], 'double')}))"
            return r if desired == "double" else trunc_long(r)
        if n.kind == "cond":
            return (
                f"(CASE WHEN {truthy(n.args[0])} THEN "
                f"{sql(n.args[1], desired)} ELSE {sql(n.args[2], desired)} END)"
            )
        op = n.op
        le, ri = n.args
        if op in ("*", "/", "%", "+", "-"):
            a, b = sql(le, "double"), sql(ri, "double")
            # NB: duckdb's % on doubles is exact C fmod (Java %); its
            # fmod() function is the inexact x - trunc(x/y)*y
            fn = f"({a} {op} {b})"
            return fn if desired == "double" else trunc_long(fn)
        if op in ("<<", ">>"):
            a, b = sql(le, "long"), sql(ri, "long")
            r = f"(({a}) {op} (({b}) & 63))"
            return r if desired != "double" else f"CAST({r} AS DOUBLE)"
        if op == ">>>":
            raise ExpressionError(">>> not mapped for the SQL oracle")
        if op in ("&", "|", "^"):
            sqlop = "xor" if op == "^" else op
            a, b = sql(le, "long"), sql(ri, "long")
            r = f"xor({a}, {b})" if op == "^" else f"(({a}) {sqlop} ({b}))"
            return r if desired != "double" else f"CAST({r} AS DOUBLE)"
        if op in ("<", "<=", ">", ">=", "==", "!="):
            a, b = sql(le, "double"), sql(ri, "double")
            cmp_op = {"==": "=", "!=": "<>"}.get(op, op)
            return boolean(f"({a} {cmp_op} {b})", desired)
        if op == "&&":
            return boolean(f"({truthy(le)} AND {truthy(ri)})", desired)
        if op == "||":
            return boolean(f"({truthy(le)} OR {truthy(ri)})", desired)
        raise ExpressionError(f"unknown operator {op!r}")

    def truthy(n: Node) -> str:
        return f"({sql(n, 'int')} <> 0)"

    def boolean(cond: str, desired: str) -> str:
        one = f"(CASE WHEN {cond} THEN 1 ELSE 0 END)"
        return f"CAST({one} AS DOUBLE)" if desired == "double" else one

    return sql(node, "double")
