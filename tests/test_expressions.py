"""The expressions module (lucene/expressions — Javascript.g4 +
JavascriptCompiler): parser precedence, the compiled-bytecode type
semantics (desired-type casts, d2i truthiness, d2l/d2i saturation,
long bitwise, fmod, NaN comparisons), and three-way agreement between
the Python evaluator, the Spark Column compiler, and the DuckDB SQL
compiler over fuzzed expressions.

No compiled-binary pin exists for this module (the reference compiles
through ANTLR + ASM, jars absent here); the evaluator IS the semantic
reference, unit-tested on the documented bytecode edges.
"""

from __future__ import annotations

import math
import random

import pytest

from lucene_solr_spark.search.expressions import (
    ExpressionError,
    Node,
    evaluate,
    expression_variables,
    parse_expression,
    to_duckdb_sql,
    to_spark_column,
)


def ev(src: str, **vars_) -> float:
    return evaluate(parse_expression(src), vars_)


def test_parser_precedence_and_literals():
    assert ev("1+2*3") == 7.0
    assert ev("(1+2)*3") == 9.0
    assert ev("2*3%4") == 2.0
    assert ev("10-4-3") == 3.0  # left assoc
    assert ev("2<<1+1") == 8.0  # addsub binds tighter than shift
    assert ev("1<<3>2") == 1.0  # shift tighter than compare
    assert ev("3>2==1") == 1.0
    assert ev("6&3|9^5") == (6 & 3 | 9 ^ 5) * 1.0
    assert ev("1||0&&0") == 1.0  # && tighter than ||
    assert ev("1?2:0?3:4") == 2.0  # right-assoc conditional
    assert ev("0?2:0?3:4") == 4.0
    assert ev("0x1F") == 31.0
    assert ev("017") == 15.0
    assert ev(".5e1") == 5.0
    assert ev("2e2") == 200.0
    assert ev("--3") == 3.0
    assert ev("~~5") == 5.0
    assert ev("+-+2") == -2.0


def test_bytecode_type_semantics():
    # truthiness goes through d2i: 0.5 truncates to int 0
    assert ev("0.5 && 1") == 0.0
    assert ev("0.5 ? 10 : 20") == 20.0
    assert ev("!0.5") == 1.0
    assert ev("1.9 && 1") == 1.0
    assert ev("-0.9 || 0") == 0.0
    # bitwise through d2l truncation
    assert ev("5.9 & 7") == 5.0
    assert ev("-5.9 & -1") == -5.0
    # d2l saturation
    assert ev("1e300 & 0x7FFFFFFFFFFFFFFF") == float(2**63 - 1)
    assert ev("-1e300 | 0") == float(-(2**63))
    # NaN truthiness: d2i(NaN) = 0
    assert ev("(0.0/0.0) ? 1 : 2") == 2.0
    # shifts: count through d2i, masked & 63
    assert ev("1 << 64") == 1.0
    assert ev("1 << 65") == 2.0
    assert ev("-8 >> 1") == -4.0
    assert ev("-8 >>> 60") == float((-8 % 2**64) >> 60)
    # fmod semantics
    assert ev("5.5 % 2") == 1.5
    assert ev("-5.5 % 2") == -1.5
    assert math.isnan(ev("5.5 % 0"))
    # Java double division
    assert ev("1 / 0") == float("inf")
    assert ev("-1 / 0") == float("-inf")
    assert math.isnan(ev("0 / 0"))
    # NaN comparisons: only != is true
    assert ev("(0.0/0.0) == (0.0/0.0)") == 0.0
    assert ev("(0.0/0.0) != 1") == 1.0
    assert ev("(0.0/0.0) < 1") == 0.0
    # ~ is long bitwise not
    assert ev("~5") == -6.0
    assert ev("~5.9") == -6.0


def test_functions_and_variables():
    assert ev("sqrt(x)", x=9.0) == 3.0
    assert ev("max(a, b) - min(a, b)", a=3.0, b=8.0) == 5.0
    assert ev("abs(0 - x)", x=4.5) == 4.5
    assert ev("floor(2.7) + ceil(2.2)") == 5.0
    assert ev("logn(2, 8)") == pytest.approx(3.0)
    assert ev("pow(2, 10)") == 1024.0
    assert ev("atan2(0, 1)") == 0.0
    assert ev("haversin(0, 0, 0, 0)") == 0.0
    assert expression_variables(
        parse_expression("a + sqrt(b) * my.field")
    ) == {"a", "b", "my.field"}
    with pytest.raises(ExpressionError):
        ev("nosuchfn(1)")
    with pytest.raises(ExpressionError):
        ev("sqrt(1, 2)")
    with pytest.raises(ExpressionError):
        ev("unbound + 1")
    with pytest.raises(ExpressionError):
        parse_expression("1 +")
    with pytest.raises(ExpressionError):
        parse_expression("(1")


def _random_node(rng: random.Random, depth: int) -> str:
    """Random expression SOURCE over the three-way-safe subset: exact
    IEEE arithmetic (+ - * / %), comparisons, boolean ops, conditional,
    & | ^ << >>, sqrt/abs/floor/ceil/min/max, positive-ish operands."""
    if depth <= 0 or rng.random() < 0.25:
        return rng.choice([
            "a", "b", "c", "3", "7.5", "0.25", "2", "0x1F", "011", "100",
        ])
    kind = rng.randint(0, 9)
    x = _random_node(rng, depth - 1)
    y = _random_node(rng, depth - 1)
    if kind == 0:
        return f"({x} {rng.choice(['+', '-', '*'])} {y})"
    if kind == 1:
        return f"({x} / (abs({y}) + 1.5))"
    if kind == 2:
        return f"({x} % (abs({y}) + 2.5))"
    if kind == 3:
        return f"({x} {rng.choice(['<', '<=', '>', '>=', '==', '!='])} {y})"
    if kind == 4:
        return f"({x} {rng.choice(['&&', '||'])} {y})"
    if kind == 5:
        z = _random_node(rng, depth - 1)
        return f"({x} ? {y} : {z})"
    if kind == 6:
        return f"({x} {rng.choice(['&', '|', '^'])} {y})"
    if kind == 7:
        return f"(({x}) {rng.choice(['<<', '>>'])} ({abs(hash(y)) % 5}))"
    if kind == 8:
        f = rng.choice(["sqrt(abs(%s))", "abs(%s)", "floor(%s)", "ceil(%s)",
                        "!(%s)", "~(%s)", "-(%s)"])
        return f % x
    return f"{rng.choice(['min', 'max'])}({x}, {y})"


def test_three_way_agreement(spark):
    """Python evaluator == Spark Column == DuckDB SQL over fuzzed
    expressions and variable rows (exact-arithmetic subset)."""
    import duckdb

    from pyspark.sql import functions as F

    rng = random.Random(5858)
    rows = [
        (float(a), float(b), float(c))
        for a, b, c in [
            (0, 0, 0), (1, 2, 3), (7.5, 0.25, 100), (12, 5, 63),
            (0.5, 1.5, 2.5), (33, 0.125, 9),
        ]
    ]
    sdf = spark.createDataFrame(rows, "a double, b double, c double")
    con = duckdb.connect()
    con.execute("CREATE TABLE t(a DOUBLE, b DOUBLE, c DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)

    exprs = [_random_node(rng, 3) for _ in range(40)] + [
        "a + b * c", "(a || b) ? sqrt(c) : -c", "a & 0x1F | (b > c)",
        "min(a, b) + max(b, c) % 3.5", "((a < b) + (b < c)) * 2",
    ]
    for src in exprs:
        node = parse_expression(src)
        py = [evaluate(node, {"a": a, "b": b, "c": c}) for a, b, c in rows]
        col = to_spark_column(
            node, {"a": F.col("a"), "b": F.col("b"), "c": F.col("c")})
        got_spark = [
            r[0] for r in sdf.select(col.alias("v")).collect()
        ]
        sql = to_duckdb_sql(node, {"a": "a", "b": "b", "c": "c"})
        got_duck = [r[0] for r in con.execute(
            f"SELECT {sql} FROM t").fetchall()]
        for i, (p, s, d) in enumerate(zip(py, got_spark, got_duck)):
            if math.isnan(p):
                assert s is None or math.isnan(s), (src, rows[i], p, s)
                assert d is None or math.isnan(d), (src, rows[i], p, d)
            else:
                assert s == pytest.approx(p, abs=0, rel=0), (src, rows[i], p, s)
                assert float(d) == p, (src, rows[i], p, d)
    con.close()
