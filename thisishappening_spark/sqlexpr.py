"""Helpers for building Spark-SQL expression *strings*.

r21 convention: hot operators build repetitive expression families as
parsed SQL strings (one Py4J round trip via ``F.expr``/``selectExpr``)
instead of nested Column operators (one round trip per operator, profiled
at 60-80% of query-construction time — which the bench pays on every
timed run). The strings must produce the exact expression tree the Column
form did, so literals are rendered with explicit types: ``flit`` for
DOUBLE (Column ``F.lit(float)``), ``sql_str`` for string literals with
Spark's backslash escaping.
"""

from __future__ import annotations


def sql_str(s: str) -> str:
    """Render a Python string as a Spark-SQL single-quoted literal.
    Spark SQL string literals process backslash escapes (non-ANSI-string
    mode), so both the backslash and the quote must be escaped — regex
    fragments like ``\\berror\\b`` round-trip exactly."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def ident(name: str) -> str:
    """Backtick-quote a column name for interpolation into parsed SQL
    (embedded backticks escape by doubling, Spark's rule). Caller-supplied
    names (config column bindings) may contain spaces, hyphens or reserved
    words that ``F.col()`` accepted but a bare interpolation would
    mis-parse; the quoted form resolves to the identical attribute."""
    return "`" + name.replace("`", "``") + "`"


def in_list(col: str, rendered: list[str]) -> str:
    """``col IN (...)`` over pre-rendered literals, with the empty list
    compiling to ``FALSE`` — the always-false predicate
    ``Column.isin([])`` produced, where ``IN ()`` is a ParseException."""
    return f"{col} IN ({', '.join(rendered)})" if rendered else "FALSE"


def flit(x: float) -> str:
    """Render a Python float as a Spark-SQL DOUBLE literal (the ``D``
    suffix), matching ``F.lit(<float>)`` typing — a bare ``-71.15`` would
    parse as DECIMAL(4,2) and change comparison coercions."""
    return f"{float(x)!r}D"
