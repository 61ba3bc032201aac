"""Flink-builtin compatibility: the functions the reference's models call
that Spark spells differently (SURVEY §2.8). All are expression-level
rewrites to Spark built-ins — JVM-side, codegen-friendly, no Python UDFs.

- ``TO_TIMESTAMP_LTZ(epoch_millis, 3)`` (``events_count.sql:22-23``)
  → ``timestamp_millis(epoch_millis)``
- ``TO_TIMESTAMP(str, fmt)`` (``http_events.sql:23``) — Flink uses Java
  SimpleDateFormat-style patterns; Spark's DateTimeFormatter patterns agree on
  the subset the reference uses (yyyy/MM/dd/HH/mm/ss + ``'T'`` literals), so
  translation is validation + passthrough.
- ``datenow()`` (``dbt/adapters/decodable/impl.py:143-148`` — the adapter's
  canonical current-date macro) → ``current_date()``
- ``CHAR_LENGTH`` (``tests/functional/adapter/simple/fixtures.py:27``) is
  native in Spark SQL already.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, SparkSession, functions as F

# Pattern letters shared (same meaning) by Flink's SimpleDateFormat-style and
# Spark's DateTimeFormatter-style datetime patterns.
_SHARED_PATTERN_LETTERS = set("yMdHmsSa")


def translate_timestamp_format(fmt: str) -> str:
    """Flink (Java SimpleDateFormat) → Spark (DateTimeFormatter) pattern.

    The reference's only observed pattern is
    ``yyyy-MM-dd'T'HH:mm:ss'Z'`` (``http_events.sql:23`` after SQL-literal
    unquoting); its letters mean the same in both dialects. Anything using
    letters outside the shared subset is rejected loudly rather than silently
    mis-parsing.
    """
    in_quote = False
    for ch in fmt:
        if ch == "'":
            in_quote = not in_quote
            continue
        if in_quote or not ch.isalpha():
            continue
        if ch not in _SHARED_PATTERN_LETTERS:
            raise ValueError(
                f"timestamp format letter {ch!r} in {fmt!r} has different semantics "
                "between Flink and Spark; translate explicitly"
            )
    return fmt


def to_timestamp_ltz(col: Column | str, precision: int = 3) -> Column:
    """``TO_TIMESTAMP_LTZ(x, p)``: epoch millis (p=3) / seconds (p=0) → timestamp."""
    c = F.col(col) if isinstance(col, str) else col
    if precision == 3:
        return F.timestamp_millis(c.cast("long"))
    if precision == 0:
        return F.timestamp_seconds(c.cast("long"))
    if precision == 6:
        return F.timestamp_micros(c.cast("long"))
    raise ValueError(f"unsupported TO_TIMESTAMP_LTZ precision {precision}")


def flink_to_timestamp(col: Column | str, fmt: str | None = None) -> Column:
    """``TO_TIMESTAMP(str[, fmt])`` with Flink-style format translation."""
    c = F.col(col) if isinstance(col, str) else col
    if fmt is None:
        return F.to_timestamp(c)
    return F.to_timestamp(c, translate_timestamp_format(fmt))


# --- SQL-string-level rewrites (used by the dialect shim) -------------------

_TO_TS_LTZ_RE = re.compile(r"\bTO_TIMESTAMP_LTZ\s*\(", re.IGNORECASE)
_DATENOW_RE = re.compile(r"\bdatenow\s*\(\s*\)", re.IGNORECASE)


def rewrite_function_calls(sql: str) -> str:
    """Rewrite Flink function spellings inside a SQL string to Spark ones.

    ``TO_TIMESTAMP_LTZ(x, 3)`` → ``timestamp_millis(CAST(x AS BIGINT))`` is
    handled by argument-aware substitution; ``datenow()`` → ``current_date()``.
    Both respect string literals and comments (a 'datenow()' inside a
    literal is data; a commented-out TO_TIMESTAMP_LTZ must not raise).
    """
    protected = _protected_spans(sql)
    out: list[str] = []
    pos = 0
    for m in _DATENOW_RE.finditer(sql):
        if any(s <= m.start() < e for s, e in protected):
            continue
        out.append(sql[pos : m.start()])
        out.append("current_date()")
        pos = m.end()
    out.append(sql[pos:])
    sql = "".join(out)

    protected = _protected_spans(sql)
    out = []
    pos = 0
    for m in _TO_TS_LTZ_RE.finditer(sql):
        if m.start() < pos or any(s <= m.start() < e for s, e in protected):
            continue
        out.append(sql[pos : m.start()])
        args, end = _read_args(sql, m.end())
        if len(args) == 1 or (len(args) == 2 and args[1].strip() == "3"):
            out.append(f"timestamp_millis(CAST({args[0].strip()} AS BIGINT))")
        elif len(args) == 2 and args[1].strip() == "0":
            out.append(f"timestamp_seconds(CAST({args[0].strip()} AS BIGINT))")
        else:
            raise ValueError(f"unsupported TO_TIMESTAMP_LTZ call: {sql[m.start():end]}")
        pos = end
    out.append(sql[pos:])
    sql = "".join(out)
    sql = _rewrite_split_index(sql)
    sql = _rewrite_base64(sql)
    sql = _rewrite_str_to_map(sql)
    sql = _rewrite_json_value(sql)
    return sql


_SPLIT_INDEX_RE = re.compile(r"\bSPLIT_INDEX\s*\(", re.IGNORECASE)
_TO_B64_RE = re.compile(r"\bTO_BASE64\s*\(", re.IGNORECASE)
_FROM_B64_RE = re.compile(r"\bFROM_BASE64\s*\(", re.IGNORECASE)
_STR_TO_MAP_RE = re.compile(r"\bSTR_TO_MAP\s*\(", re.IGNORECASE)


def _protected_spans(sql: str) -> list[tuple[int, int]]:
    """(start, end) spans of string literals and comments — function-name
    matches inside them are DATA, not calls, and must not be rewritten.
    (Kept in lockstep with dialect._comment_spans, which cannot be
    imported here without a cycle.)"""
    spans: list[tuple[int, int]] = []
    i, n = 0, len(sql)
    lit = re.compile(r"'(?:[^']|'')*'")
    while i < n:
        if sql[i] == "'":
            m = lit.match(sql, i)
            if m:
                spans.append((i, m.end()))
                i = m.end()
                continue
            i += 1
        elif sql.startswith("--", i):
            end = sql.find("\n", i)
            end = n if end == -1 else end
            spans.append((i, end))
            i = end
        elif sql.startswith("/*", i):
            end = sql.find("*/", i + 2)
            end = n if end == -1 else end + 2
            spans.append((i, end))
            i = end
        else:
            i += 1
    return spans


def _rewrite_calls(sql: str, pattern: re.Pattern, render) -> str:
    # Iterate to a fixed point: a single left-to-right pass consumes an
    # outer call's full argument span, so a nested occurrence of the SAME
    # function (SPLIT_INDEX(SPLIT_INDEX(…))) lands inside the consumed
    # region and is skipped — the next pass picks it up. Renders never
    # re-emit the Flink spelling, so this terminates; the cap is a guard.
    for _ in range(10):
        rewritten = _rewrite_calls_once(sql, pattern, render)
        if rewritten == sql:
            return sql
        sql = rewritten
    return sql


def _rewrite_calls_once(sql: str, pattern: re.Pattern, render) -> str:
    protected = _protected_spans(sql)
    out: list[str] = []
    pos = 0
    for m in pattern.finditer(sql):
        if m.start() < pos:  # overlapped a previously-rewritten span
            continue
        if any(s <= m.start() < e for s, e in protected):
            continue  # inside a string literal or comment
        out.append(sql[pos : m.start()])
        args, end = _read_args(sql, m.end())
        out.append(render([a.strip() for a in args]))
        pos = end
    out.append(sql[pos:])
    return "".join(out)


def _rewrite_split_index(sql: str) -> str:
    """``SPLIT_INDEX(s, d, i)`` (Flink: plain-string delimiter, 0-based,
    NULL out of range) → ``split(s, '\\Qd\\E')[i]``. Spark's ``split``
    takes a REGEX, so the delimiter is \\Q…\\E-quoted — without it a ``|``
    or ``.`` delimiter silently splits on everything. Spark's ``[]`` on a
    split result is 0-based and NULL out of range under ANSI-off — the
    Flink semantics."""
    return _rewrite_calls(
        sql,
        _SPLIT_INDEX_RE,
        lambda a: f"split({a[0]}, concat('\\\\Q', {a[1]}, '\\\\E'))[{a[2]}]",
    )


def _rewrite_base64(sql: str) -> str:
    """``TO_BASE64(s)`` → ``base64(s)``; ``FROM_BASE64(s)`` →
    ``CAST(unbase64(s) AS STRING)`` (Flink returns STRING, Spark's
    ``unbase64`` returns BINARY)."""
    sql = _rewrite_calls(sql, _TO_B64_RE, lambda a: f"base64({a[0]})")
    return _rewrite_calls(
        sql, _FROM_B64_RE, lambda a: f"CAST(unbase64({a[0]}) AS STRING)"
    )


_JSON_VALUE_RE = re.compile(r"\bJSON_VALUE\s*\(", re.IGNORECASE)


def _rewrite_json_value(sql: str) -> str:
    """``JSON_VALUE(doc, path)`` (SQL/JSON, Flink ≥1.15) →
    ``get_json_object(doc, path)``. Both return VARCHAR (Flink's default
    RETURNING clause) and NULL on a missing path; RETURNING/ON EMPTY
    clauses are not supported — fail loudly rather than mis-translate."""

    def render(a: list[str]) -> str:
        if len(a) != 2 or re.search(r"\bRETURNING\b|\bON\s+(EMPTY|ERROR)\b", " ".join(a), re.I):
            raise ValueError(
                "JSON_VALUE: only the 2-arg VARCHAR form is supported; "
                f"got JSON_VALUE({', '.join(a)})"
            )
        return f"get_json_object({a[0]}, {a[1]})"

    return _rewrite_calls(sql, _JSON_VALUE_RE, render)


def _rewrite_str_to_map(sql: str) -> str:
    """``STR_TO_MAP(s)`` → ``str_to_map(s, ',', '=')``: the function is
    name-compatible but the DEFAULT delimiters differ (Flink ``,``/``=``,
    Spark ``,``/``:``) — a silent wrong-answer without the injection.
    Explicit-delimiter calls pass through unchanged."""

    def render(a: list[str]) -> str:
        if len(a) == 1:
            return f"str_to_map({a[0]}, ',', '=')"
        return f"str_to_map({', '.join(a)})"

    return _rewrite_calls(sql, _STR_TO_MAP_RE, render)


def _read_args(sql: str, start: int) -> tuple[list[str], int]:
    """Split the argument list starting just after ``(``; returns (args, index
    one past the closing paren). Handles nested parens and string literals."""
    depth = 1
    args: list[str] = []
    cur: list[str] = []
    i = start
    while i < len(sql):
        ch = sql[i]
        if ch == "'":
            j = i + 1
            while j < len(sql):
                if sql[j] == "'" and not (j + 1 < len(sql) and sql[j + 1] == "'"):
                    break
                j += 2 if sql[j] == "'" else 1
            cur.append(sql[i : j + 1])
            i = j + 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                args.append("".join(cur))
                return args, i + 1
        elif ch == "," and depth == 1:
            args.append("".join(cur))
            cur = []
            i += 1
            continue
        cur.append(ch)
        i += 1
    raise ValueError(f"unbalanced parentheses in SQL: {sql[start:]!r}")


def register_flink_functions(spark: SparkSession) -> None:
    """Make Flink spellings callable from ``spark.sql`` directly.

    ``CHAR_LENGTH`` is Spark-native. ``TO_TIMESTAMP_LTZ``/``datenow``/``grok``
    are handled by the dialect shim's string rewrites (keeping them JVM
    expressions); nothing needs a Python UDF.
    """
    # No-op today: every compat function is an expression rewrite, which the
    # dialect shim applies before parsing. Kept as the registration hook for
    # future true UDFs.
    return None
