"""Flink-SQL → Spark-SQL dialect shim (SURVEY §4 item 1).

The reference ships SQL strings verbatim to Flink; the only local rewrites it
performs are ``!=`` → ``<>`` (``dbt/adapters/decodable/impl.py:637-639``) and
``INSERT INTO`` wrapping (``impl.py:690-692``). Our engine needs the inverse
direction: accept the Flink SQL the reference's models are written in and
hand Catalyst something it parses. String-level, pre-parse, by design — not a
Catalyst rule (SURVEY §4: "a pre-parse SQL normalizer + function registry is
idiomatic").

Handled spellings:

- ``!=`` → ``<>`` (kept for reference parity; Spark accepts both),
- ``TO_TIMESTAMP_LTZ(x, p)`` → ``timestamp_millis/seconds/micros`` ,
- ``datenow()`` → ``current_date()``,
- ``grok(col, 'pattern')`` → an inline ``CASE WHEN rlike THEN map(...)``
  expression of native ``regexp_extract`` calls (no UDF),
- ``TO_TIMESTAMP(str, 'fmt')`` → validated format passthrough,
- backtick identifiers and ``m['key']`` map access parse natively in Spark.
"""

from __future__ import annotations

import re

from dbt_decodable_spark.functions.flink_compat import (
    rewrite_function_calls,
    translate_timestamp_format,
)
from dbt_decodable_spark.functions.grok import compile_pattern

_NEQ_RE = re.compile(r"!=")
_GROK_RE = re.compile(r"\bgrok\s*\(", re.IGNORECASE)
_TO_TS_RE = re.compile(r"\bTO_TIMESTAMP\s*\(", re.IGNORECASE)
_STRING_LIT = re.compile(r"'((?:[^']|'')*)'")


def _sql_escape_regex(regex: str) -> str:
    """Embed a regex in a Spark SQL string literal (backslashes double)."""
    return regex.replace("\\", "\\\\").replace("'", "''")


def _comment_spans(sql: str) -> list[tuple[int, int]]:
    """(start, end) spans of ``--``-to-EOL and ``/* */`` comments, tracked
    outside string literals (a ``--`` inside a literal is data, and a quote
    inside a comment doesn't open a string)."""
    spans: list[tuple[int, int]] = []
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch == "'":
            m = _STRING_LIT.match(sql, i)
            i = m.end() if m else i + 1
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


def _in_comment(spans: list[tuple[int, int]], pos: int) -> bool:
    return any(s <= pos < e for s, e in spans)


def _split_args(arglist: str) -> list[str]:
    """Split a SQL argument list on top-level commas."""
    args, depth, cur, i = [], 0, [], 0
    while i < len(arglist):
        ch = arglist[i]
        if ch == "'":
            m = _STRING_LIT.match(arglist, i)
            if m:
                cur.append(m.group(0))
                i = m.end()
                continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            args.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
        i += 1
    if cur:
        args.append("".join(cur).strip())
    return args


def _find_call(sql: str, m: re.Match) -> tuple[str, int]:
    """From a match at ``name(``, return (argument text, end index past ')')."""
    depth, i = 1, m.end()
    start = i
    while i < len(sql):
        ch = sql[i]
        if ch == "'":
            lm = _STRING_LIT.match(sql, i)
            if lm:
                i = lm.end()
                continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return sql[start:i], i + 1
        i += 1
    raise ValueError(f"unbalanced parentheses after {m.group(0)!r}")


def rewrite_grok(sql: str) -> str:
    """``grok(col, 'pattern')`` → native map-of-regexp_extract expression."""
    out, pos = [], 0
    comments = _comment_spans(sql)
    for m in _GROK_RE.finditer(sql):
        if m.start() < pos or _in_comment(comments, m.start()):
            continue
        out.append(sql[pos : m.start()])
        argtext, end = _find_call(sql, m)
        args = _split_args(argtext)
        if len(args) != 2:
            raise ValueError(f"grok() takes (value, pattern): {argtext!r}")
        col, pat_lit = args
        pm = _STRING_LIT.fullmatch(pat_lit)
        if not pm:
            raise ValueError(f"grok() pattern must be a string literal: {pat_lit!r}")
        pattern = pm.group(1).replace("''", "'")
        regex, names = compile_pattern(pattern)
        esc = _sql_escape_regex(regex)
        entries = ", ".join(
            f"'{name}', regexp_extract({col}, '{esc}', {i + 1})"
            for i, name in enumerate(names)
        )
        out.append(f"(CASE WHEN {col} RLIKE '{esc}' THEN map({entries}) END)")
        pos = end
    out.append(sql[pos:])
    return "".join(out)


def validate_to_timestamp_formats(sql: str) -> str:
    """Check every TO_TIMESTAMP(str, 'fmt') format is Flink/Spark-shared."""
    for m in _TO_TS_RE.finditer(sql):
        argtext, _ = _find_call(sql, m)
        args = _split_args(argtext)
        if len(args) == 2:
            lm = _STRING_LIT.fullmatch(args[1])
            if lm:
                translate_timestamp_format(lm.group(1).replace("''", "'"))
    return sql


def normalize(sql: str) -> str:
    """Full dialect normalization pipeline: Flink SQL in, Spark SQL out."""
    sql = _NEQ_RE.sub("<>", sql)  # impl.py:637-639 parity
    sql = rewrite_function_calls(sql)  # TO_TIMESTAMP_LTZ, datenow
    sql = rewrite_grok(sql)
    sql = validate_to_timestamp_formats(sql)
    return sql
