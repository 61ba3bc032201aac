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
- backtick identifiers and ``m['key']`` map access parse natively in Spark,
- Flink windowing TVFs (``TABLE(TUMBLE(TABLE t, DESCRIPTOR(ts),
  INTERVAL '10' MINUTES))`` and HOP/SESSION) → derived tables that add the
  TVF's ``window_start``/``window_end`` columns, so the surrounding
  ``GROUP BY window_start, window_end`` SQL runs unchanged (see
  :func:`rewrite_window_tvfs`).
"""

from __future__ import annotations

import re

from dbt_decodable_spark.functions.flink_compat import (
    _protected_spans,
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


def _in_span(spans: list[tuple[int, int]], pos: int) -> bool:
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
    # literals AND comments are protected: 'grok(' inside a string is data
    protected = _protected_spans(sql)
    for m in _GROK_RE.finditer(sql):
        if m.start() < pos or _in_span(protected, m.start()):
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


_TVF_RE = re.compile(
    r"\bTABLE\s*\(\s*(TUMBLE|HOP|SESSION|CUMULATE)\s*\(", re.IGNORECASE
)
_INTERVAL_ARG_RE = re.compile(
    r"^INTERVAL\s+'([0-9]+(?:\.[0-9]+)?)'\s+(SECOND|MINUTE|HOUR|DAY)S?$",
    re.IGNORECASE,
)
_DESCRIPTOR_RE = re.compile(r"^DESCRIPTOR\s*\(\s*(.+?)\s*\)$", re.IGNORECASE | re.DOTALL)
_TABLE_ARG_RE = re.compile(
    r"^TABLE\s+(?P<rel>[^\s]+)(?:\s+PARTITION\s+BY\s+(?P<keys>.+))?$",
    re.IGNORECASE | re.DOTALL,
)


def _interval_to_duration(arg: str) -> str:
    """``INTERVAL '10' MINUTES`` → Spark duration string ``'10 minutes'``."""
    m = _INTERVAL_ARG_RE.fullmatch(arg.strip())
    if not m:
        raise ValueError(
            f"window TVF size must be INTERVAL '<n>' SECOND/MINUTE/HOUR/DAY: {arg!r}"
        )
    return f"{m.group(1)} {m.group(2).lower()}s"


def _tvf_parts(fn: str, argtext: str) -> tuple[str, str | None, str, list[str]]:
    """Parse TVF args → (relation, partition_keys, time_col, interval args)."""
    args = _split_args(argtext)
    if len(args) < 3:
        raise ValueError(f"{fn} TVF needs (TABLE t, DESCRIPTOR(ts), INTERVAL...): {argtext!r}")
    tm = _TABLE_ARG_RE.fullmatch(args[0].strip())
    if not tm:
        raise ValueError(f"{fn} TVF first arg must be TABLE <relation>: {args[0]!r}")
    dm = _DESCRIPTOR_RE.fullmatch(args[1].strip())
    if not dm:
        raise ValueError(f"{fn} TVF second arg must be DESCRIPTOR(<time col>): {args[1]!r}")
    return tm.group("rel"), tm.group("keys"), dm.group(1), args[2:]


def rewrite_window_tvfs(sql: str) -> str:
    """Rewrite Flink windowing TVFs into Spark-parseable derived tables.

    The reference platform accepts Flink window TVF SQL (models ship
    verbatim to Flink, ``decodable/client/client.py:364-373``); Spark has no
    TVF spelling, but the SEMANTICS map exactly:

    - ``TUMBLE(TABLE t, DESCRIPTOR(ts), size)`` / ``HOP(..., slide, size)``
      → ``window(ts, size[, slide])`` projected in a subquery; Catalyst's
      TimeWindowing rule turns the projection into the same per-row window
      assignment (tumble) or row replication (hop) as the TVF, and the
      query's ``GROUP BY window_start, window_end`` works untouched.
      NOTE Flink's HOP arg order is (slide, size); Spark's window() is
      (size, slide) — swapped here.
    - ``SESSION(TABLE t [PARTITION BY k], DESCRIPTOR(ts), gap)`` → the
      classic batch session computation: flag rows that start a new session
      (gap exceeded), prefix-sum the flags into a session id, then
      min/max-extend per session — all window functions, no UDF. Matches
      ``F.session_window`` (window_end = last event + gap).
    - ``CUMULATE(TABLE t, DESCRIPTOR(ts), step, size)`` → size-aligned
      ``window()`` start + ``LATERAL VIEW explode(sequence(...))`` over the
      not-yet-closed step ends — the same row expansion the DataFrame
      cumulate operator (queries/relational2.py) does with a broadcast join.
    """
    out, pos = [], 0
    # literals AND comments are protected: 'TABLE(TUMBLE(' inside a string
    # literal is data, not a windowing TVF
    protected = _protected_spans(sql)
    for m in _TVF_RE.finditer(sql):
        if m.start() < pos or _in_span(protected, m.start()):
            continue
        fn = m.group(1).upper()
        argtext, inner_end = _find_call(sql, m)
        # consume the closing paren of the outer TABLE(
        rest = sql[inner_end:]
        stripped = rest.lstrip()
        if not stripped.startswith(")"):
            raise ValueError(f"malformed TABLE({fn}(...)): expected ')' after TVF call")
        end = inner_end + (len(rest) - len(stripped)) + 1
        rel, keys, ts, ivals = _tvf_parts(fn, argtext)
        out.append(sql[pos : m.start()])
        if fn == "CUMULATE":
            # Flink arg order: (step, size). Each row belongs to every
            # not-yet-closed step of its size-aligned window: window_start =
            # tumble(size) start, window_end ∈ {start + k·step | end > ts}.
            # Row-expansion via explode(sequence(...)) — the same broadcast
            # join-free shape as the DataFrame cumulate operator.
            if len(ivals) != 2:
                raise ValueError(f"CUMULATE takes (step, size) INTERVALs, got {ivals!r}")
            step, size = (_interval_to_duration(v) for v in ivals)
            out.append(
                f"(SELECT * EXCEPT (__w, __end), __w.start AS window_start, "
                f"__end AS window_end FROM "
                f"(SELECT *, window({ts}, '{size}') AS __w FROM {rel}) "
                f"LATERAL VIEW explode(sequence(__w.start + INTERVAL '{step}', "
                f"__w.start + INTERVAL '{size}', INTERVAL '{step}')) AS __end "
                f"WHERE __end > {ts})"
            )
        elif fn in ("TUMBLE", "HOP"):
            if fn == "TUMBLE":
                if len(ivals) != 1:
                    raise ValueError(f"TUMBLE takes one INTERVAL, got {ivals!r}")
                win = f"window({ts}, '{_interval_to_duration(ivals[0])}')"
            else:
                if len(ivals) != 2:
                    raise ValueError(f"HOP takes (slide, size) INTERVALs, got {ivals!r}")
                slide, size = ivals  # Flink order
                win = (
                    f"window({ts}, '{_interval_to_duration(size)}', "
                    f"'{_interval_to_duration(slide)}')"
                )
            out.append(
                f"(SELECT * EXCEPT (__w), __w.start AS window_start, "
                f"__w.end AS window_end FROM "
                f"(SELECT *, {win} AS __w FROM {rel}))"
            )
        else:  # SESSION
            if len(ivals) != 1:
                raise ValueError(f"SESSION takes one gap INTERVAL, got {ivals!r}")
            gap = _interval_to_duration(ivals[0])
            part = f"PARTITION BY {keys} " if keys else ""
            sess_part = f"PARTITION BY {keys}, __sess_id" if keys else "PARTITION BY __sess_id"
            # ties on ts need no tie-break: equal timestamps are always
            # within the (positive) gap, so their flag is 0 either way
            out.append(
                f"(SELECT * EXCEPT (__sess_id), "
                f"min({ts}) OVER ({sess_part}) AS window_start, "
                f"max({ts}) OVER ({sess_part}) "
                f"+ INTERVAL '{gap}' AS window_end FROM "
                f"(SELECT * EXCEPT (__prev_ts), "
                f"sum(CASE WHEN __prev_ts IS NOT NULL AND "
                f"{ts} <= __prev_ts + INTERVAL '{gap}' THEN 0 ELSE 1 END) "
                f"OVER ({part}ORDER BY {ts} "
                f"ROWS UNBOUNDED PRECEDING) AS __sess_id FROM "
                f"(SELECT *, lag({ts}) OVER ({part}ORDER BY {ts}) "
                f"AS __prev_ts FROM {rel})))"
            )
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
    sql = rewrite_window_tvfs(sql)
    sql = validate_to_timestamp_formats(sql)
    return sql
