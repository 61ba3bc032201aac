"""``grok(value, pattern)`` — the Decodable platform builtin used by the
reference's example models (``http_events.sql:42-45``,
``http_events_bytes_sent.sql:18-21``), which parse an Envoy access-log line
into a ``MAP<STRING, STRING>``.

Spark-first design (SURVEY §7.5): compile the grok pattern *once* on the
driver into a plain regex + ordered field-name list, then evaluate as native
``regexp_extract`` expressions (JVM, whole-stage codegen) — one expression per
extracted field, assembled into a map with ``F.create_map`` when map-shaped
output is needed. No Python UDF anywhere, so the hot path stays vectorized at
100 TB.

The bundled pattern library is the public grok pattern subset the example
project needs (TIMESTAMP_ISO8601, DATA, NUMBER, INT, WORD, NOTSPACE, ...),
written against Java-regex/RE2-compatible syntax (no backrefs/lookaheads) so
the same compiled regex runs in Spark and in a DuckDB oracle.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F

# Public grok base patterns (subset; non-capturing groups only so compiled
# group numbering stays stable).
GROK_PATTERNS: dict[str, str] = {
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "BASE10NUM": r"[+-]?(?:\d+(?:\.\d+)?|\.\d+)",
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "QUOTEDSTRING": r"\"[^\"]*\"",
    "IP": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
    "IPORHOST": r"(?:\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}|[0-9A-Za-z][0-9A-Za-z\-\.]*)",
    "HOSTPORT": r"(?:\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}|[0-9A-Za-z][0-9A-Za-z\-\.]*):\d+",
    "YEAR": r"\d{4}",
    "MONTHNUM": r"(?:0?[1-9]|1[0-2])",
    "MONTHDAY": r"(?:0?[1-9]|[12]\d|3[01])",
    "HOUR": r"(?:[01]?\d|2[0-3])",
    "MINUTE": r"[0-5]\d",
    "SECOND": r"(?:[0-5]?\d)(?:\.\d+)?",
    "TIME": r"(?:[01]?\d|2[0-3]):[0-5]\d:(?:[0-5]?\d)(?:\.\d+)?",
    "TIMESTAMP_ISO8601": (
        r"\d{4}-(?:0?[1-9]|1[0-2])-(?:0?[1-9]|[12]\d|3[01])"
        r"[T ](?:[01]?\d|2[0-3]):?[0-5]\d(?::?(?:[0-5]?\d)(?:\.\d+)?)?"
        r"(?:Z|[+-](?:[01]?\d|2[0-3])(?::?[0-5]\d)?)?"
    ),
    "LOGLEVEL": r"(?:TRACE|DEBUG|INFO|WARN|ERROR|FATAL)",
    "UUID": r"[0-9a-fA-F]{8}-(?:[0-9a-fA-F]{4}-){3}[0-9a-fA-F]{12}",
}

_GROK_REF = re.compile(r"%\{(\w+)(?::(\w+))?\}")


class GrokError(ValueError):
    pass


def compile_pattern(pattern: str) -> tuple[str, list[str]]:
    """Compile a grok pattern into ``(regex, field_names)``.

    Fields come out as *plain* capturing groups in order — field ``i`` is
    regex group ``i + 1`` — so the identical regex string works with Spark's
    ``regexp_extract(col, regex, i+1)`` and any other POSIX-regex engine.
    Unnamed references (``%{INT}``) are inlined without a capture group.
    """
    names: list[str] = []

    def sub(m: re.Match) -> str:
        pat_name, field = m.group(1), m.group(2)
        try:
            base = GROK_PATTERNS[pat_name]
        except KeyError:
            raise GrokError(f"unknown grok pattern %{{{pat_name}}}") from None
        if field is None:
            return f"(?:{base})"
        names.append(field)
        return f"({base})"

    regex = _GROK_REF.sub(sub, pattern)
    # verify it compiles and group count matches
    compiled = re.compile(regex)
    if compiled.groups != len(names):
        raise GrokError(
            f"pattern contains raw capturing groups; use non-capturing (?:...): {pattern!r}"
        )
    return regex, names


def grok_columns(col: Column | str, pattern: str) -> dict[str, Column]:
    """Extract each grok field as its own StringType column (the fast shape —
    downstream projections prune unused fields at the scan)."""
    regex, names = compile_pattern(pattern)
    c = F.col(col) if isinstance(col, str) else col
    return {name: F.regexp_extract(c, regex, i + 1) for i, name in enumerate(names)}


# Unit separator — cannot appear in log text (control char); used to pack all
# capture groups into one string so a single regex execution extracts every
# field.
_SEP = "\x1f"


def grok_array(col: Column | str, pattern: str) -> tuple[list[str], Column]:
    """All grok fields in ONE regex execution.

    ``regexp_extract`` re-runs the whole match once per group, so an n-field
    pattern costs n+1 executions per row. Instead, rewrite the first match
    into its capture groups joined by ``_SEP`` (one ``regexp_replace``), then
    ``split`` — 2 regex runs per row regardless of field count. Returns
    ``(field_names, array_column)``; the array is NULL on non-matching rows
    (platform semantics)."""
    regex, names = compile_pattern(pattern)
    c = F.col(col) if isinstance(col, str) else col
    if not names:
        return names, F.when(c.rlike(regex), F.array().cast("array<string>"))
    repl = _SEP.join(f"${i + 1}" for i in range(len(names)))
    consumed = "(?s)^.*?" + regex + ".*$"
    arr = F.split(F.regexp_replace(c, consumed, repl), _SEP, -1)
    if len(names) == 1:
        # a non-match passes through unchanged with 0 separators — identical
        # to a 1-field match, so the size test can't discriminate here
        return names, F.when(c.rlike(regex), arr)
    # Match detection WITHOUT a second regex run: a non-matching line passes
    # through regexp_replace unchanged, and real text never contains the
    # control char _SEP, so "split produced exactly n fields" ⇔ "matched".
    # (Codegen subexpression elimination evaluates `arr` once per operator.)
    # Caveat: input that already contains exactly n-1 U+001F chars and does
    # not match would be misread — impossible for textual log data.
    return names, F.when(F.size(arr) == len(names), arr)


def grok_extract(df: DataFrame, col: str, pattern: str) -> DataFrame:
    """Filter to matching rows and append one StringType column per grok
    field — the FAST path for "parse then project" pipelines.

    Exactly two regex executions per row: the match test (cheap ``rlike``
    filter on the raw attribute — nothing for the optimizer to substitute)
    and the group rewrite. The packed-array projection is aliased once and
    extracted in a second Project; the multi-reference stops CollapseProject
    from inlining the regex per field, and no filter sits above it to get
    pushed through. Grok field names shadow same-named input columns."""
    regex, names = compile_pattern(pattern)
    c = F.col(col)
    matched = df.where(c.rlike(regex))
    if not names:
        return matched
    repl = _SEP.join(f"${i + 1}" for i in range(len(names)))
    arr = F.split(F.regexp_replace(c, "(?s)^.*?" + regex + ".*$", repl), _SEP, -1)
    packed = matched.select("*", arr.alias("__grok"))
    keep = [F.col(x) for x in df.columns if x not in names]
    fields = [F.col("__grok")[i].alias(nm) for i, nm in enumerate(names)]
    return packed.select(*keep, *fields)


def grok_map(col: Column | str, pattern: str) -> Column:
    """``grok()`` proper: MAP<STRING, STRING> of field → extracted text, NULL
    when the line doesn't match (platform semantics).

    NOTE: callers projecting several fields from the result should alias the
    map ONCE (``.select(grok_map(...).alias("g"))``) and extract from the
    alias in a second projection — multi-referencing the raw expression
    re-runs it per reference (CollapseProject only dedups attribute refs)."""
    names, arr = grok_array(col, pattern)
    # map_from_arrays is null-intolerant: NULL array (non-match) → NULL map
    return F.map_from_arrays(F.array(*[F.lit(n) for n in names]), arr)
