"""As-of (temporal) join — ``FOR SYSTEM_TIME AS OF`` surface (SURVEY §2.3,
§7.6). Spark has no native as-of join; two implementations:

- :func:`asof_join` — the **merge** technique: union left probes and right
  quotes, one sort per key partition, forward-fill the latest right value.
  One shuffle on the key, no theta join, no per-key quadratic blowup — the
  100 TB path (this is how kdb/pandas merge_asof semantics decompose onto a
  shuffle engine).
- :func:`asof_join_pandas` — ``applyInPandas`` + ``pandas.merge_asof`` per
  key group; simpler, Arrow-batched, right answer when per-key data fits in
  memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tolerance: str | None = None,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` within the same ``on`` key.

    Output: all left columns + ``value_cols`` from the right (null when no
    quote precedes the probe). ``tolerance``: an INTERVAL string limiting
    staleness (e.g. ``'7 days'``). ``tiebreak_cols``: right-side columns
    deciding WHICH quote wins among several at the same ``(key, ts)`` —
    the one greatest by the tiebreak (ascending in the fill order, so the
    last tied row wins); without it tied quotes are partition-order
    nondeterministic, which poisons any pinned-result comparison.

    NULL semantics match ``pandas.merge_asof`` / a LATERAL ``<=`` probe:
    a quote with a NULL timestamp can never satisfy ``right_ts <=
    left_ts`` and is excluded (not treated as "earliest"), a NULL-keyed
    quote matches no probe (join equality, NULL ≠ NULL), and a probe with
    a NULL timestamp or NULL key gets NULL value columns.
    """
    lcols = left.columns
    tbs = list(tiebreak_cols or [])
    probes = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_probe"),
        F.struct(*lcols).alias("__l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in value_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__rts"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__tb{i}")
            for i, c in enumerate(tbs)
        ],
    )
    quotes = right.filter(
        F.col(right_ts).isNotNull() & F.col(on).isNotNull()
    ).select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_probe"),
        F.lit(None).cast(probes.schema["__l"].dataType).alias("__l"),
        *value_cols,
        F.col(right_ts).alias("__rts"),
        *[F.col(c).alias(f"__tb{i}") for i, c in enumerate(tbs)],
    )
    # quotes sort before probes at the same instant (<= semantics)
    merged = quotes.unionByName(probes)
    # carry the LATEST QUOTE ROW as one struct, not per-column last():
    # last(value, ignorenulls) cannot distinguish probe-padding NULLs from a
    # genuine NULL in the latest quote, and would forward-fill PAST it to a
    # stale older value — merge_asof (and asof_join_pandas) return the
    # latest quote's NULL. The struct is non-null on every quote row.
    merged = merged.withColumn(
        "__vals",
        F.when(
            F.col("__is_probe") == 0,
            F.struct(*[F.col(c).alias(c) for c in value_cols]),
        ),
    )
    w = (
        W.partitionBy("__k")
        .orderBy(
            F.col("__ts"),
            F.col("__is_probe"),
            *[F.col(f"__tb{i}") for i in range(len(tbs))],
        )
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = merged.select(
        "__is_probe",
        "__l",
        F.last("__rts", ignorenulls=True).over(w).alias("__last_rts"),
        F.last("__vals", ignorenulls=True).over(w).alias("__vals"),
    ).filter(F.col("__is_probe") == 1)
    if tolerance is not None:
        fresh = F.col("__last_rts") >= F.col("__l." + left_ts) - F.expr(
            f"INTERVAL {tolerance}"
        )
        filled = filled.select(
            "__l",
            *[
                F.when(fresh, F.col(f"__vals.{c}")).otherwise(F.lit(None)).alias(c)
                for c in value_cols
            ],
        )
    else:
        filled = filled.select(
            "__l", *[F.col(f"__vals.{c}").alias(c) for c in value_cols]
        )
    return filled.select(*[F.col(f"__l.{c}").alias(c) for c in lcols], *value_cols)


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """merge_asof per key group via applyInPandas (Arrow-batched). Same
    NULL and tie semantics as :func:`asof_join`: NULL-timestamped or
    NULL-keyed quotes match nothing (merge_asof raises outright on null
    merge keys — they are segregated, not crashed on), NULL-timestamped
    probes get NULL value columns, and ``tiebreak_cols`` decide which of
    several same-timestamp quotes wins (greatest tiebreak)."""
    import pandas as pd

    # build output schema: left columns + value columns
    from pyspark.sql import types as T

    fields = list(left.schema.fields) + [right.schema[c] for c in value_cols]
    out_schema = T.StructType(fields)
    tbs = list(tiebreak_cols or [])

    l2 = left.withColumn("__side", F.lit("l"))
    r2 = right.filter(
        F.col(right_ts).isNotNull() & F.col(on).isNotNull()
    ).select(
        F.col(on), F.col(right_ts).alias(left_ts), *value_cols,
        *[F.col(c).alias(f"__tb{i}") for i, c in enumerate(tbs)],
    ).withColumn("__side", F.lit("r"))
    both = l2.unionByName(r2, allowMissingColumns=True)

    lcols = left.columns

    def merge(key, pdf: pd.DataFrame):
        lp = pdf[pdf["__side"] == "l"][lcols]
        rp = pdf[pdf["__side"] == "r"][
            [left_ts, *value_cols, *[f"__tb{i}" for i in range(len(tbs))]]
        ].sort_values(
            # na_position='first' matches Spark's ascending NULLS FIRST:
            # drop_duplicates(keep='last') must pick the greatest non-NULL
            # tiebreak quote, exactly like the window form (ADVICE r10 —
            # pandas' default NaN-last put the NULL-tiebreak quote last
            # and reintroduced the nondeterminism tiebreak_cols removes)
            [left_ts, *[f"__tb{i}" for i in range(len(tbs))]],
            na_position="first",
        )
        if len(lp) == 0:
            return pd.DataFrame(columns=[*lcols, *value_cols])
        # merge_asof refuses null merge keys — probe rows with a NULL
        # timestamp can match nothing, so they bypass the merge and come
        # back with NULL value columns
        null_ts = lp[left_ts].isna()
        lp_ok = lp[~null_ts].sort_values(left_ts)
        out_parts = []
        if len(lp_ok):
            merged = pd.merge_asof(
                lp_ok, rp.drop_duplicates(subset=[left_ts], keep="last"),
                on=left_ts, direction="backward",
            )
            out_parts.append(merged[[*lcols, *value_cols]])
        if null_ts.any():
            lp_null = lp[null_ts].copy()
            for c in value_cols:
                lp_null[c] = None
            out_parts.append(lp_null[[*lcols, *value_cols]])
        return pd.concat(out_parts, ignore_index=True)

    return both.groupBy(on).applyInPandas(merge, schema=out_schema)
