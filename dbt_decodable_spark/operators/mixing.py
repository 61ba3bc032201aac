"""Source-mix construction for training-data pipelines (SURVEY §2.12).

Training corpora are blended to target token budgets per source/language
("20k tokens of English web, 8k of zh, 8k of es"). The operator takes docs
in a deterministic per-stratum priority order (md5 of the key — the same
engine-portable hash the sampling operators use) and keeps each stratum's
prefix until its token budget fills.

Built on :func:`~dbt_decodable_spark.operators.packing.grouped_running_sum`
— the two-phase distributed prefix sum partitioned by stratum, so no single
window task ever sees a whole stratum (at 100 TB a stratum IS the corpus:
"en" can be 80% of the data). The budget table is broadcast; everything
else is the prefix sum's two shuffles.

Boundary rule matches the shard packer: a doc is kept iff its token
interval *starts* inside the budget (``cum - w < budget``), so each
stratum ends with ≥ budget tokens and the kept set is a prefix of the
priority order — stable under corpus growth (new docs only append to the
priority tail of their stratum... unless they hash earlier, which is the
same nested-keep-set property the hash sampler documents).

The reference (decodableco/dbt-decodable) has no mixing surface; part of
the driver-mandated training-data extension set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dbt_decodable_spark.operators.packing import grouped_running_sum

PRIORITY_COL = "__mix_priority"


def mix_by_token_budget(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    weight_col: str,
    budgets: dict[str, int],
    cum_col: str = "cum_weight",
) -> DataFrame:
    """Keep each stratum's deterministic-priority prefix of rows whose
    cumulative ``weight_col`` fits the stratum's budget. Strata without a
    configured budget are dropped. Output: input columns + ``cum_col``
    (the running token count within the stratum, in priority order)."""
    spark = df.sparkSession
    from dbt_decodable_spark.operators.sampling import _key_hash

    # ONE definition of the hash gate (sampling._key_hash) — an inline
    # copy here could drift from sample membership, silently decoupling
    # mix priorities from the sampling operators they're documented to
    # share the hash with
    pri = _key_hash(F.col(key_col))
    cum = grouped_running_sum(
        df.withColumn(PRIORITY_COL, pri),
        order_cols=[PRIORITY_COL, key_col],
        weight_col=weight_col,
        out_col=cum_col,
        group_cols=[stratum_col],
    )
    bud = spark.createDataFrame(
        sorted(budgets.items()), f"{stratum_col} string, __budget long"
    )
    return (
        cum.join(F.broadcast(bud), stratum_col)
        .filter(F.col(cum_col) - F.col(weight_col) < F.col("__budget"))
        .drop("__budget", PRIORITY_COL)
    )


def temperature_quotas(
    df: DataFrame,
    stratum_col: str,
    weight_col: str,
    budget: int,
) -> DataFrame:
    """Temperature-scaled source mixing (the multilingual-sampling rule of
    Conneau & Lample 2019 / mT5, at τ = 0.5): allocate a global token
    ``budget`` across strata proportional to ``n_tokens^τ`` — up-weighting
    small sources so they aren't drowned by the head stratum.

    τ is fixed at 1/2 because ``sqrt`` is the one power IEEE-754 requires
    to be correctly rounded — both engines map the same BIGINT to the same
    double, so ``floor(sqrt(n))`` is engine-exact where ``pow(n, 0.3)``
    would not be. Quotas are then largest-remainder apportionment in pure
    BIGINT arithmetic: ``floor(budget·w/W)`` per stratum plus +1 to the
    largest remainders (ties broken by stratum name) until the budget is
    exactly exhausted.

    Scale shape: one groupBy(stratum) with partial aggregation, then all
    window work runs over the tiny per-stratum table (#strata rows — the
    only "collect-sized" data, kept distributed anyway). Output:
    ``(stratum, n_tokens, weight, quota)`` with ``sum(quota) = budget``.
    """
    per = df.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.sum(F.col(weight_col)).alias("n_tokens")
    )
    w = per.withColumn(
        "weight", F.floor(F.sqrt(F.col("n_tokens").cast("double"))).cast("long")
    )
    tot = w.agg(F.sum("weight").alias("__W"))
    j = w.crossJoin(F.broadcast(tot))
    base = j.select(
        "stratum",
        "n_tokens",
        "weight",
        "__W",
        # BIGINT `div`, not `/`: Spark's `/` on longs is double division,
        # which would round differently from the oracle's exact `//`.
        # __W = 0 (every stratum weightless) is a defined zero allocation,
        # not a NULL quota / ANSI divide-by-zero
        F.expr(
            f"CASE WHEN __W > 0 THEN ({budget}L * weight) div __W ELSE 0 END"
        ).alias("__q0"),
        F.when(
            F.col("__W") > 0, (F.lit(budget) * F.col("weight")) % F.col("__W")
        ).otherwise(F.lit(0)).alias("__rem"),
    )
    from pyspark.sql import Window as _W

    leftover = F.lit(budget) - F.sum("__q0").over(
        _W.partitionBy()
    )
    rk = F.row_number().over(
        _W.partitionBy().orderBy(F.col("__rem").desc(), F.col("stratum").asc())
    )
    return base.select(
        "stratum",
        "n_tokens",
        "weight",
        F.when(
            F.col("__W") > 0,
            F.col("__q0") + F.when(rk <= leftover, 1).otherwise(0),
        ).otherwise(F.lit(0)).alias("quota"),
    )


def epoch_upsample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    epochs: dict[str, float],
    default_epochs: float = 1.0,
    copy_col: str = "epoch_copy",
) -> DataFrame:
    """Fractional-epoch upsampling: replicate each stratum's rows
    ``epochs[stratum]`` times, where the fractional part is realized as a
    deterministic hash-gated extra copy (the Llama/GPT-3-style data-mix
    recipe — "web 1.1 epochs, books 2.25, code 0.6").

    A row with epoch target ``e`` yields ``floor(e)`` copies plus one more
    iff ``md5(key)[:6] < frac(e)·16^6`` — the same partition-independent
    hash gate as :mod:`~dbt_decodable_spark.operators.sampling`, so the
    realized mix is reproducible across runs, engines, and re-partitioning,
    and is *nested*: raising ``e`` by 0.1 only ever adds copies. ``e < 1``
    degenerates to stratified down-sampling; ``e = 0`` drops the stratum.

    Output: input columns + ``copy_col`` (0-based copy index) — exploded
    map-side from a per-row ``sequence``, no shuffle anywhere: the
    (stratum → epochs) table is broadcast and the explode is a narrow op.
    Copy indices are stable, so downstream shuffles (e.g. shard packing
    keyed on (key, copy)) see a deterministic stream.
    """
    from dbt_decodable_spark.operators.sampling import _key_hash, _threshold_hex

    spark = df.sparkSession
    ep = spark.createDataFrame(
        [(s, int(e), _threshold_hex(e - int(e)))
         for s, e in sorted(epochs.items())],
        f"{stratum_col} string, __whole int, __fthr string",
    )
    d_whole = int(default_epochs)
    d_fthr = _threshold_hex(default_epochs - d_whole)
    gate = _key_hash(F.col(key_col))
    copies = (
        F.coalesce(F.col("__whole"), F.lit(d_whole))
        + F.when(gate < F.coalesce(F.col("__fthr"), F.lit(d_fthr)), 1).otherwise(0)
    )
    seq = F.when(
        copies > 0, F.sequence(F.lit(0), copies - 1)
    ).otherwise(F.array().cast("array<int>"))
    return (
        df.join(F.broadcast(ep), stratum_col, "left")
        .withColumn(copy_col, F.explode(seq))
        .drop("__whole", "__fthr")
    )
