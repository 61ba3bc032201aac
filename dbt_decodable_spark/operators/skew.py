"""Skew-mitigation join (100 TB design; SCALING.md §joins).

AQE's runtime skew-join splitting (on in ``session.py``) rescues sort-merge
joins whose partitions are detected oversized AT RUNTIME. The explicit
salted join here is the planned form for the cases AQE can't fix: a hot key
so large that even split partitions spill, or a join below an operator that
pins partitioning. Result-identical to a plain equi-join — proven by the
``join_salted_skew`` oracle query.

Shape: the big (skewed) side scatters each row into one of ``salt`` buckets;
the small side is replicated ``salt`` times (rows × salt — keep the small
side genuinely small); the equi-join then runs on (keys + bucket), so a hot
key's rows spread over ``salt`` reducers instead of one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with the hot-key rows of ``big``
    scattered across ``salt`` shuffle buckets.

    Only ``inner`` and ``left`` joins are salted-safe (the replicated small
    side would multiply unmatched-row null output for right/full).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    if _SALT in big.columns or _SALT in small.columns:
        raise ValueError(f"column name {_SALT!r} is reserved by salted_join")
    # monotonically_increasing_id is nondeterministic across runs, but any
    # row→bucket assignment yields the same join result; uniformity is all
    # that matters.
    big_s = big.withColumn(_SALT, F.pmod(F.monotonically_increasing_id(), salt))
    small_s = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return big_s.join(small_s, on + [_SALT], how).drop(_SALT)
