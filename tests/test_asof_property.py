"""Property tests for the merge as-of join and the distributed prefix sum:
randomized inputs checked against an independent reference implementation
(pandas merge_asof / plain python cumsum), so the operators' semantics hold
beyond the hand-picked fixtures."""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F


@st.composite
def asof_case(draw):
    n_keys = draw(st.integers(1, 3))
    probes = draw(
        st.lists(
            st.tuples(st.integers(0, n_keys - 1), st.integers(0, 1000)),
            min_size=1,
            max_size=25,
        )
    )
    quotes = draw(
        st.lists(
            st.tuples(
                st.integers(0, n_keys - 1),
                st.integers(0, 1000),
                st.integers(-100, 100),
            ),
            min_size=0,
            max_size=25,
            unique_by=lambda t: (t[0], t[1]),  # unique (key, ts) per quote
        )
    )
    return probes, quotes


class TestAsofProperty:
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(case=asof_case())
    def test_matches_pandas_merge_asof(self, spark, case):
        probes, quotes = case
        left = spark.createDataFrame(
            [(i, k, t) for i, (k, t) in enumerate(probes)], "id long, k long, t long"
        )
        right = spark.createDataFrame(quotes, "k long, rt long, v long") if quotes else (
            spark.createDataFrame([], "k long, rt long, v long")
        )
        from dbt_decodable_spark.operators.asof import asof_join

        got = {
            (r["id"], r["v"])
            for r in asof_join(left, right, "k", "t", "rt", ["v"]).collect()
        }

        lp = pd.DataFrame([(i, k, t) for i, (k, t) in enumerate(probes)],
                          columns=["id", "k", "t"]).sort_values("t", kind="stable")
        rp = pd.DataFrame(quotes, columns=["k", "rt", "v"]).sort_values("rt", kind="stable")
        if len(rp):
            m = pd.merge_asof(lp, rp, left_on="t", right_on="rt", by="k",
                              direction="backward")
            want = {
                (int(r.id), None if pd.isna(r.v) else int(r.v))
                for r in m.itertuples()
            }
        else:
            want = {(int(r.id), None) for r in lp.itertuples()}
        assert got == want


class TestPrefixSumProperty:
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        rows=st.lists(
            st.tuples(st.integers(0, 2), st.integers(0, 50)),
            min_size=1,
            max_size=60,
        )
    )
    def test_grouped_cumsum_matches_python(self, spark, rows):
        from dbt_decodable_spark.operators.packing import grouped_running_sum

        data = [(i, g, w) for i, (g, w) in enumerate(rows)]
        df = spark.createDataFrame(data, "id long, g long, w long")
        got = {
            (r["id"], r["cum"])
            for r in grouped_running_sum(
                df, order_cols=["id"], weight_col="w", group_cols=["g"]
            ).collect()
        }
        acc: dict[int, int] = {}
        want = set()
        for i, g, w in data:  # data already in id order
            acc[g] = acc.get(g, 0) + w
            want.add((i, acc[g]))
        assert got == want


# ---------------------------------------------------------------------------
# duplicate n-gram spans: randomized docs vs a brute-force python reference


def _ref_spans(docs: dict[int, list[str]], n: int) -> set[tuple[int, int, int]]:
    """Brute-force reference: every n-window whose gram occurs in another
    doc is duplicated; merge overlapping/adjacent windows per doc."""
    grams: dict[tuple[str, ...], set[int]] = {}
    for did, toks in docs.items():
        for i in range(len(toks) - n + 1):
            grams.setdefault(tuple(toks[i : i + n]), set()).add(did)
    out = set()
    for did, toks in docs.items():
        dup_pos = sorted(
            i
            for i in range(len(toks) - n + 1)
            if len(grams[tuple(toks[i : i + n])]) > 1
        )
        if not dup_pos:
            continue
        start, end = dup_pos[0], dup_pos[0] + n - 1
        cnt = 1
        for p in dup_pos[1:]:
            if p <= end + 1:
                end = max(end, p + n - 1)
                cnt += 1
            else:
                out.add((did, start, end))
                start, end, cnt = p, p + n - 1, 1
        out.add((did, start, end))
    return out


@st.composite
def span_case(draw):
    vocab = ["w%d" % i for i in range(8)]
    word = st.sampled_from(vocab)
    n_docs = draw(st.integers(2, 4))
    docs = {
        i: draw(st.lists(word, min_size=0, max_size=18)) for i in range(n_docs)
    }
    # plant a shared block in two docs half the time so dups are common
    if draw(st.booleans()):
        block = draw(st.lists(word, min_size=4, max_size=8))
        docs[0] = docs[0] + block
        docs[1] = block + docs[1]
    return docs


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(span_case())
def test_duplicate_spans_match_bruteforce(spark, case):
    from dbt_decodable_spark.operators.dedup import duplicate_ngram_spans

    n = 4
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in case.items() if toks],
        "doc_id long, text string",
    )
    if not df.count():
        return
    got = {
        (r["id"], r["span_start"], r["span_end"])
        for r in duplicate_ngram_spans(df, "doc_id", "text", n=n).collect()
    }
    want = _ref_spans({i: t for i, t in case.items() if t}, n)
    assert got == want


class TestAsofNullQuoteValues:
    def test_latest_quote_null_not_skipped(self, spark):
        """A NULL in the latest quote must surface as NULL — not be
        forward-filled past to a stale older value (merge_asof parity)."""
        from dbt_decodable_spark.operators.asof import asof_join, asof_join_pandas

        left = spark.createDataFrame(
            [(1, 3_000_000)], "k long, t long"
        ).selectExpr("k", "timestamp_micros(t) AS t")
        right = spark.createDataFrame(
            [(1, 1_000_000, 10.0), (1, 2_000_000, None)],
            "k long, rt long, v double",
        ).selectExpr("k", "timestamp_micros(rt) AS rt", "v")
        [r1] = asof_join(left, right, "k", "t", "rt", ["v"]).collect()
        [r2] = asof_join_pandas(left, right, "k", "t", "rt", ["v"]).collect()
        assert r1.v is None and r2.v is None
