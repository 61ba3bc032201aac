"""Deterministic hash sampling (operators/sampling.py): partition
independence, nested keep-sets, per-stratum rates, edge fractions."""

from dbt_decodable_spark.operators.sampling import (
    _threshold_hex,
    deterministic_sample,
    stratified_sample,
)


def _ids(df):
    return {r.id for r in df.select("id").collect()}


class TestDeterministicSample:
    def test_partition_independent(self, spark):
        df = spark.createDataFrame([(i,) for i in range(2000)], "id long")
        base = _ids(deterministic_sample(df, "id", 0.3))
        repart = _ids(deterministic_sample(df.repartition(13), "id", 0.3))
        assert base == repart and base  # same membership, non-empty

    def test_nested_keep_sets(self, spark):
        df = spark.createDataFrame([(i,) for i in range(2000)], "id long")
        s10 = _ids(deterministic_sample(df, "id", 0.1))
        s50 = _ids(deterministic_sample(df, "id", 0.5))
        assert s10 <= s50

    def test_rate_close_to_target(self, spark):
        df = spark.createDataFrame([(i,) for i in range(5000)], "id long")
        n = len(_ids(deterministic_sample(df, "id", 0.25)))
        assert abs(n / 5000 - 0.25) < 0.03

    def test_edge_fractions(self, spark):
        df = spark.createDataFrame([(i,) for i in range(100)], "id long")
        assert len(_ids(deterministic_sample(df, "id", 0.0))) == 0
        assert len(_ids(deterministic_sample(df, "id", 1.0))) == 100

    def test_threshold_hex_format(self):
        assert _threshold_hex(0.0) == "000000"
        assert _threshold_hex(0.5) == "800000"
        assert _threshold_hex(1.0) == "g"  # above every hex string
        assert len(_threshold_hex(0.123)) == 6


class TestStratifiedSample:
    def test_per_stratum_rates_and_default(self, spark):
        rows = [(i, "a" if i % 2 == 0 else ("b" if i % 4 == 1 else "c")) for i in range(4000)]
        df = spark.createDataFrame(rows, "id long, s string")
        out = stratified_sample(df, "s", "id", {"a": 0.5, "b": 0.1}, default_fraction=0.0)
        got = out.groupBy("s").count().collect()
        by = {r.s: r["count"] for r in got}
        assert abs(by.get("a", 0) / 2000 - 0.5) < 0.05
        assert abs(by.get("b", 0) / 1000 - 0.1) < 0.05
        assert "c" not in by  # default 0 drops unlisted strata

    def test_matches_uniform_within_stratum(self, spark):
        # a stratum sampled at f keeps exactly the rows the uniform f-sample keeps
        df = spark.createDataFrame([(i, "x") for i in range(1000)], "id long, s string")
        strat = _ids(stratified_sample(df, "s", "id", {"x": 0.3}))
        unif = _ids(deterministic_sample(df, "id", 0.3))
        assert strat == unif


class TestNestedKeepSets:
    def test_lower_fraction_sample_is_subset(self, spark):
        from dbt_decodable_spark.operators.sampling import deterministic_sample
        from dbt_decodable_spark.sources.tables import read_table

        d = read_table(spark, "/root/testdata/sf0.001", "documents")
        s10 = {r["doc_id"] for r in deterministic_sample(d, "doc_id", 0.1).collect()}
        s50 = {r["doc_id"] for r in deterministic_sample(d, "doc_id", 0.5).collect()}
        assert s10 <= s50  # documented nested keep-set property
        assert 0 < len(s10) < len(s50) < d.count()
