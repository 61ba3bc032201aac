"""BPE merge-rule learning (operators/bpe.py): greedy-merge semantics on
the doubled-separator encoding, reference-implementation cross-check, and
partition independence."""

from collections import Counter

from dbt_decodable_spark.operators.bpe import SEP, learn_merges
from dbt_decodable_spark.sources.tables import read_table

SF = "/root/testdata/sf0.001"


def _py_bpe(texts: dict, rounds: int, max_chars: int = 64):
    """Reference BPE: corpus pair counts → (count DESC, pair ASC) winner →
    greedy left-to-right merge per doc."""
    segs = {
        i: [c for c in t[:max_chars]]
        for i, t in texts.items()
        if len(t[:max_chars]) >= 2 and SEP not in t[:max_chars]
    }
    rules = []
    for r in range(1, rounds + 1):
        counts = Counter()
        for s in segs.values():
            counts.update(zip(s, s[1:]))
        if not counts:  # fully merged — mirror the operator's early stop
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        rules.append((r, a, b, cnt))
        for i, s in segs.items():
            out, j = [], 0
            while j < len(s):
                if j + 1 < len(s) and s[j] == a and s[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(s[j])
                    j += 1
            segs[i] = out
    return rules, segs


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )


class TestBpeSemantics:
    def test_overlap_merges_greedy_left_to_right(self, spark):
        # pair (a,a) on "aaa" must yield [aa, a], never [a, aa]
        texts = {1: "aaa", 2: "aa"}
        rules, seg = learn_merges(_df(spark, texts), "text", rounds=1)
        assert rules == [(1, "a", "a", 3)]
        got = {r.doc_id: list(r.syms) for r in seg.collect()}
        assert got == {1: ["aa", "a"], 2: ["aa"]}

    def test_back_to_back_occurrences_all_merge(self, spark):
        # "abab" has (a,b) twice back-to-back: both must merge on one pass
        texts = {1: "abab", 2: "ab"}
        rules, seg = learn_merges(_df(spark, texts), "text", rounds=1)
        assert rules == [(1, "a", "b", 3)]
        got = {r.doc_id: list(r.syms) for r in seg.collect()}
        assert got == {1: ["ab", "ab"], 2: ["ab"]}

    def test_merged_symbol_participates_next_round(self, spark):
        # round 1 merges (a,b) -> "ab"; round 2 must see pairs ("ab", c)
        texts = {1: "abcabc"}
        rules, seg = learn_merges(_df(spark, texts), "text", rounds=2)
        assert rules[0][1:] == ("a", "b", 2)
        assert rules[1][1:] == ("ab", "c", 2)
        [r] = seg.collect()
        assert list(r.syms) == ["abc", "abc"]

    def test_tie_breaks_to_smallest_pair(self, spark):
        # (x,y) and (y,z) each occur once — lexicographic smaller pair wins
        texts = {1: "xyz"}
        rules, _ = learn_merges(_df(spark, texts), "text", rounds=1)
        assert rules == [(1, "x", "y", 1)]


class TestBpeCorpus:
    def test_matches_python_reference(self, spark):
        docs = read_table(spark, SF, "documents").select("doc_id", "text")
        texts = {r.doc_id: r.text for r in docs.collect()}
        ref_rules, ref_segs = _py_bpe(texts, rounds=2)
        rules, seg = learn_merges(docs, "text", rounds=2)
        assert rules == ref_rules
        got = {r.doc_id: list(r.syms) for r in seg.collect()}
        assert got == ref_segs

    def test_segmentation_rejoins_to_prefix(self, spark):
        docs = read_table(spark, SF, "documents").select("doc_id", "text")
        texts = {r.doc_id: r.text for r in docs.collect()}
        _, seg = learn_merges(docs, "text", rounds=2)
        for r in seg.collect():
            assert "".join(r.syms) == texts[r.doc_id][:64]

    def test_partition_independent(self, spark):
        docs = read_table(spark, SF, "documents").select("doc_id", "text")
        r1, _ = learn_merges(docs, "text", rounds=2)
        r2, _ = learn_merges(docs.repartition(17), "text", rounds=2)
        assert r1 == r2
