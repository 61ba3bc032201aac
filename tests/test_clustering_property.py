"""Property-based cross-checks (hypothesis): random corpora/vector sets
must match the pure-Python reference implementations of BPE merge learning
and exact-integer k-means bit-for-bit. Few examples, Spark jobs are slow —
the value is in the adversarial shapes hypothesis finds (single-char docs,
all-identical docs, boundary-heavy pair patterns), not in volume."""

from hypothesis import HealthCheck, given, settings, strategies as st

from dbt_decodable_spark.operators.bpe import learn_merges
from dbt_decodable_spark.operators.clustering import kmeans_lloyd
from tests.test_bpe import _py_bpe
from tests.test_clustering import _py_kmeans

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_texts = st.lists(
    st.text(alphabet="ab c", min_size=0, max_size=12), min_size=1, max_size=6
)


@given(texts=_texts)
@settings(**_SETTINGS)
def test_bpe_matches_reference_on_random_corpora(spark, texts):
    docs = {i: t for i, t in enumerate(texts)}
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    eligible = [t for t in docs.values() if len(t[:64]) >= 2]
    if not eligible:
        return  # no pairs anywhere — learn_merges has nothing to rank
    rules, seg = learn_merges(df, "text", rounds=2)
    ref_rules, ref_segs = _py_bpe(docs, rounds=2)
    assert rules == ref_rules
    got = {r.doc_id: list(r.syms) for r in seg.collect()}
    assert got == ref_segs


# grid-exact floats: multiples of 1/64 in [-1, 1] survive float32 round-trip
_vec = st.lists(
    st.integers(min_value=-64, max_value=64).map(lambda i: i / 64.0),
    min_size=4,
    max_size=4,
)
_vecs = st.lists(_vec, min_size=2, max_size=12)


@given(vecs=_vecs)
@settings(**_SETTINGS)
def test_kmeans_matches_reference_on_random_vectors(spark, vecs):
    rows = {i: v for i, v in enumerate(vecs)}
    df = spark.createDataFrame(
        [(i, v) for i, v in rows.items()], "vec_id long, embedding array<float>"
    )
    k = min(3, len(rows))
    ref = _py_kmeans(rows, k=k, iters=2, init_mod=1)
    got = {
        r.vec_id: (r.dist2, r.centroid_id)
        for r in kmeans_lloyd(df, k=k, iters=2, init_mod=1).collect()
    }
    assert got == ref
