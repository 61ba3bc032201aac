"""Property-based tests for the type parser (hypothesis): every constructible
Flink type round-trips through repr, equality is canonical, and the Spark
mapping is total over the generated space."""

from hypothesis import given, settings, strategies as st

from dbt_decodable_spark import ftypes

_atomic = st.sampled_from(
    [
        "STRING",
        "BYTES",
        "BOOLEAN",
        "TINYINT",
        "SMALLINT",
        "INT",
        "BIGINT",
        "FLOAT",
        "DOUBLE",
        "DATE",
        "CHAR(7)",
        "VARCHAR(255)",
        "BINARY(4)",
        "VARBINARY(16)",
        "DECIMAL(12, 3)",
        "DEC(9)",
        "NUMERIC(20, 5)",
        "TIME(3)",
        "TIMESTAMP(3)",
        "TIMESTAMP_LTZ(3)",
    ]
)


def _compound(children: st.SearchStrategy[str]) -> st.SearchStrategy[str]:
    return st.one_of(
        children.map(lambda t: f"ARRAY<{t}>"),
        st.tuples(children, children).map(lambda kv: f"MAP<{kv[0]}, {kv[1]}>"),
        st.lists(
            st.tuples(st.from_regex(r"[a-z][a-z0-9_]{0,6}", fullmatch=True), children),
            min_size=1,
            max_size=3,
            unique_by=lambda p: p[0],
        ).map(lambda fs: "ROW<" + ", ".join(f"{n} {t}" for n, t in fs) + ">"),
        children.map(lambda t: f"MULTISET<{t}>"),
    )


type_strings = st.recursive(_atomic, _compound, max_leaves=6)
modified = st.one_of(
    type_strings,
    type_strings.map(lambda t: f"{t} NOT NULL"),
    type_strings.map(lambda t: f"{t} PRIMARY KEY"),
)


@settings(max_examples=300, deadline=None)
@given(modified)
def test_repr_round_trip(s: str):
    t = ftypes.parse(s)
    assert repr(t) == s
    assert ftypes.parse(repr(t)) == t


@settings(max_examples=300, deadline=None)
@given(modified)
def test_spark_mapping_total(s: str):
    """Every parseable type has a Spark mapping, and nullability of the
    modifier survives."""
    t = ftypes.parse(s)
    dt = t.to_spark()
    assert dt is not None
    if s.endswith("NOT NULL") or s.endswith("PRIMARY KEY"):
        assert not t.nullable


@settings(max_examples=200, deadline=None)
@given(type_strings)
def test_from_spark_stable(s: str):
    """Flink → Spark → Flink → Spark is a fixpoint (modulo synonyms that
    collapse, e.g. CHAR→STRING, TIME→BIGINT)."""
    t = ftypes.parse(s)
    dt = t.to_spark()
    s2 = ftypes.from_spark(dt)
    assert ftypes.parse(s2).to_spark() == dt


@settings(max_examples=200, deadline=None)
@given(modified)
def test_equality_is_hash_consistent(s: str):
    a, b = ftypes.parse(s), ftypes.parse(s)
    assert a == b and hash(a) == hash(b)
