"""Connected-components clustering (operators/graph.py): correctness vs a
Python union-find reference on structured and pseudo-random graphs, plus the
dedup_by_components representative semantics."""

import pytest

from dbt_decodable_spark.operators.graph import connected_components, dedup_by_components


def _union_find(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component = min member id
    comp_min = {}
    for n in nodes:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    return {n: comp_min[find(n)] for n in nodes}


def _check(spark, edges):
    # self-loops never enter the symmetrized edge set — exclude upfront
    edges = [e for e in edges if e[0] != e[1]]
    nodes = sorted({x for e in edges for x in e})
    expected = _union_find(edges, nodes)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: r.component for r in connected_components(df).collect()}
    assert expected == got


class TestConnectedComponents:
    def test_two_components_and_isolated_selfloop(self, spark):
        _check(spark, [(1, 2), (2, 3), (5, 6), (9, 3)])

    def test_long_chain_converges_logarithmically(self, spark):
        # 60-node chain: label propagation would need 60 rounds; star
        # contraction must finish within the max_iter=25 budget
        _check(spark, [(i, i + 1) for i in range(60)])

    def test_pseudo_random_graph(self, spark):
        # deterministic LCG edges over 80 nodes — mixes cliques and chains
        x, edges = 7, []
        for _ in range(120):
            x = (x * 1103515245 + 12345) % (1 << 31)
            a = x % 80
            x = (x * 1103515245 + 12345) % (1 << 31)
            b = x % 80
            if a != b:
                edges.append((a, b))
        _check(spark, edges)

    def test_reversed_edge_direction_same_result(self, spark):
        e1 = [(1, 2), (3, 2), (4, 5)]
        df1 = spark.createDataFrame(e1, "src long, dst long")
        df2 = spark.createDataFrame([(b, a) for a, b in e1], "src long, dst long")
        assert sorted(connected_components(df1).collect()) == sorted(
            connected_components(df2).collect()
        )

    def test_empty(self, spark):
        df = spark.createDataFrame([], "src long, dst long")
        assert connected_components(df).collect() == []


class TestDedupByComponents:
    def test_representatives_and_singletons(self, spark):
        docs = spark.createDataFrame(
            [(i, f"doc{i}") for i in range(6)], "doc_id long, text string"
        )
        pairs = spark.createDataFrame(
            [(0, 1), (1, 2), (4, 5)], "id_a long, id_b long"
        )
        out = {
            r.doc_id: (r.component, r.is_representative)
            for r in dedup_by_components(docs, pairs, "doc_id").collect()
        }
        assert out == {
            0: (0, True),
            1: (0, False),
            2: (0, False),
            3: (3, True),  # unpaired doc is its own representative
            4: (4, True),
            5: (4, False),
        }

    def test_one_representative_per_component(self, spark):
        docs = spark.createDataFrame(
            [(i, "t") for i in range(10)], "doc_id long, text string"
        )
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(9)], "id_a long, id_b long"
        )
        rows = dedup_by_components(docs, pairs, "doc_id").collect()
        reps = [r for r in rows if r.is_representative]
        assert len(reps) == 1 and reps[0].doc_id == 0
        assert all(r.component == 0 for r in rows)


class TestSmallGraphFinisher:
    def test_star_and_unionfind_paths_agree(self, spark):
        import random

        rng = random.Random(7)
        edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(300)]
        df = spark.createDataFrame(edges, "src long, dst long")
        uf = sorted(connected_components(df).collect())
        stars = sorted(connected_components(df, smallgraph_edges=0).collect())
        assert uf == stars

    def test_late_round_cutoff_matches(self, spark):
        # force one star round, then the in-loop union-find cutoff
        edges = [(i, i + 1) for i in range(50)] + [(100, 101), (101, 102)]
        df = spark.createDataFrame(edges, "src long, dst long")
        full = sorted(connected_components(df, smallgraph_edges=0).collect())
        hybrid = sorted(connected_components(df, smallgraph_edges=60).collect())
        assert full == hybrid
        got = {r.id: r.component for r in connected_components(df).collect()}
        assert all(got[i] == 0 for i in range(51))
        assert got[102] == 100


class TestKhopRecursiveCte:
    def test_khop_on_known_graph(self, spark):
        # path 1-2-3-4-5 plus isolated edge 8-9: 2 hops from 1 reaches 3 but
        # not 4; symmetric closure, src<node halves the output
        from dbt_decodable_spark.queries.extensions3 import _KHOP_SQL

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5), (8, 9)], "id_a long, id_b long"
        )
        out = spark.sql(_KHOP_SQL.format(pairs="{pairs}"), pairs=edges)
        got = sorted(map(tuple, out.collect()))
        want = sorted(
            [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (3, 5), (4, 5), (8, 9)]
        )
        assert got == want

    def test_khop_terminates_on_cycle(self, spark):
        # triangle: UNION ALL recursion must stop at the depth bound
        from dbt_decodable_spark.queries.extensions3 import _KHOP_SQL

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 1)], "id_a long, id_b long"
        )
        out = spark.sql(_KHOP_SQL.format(pairs="{pairs}"), pairs=edges)
        assert sorted(map(tuple, out.collect())) == [(1, 2), (1, 3), (2, 3)]
