"""Distributed graph clustering for dedup pipelines (SURVEY §2.12).

Near-dup detection (MinHash-LSH / n-gram Jaccard / embedding cosine —
``operators/dedup.py``, ``operators/similarity.py``) emits *pairs*. Turning
pairs into dedup decisions needs *clusters*: the connected components of the
similarity graph, with one representative kept per component.

``connected_components`` implements the alternating large-star / small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14 — public literature). Why this and not label propagation:

- label propagation converges in O(diameter) rounds — a 100 TB near-dup
  graph can contain long chains (A~B~C~... transitive near-dups), and each
  round is a full shuffle of the edge list;
- large-star/small-star converges in O(log n) rounds *regardless of
  diameter*, and every round is two groupBy-join passes over the current
  edge set — each a plain key shuffle, no global structure, no driver-side
  graph. Edges monotonically point toward component minima, so the edge set
  shrinks toward a star forest.

Everything is deterministic (component id = min node id in the component),
so the result is oracle-checkable against a recursive-CTE transitive
closure in DuckDB at test scale.

Scale notes (100 TB): per-iteration ``localCheckpoint`` truncates the
lineage so round N's plan doesn't re-run rounds 1..N-1; on a real cluster
with a fault-tolerance requirement, swap for reliable ``checkpoint()``
backed by the cluster filesystem — one line, noted below. Convergence is
detected by (count, xxhash64 checksum) of the edge set — two tiny
aggregates per round, no driver-side edge materialization.

The reference (decodableco/dbt-decodable) has no graph operator; this is
part of the training-data-pipeline extension surface the driver mandates
alongside SURVEY §2.12.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _symmetrize(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected view: both directions, self-loops dropped, distinct."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).filter(
        F.col("u") != F.col("v")
    )
    return e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()


def _large_star(sym: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) ∪ {u}).

    One groupBy(u) for the neighborhood minimum, one join back — the min is
    a map-side partial aggregate, the join is a self-join on u (AQE picks
    broadcast when the min table is small late in convergence)."""
    mins = sym.groupBy("u").agg(F.min("v").alias("mv"))
    m = F.least(F.col("u"), F.col("mv"))
    # no distinct here: duplicate edges don't change _small_star's group
    # minima, and its final distinct cleans them — one less shuffle per round
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), m.alias("v"))
    )


def _small_star(directed: DataFrame) -> DataFrame:
    """On edges oriented large→small (u > v): connect u and all its smaller
    neighbors to the smallest of them."""
    mins = directed.groupBy("u").agg(F.min("v").alias("mv"))
    to_min = (
        directed.join(mins, "u")
        .filter(F.col("v") != F.col("mv"))
        .select(F.col("v").alias("u"), F.col("mv").alias("v"))
    )
    self_edge = mins.select(F.col("u"), F.col("mv").alias("v"))
    return to_min.union(self_edge).distinct()


def _unionfind_components(sym: DataFrame) -> DataFrame:
    """Single-task union-find over a SMALL symmetrized edge set: the
    finisher for graphs (or late-round residuals) below the distributed
    threshold. Union-by-min keeps the invariant that every tree's root is
    the minimum id in the tree, so the output is identical to the star
    algorithm's min-id components. One coalesce (shuffle-free) + one
    Arrow-batched pass; the edge iterator streams, only the parent map
    (O(nodes)) is held."""
    import pandas as pd

    utype = dict(sym.dtypes)["u"]

    def uf(batches):
        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:
                parent[x], x = root, parent[x]
            return root

        for pdf in batches:
            for u, v in zip(pdf["u"].tolist(), pdf["v"].tolist()):
                parent.setdefault(u, u)
                parent.setdefault(v, v)
                ru, rv = find(u), find(v)
                if ru != rv:
                    lo, hi = (ru, rv) if ru < rv else (rv, ru)
                    parent[hi] = lo
        if parent:
            nodes = list(parent)
            yield pd.DataFrame(
                {"id": nodes, "component": [find(n) for n in nodes]}
            )

    return sym.coalesce(1).mapInPandas(
        uf, schema=f"id {utype}, component {utype}"
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    smallgraph_edges: int = 1_000_000,
) -> DataFrame:
    """(id, component) for every node appearing in ``edges``; ``component``
    is the minimum node id reachable from ``id`` (the component's canonical
    representative). Node ids must be an orderable atomic type (int/long/
    string). Callers keep one row per component by filtering
    ``id == component`` or joining back and picking representatives.

    Two-tier execution: a symmetrized edge set at or below
    ``smallgraph_edges`` finishes in ONE single-task union-find pass
    (:func:`_unionfind_components`) — iterating star rounds over a graph
    that fits one task wastes 3-4 driver-synchronous jobs on convergence
    detection alone (measured: 3.8 s of a 5.4 s total at sf0.1). Above the
    threshold, alternating large-star/small-star runs until a fixed point
    (count + order-independent xxhash64 checksum); each round shrinks the
    edge set geometrically, so at 100 TB the star rounds do the heavy
    contraction and the same small-graph cutoff ends the tail (pass
    ``smallgraph_edges=0`` to force pure star rounds)."""
    # materialize the (possibly expensive) pair-generation pipeline ONCE —
    # without this, the emptiness probe below runs it and round 1 runs it
    # again through the un-truncated lineage.
    sym = _symmetrize(edges, src, dst).localCheckpoint(eager=True)
    n_edges = sym.count()
    if n_edges == 0:  # empty graph
        return sym.select(F.col("u").alias("id"), F.col("v").alias("component"))
    if n_edges <= smallgraph_edges:
        return _unionfind_components(sym)

    cur = sym
    prev_sig: tuple[int, int] | None = None
    converged = False
    for _ in range(max_iter):
        stars = _small_star(_large_star(cur))
        # localCheckpoint: truncate lineage so each round's plan is O(1)
        # deep; on a multi-node cluster use .checkpoint() (reliable) instead.
        # Lazy here — the signature aggregate right below is the action that
        # materializes it, so each round is ONE job, not two.
        stars = stars.localCheckpoint(eager=False)
        # bit_xor: order-independent and overflow-free (the edge set is
        # distinct, so XOR cancellation of duplicates can't occur)
        cnt, chk = stars.agg(
            F.count(F.lit(1)), F.bit_xor(F.xxhash64("u", "v"))
        ).first()
        sig = (cnt, chk)
        if sig == prev_sig:
            cur = stars
            converged = True
            break
        prev_sig = sig
        # late-round cutoff: the star rounds shrink the edge set
        # geometrically — once the residual fits one task, a single
        # union-find pass replaces the remaining convergence rounds
        # (component-preserving: star transforms keep connectivity)
        if 0 < cnt <= smallgraph_edges:
            # union-find registers BOTH endpoints of every row (uf() does
            # setdefault on u and v), so it is direction-agnostic — the
            # reversed copy would only double the single-task finisher's
            # input for nothing
            return _unionfind_components(stars)
        # adaptive width: the edge set shrinks toward a star forest, and we
        # just measured its size — narrow the checkpointed frame (coalesce
        # is shuffle-free) so late rounds don't schedule full-width task
        # waves over a few hundred edges. Large edge sets keep full width.
        width = max(1, min(int(cnt // 20_000) + 1, stars.rdd.getNumPartitions()))
        if width < stars.rdd.getNumPartitions():
            stars = stars.coalesce(width)
        # re-symmetrize WITHOUT the distinct shuffle: small-star output is
        # already distinct and strictly oriented u > v, so the reversed copy
        # is disjoint from the forward one — a plain union is exact here
        # (one less shuffle per round than _symmetrize)
        cur = stars.union(stars.select(F.col("v").alias("u"), F.col("u").alias("v")))
    if not converged:
        # the forest extraction below is only valid on a CONVERGED star
        # set — on the re-symmetrized working set it would emit conflicting
        # multi-component rows per node. Star rounds converge in O(log n),
        # so hitting this means the iteration budget, not the data, is wrong.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "raise max_iter (convergence needs ~log2(diameter) rounds)"
        )
    # cur is a star forest oriented node→root; roots map to themselves
    members = cur.filter(F.col("u") != F.col("v")).select(
        F.col("u").alias("id"), F.col("v").alias("component")
    )
    roots = cur.select(F.col("v").alias("id")).distinct().select(
        "id", F.col("id").alias("component")
    )
    return members.union(roots).distinct()


def dedup_by_components(
    df: DataFrame, pairs: DataFrame, id_col: str, pair_a: str = "id_a", pair_b: str = "id_b"
) -> DataFrame:
    """Assign every row of ``df`` its near-dup cluster id: the connected
    component of the similarity pairs, or its own id when unpaired.
    Output: df columns + ``component`` + ``is_representative``."""
    # rename cc's id before joining — with id_col literally "id",
    # drop("id") would remove BOTH columns (same hazard as
    # keep_best_representative below). The same hazard class applies to
    # 'component': a df already carrying one (e.g. this function's own
    # output fed back in) would make the coalesce reference ambiguous —
    # or silently resolve to the STALE cluster ids
    if "component" in df.columns:
        raise ValueError(
            "df already has a 'component' column — the cluster-id output "
            "would be ambiguous against it; rename or drop it first"
        )
    cc = connected_components(pairs, pair_a, pair_b).withColumnRenamed(
        "id", "__cc_id"
    )
    joined = df.join(cc, F.col(id_col) == F.col("__cc_id"), "left").drop("__cc_id")
    comp = F.coalesce(F.col("component"), F.col(id_col))
    return joined.withColumn("component", comp).withColumn(
        "is_representative", F.col(id_col) == F.col("component")
    )


def keep_best_representative(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    score_col: str,
    pair_a: str = "id_a",
    pair_b: str = "id_b",
) -> DataFrame:
    """Near-dup cluster dedup that keeps the BEST document per cluster
    instead of the minimum-id one: the connected component of the
    similarity pairs picks its representative by ``score_col`` descending
    (ties broken by ascending id, so the choice is total and
    deterministic). This is the keep-highest-quality policy real training
    pipelines want — min-id keeps whichever near-duplicate happened to be
    crawled first; keep-best keeps the longest / highest-scoring copy.

    Output: df's id + score columns, ``component``, and ``keep``.

    Scale shape: components come from the O(log n)-round star algorithm
    (:func:`connected_components`); the per-component arg-max window runs
    over ONLY the clustered slice (r14, guide §2.3 — pre-filter before
    the shuffle): a document with no near-dup pair is its own singleton
    component with ``keep`` trivially true, so it never enters the window
    exchange. At 100 TB that is the difference between shuffling the
    whole corpus by component and shuffling just the duplicate-cluster
    members (the pairs-sized minority); the unpaired majority flows
    through map-side only (a broadcast/AQE left-anti probe against the
    k-node cc table). Bit-identical to the windowed-everything form: a
    singleton's row_number is 1 by definition (pinned in
    tests/test_round14_opt.py).
    """
    from pyspark.sql import Window as W

    # rename cc's id before joining: if the caller's id_col is literally
    # "id", drop("id") would remove BOTH columns and the references below
    # would not resolve. 'component' as an input name is the same hazard
    if "component" in (id_col, score_col):
        raise ValueError(
            "'component' is this function's output column — rename the "
            "input column first"
        )
    # the cc table now feeds TWO consumers (the clustered inner join and
    # the singleton anti probe); Spark re-executes common subplans, so
    # without the lazy checkpoint the component computation (union-find /
    # star rounds) would run twice. Node-count bounded by the pairs table.
    cc = connected_components(pairs, pair_a, pair_b).withColumnRenamed(
        "id", "__cc_id"
    ).localCheckpoint(eager=False)
    base = df.select(id_col, score_col)
    clustered = base.join(
        cc, F.col(id_col) == F.col("__cc_id"), "inner"
    ).drop("__cc_id")
    w = W.partitionBy("component").orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    best = clustered.withColumn("keep", F.row_number().over(w) == F.lit(1))
    singles = (
        base.join(cc, F.col(id_col) == F.col("__cc_id"), "left_anti")
        .withColumn("component", F.col(id_col))
        .withColumn("keep", F.lit(True))
    )
    return best.unionByName(singles)
