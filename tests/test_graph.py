"""PageRank semantics on hand graphs: fixed points, centrality ordering,
dangling/isolated behavior, and mass accounting under fixed-point math."""

from __future__ import annotations

from pyspark.sql import Row

from marketstream_etl_spark.operators.graph import PR_SCALE, pagerank


def _nodes(spark, names):
    return spark.createDataFrame([Row(node=n) for n in names])


def _edges(spark, triples):
    return spark.createDataFrame(
        [Row(src=s, dst=d, weight=w) for s, d, w in triples]
    )


def test_symmetric_pair_is_exact_fixed_point(spark):
    """A ⇄ B with equal weights: uniform 1/2 is a fixed point even in
    integer arithmetic (no floor dust at these values), so every
    iteration returns exactly 0.5 / 0.5."""
    out = pagerank(
        _edges(spark, [("a", "b", 1), ("b", "a", 1)]),
        _nodes(spark, ["a", "b"]),
    ).collect()
    assert {r["node"]: r["rank_fp"] for r in out} == {
        "a": PR_SCALE // 2,
        "b": PR_SCALE // 2,
    }


def test_star_center_outranks_leaves(spark):
    """Leaves all point at the hub (and back): the hub concentrates
    rank; all leaves tie by symmetry."""
    leaves = [f"l{i}" for i in range(4)]
    edges = [(leaf, "hub", 1) for leaf in leaves] + [
        ("hub", leaf, 1) for leaf in leaves
    ]
    out = {
        r["node"]: r["rank_fp"]
        for r in pagerank(
            _edges(spark, edges), _nodes(spark, ["hub"] + leaves)
        ).collect()
    }
    assert all(out["hub"] > out[leaf] for leaf in leaves)
    assert len({out[leaf] for leaf in leaves}) == 1


def test_isolated_node_gets_teleport_only(spark):
    """A node with no edges at all holds exactly the teleport share."""
    out = {
        r["node"]: r["rank_fp"]
        for r in pagerank(
            _edges(spark, [("a", "b", 1), ("b", "a", 1)]),
            _nodes(spark, ["a", "b", "iso"]),
        ).collect()
    }
    assert out["iso"] == (15 * PR_SCALE) // (100 * 3)


def test_total_mass_bounded_and_near_one(spark):
    """No danglers: total rank stays ≤ 1 and within floor-dust of 1."""
    edges = [("a", "b", 2), ("b", "c", 1), ("c", "a", 3), ("b", "a", 1)]
    out = pagerank(_edges(spark, edges), _nodes(spark, list("abc"))).collect()
    total = sum(r["rank_fp"] for r in out)
    assert total <= PR_SCALE
    assert total >= PR_SCALE - 1000  # ≤ iters × nodes × 1-unit floor dust


def test_pagerank_invariant_to_edge_input_order(spark):
    """Distributed reproducibility: the fixed-point trajectory must not
    depend on edge row order or partitioning — integer arithmetic makes
    this exact, not approximate."""
    edges = [("a", "b", 2), ("b", "c", 1), ("c", "a", 3), ("b", "a", 1),
             ("c", "b", 2), ("a", "c", 1)]
    nodes = _nodes(spark, list("abc"))
    fwd = pagerank(_edges(spark, edges), nodes).collect()
    rev = pagerank(
        _edges(spark, list(reversed(edges))).repartition(7), nodes
    ).collect()
    assert {r["node"]: r["rank_fp"] for r in fwd} == {
        r["node"]: r["rank_fp"] for r in rev
    }
