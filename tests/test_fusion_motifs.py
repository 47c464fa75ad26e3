"""Semantics tests for the r6-late operators: RRF hybrid retrieval,
degree-ordered triangle counting, and the tolerance-bounded as-of."""

from __future__ import annotations

from pyspark.sql import Row

from marketstream_etl_spark.operators.asof import asof_events_tolerance
from marketstream_etl_spark.operators.fusion import (
    RRF_K,
    RRF_NUM,
    hybrid_search_rrf,
)
from marketstream_etl_spark.operators.graph import part_triangles


# --------------------------------------------------------------- triangles
def _lineitem(spark, orders):
    rows = [
        Row(l_orderkey=ok, l_partkey=pk, l_quantity=1.0)
        for ok, parts in orders.items()
        for pk in parts
    ]
    return spark.createDataFrame(rows)


def test_single_triangle_counted_once_per_vertex(spark):
    """Three orders each holding parts {1,2,3}: every pair has weight 3,
    one triangle, each vertex participates exactly once."""
    li = _lineitem(spark, {10: [1, 2, 3], 11: [1, 2, 3], 12: [1, 2, 3]})
    out = {r["l_partkey"]: r["triangles"] for r in part_triangles(li).collect()}
    assert out == {1: 1, 2: 1, 3: 1}


def test_edges_below_min_weight_break_the_triangle(spark):
    """Pair (1,3) co-occurs only once -> edge pruned -> no triangle."""
    li = _lineitem(
        spark,
        {10: [1, 2], 11: [1, 2], 12: [2, 3], 13: [2, 3], 14: [1, 3]},
    )
    assert part_triangles(li).collect() == []


def test_k4_counts_four_triangles(spark):
    """Complete graph on 4 parts (every pair twice): C(4,3)=4 triangles,
    each vertex in exactly 3; total participation = 3 x 4."""
    li = _lineitem(spark, {10: [1, 2, 3, 4], 11: [1, 2, 3, 4]})
    out = {r["l_partkey"]: r["triangles"] for r in part_triangles(li).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}
    assert sum(out.values()) % 3 == 0


def test_duplicate_part_rows_in_one_order_do_not_self_pair(spark):
    """A part listed twice in the same order never forms a self-edge
    (a < b), and repeated rows only inflate weight, not edge identity."""
    li = _lineitem(spark, {10: [1, 1, 2, 3], 11: [1, 2, 3]})
    out = {r["l_partkey"]: r["triangles"] for r in part_triangles(li).collect()}
    assert out == {1: 1, 2: 1, 3: 1}


# --------------------------------------------------------------------- rrf
def test_rrf_scores_on_driver_corpus(spark, sf_dir):
    """On the sf0.001 tables: every fused row's score equals the exact
    integer recombination of its component ranks, and the per-query
    output is top-k of the fused ordering."""
    from marketstream_etl_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    rows = hybrid_search_rrf(docs, emb, n_queries=2, k=5).collect()
    assert rows, "fusion returned nothing"
    for r in rows:
        expect = 0
        if r["lex_rank"] is not None:
            expect += RRF_NUM // (RRF_K + r["lex_rank"])
        if r["vec_rank"] is not None:
            expect += RRF_NUM // (RRF_K + r["vec_rank"])
        assert r["rrf_score"] == expect
        assert r["lex_rank"] is not None or r["vec_rank"] is not None
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        assert len(rs) <= 5
        ranks = [r["rank"] for r in sorted(rs, key=lambda r: r["rank"])]
        assert ranks == list(range(1, len(rs) + 1))
        ordered = sorted(rs, key=lambda r: r["rank"])
        for a, b in zip(ordered, ordered[1:]):
            assert (a["rrf_score"], -a["item_id"]) >= (
                b["rrf_score"],
                -b["item_id"],
            ), "fused ranking must follow (score desc, item_id asc)"


def test_rrf_dual_listed_item_beats_single_listed_at_same_rank(spark, sf_dir):
    """An item ranked r by BOTH systems strictly outscores an item ranked
    r by one system only — the monotonicity RRF is used for."""
    from marketstream_etl_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    rows = hybrid_search_rrf(docs, emb, n_queries=2, k=20).collect()
    dual = [
        r
        for r in rows
        if r["lex_rank"] is not None and r["vec_rank"] is not None
    ]
    single = [
        r for r in rows if (r["lex_rank"] is None) != (r["vec_rank"] is None)
    ]
    for d in dual:
        for s in single:
            if d["query_id"] != s["query_id"]:
                continue
            s_rank = s["lex_rank"] if s["lex_rank"] is not None else s["vec_rank"]
            if (d["lex_rank"] <= s_rank) and (d["vec_rank"] <= s_rank):
                assert d["rrf_score"] > s["rrf_score"]


# ------------------------------------------------------------ asof events
def _events(spark, rows):
    return spark.createDataFrame(
        [
            Row(
                event_id=i,
                user_id=u,
                event_type=t,
                ts=ns,
                value=float(v),
            )
            for i, u, t, ns, v in rows
        ]
    )


def test_asof_backward_forward_and_tolerance(spark):
    ev = _events(
        spark,
        [
            (1, 7, "view", 1_000, 0),
            (2, 7, "view", 5_000, 0),
            (3, 7, "purchase", 6_000, 9.5),
            (4, 7, "click", 6_500, 0),
            (5, 7, "purchase", 50_000, 1.0),  # view gap 45_000 > tol
            (6, 8, "purchase", 100, 2.0),  # no view at all, no click
        ],
    )
    out = {
        r["event_id"]: r
        for r in asof_events_tolerance(ev, tol_ns=10_000).collect()
    }
    assert out[3]["last_view_id"] == 2 and out[3]["view_gap_ns"] == 1_000
    assert out[3]["next_click_id"] == 4 and out[3]["click_gap_ns"] == 500
    assert out[5]["last_view_id"] is None and out[5]["view_gap_ns"] is None
    assert out[6]["last_view_id"] is None and out[6]["next_click_id"] is None


def test_asof_equal_timestamp_visibility(spark):
    """View at exactly the purchase ts matches backward; click at exactly
    the purchase ts matches forward; other users never leak in."""
    ev = _events(
        spark,
        [
            (1, 1, "view", 2_000, 0),
            (2, 1, "purchase", 2_000, 1.0),
            (3, 1, "click", 2_000, 0),
            (4, 2, "view", 1_999, 0),
        ],
    )
    out = asof_events_tolerance(ev, tol_ns=10).collect()
    assert len(out) == 1
    r = out[0]
    assert r["last_view_id"] == 1 and r["view_gap_ns"] == 0
    assert r["next_click_id"] == 3 and r["click_gap_ns"] == 0


def test_asof_tie_between_two_views_picks_higher_event_id(spark):
    ev = _events(
        spark,
        [
            (1, 1, "view", 2_000, 0),
            (9, 1, "view", 2_000, 0),
            (3, 1, "purchase", 2_500, 1.0),
        ],
    )
    out = asof_events_tolerance(ev, tol_ns=10_000).collect()
    assert out[0]["last_view_id"] == 9


# ------------------------------------------------------------ ngram novelty
def _docs(spark, texts):
    return spark.createDataFrame(
        [
            Row(doc_id=i, text=t, lang="en", source="s", n_chars=len(t))
            for i, t in sorted(texts.items())
        ]
    )


def test_novelty_duplicate_doc_contributes_nothing(spark):
    from marketstream_etl_spark.operators.novelty import ngram_novelty

    texts = {
        0: "alpha beta gamma delta epsilon",
        1: "alpha beta gamma delta epsilon",  # exact dup of 0
        2: "one two three four",
    }
    out = {r["doc_id"]: r for r in ngram_novelty(_docs(spark, texts)).collect()}
    assert out[0]["n_grams"] == 3 and out[0]["new_grams"] == 3
    assert out[1]["n_grams"] == 3 and out[1]["new_grams"] == 0
    assert out[1]["novelty_ppm"] == 0
    assert out[2]["new_grams"] == 2
    assert out[2]["cum_new"] == 5
    assert out[2]["coverage_ppm"] == 1_000_000  # last doc closes the corpus


def test_novelty_short_doc_and_monotone_coverage(spark):
    from marketstream_etl_spark.operators.novelty import ngram_novelty

    texts = {
        0: "too short",  # < k tokens -> zero grams
        1: "a b c d",
        2: "c d e f",  # shares the 1-shingle overlap "c d e"? no: grams are b c d etc.
    }
    rows = ngram_novelty(_docs(spark, texts)).collect()
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id[0]["n_grams"] == 0 and by_id[0]["novelty_ppm"] == 0
    cums = [r["cum_new"] for r in sorted(rows, key=lambda r: r["doc_id"])]
    assert cums == sorted(cums), "coverage must be monotone"
    assert by_id[2]["coverage_ppm"] == 1_000_000
    # every new_grams <= n_grams
    for r in rows:
        assert 0 <= r["new_grams"] <= r["n_grams"]


# --------------------------------------------------------- link prediction
def test_link_prediction_path_graph(spark):
    """Path 1-2-3 (both edges weight 2): the one candidate is (1,3) via
    center 2 (deg 2) -> cn=1, ra_micro=500000, jaccard=1/(1+1-1)=1."""
    from marketstream_etl_spark.operators.graph import link_prediction

    li = _lineitem(spark, {10: [1, 2], 11: [1, 2], 12: [2, 3], 13: [2, 3]})
    rows = link_prediction(li).collect()
    assert [(r.pa, r.pb, r.cn, r.ra_micro, r.jaccard) for r in rows] == [
        (1, 3, 1, 500000, 1.0)
    ]


def test_link_prediction_excludes_known_edges(spark):
    """A complete triangle has no missing edges -> empty prediction."""
    from marketstream_etl_spark.operators.graph import link_prediction

    li = _lineitem(spark, {10: [1, 2, 3], 11: [1, 2, 3]})
    assert link_prediction(li).collect() == []


def test_link_prediction_hub_cap_drops_quadratic_centers(spark):
    """With hub_cap=1 the degree-2 path center is excluded -> no wedges."""
    from marketstream_etl_spark.operators.graph import link_prediction

    li = _lineitem(spark, {10: [1, 2], 11: [1, 2], 12: [2, 3], 13: [2, 3]})
    assert link_prediction(li, hub_cap=1).collect() == []
