"""Property-style invariants for the late-r6 statistical audit ops:
Gini bounds and extremes, entropy bounds, PSI non-negativity/symmetry
of contribution structure, containment vs Jaccard dominance, transition
row-stochasticity — constructed inputs, exact assertions."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F


def _skew_one(spark, keys):
    from marketstream_etl_spark.plans.advanced import _skew_profile_one

    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    return _skew_profile_one(df, "t", "k").collect()[0]


def test_gini_bounds_and_monotonicity(spark):
    """0 for uniform; grows with concentration; < 1 always; max_cnt/avg
    ratio consistent."""
    uniform = _skew_one(spark, list("abcd") * 3)
    assert uniform["gini"] == 0.0
    mild = _skew_one(spark, list("aab") + list("cd"))
    heavy = _skew_one(spark, list("aaaaaaaab") + list("cd"))
    assert 0.0 <= mild["gini"] < heavy["gini"] < 1.0
    assert heavy["skew_ratio"] > mild["skew_ratio"] > 1.0


def test_entropy_never_exceeds_log_vocab(spark, monkeypatch):
    from math import log

    from marketstream_etl_spark.plans import training_data as td

    docs_frame = spark.createDataFrame([
        Row(doc_id=0, text="a a a b c", source="s1"),
        Row(doc_id=1, text="x y z x y z q q q q", source="s2"),
    ])
    monkeypatch.setattr(td, "load_table", lambda sp, sf, name: docs_frame)
    for r in td.q_source_entropy(spark, "x").collect():
        assert 0.0 <= r["entropy"] <= round(log(r["n_terms"]), 6) + 1e-9
        assert r["norm_entropy"] is None or 0.0 <= r["norm_entropy"] <= 1.0


def test_psi_contributions_are_nonnegative(spark, monkeypatch):
    """Each (p_a-p_b)·ln(p_a/p_b) term is >= 0 (same sign factors), so
    psi_part >= 0 and the total equals the part sum."""
    from marketstream_etl_spark.plans import advanced as adv

    rows, eid = [], 0
    for seg, vals in (("click", [10.0] * 6 + [60.0] * 4),
                      ("purchase", [10.0] * 2 + [60.0] * 8)):
        for v in vals:
            rows.append((eid, 1, 1000 + eid, seg, v, "{}")); eid += 1
    ev = spark.createDataFrame(
        rows, ["event_id", "user_id", "ts", "event_type", "value", "props"]
    )
    monkeypatch.setattr(adv, "load_table", lambda sp, sf, name: ev)
    out = adv.q_psi_drift(spark, "x").collect()
    assert all(r["psi_part"] >= 0.0 for r in out)
    total = out[0]["psi_total"]
    assert abs(total - sum(r["psi_part"] for r in out)) < 1e-9


def test_containment_dominates_jaccard(spark):
    """For every emitted pair, containment >= the pair's Jaccard would
    be (inter/min >= inter/union); and containment <= 1."""
    from marketstream_etl_spark.operators.dedup import containment_pairs

    texts = [
        "alpha bravo charlie delta echo foxtrot golf hotel",
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo",
        "alpha bravo charlie xray yankee zulu whiskey victor",
    ]
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    for r in containment_pairs(docs).collect():
        assert 0.7 <= r["containment"] <= 1.0


def test_transition_rows_sum_to_one(spark, monkeypatch):
    from collections import defaultdict

    from marketstream_etl_spark.plans import advanced as adv

    m = 60_000_000_000
    rows = []
    seq = ["click", "view", "click", "purchase", "view", "view", "click"]
    for i, t in enumerate(seq):
        rows.append((i, 1, i * m, t, 0.0, "{}"))
    ev = spark.createDataFrame(
        rows, ["event_id", "user_id", "ts", "event_type", "value", "props"]
    )
    monkeypatch.setattr(adv, "load_table", lambda sp, sf, name: ev)
    sums = defaultdict(float)
    for r in adv.q_session_transitions(spark, "x").collect():
        sums[r["from_type"]] += r["prob"]
    for s in sums.values():
        # probs are rounded to 6 dp before summing: three 1/3 rows sum
        # to 0.999999, so the bound is per-row rounding error
        assert abs(s - 1.0) <= 5e-6


def test_funnel_matches_bruteforce_on_random_journeys(spark, monkeypatch):
    """Deterministic pseudo-random event journeys vs a brute-force Python
    funnel: per-user in-order prefix reachability and the monotone
    n1 >= n2 >= n3 invariant."""
    from marketstream_etl_spark.plans import advanced as adv

    # LCG so the corpus is reproducible without Python's random module
    x, rows, eid = 42, [], 0
    types = ["view", "click", "purchase", "signup", "error"]
    journeys: dict[int, list[tuple[int, int, str]]] = {}
    for user in range(40):
        n = 1 + (user * 7) % 6
        for i in range(n):
            x = (x * 1103515245 + 12345) % (1 << 31)
            ty = types[x % len(types)]
            ts = 1000 + (x % 997)
            rows.append((eid, user, ts, ty))
            journeys.setdefault(user, []).append((ts, eid, ty))
            eid += 1
    ev = spark.createDataFrame(
        [(e, u, t, ty, 1.0, "{}") for e, u, t, ty in rows],
        ["event_id", "user_id", "ts", "event_type", "value", "props"],
    )
    monkeypatch.setattr(adv, "load_table", lambda sp, sf, name: ev)
    out = {r["step"]: r["n_users"] for r in
           adv.q_funnel_steps(spark, "x").collect()}

    # brute force: scan each journey in (ts, event_id) order
    n1 = n2 = n3 = 0
    for evs in journeys.values():
        seen1 = seen2 = seen3 = False
        for _, _, ty in sorted(evs):
            if ty == "view":
                seen1 = True
            elif ty == "click" and seen1:
                seen2 = True
            elif ty == "purchase" and seen2:
                seen3 = True
        n1 += seen1; n2 += seen2; n3 += seen3
    assert (out[1], out[2], out[3]) == (n1, n2, n3)
    assert out[1] >= out[2] >= out[3]


# --- late-r9 wave invariants -------------------------------------------------


def _drift_events(spark, click_vals, purchase_vals, swap=False):
    a, b = ("purchase", "click") if swap else ("click", "purchase")
    rows, eid = [], 0
    for seg, vals in ((a, click_vals), (b, purchase_vals)):
        for v in vals:
            rows.append((eid, 1, 1000 + eid, seg, float(v), '{"k": 1}'))
            eid += 1
    return spark.createDataFrame(
        rows, ["event_id", "user_id", "ts", "event_type", "value", "props"]
    )


def test_chi2_segment_swap_symmetry(spark, monkeypatch):
    """A contingency test is symmetric in its rows: relabeling the
    segments must not change chi2, dof, or Cramer's V."""
    from marketstream_etl_spark.plans import advanced as adv

    c = [10.0] * 7 + [60.0] * 3 + [120.0] * 2
    p = [10.0] * 2 + [60.0] * 5 + [260.0] * 4
    outs = []
    for swap in (False, True):
        ev = _drift_events(spark, c, p, swap=swap)
        monkeypatch.setattr(adv, "load_table", lambda sp, sf, name: ev)
        outs.append(adv.q_chi2_drift(spark, "x").collect()[0])
    assert outs[0]["chi2_stat"] == outs[1]["chi2_stat"]
    assert outs[0]["dof"] == outs[1]["dof"]
    assert outs[0]["cramers_v"] == outs[1]["cramers_v"]
    assert outs[0]["drifted"] == outs[1]["drifted"]


def test_chi2_contributions_nonnegative_and_sum(spark, monkeypatch):
    """Every (O-E)^2/E cell term is >= 0 and the statistic equals the
    per-bucket contribution sum exactly (integer e6 identity)."""
    from marketstream_etl_spark.plans import advanced as adv

    ev = _drift_events(
        spark, [10.0] * 5 + [60.0] * 5, [10.0] * 3 + [110.0] * 7
    )
    monkeypatch.setattr(adv, "load_table", lambda sp, sf, name: ev)
    out = adv.q_chi2_drift(spark, "x").collect()
    assert all(r["contrib_e6"] >= 0 for r in out)
    total_e6 = round(out[0]["chi2_stat"] * 1e6)
    assert total_e6 == sum(r["contrib_e6"] for r in out)


def test_roc_auc_label_flip_complements(spark, monkeypatch):
    """Flipping the labels maps AUC -> 1 - AUC (midrank identity) and
    negates Gini."""
    from marketstream_etl_spark.plans import training_data as td

    scores = [(i, s, p) for i, (s, p) in enumerate([
        (120_000, 1), (300_000, 0), (300_000, 1), (520_000, 0),
        (520_000, 0), (700_000, 1), (880_000, 1), (880_000, 0),
    ])]
    flipped = [(i, s, 1 - p) for i, s, p in scores]
    outs = []
    for rows in (scores, flipped):
        monkeypatch.setattr(
            td,
            "_quality_scored",
            lambda sp, sf, _r=rows: sp.createDataFrame(
                _r, ["doc_id", "score_e6", "pos"]
            ),
        )
        outs.append(td.q_roc_auc(spark, "x").collect()[0])
    assert abs(outs[0]["auc"] + outs[1]["auc"] - 1.0) < 2e-6
    assert abs(outs[0]["gini"] + outs[1]["gini"]) < 2e-6


def test_information_value_label_swap_invariant(spark, monkeypatch):
    """IV = sum (p-n)ln(p/n) is symmetric under class exchange: iv_total
    unchanged, every WoE negated."""
    from marketstream_etl_spark.plans import training_data as td

    rows = [(i, s, p) for i, (s, p) in enumerate([
        (150_000, 1), (150_000, 1), (150_000, 0),
        (450_000, 0), (450_000, 1),
        (850_000, 0), (850_000, 0), (850_000, 1),
    ])]
    flipped = [(i, s, 1 - p) for i, s, p in rows]
    outs = []
    for r in (rows, flipped):
        monkeypatch.setattr(
            td,
            "_quality_scored",
            lambda sp, sf, _r=r: sp.createDataFrame(
                _r, ["doc_id", "score_e6", "pos"]
            ),
        )
        outs.append(td.q_information_value(spark, "x").collect())
    for a, b in zip(outs[0], outs[1]):
        assert a["iv_part"] == b["iv_part"]
        assert a["woe"] == -b["woe"]
    assert outs[0][0]["iv_total"] == outs[1][0]["iv_total"]


def test_embedding_drift_snapshot_swap_symmetry(spark, monkeypatch):
    """PSI is symmetric in (a, b): exchanging which rows form the
    baseline vs candidate snapshot leaves every per-dim PSI unchanged."""
    from marketstream_etl_spark.plans import training_data as td

    base = [0.05, -0.2, 0.4]
    moved = [0.05, 0.3, -0.1]
    vecs = [base if i % 2 == 0 else moved for i in range(10)]

    def frame(sp, shift):
        return sp.createDataFrame(
            [(i + shift, v, 0) for i, v in enumerate(vecs)],
            ["vec_id", "embedding", "label"],
        )

    outs = []
    for shift in (0, 1):  # +1 flips every row's snapshot parity
        monkeypatch.setattr(
            td, "load_table", lambda sp, sf, name, _s=shift: frame(sp, _s)
        )
        outs.append(
            sorted(
                td.q_embedding_drift(spark, "x").collect(),
                key=lambda r: r["dim"],
            )  # output order is unspecified (r13)
        )
    for a, b in zip(outs[0], outs[1]):
        assert a["dim"] == b["dim"] and a["psi"] == b["psi"]
    assert outs[0][0]["max_psi"] == outs[1][0]["max_psi"]
