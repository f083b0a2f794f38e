"""Temporal-operator correctness armor.

The as-of union+window rewrite is the subtlest algorithm in plans/
temporal.py — a Hypothesis property checks it against a brute-force
Python model (latest right row with ts <= left ts, inclusive).
Sessionization and rolling-window invariants are spot-checked on the
sf0.001 testdata.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from hdfs_with_pyspark_spark.operators.asof import asof_join
from hdfs_with_pyspark_spark.plans.registry import QUERIES

SLOW = settings(max_examples=10, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])

key = st.integers(min_value=0, max_value=2)
ts = st.integers(min_value=0, max_value=20)


@SLOW
@given(lefts=st.lists(st.tuples(key, ts), min_size=1, max_size=10),
       rights=st.lists(st.tuples(key, ts), min_size=0, max_size=10))
def test_asof_join_matches_bruteforce(spark, lefts, rights):
    # Right must be unique per (key, ts) — the operator's contract; the
    # value encodes (key, ts) so the match content is checkable.
    rights = {(k, t): k * 1000 + t for (k, t) in rights}
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lefts)], "lid int, k int, t int")
    rdf = spark.createDataFrame(
        [(k, t, v) for (k, t), v in rights.items()] or [(None, None, None)],
        "k int, t int, v int").where(F.col("k").isNotNull())
    out = {r["lid"]: r["v"]
           for r in asof_join(ldf, rdf, on=["k"], left_ts="t", right_ts="t",
                              value_cols=["v"]).collect()}
    for i, (k, t) in enumerate(lefts):
        earlier = [ts_ for (k_, ts_) in rights if k_ == k and ts_ <= t]
        expect = (k * 1000 + max(earlier)) if earlier else None
        assert out[i] == expect, (i, k, t, out[i], expect)


def test_asof_join_inclusive_at_equal_ts(spark):
    ldf = spark.createDataFrame([(1, 5)], "k int, t int")
    rdf = spark.createDataFrame([(1, 5, 99)], "k int, t int, v int")
    [row] = asof_join(ldf, rdf, on=["k"], left_ts="t", right_ts="t",
                      value_cols=["v"]).collect()
    assert row["v"] == 99  # right row at equal ts IS eligible


def test_sessions_partition_events(spark, sf_dir):
    total = QUERIES["user_sessions"](spark, sf_dir)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    agg = total.agg(F.sum("n_events"), F.sum("n_sessions")).collect()[0]
    assert agg[0] == ev.count()          # sessions partition the events
    assert 0 < agg[1] <= agg[0]


def test_rolling_frame_matches_bruteforce(spark, sf_dir):
    rows = QUERIES["rolling_daily_revenue"](spark, sf_dir).collect()
    daily = {}  # (priority, day) -> revenue
    for r in rows:
        daily[(r["o_orderpriority"], r["day"])] = r["revenue"]
    import datetime
    for r in rows:
        d = datetime.date.fromisoformat(r["day"])
        win = [daily.get((r["o_orderpriority"],
                          (d - datetime.timedelta(days=i)).isoformat()))
               for i in range(7)]
        present = [v for v in win if v is not None]
        assert abs(sum(present) - r["revenue_7d"]) < 1e-6
        assert len(present) == r["n_days_7d"]


def test_time_proximity_band_edges(spark, monkeypatch):
    # Error at t=100000; clicks at +/-1800 (inclusive), +/-1801 (out),
    # and one unrelated type. Banding must find the inclusive edges even
    # when they land in neighboring cells.
    from hdfs_with_pyspark_spark.plans import temporal as tp
    import datetime as dt
    base = dt.datetime(2024, 1, 10, 0, 0, 0)

    def at(s):
        return base + dt.timedelta(seconds=s)

    rows = [(1, at(0), 7, "error", 0.0, None),
            (2, at(-1800), 7, "click", 0.0, None),
            (3, at(1800), 7, "click", 0.0, None),
            (4, at(-1801), 7, "click", 0.0, None),
            (5, at(1801), 7, "click", 0.0, None),
            (6, at(10), 7, "view", 0.0, None)]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    monkeypatch.setattr(tp, "read_table", lambda s, d, n: ev)
    out = tp.events_time_proximity(spark, "x").collect()
    assert len(out) == 1 and out[0]["n_nearby_clicks"] == 2


def test_time_proximity_no_nested_loop(spark, sf_dir):
    # The whole point of the banding rewrite: the physical plan must be
    # an equi-join on the cell id, never a nested-loop over the
    # inequality predicate.
    from hdfs_with_pyspark_spark.plans import temporal as tp
    plan = (tp.events_time_proximity(spark, sf_dir)
              ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_daily_anomalies_zero_stddev_yields_null(spark, monkeypatch):
    # A heartbeat-like event type with constant daily volume has zero
    # stddev: the z-score must be NULL (matching the oracle), not an
    # ANSI DIVIDE_BY_ZERO crash.
    import datetime as dt

    from hdfs_with_pyspark_spark.plans import temporal as tp
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        rows = [(i, dt.datetime(2024, 1, 1 + d, 2, 0, 0), 1,
                 "heartbeat", 1.0, None)
                for i, d in enumerate([0, 0, 1, 1, 2, 2])]
        ev = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
                  "event_type string, value double, props string")
        monkeypatch.setattr(tp, "read_table", lambda s, d, n: ev)
        out = tp.events_daily_anomalies(spark, "x").collect()
        assert len(out) == 3
        assert all(r["zscore"] is None and r["is_anomaly"] is None
                   for r in out)
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def test_funnel_conversion_consistent_with_user_funnel(spark, sf_dir):
    from hdfs_with_pyspark_spark.plans import temporal as tp

    detail = tp.user_funnel(spark, sf_dir)
    agg = {r["step"]: r for r in
           tp.events_funnel_conversion(spark, sf_dir).collect()}
    truth = detail.agg(
        F.sum(F.col("did_signup").cast("long")).alias("n1"),
        F.sum(F.col("did_click").cast("long")).alias("n2"),
        F.sum(F.col("did_purchase").cast("long")).alias("n3")).first()
    assert agg["signup"]["n_users"] == truth["n1"]
    assert agg["click"]["n_users"] == truth["n2"]
    assert agg["purchase"]["n_users"] == truth["n3"]
    # Ordered-funnel counts are monotone non-increasing, rates in [0, 1].
    assert truth["n1"] >= truth["n2"] >= truth["n3"]
    for r in agg.values():
        assert r["conv_from_prev"] is None or 0.0 <= r["conv_from_prev"] <= 1.0
        assert r["conv_from_first"] is None or 0.0 <= r["conv_from_first"] <= 1.0
    assert agg["purchase"]["conv_from_first"] <= agg["click"]["conv_from_first"]


def test_t_closeness_bounds_and_uniform_case(spark, monkeypatch):
    # EMD is within [0, 1e6] ppm on real data; a bucket whose decade
    # distribution EQUALS the global distribution has t = 0 (hand
    # dataset: both hours see the same value mix).
    import datetime as dt

    from hdfs_with_pyspark_spark.plans import temporal as tp

    rows = []
    i = 0
    for hour in (2, 3):
        for dec_val, cnt in ((5.0, 2), (15.0, 2)):
            for _ in range(cnt):
                rows.append((i, dt.datetime(2024, 1, 1, hour, 0, 0), 1,
                             "click", dec_val, None))
                i += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    monkeypatch.setattr(tp, "read_table", lambda s, d, n: ev)
    out = {(r["event_type"], r["hour_of_day"]): r
           for r in tp.events_t_closeness(spark, "x").collect()}
    assert all(r["t_ppm"] == 0 for r in out.values())
    assert all(r["k"] == 4 for r in out.values())


def test_t_closeness_disjoint_distributions_max_out(spark, monkeypatch):
    # Two buckets with DISJOINT sensitive values at opposite ends of the
    # order: each bucket's EMD from the 50/50 global mix is the maximal
    # single-step mass move = 0.5 (500000 ppm) with m=2 decades.
    import datetime as dt

    from hdfs_with_pyspark_spark.plans import temporal as tp

    rows = []
    i = 0
    for hour, dec_val in ((2, 5.0), (3, 15.0)):
        for _ in range(3):
            rows.append((i, dt.datetime(2024, 1, 1, hour, 0, 0), 1,
                         "click", dec_val, None))
            i += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    monkeypatch.setattr(tp, "read_table", lambda s, d, n: ev)
    out = {r["hour_of_day"]: r["t_ppm"]
           for r in tp.events_t_closeness(spark, "x").collect()}
    assert out == {2: 500000, 3: 500000}


def test_survival_km_hand_case(spark, monkeypatch):
    # A orders day 0 and day 10 (one event gap of 10, censored 0 at the
    # corpus max); B orders day 0 only (censored at 10). At t=10 one of
    # the two still-at-risk observations is an event: S = 1/2.
    from hdfs_with_pyspark_spark.plans import temporal as t
    rows = [(1, 1, "2020-01-01"), (2, 1, "2020-01-11"),
            (3, 2, "2020-01-01")]
    o = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, d string").selectExpr(
        "o_orderkey", "o_custkey", "CAST(d AS TIMESTAMP) AS o_orderdate")
    monkeypatch.setattr(t, "read_table", lambda s, dd, n: o)
    out = t.orders_survival_km(spark, "x").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["t_days"], r["n_risk"], r["n_events"]) == (10, 2, 1)
    assert r["survival_ppm"] == 500_000


def test_survival_km_monotone(spark, sf_dir):
    # KM is a survival curve: non-increasing in t, inside [0, 1e6];
    # n_risk strictly decreases over successive event times.
    from hdfs_with_pyspark_spark.plans.temporal import orders_survival_km
    rows = sorted(orders_survival_km(spark, sf_dir).collect(),
                  key=lambda r: r["t_days"])
    assert rows
    s_prev, n_prev = 1_000_001, None
    for r in rows:
        assert 0 <= r["survival_ppm"] <= 1_000_000
        assert r["survival_ppm"] <= s_prev
        assert 1 <= r["n_events"] <= r["n_risk"]
        if n_prev is not None:
            assert r["n_risk"] < n_prev
        s_prev, n_prev = r["survival_ppm"], r["n_risk"]


def test_ab_test_eval_hand_counts(spark, monkeypatch):
    # Variants follow the md5('ab:'||uid) 60-bit parity exactly;
    # conversion = any purchase. Recompute both in pure Python.
    import hashlib

    from hdfs_with_pyspark_spark.plans import temporal as t
    rows = []
    eid = 0
    purchases = {2, 5, 7}
    for uid in range(10):
        eid += 1
        rows.append((eid, uid, "view"))
        if uid in purchases:
            eid += 1
            rows.append((eid, uid, "purchase"))
    ev = spark.createDataFrame(rows, "event_id long, user_id long, "
                                     "event_type string")
    monkeypatch.setattr(t, "read_table", lambda s, dd, n: ev)
    out = t.events_ab_test_eval(spark, "x").collect()[0]

    def variant(uid: int) -> int:
        return int(hashlib.md5(f"ab:{uid}".encode()).hexdigest()[:15],
                   16) % 2

    n = {0: 0, 1: 0}
    conv = {0: 0, 1: 0}
    for uid in range(10):
        v = variant(uid)
        n[v] += 1
        conv[v] += int(uid in purchases)
    assert (out["n_a"], out["conv_a"]) == (n[0], conv[0])
    assert (out["n_b"], out["conv_b"]) == (n[1], conv[1])
    assert out["rate_a_ppm"] == (1_000_000 * conv[0]) // n[0]
    assert out["rate_b_ppm"] == (1_000_000 * conv[1]) // n[1]


def test_cohort_ltv_hand_case(spark, monkeypatch):
    # Cohort month M: A (10.00 at M, 5.00 at M+1) and B (2.00 at M).
    # age 0: revenue 1200c, cum 1200c, ltv 600c; age 1: 500c, cum
    # 1700c, ltv 850c (cohort size 2).
    from hdfs_with_pyspark_spark.plans import temporal as t
    rows = [(1, 1, "2021-03-10", 10.00), (2, 1, "2021-04-02", 5.00),
            (3, 2, "2021-03-20", 2.00)]
    o = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, d string, "
              "o_totalprice double").selectExpr(
        "o_orderkey", "o_custkey", "CAST(d AS TIMESTAMP) AS o_orderdate",
        "o_totalprice")
    monkeypatch.setattr(t, "read_table", lambda s, dd, n: o)
    out = {r["age_months"]: r
           for r in t.orders_cohort_ltv(spark, "x").collect()}
    assert set(out) == {0, 1}
    assert out[0]["cohort_size"] == 2
    assert (out[0]["revenue_cents"], out[0]["cum_revenue_cents"],
            out[0]["ltv_cents_per_user"]) == (1200, 1200, 600)
    assert (out[1]["revenue_cents"], out[1]["cum_revenue_cents"],
            out[1]["ltv_cents_per_user"]) == (500, 1700, 850)


def test_cep_pattern_hand_sequence(spark, monkeypatch):
    # user 1: view@0s -> purchase@100s        => match (gap 100s)
    #         view@200s -> error@250s -> purchase@300s => NO match
    #         error@400s -> view@500s -> purchase@600s => match (error
    #         older than the view does not block)
    # user 2: purchase with no prior view     => no match
    # user 3: view -> purchase after window   => no match
    from hdfs_with_pyspark_spark.plans import temporal as t
    base = "2021-01-01 00:00:00"
    rows = [
        (1, 1, "view", 0), (2, 1, "purchase", 100),
        (3, 1, "view", 200), (4, 1, "error", 250), (5, 1, "purchase", 300),
        (6, 1, "error", 400), (7, 1, "view", 500), (8, 1, "purchase", 600),
        (9, 2, "purchase", 50),
        (10, 3, "view", 0), (11, 3, "purchase", 4000),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, off long"
    ).selectExpr("event_id", "user_id", "event_type",
                 f"CAST('{base}' AS TIMESTAMP) + make_interval(0,0,0,0,0,0,"
                 "off) AS ts")
    monkeypatch.setattr(t, "read_table", lambda s, d, n: ev)
    out = {r["purchase_event_id"]: r["gap_us"]
           for r in t.events_cep_pattern_match(spark, "x").collect()}
    assert out == {2: 100_000_000, 8: 100_000_000}


def test_power_analysis_hand_case(spark, monkeypatch):
    """Users with known md5-parity variants and conversions: the
    required sample size must equal the closed-form two-proportion
    formula computed independently in Python, and degenerate inputs
    (equal rates) must yield NULL instead of an ANSI divide error."""
    import hashlib
    import math

    from hdfs_with_pyspark_spark.plans import temporal as tp

    def parity(uid: int) -> int:
        return int(hashlib.md5(f"ab:{uid}".encode()).hexdigest()[:15],
                   16) % 2

    arm = {0: [], 1: []}
    uid = 0
    while len(arm[0]) < 10 or len(arm[1]) < 10:
        arm[parity(uid)].append(uid)
        uid += 1
    a_users, b_users = arm[0][:10], arm[1][:10]
    # p1 = 2/10, p2 = 5/10: conversions are 'purchase' events.
    rows = []
    eid = 0
    for i, u in enumerate(a_users):
        rows.append((eid, u, "purchase" if i < 2 else "view")); eid += 1
    for i, u in enumerate(b_users):
        rows.append((eid, u, "purchase" if i < 5 else "view")); eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string")
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        monkeypatch.setattr(tp, "read_table", lambda s, d, n: ev)
        r = tp.events_power_analysis(spark, "x").first()
        assert (r.n_a, r.conv_a, r.n_b, r.conv_b) == (10, 2, 10, 5)
        p1, p2 = 0.2, 0.5
        pbar = (p1 + p2) / 2.0
        num = (tp.Z_ALPHA_2 * math.sqrt(2.0 * pbar * (1.0 - pbar))
               + tp.Z_BETA_80 * math.sqrt(p1 * (1 - p1) + p2 * (1 - p2)))
        expect = math.ceil((num * num) / ((p2 - p1) * (p2 - p1)))
        assert r.n_required_per_arm == expect

        # Equal rates -> zero effect -> NULL, no divide error.
        rows_eq = []
        eid = 0
        for i, u in enumerate(a_users):
            rows_eq.append((eid, u, "purchase" if i < 3 else "view"))
            eid += 1
        for i, u in enumerate(b_users):
            rows_eq.append((eid, u, "purchase" if i < 3 else "view"))
            eid += 1
        ev_eq = spark.createDataFrame(
            rows_eq, "event_id long, user_id long, event_type string")
        monkeypatch.setattr(tp, "read_table", lambda s, d, n: ev_eq)
        r = tp.events_power_analysis(spark, "x").first()
        assert r.n_required_per_arm is None
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
