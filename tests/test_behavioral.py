"""Semantic + plan tests for pipeline/behavioral.py (sessionize,
funnel, cohort retention, histogram)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from pigout_spark.pipeline.behavioral import (
    cohort_retention,
    funnel_counts,
    funnel_steps,
    histogram,
    session_stats,
    sessionize,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, rows):
    """rows: (user_id, offset_seconds, event_type, value)."""
    return spark.createDataFrame(
        [
            (u, T0 + dt.timedelta(seconds=s), typ, float(v))
            for (u, s, typ, v) in rows
        ],
        "user_id bigint, ts timestamp, event_type string, value double",
    )


def test_sessionize_gap_boundary_merges(spark):
    """A gap of EXACTLY the threshold merges (strict > starts a new
    session) — matching Spark session_window's rule."""
    df = _ev(spark, [(1, 0, "a", 0), (1, 1800, "a", 0), (1, 3601, "a", 0)])
    out = sessionize(df, gap_seconds=1800).select("ts", "session_seq").collect()
    seqs = {r.ts: r.session_seq for r in out}
    assert seqs[T0] == 1
    assert seqs[T0 + dt.timedelta(seconds=1800)] == 1  # boundary merges
    assert seqs[T0 + dt.timedelta(seconds=3601)] == 2  # 1801s gap splits


def test_sessionize_ties_share_session(spark):
    df = _ev(spark, [(1, 0, "a", 0), (1, 0, "b", 0), (1, 0, "c", 0)])
    out = sessionize(df, gap_seconds=10).select("session_seq").collect()
    assert [r.session_seq for r in out] == [1, 1, 1]


def test_sessionize_keys_independent(spark):
    df = _ev(spark, [(1, 0, "a", 0), (2, 5000, "a", 0), (1, 5000, "a", 0)])
    out = session_stats(df, gap_seconds=1800)
    rows = {(r.user_id, r.session_seq): r.n_events for r in out.collect()}
    assert rows == {(1, 1): 1, (1, 2): 1, (2, 1): 1}


def test_funnel_requires_strict_order(spark):
    """A purchase BEFORE the first view (or tied with the click) must
    not complete the funnel."""
    rows = [
        # user 1: clean progression view < click < purchase
        (1, 0, "view", 0), (1, 10, "click", 0), (1, 20, "purchase", 0),
        # user 2: purchase precedes the view -> stage stops at click
        (2, 50, "purchase", 0), (2, 100, "view", 0), (2, 200, "click", 0),
        # user 3: click tied with view (strict > -> not counted)
        (3, 0, "view", 0), (3, 0, "click", 0),
    ]
    out = funnel_steps(_ev(spark, rows), ["view", "click", "purchase"])
    stages = {r.user_id: r.funnel_stage for r in out.collect()}
    assert stages == {1: 3, 2: 2, 3: 1}


def test_funnel_picks_earliest_valid_chain(spark):
    """Later duplicate steps don't shift earlier completions."""
    rows = [
        (1, 0, "view", 0), (1, 5, "view", 0),
        (1, 10, "click", 0), (1, 8, "click", 0),
    ]
    out = funnel_steps(_ev(spark, rows), ["view", "click"]).collect()[0]
    assert out.step_1_ts == T0
    assert out.step_2_ts == T0 + dt.timedelta(seconds=8)


def test_funnel_counts_monotone(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    fc = funnel_counts(ev, ["view", "click", "purchase"])
    rows = sorted((r.step, r.n_keys) for r in fc.collect())
    counts = [n for _, n in rows]
    assert counts == sorted(counts, reverse=True)


def test_cohort_offset_zero_covers_all_keys(spark, sf_dir):
    """Every key is active in its own cohort period, so Σ n_keys at
    offset 0 equals the number of distinct keys."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cr = cohort_retention(ev, period_seconds=86400)
    at0 = (
        cr.filter(F.col("period_offset") == 0)
        .agg(F.sum("n_keys").alias("s"))
        .collect()[0]
        .s
    )
    n_users = ev.select("user_id").distinct().count()
    assert at0 == n_users
    assert cr.filter(F.col("period_offset") < 0).count() == 0


def test_histogram_clamps_and_conserves(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (4.9,), (5.0,), (99.9,), (150.0,), (None,)],
        "v double",
    )
    h = {r.bin: r.cnt for r in histogram(df, "v", 20, 0.0, 100.0).collect()}
    assert h[0] == 3  # -5 clamped, 0.0, 4.9
    assert h[1] == 1  # 5.0 lands in bin 1 (left-closed bins)
    assert h[19] == 2  # 99.9 plus 150 clamped
    assert sum(h.values()) == 6  # null dropped


def test_histogram_edges_deterministic(spark):
    h = histogram(
        spark.createDataFrame([(12.5,)], "v double"), "v", 8, 10.0, 30.0
    ).collect()[0]
    assert h.bin == 1 and abs(h.bin_lo - 12.5) < 1e-12


def test_funnel_single_exchange(spark, sf_dir):
    """The three chained conditional window-mins and the final per-key
    reduction all share ONE hash exchange on the key."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    df = funnel_steps(ev, ["view", "click", "purchase"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange SinglePartition" not in plan


def test_sessionize_no_global_sort(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    df = session_stats(ev, gap_seconds=1800)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
    assert "rangepartitioning" not in plan
    # window pass + session rollup: at most two key-hash exchanges
    assert plan.count("Exchange hashpartitioning") <= 2


def test_cohort_reuses_key_partitioning(spark, sf_dir):
    """The (key, cohort, offset) distinct runs on the window's existing
    key partitioning (subset-satisfies-clustering); only the final tiny
    rollup re-shuffles."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    df = cohort_retention(ev, period_seconds=86400)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "Exchange SinglePartition" not in plan


def test_rolling_agg_trailing_window_and_ties(spark):
    """RANGE frame: window is [ts-w, ts] inclusive, and tied timestamps
    see each other regardless of row order."""
    from pigout_spark.streaming.windows import rolling_agg

    df = _ev(
        spark,
        [
            (1, 0, "a", 1.0),
            (1, 3600, "a", 2.0),   # exactly w back -> includes t=0
            (1, 3601, "a", 4.0),   # t=0 just left the window
            (1, 3601, "b", 8.0),   # tie with previous row
        ],
    )
    out = rolling_agg(
        df, "ts", "user_id", 3600, {"n": F.count(F.lit(1)), "s": F.sum("value")}
    )
    rows = {(r.event_type, r.ts): (r.n, r.s) for r in out.collect()}
    assert rows[("a", T0)] == (1, 1.0)
    assert rows[("a", T0 + dt.timedelta(seconds=3600))] == (2, 3.0)
    # both tied rows at 3601 see {2.0, 4.0, 8.0} (t=0 excluded)
    assert rows[("a", T0 + dt.timedelta(seconds=3601))] == (3, 14.0)
    assert rows[("b", T0 + dt.timedelta(seconds=3601))] == (3, 14.0)


def test_rolling_agg_single_exchange(spark, sf_dir):
    from pigout_spark.streaming.windows import rolling_agg

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = rolling_agg(ev, "ts", "user_id", 3600, {"n": F.count(F.lit(1))})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange SinglePartition" not in plan


def test_pivot_table_explicit_values_no_discovery_job(spark, sf_dir):
    """Explicit values: unseen values yield null/0 columns, unlisted
    values are dropped, and the schema is fixed."""
    from pigout_spark.operators.grouping import pivot_table

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = pivot_table(
        ev, ["user_id"], "event_type", ["view", "nosuch"],
        [F.count("event_type").alias("n")],
    )
    # single agg -> columns named by the pivot value alone
    assert set(out.columns) == {"user_id", "view", "nosuch"}
    agg = out.agg(
        F.sum("view").alias("v"), F.sum("nosuch").alias("x")
    ).collect()[0]
    truth = ev.filter("event_type = 'view'").count()
    assert agg.v == truth
    assert (agg.x or 0) == 0


def test_sessionize_hot_key_skew(spark):
    """One key owning the whole log (the bot-user case): sessionize
    stays correct — one sorted partition, dense seqs, conserved rows —
    and funnel/cohort complete on the same skewed input."""
    from pigout_spark.pipeline.behavioral import (
        cohort_retention,
        funnel_steps,
        sessionize,
    )

    n = 20_000
    df = spark.range(n).select(
        F.lit(7).alias("user_id"),
        (F.lit(1704067200) + F.col("id") * 10).cast("timestamp").alias("ts"),
        F.element_at(
            F.array(F.lit("view"), F.lit("click"), F.lit("purchase")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("event_type"),
        F.lit(1.0).alias("value"),
    )
    s = sessionize(df, gap_seconds=5)  # every 10s gap splits
    rows = s.agg(
        F.count(F.lit(1)).alias("n"), F.max("session_seq").alias("mx")
    ).collect()[0]
    assert rows.n == n and rows.mx == n  # every event its own session
    merged = sessionize(df, gap_seconds=10)  # boundary gap merges all
    assert merged.agg(F.max("session_seq")).collect()[0][0] == 1
    assert funnel_steps(df, ["view", "click", "purchase"]).count() == 1
    assert cohort_retention(df, period_seconds=86400).count() > 0


def test_session_paths_order_truncation_and_counts(spark):
    from pigout_spark.pipeline.behavioral import session_paths

    rows = [
        # user 1, one session: a > b > c  (tie at t=10 broken by id)
        (1, 0, "a", 0), (1, 10, "b", 0), (1, 10, "c", 0),
        # user 2, same path in one session + a lone 'a' session
        (2, 0, "a", 0), (2, 5, "b", 0), (2, 9, "c", 0),
        (2, 50_000, "a", 0),
    ]
    df = spark.createDataFrame(
        [
            (u, T0 + dt.timedelta(seconds=s), typ, i)
            for i, (u, s, typ, _) in enumerate(rows)
        ],
        "user_id bigint, ts timestamp, event_type string, event_id bigint",
    )
    out = {
        r.path: r.n_sessions
        for r in session_paths(
            df, tiebreak="event_id", gap_seconds=1800, max_len=2
        ).collect()
    }
    # max_len=2 truncates a>b>c to a>b
    assert out == {"a>b": 2, "a": 1}


def test_funnel_conversion_window(spark):
    """within_seconds: a step landing after the window does not count,
    even though it is strictly later."""
    rows = [
        (1, 0, "view", 0), (1, 100, "click", 0),     # inside 600s
        (2, 0, "view", 0), (2, 700, "click", 0),     # outside 600s
        (3, 0, "view", 0), (3, 600, "click", 0),     # exactly at bound
    ]
    out = funnel_steps(
        _ev(spark, rows), ["view", "click"], within_seconds=600
    )
    stages = {r.user_id: r.funnel_stage for r in out.collect()}
    assert stages == {1: 2, 2: 1, 3: 2}  # bound is inclusive


def test_detect_gaps_strict_threshold(spark):
    from pigout_spark.pipeline.behavioral import detect_gaps

    rows = [
        (1, 0, "a", 0), (1, 3600, "a", 0),   # exactly threshold: no gap
        (1, 7201, "a", 0),                    # 3601s: gap
        (2, 0, "a", 0), (2, 0, "b", 0),       # tie: zero gap
    ]
    out = detect_gaps(_ev(spark, rows), min_gap_seconds=3600).collect()
    assert len(out) == 1
    g = out[0]
    assert g.user_id == 1 and g.gap_seconds == 3601
    assert g.gap_start == T0 + dt.timedelta(seconds=3600)


def test_cap_events_per_key_bounds_hot_key(spark):
    """Skew guard (VERDICT r5): a 10⁶-event bot key is capped before
    the window passes, under tight windowExec spill thresholds (so the
    capping pass itself must spill, not OOM), overflow is counted, and
    under-cap keys are byte-identical to the unguarded result."""
    from pigout_spark.pipeline.behavioral import (
        cap_events_per_key,
        funnel_steps,
        key_overflow_counts,
        sessionize,
    )

    hot = spark.range(1_000_000).select(
        F.lit(7).alias("user_id"),
        (F.lit(1704067200) + F.col("id")).cast("timestamp").alias("ts"),
        F.lit("view").alias("event_type"),
    )
    cold = spark.range(10).select(
        F.lit(1).alias("user_id"),
        (F.lit(1704067200) + F.col("id") * 3600).cast("timestamp").alias("ts"),
        F.lit("click").alias("event_type"),
    )
    df = hot.unionByName(cold)
    conf = spark.conf
    old_mem = conf.get("spark.sql.windowExec.buffer.in.memory.threshold", "4096")
    old_spill = conf.get("spark.sql.windowExec.buffer.spill.threshold", None)
    conf.set("spark.sql.windowExec.buffer.in.memory.threshold", "128")
    conf.set("spark.sql.windowExec.buffer.spill.threshold", "256")
    try:
        capped = cap_events_per_key(df, max_events_per_key=1000)
        per_key = {
            r.user_id: r.n
            for r in capped.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert per_key == {7: 1000, 1: 10}
        # guarded sessionize/funnel complete on the capped relation
        s = sessionize(df, gap_seconds=5, max_events_per_key=1000)
        assert s.filter("user_id = 7").count() == 1000
        fs = funnel_steps(df, ["view", "click"], max_events_per_key=1000)
        assert fs.count() == 2
        # overflow observable, never silent
        over = key_overflow_counts(df, max_events_per_key=1000).collect()
        assert [(r.user_id, r.n_events) for r in over] == [(7, 1_000_000)]
    finally:
        conf.set("spark.sql.windowExec.buffer.in.memory.threshold", old_mem)
        if old_spill is None:
            conf.unset("spark.sql.windowExec.buffer.spill.threshold")
        else:
            conf.set("spark.sql.windowExec.buffer.spill.threshold", old_spill)
    # under-cap keys: guarded output == unguarded output
    got = sorted(
        sessionize(cold, gap_seconds=5, max_events_per_key=1000).collect()
    )
    want = sorted(sessionize(cold, gap_seconds=5).collect())
    assert got == want


def test_session_paths_deterministic_without_tiebreak(spark):
    """VERDICT r5 'what's wrong' #1: with no tiebreak column the step
    value itself pins tie order — same input in different physical
    layouts yields the identical path relation."""
    import datetime as dt

    from pigout_spark.pipeline.behavioral import session_paths

    rows = [
        (1, 0, "b"), (1, 0, "a"), (1, 0, "c"),   # 3-way tie
        (2, 0, "a"), (2, 0, "b"), (2, 0, "c"),   # same multiset
    ]
    df = spark.createDataFrame(
        [(u, T0 + dt.timedelta(seconds=s), typ) for (u, s, typ) in rows],
        "user_id bigint, ts timestamp, event_type string",
    )
    outs = []
    for parts in (1, 7):
        out = session_paths(df.repartition(parts, "event_type"), gap_seconds=60)
        outs.append(sorted((r.path, r.n_sessions) for r in out.collect()))
    assert outs[0] == outs[1] == [("a>b>c", 2)]


def test_attribution_models(spark):
    """Hand-built journey: touches v1(t=10) c1(t=20), purchase p1(t=30),
    touch c2(t=40), purchase p2(t=50).  Last-touch: p1→c1, p2→c2;
    first-touch: both→v1; linear: p1 splits over {v1,c1}, p2 over
    {v1,c1,c2}; a lookback of 15s restricts p1 to {c1} and p2 to {c2};
    conversions with no qualifying touch emit nothing."""
    from pigout_spark.pipeline.behavioral import attribution

    rows = [
        (1, 10, "view", 1000),
        (1, 11, "click", 1020),
        (1, 12, "purchase", 1030),
        (1, 13, "click", 1040),
        (1, 14, "purchase", 1050),
        (2, 20, "purchase", 1000),  # no touches at all
    ]
    df = spark.createDataFrame(
        [(u, e, t, float(s)) for u, e, t, s in rows],
        "user_id bigint, event_id bigint, event_type string, s double",
    ).selectExpr(
        "user_id", "event_id", "event_type",
        "CAST(to_timestamp(s) AS timestamp_ntz) AS ts",
    )

    def rowsof(model, lb=None):
        return sorted(
            (r.conv_id, r.touch_id, round(r.credit, 6))
            for r in attribution(df, model=model, lookback_seconds=lb).collect()
        )

    assert rowsof("last") == [(12, 11, 1.0), (14, 13, 1.0)]
    assert rowsof("first") == [(12, 10, 1.0), (14, 10, 1.0)]
    assert rowsof("linear") == [
        (12, 10, 0.5), (12, 11, 0.5),
        (14, 10, round(1 / 3, 6)), (14, 11, round(1 / 3, 6)), (14, 13, round(1 / 3, 6)),
    ]
    assert rowsof("linear", lb=15) == [(12, 11, 1.0), (14, 13, 1.0)]
    import pytest

    with pytest.raises(ValueError, match="unknown attribution model"):
        attribution(df, model="shapley")


def test_attribution_per_key_event_ids(spark):
    """Event ids unique only *per user*: two users each have conv_id=5
    with different touch sets.  Credit must not pool across users —
    user 1's linear split is over its own 2 touches (0.5 each), user
    2's over its single touch (1.0)."""
    from pigout_spark.pipeline.behavioral import attribution

    rows = [
        (1, 1, "view", 1000),
        (1, 2, "click", 1010),
        (1, 5, "purchase", 1020),
        (2, 3, "click", 1000),
        (2, 5, "purchase", 1020),
    ]
    df = spark.createDataFrame(
        [(u, e, t, float(s)) for u, e, t, s in rows],
        "user_id bigint, event_id bigint, event_type string, s double",
    ).selectExpr(
        "user_id", "event_id", "event_type",
        "CAST(to_timestamp(s) AS timestamp_ntz) AS ts",
    )
    got = sorted(
        (r.user_id, r.conv_id, r.touch_id, round(r.credit, 6))
        for r in attribution(df, model="linear").collect()
    )
    assert got == [
        (1, 5, 1, 0.5), (1, 5, 2, 0.5),
        (2, 5, 3, 1.0),
    ]
    last = sorted(
        (r.user_id, r.conv_id, r.touch_id)
        for r in attribution(df, model="last").collect()
    )
    assert last == [(1, 5, 2), (2, 5, 3)]


def test_rfm_explicit_bounds(spark):
    """Deterministic RFM: two users with known recency/frequency/
    monetary land in the expected score cells; recency scoring is
    REVERSED (fresher = higher); explicit now_ts pins reproducibility."""
    from pigout_spark.pipeline.behavioral import rfm

    rows = [
        # user 1: 3 events ending at t=1000, total value 30
        (1, "a", 900.0, 10.0), (1, "a", 950.0, 10.0), (1, "a", 1000.0, 10.0),
        # user 2: 1 event at t=100, value 500
        (2, "a", 100.0, 500.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_type string, s double, value double"
    ).selectExpr(
        "user_id", "event_type",
        "CAST(to_timestamp(s) AS timestamp_ntz) AS ts", "value"
    )
    out = {
        r.user_id: (r.recency_s, r.frequency, r.monetary, r.r, r.f, r.m, r.segment)
        for r in rfm(
            df, r_bounds=[200.0], f_bounds=[2.0], m_bounds=[100.0], now_ts=1000
        ).collect()
    }
    # user1: rec 0 (<200 -> r=2 of 2), freq 3 (>2 -> f=2), mon 30 (<100 -> m=1)
    assert out[1] == (0, 3, 30.0, 2, 2, 1, 221)
    # user2: rec 900 (>200 -> r=1), freq 1 -> f=1, mon 500 -> m=2
    assert out[2] == (900, 1, 500.0, 1, 1, 2, 112)


def test_event_transitions_session_reset_and_ties(spark):
    """Transitions count adjacent pairs in (ts, step) order, never
    across a session gap; tied timestamps order by step value so the
    multiset is deterministic."""
    from pigout_spark.pipeline.behavioral import event_transitions

    rows = [
        (1, 1000, "view"),
        (1, 1010, "click"),
        (1, 1010, "addcart"),   # tied with click: addcart < click orders first
        (1, 9999, "purchase"),  # > 30 min gap: new session, no transition in
        (2, 1000, "view"),
        (2, 1500, "view"),
    ]
    df = spark.createDataFrame(
        [(u, float(s), t) for u, s, t in rows],
        "user_id bigint, s double, event_type string",
    ).selectExpr(
        "user_id", "event_type",
        "CAST(to_timestamp(s) AS timestamp_ntz) AS ts",
    )
    got = {
        (r.from_step, r.to_step): r.n
        for r in event_transitions(df, gap_seconds=1800).collect()
    }
    # user1 session1: view -> addcart -> click (tie orders addcart first)
    assert got == {
        ("view", "addcart"): 1,
        ("addcart", "click"): 1,
        ("view", "view"): 1,
    }
    # without sessionization the gap pair appears
    got_all = {
        (r.from_step, r.to_step): r.n
        for r in event_transitions(df).collect()
    }
    assert got_all[("click", "purchase")] == 1


def test_mad_outliers_lower_median_and_masking(spark):
    """MAD flags the lone extreme value (median 10, MAD 1 -> |v-10|>3),
    uses the LOWER median on even counts, and a constant-value key
    emits nothing (MAD 0 masks nothing above it)."""
    from pigout_spark.pipeline.behavioral import mad_outliers

    rows = [
        (1, 1, 9.0), (1, 2, 10.0), (1, 3, 11.0), (1, 4, 10.0), (1, 5, 100.0),
        (2, 6, 5.0), (2, 7, 5.0), (2, 8, 5.0),
        (3, 9, 1.0), (3, 10, 2.0),  # even count: lower median = 1.0
    ]
    df = spark.createDataFrame(rows, "user_id bigint, event_id bigint, value double")
    out = {r.event_id: r for r in mad_outliers(df, threshold=3.0).collect()}
    # key1: sorted values 9,10,10,11,100 -> median 10; deviations
    # 0,0,1,1,90 -> mad 1; only |100-10|=90 > 3·1.  key2 constant:
    # mad 0, all deviations 0 -> nothing.  key3 even count: LOWER
    # median 1.0, deviations {0,1} -> lower mad 0; deviation 1 > 3·0
    # -> event 10 flagged (any nonzero deviation beats a zero MAD).
    assert set(out) == {5, 10}
    assert out[5].median == 10.0 and out[5].mad == 1.0 and out[5].deviation == 90.0
    assert out[10].median == 1.0 and out[10].mad == 0.0 and out[10].deviation == 1.0


def test_session_ngrams_contiguity_and_session_reset(spark):
    """Trigram mining: counts contiguous triples only, never across a
    session gap; n=2 equals event_transitions' counts."""
    from pigout_spark.pipeline.behavioral import (
        event_transitions,
        session_ngrams,
    )

    rows = [
        (1, 0, "a"), (1, 10, "b"), (1, 20, "c"), (1, 30, "a"),
        (1, 9000, "b"), (1, 9010, "c"),  # new session: no cross trigram
        (2, 0, "a"), (2, 5, "b"),        # too short for a trigram
    ]
    df = spark.createDataFrame(
        [(u, float(s), t) for u, s, t in rows],
        "user_id bigint, s double, event_type string",
    ).selectExpr(
        "user_id", "event_type",
        "CAST(to_timestamp(s) AS timestamp_ntz) AS ts",
    )
    got = {
        r.gram: r.n_occurrences
        for r in session_ngrams(df, n=3, gap_seconds=1800).collect()
    }
    assert got == {"a>b>c": 1, "b>c>a": 1}
    bi = {
        r.gram: r.n_occurrences
        for r in session_ngrams(df, n=2, gap_seconds=1800).collect()
    }
    tr = {
        f"{r.from_step}>{r.to_step}": r.n
        for r in event_transitions(df, gap_seconds=1800).collect()
    }
    assert bi == tr
    import pytest

    with pytest.raises(ValueError, match="n >= 2"):
        session_ngrams(df, n=1)


def test_basket_rules_hand_computed(spark):
    """3-basket corpus: supports, both confidences, and lift computed
    by hand; quantity duplicates inside a basket don't inflate."""
    rows = [
        (1, 10), (1, 20), (1, 20),  # dup item in basket 1
        (2, 10), (2, 20), (2, 30),
        (3, 10), (3, 30),
    ]
    from pigout_spark.pipeline.behavioral import basket_rules

    df = spark.createDataFrame(rows, "order_id bigint, item_id bigint")
    out = {
        (r.item_a, r.item_b): r
        for r in basket_rules(df, "order_id", "item_id", 2).collect()
    }
    # pairs in >=2 baskets: (10,20) in 1,2; (10,30) in 2,3
    assert set(out) == {(10, 20), (10, 30)}
    r = out[(10, 20)]
    assert (r.support, r.n_a, r.n_b) == (2, 3, 2)
    assert abs(r.conf_a_b - 2 / 3) < 1e-12
    assert abs(r.conf_b_a - 1.0) < 1e-12
    assert abs(r.lift - (2 * 3) / (3 * 2)) < 1e-12  # = 1.0
    r2 = out[(10, 30)]
    assert (r2.support, r2.n_a, r2.n_b) == (2, 3, 2)


def test_cuped_lift_matches_reference_and_reduces_variance(spark):
    """CUPED vs a direct numpy-style reference of the same algebra:
    theta, raw and adjusted lifts/z agree; with a strongly correlated
    covariate the adjusted variances shrink so |z_cuped| >= |z_raw|
    for the same lift."""
    import random

    from pigout_spark.pipeline.behavioral import ab_assign, cuped_lift

    rng = random.Random(5)
    rows = []
    for uid in range(120):
        x = rng.uniform(0, 100)             # pre-period metric
        y = x + rng.uniform(-5, 5)          # strongly correlated
        rows.append((uid, round(y, 3), round(x, 3)))
    df = spark.createDataFrame(rows, "uid bigint, y double, x double")
    out = cuped_lift(df, "y", "x", ["uid"], seed="11").collect()[0]
    assigned = {
        r.uid: r.variant for r in ab_assign(df, ["uid"], seed="11").collect()
    }
    t = [(y, x) for uid, y, x in rows if assigned[uid] == "treatment"]
    c = [(y, x) for uid, y, x in rows if assigned[uid] == "control"]
    allr = t + c
    n = len(allr)
    sy = sum(y for y, _ in allr); sx = sum(x for _, x in allr)
    sxx = sum(x * x for _, x in allr); sxy = sum(x * y for y, x in allr)
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert abs(out.theta - theta) < 1e-6

    def arm(vals):
        nn = len(vals)
        my = sum(y for y, _ in vals) / nn
        mx = sum(x for _, x in vals) / nn
        vy = (nn * sum(y * y for y, _ in vals) - sum(y for y, _ in vals) ** 2) / (nn * (nn - 1))
        vx = (nn * sum(x * x for _, x in vals) - sum(x for _, x in vals) ** 2) / (nn * (nn - 1))
        cxy = (nn * sum(x * y for y, x in vals) - sum(x for _, x in vals) * sum(y for y, _ in vals)) / (nn * (nn - 1))
        xbar = sx / n
        return nn, my, vy, my - theta * (mx - xbar), vy - 2 * theta * cxy + theta * theta * vx

    nt, myt, vyt, mat, vat = arm(t)
    nc, myc, vyc, mac, vac = arm(c)
    assert abs(out.lift_raw - (myt - myc)) < 1e-6
    assert abs(out.lift_cuped - (mat - mac)) < 1e-6
    # correlated covariate -> adjusted variance far smaller
    assert vat < 0.1 * vyt and vac < 0.1 * vyc
    import math
    z_c = (mat - mac) / math.sqrt(vat / nt + vac / nc)
    # decimal(…,4) sum quantization vs the float reference: ~1e-5 slack
    assert abs(out.z_cuped - z_c) < 1e-4


def test_srm_check_flags_broken_assignment(spark):
    """A heavily imbalanced observed split flags SRM; the md5 split on
    a healthy population does not."""
    from pigout_spark.pipeline.behavioral import srm_check

    healthy = spark.createDataFrame(
        [(i,) for i in range(2000)], "uid bigint"
    )
    ok = srm_check(healthy, ["uid"], seed="1").collect()[0]
    assert not ok.srm_suspected and ok.n_c + ok.n_t == 2000
    # simulate a broken logger: drop most of one arm by filtering on
    # the assignment itself
    from pigout_spark.pipeline.behavioral import ab_assign

    a = ab_assign(healthy, ["uid"], seed="1")
    broken = a.filter(
        (a.variant == "control") | (a.uid % 10 == 0)
    ).drop("variant")
    bad = srm_check(broken, ["uid"], seed="1").collect()[0]
    assert bad.srm_suspected and bad.chi2 > 100


def test_experiment_family_null_discipline(spark):
    """NULL metrics/covariates are excluded from counts AND sums
    (ADVICE r7): ab_lift on a frame with NULL metric rows equals
    ab_lift on the pre-filtered frame; cuped_lift drops a unit missing
    either column; mad_outliers ignores NULL values entirely (they
    neither shift the median rank nor appear as outliers)."""
    from pigout_spark.pipeline.behavioral import (
        ab_lift,
        cuped_lift,
        mad_outliers,
    )

    rows = [(i, float(i % 7) if i % 5 else None) for i in range(40)]
    df = spark.createDataFrame(rows, "uid bigint, m double")
    clean = df.filter("m is not null")
    a = ab_lift(df, "m", ["uid"], seed="9").collect()[0]
    b = ab_lift(clean, "m", ["uid"], seed="9").collect()[0]
    assert a == b
    assert a.n_t + a.n_c == clean.count()

    c_rows = [
        (i, float(i % 7) if i % 5 else None, float(i % 3) if i % 4 else None)
        for i in range(60)
    ]
    cdf = spark.createDataFrame(c_rows, "uid bigint, y double, x double")
    cclean = cdf.filter("y is not null and x is not null")
    ca = cuped_lift(cdf, "y", "x", ["uid"], seed="9").collect()[0]
    cb = cuped_lift(cclean, "y", "x", ["uid"], seed="9").collect()[0]
    assert ca == cb
    assert ca.n_t + ca.n_c == cclean.count()

    # key 1: values 9,10,11,10,100 (+ two NULLs that would otherwise
    # sort first and steal the (n+1)//2 rank) -> median 10, mad 1,
    # only the 100 flagged; NULL rows never appear in the output.
    m_rows = [
        (1, 1, 9.0), (1, 2, 10.0), (1, 3, 11.0), (1, 4, 10.0),
        (1, 5, 100.0), (1, 6, None), (1, 7, None),
    ]
    mdf = spark.createDataFrame(
        m_rows, "user_id bigint, event_id bigint, value double"
    )
    out = mad_outliers(mdf, threshold=3.0).collect()
    assert [(r.event_id, r.median, r.mad) for r in out] == [(5, 10.0, 1.0)]


def test_trend_fit_matches_numpy_and_guards(spark):
    import numpy as np
    from pigout_spark.pipeline.behavioral import trend_fit

    xs = [0.0, 1.0, 2.0, 3.0, 4.0]
    ys = [3.0, 5.0, 7.0, 9.0, 11.0]          # exact line: slope 2, icpt 3
    noisy = [1.0, 2.0, 2.0, 5.0, 4.0]
    rows = (
        [("line", x, y) for x, y in zip(xs, ys)]
        + [("noisy", x, y) for x, y in zip(xs, noisy)]
        + [("single", 1.0, 7.0)]              # zero x-variance
        + [("flat", 1.0, 4.0), ("flat", 2.0, 4.0)]  # zero y-variance
        + [("line", None, 99.0), ("line", 9.0, None)]  # NULLs excluded
    )
    df = spark.createDataFrame(rows, "k string, x double, y double")
    got = {r.k: r for r in trend_fit(df, ["k"], "x", "y").collect()}

    assert got["line"].n == 5
    assert got["line"].slope == 2.0 and got["line"].intercept == 3.0
    assert got["line"].r2 == 1.0

    co = np.polyfit(xs, noisy, 1)
    assert abs(got["noisy"].slope - co[0]) < 1e-12
    assert abs(got["noisy"].intercept - co[1]) < 1e-12
    r = np.corrcoef(xs, noisy)[0, 1]
    assert abs(got["noisy"].r2 - r * r) < 1e-12

    assert got["single"].slope is None and got["single"].r2 is None
    assert got["flat"].slope == 0.0 and got["flat"].r2 is None


def test_psi_drift_identical_and_shifted(spark):
    """Identical populations → every contribution 0 (and exactly +0.0,
    the signed-zero discipline); a hard shift → large positive total;
    an emptied bin hits the min_prop clamp, not infinity."""
    from pigout_spark.pipeline.drift import psi_drift

    a = spark.createDataFrame([(float(i % 10),) for i in range(1000)], "v double")
    same = psi_drift(a, a, "v", bins=10, lo=0.0, hi=10.0).collect()
    assert all(r.psi6 == 0.0 and str(r.psi6) != "-0.0" for r in same)
    assert {r.bin for r in same} == set(range(10))

    b = spark.createDataFrame(
        [(float(5 + i % 5),) for i in range(1000)], "v double"
    )
    shifted = psi_drift(a, b, "v", bins=10, lo=0.0, hi=10.0).collect()
    total = sum(r.psi6 for r in shifted)
    assert total > 0.25  # "shifted" by any PSI rule of thumb
    emptied = [r for r in shifted if r.n_cur == 0]
    assert emptied and all(r.psi6 > 0 for r in emptied)  # clamped, finite


def test_ks_drift_exact_on_disjoint_and_zero_on_equal(spark):
    from pigout_spark.pipeline.drift import ks_drift

    a = spark.createDataFrame([(float(i % 5),) for i in range(500)], "v double")
    b = spark.createDataFrame(
        [(float(5 + i % 5),) for i in range(500)], "v double"
    )
    r = ks_drift(a, b, "v", bins=10, lo=0.0, hi=10.0).collect()[0]
    assert r.d_stat == 1.0 and r.at_bin == 4  # disjoint supports
    same = ks_drift(a, a, "v", bins=10, lo=0.0, hi=10.0).collect()[0]
    assert same.d_stat == 0.0 and same.at_bin == 0


def test_ab_lift_by_segments_matches_per_segment_runs(spark):
    """ab_lift(by=[seg]) equals running ab_lift separately on each
    segment slice (same assignment — it keys on the id, not the
    segment), and a singleton-arm segment yields NULL variance/z
    instead of crashing."""
    from pigout_spark.pipeline.behavioral import ab_lift

    rows = [(i, "s" + str(i % 2), float(i % 9)) for i in range(80)]
    df = spark.createDataFrame(rows, "uid bigint, seg string, m double")
    seg = {
        r.seg: r for r in ab_lift(df, "m", ["uid"], seed="3", by=["seg"]).collect()
    }
    for sname in ("s0", "s1"):
        solo = ab_lift(
            df.filter(F.col("seg") == sname), "m", ["uid"], seed="3"
        ).collect()[0]
        got = seg[sname]
        assert (got.n_t, got.n_c, got.lift, got.z) == (
            solo.n_t, solo.n_c, solo.lift, solo.z,
        )

    tiny = spark.createDataFrame(
        [(1, "x", 5.0), (2, "x", 6.0)], "uid bigint, seg string, m double"
    )
    r = ab_lift(tiny, "m", ["uid"], seed="3", by=["seg"]).collect()[0]
    assert r.z is None  # singleton arms -> NULL variance -> NULL z


def test_r8_review_regressions(spark):
    """Pins for the round-8 closing-review fixes: the winsorize ceil
    divergence (IEEE 0.07*100 -> 8 vs the exact decimal 7), the CDC
    NULL-op data-destruction path, the over-eager duplicate-ts guard,
    trend_fit's silent fractional truncation, and drift's empty-side /
    swapped-bounds behavior."""
    import pytest as _pytest
    from pigout_spark.operators.sorting import winsorize
    from pigout_spark.pipeline.behavioral import trend_fit
    from pigout_spark.pipeline.drift import ks_drift, psi_drift
    from pigout_spark.pipeline.scd import apply_cdc, compact_changelog

    # winsorize: p=0.07 over 100 values -> k MUST be 7 (exact decimal),
    # not 8 (IEEE product one ulp high); value at rank 7 is 7.0
    df = spark.createDataFrame(
        [("a", float(i)) for i in range(1, 101)], "k string, value double"
    )
    out = {r.value: r.value_w for r in
           winsorize(df, "value", ["k"], p_lo=0.07, p_hi=0.93).collect()}
    assert out[1.0] == 7.0 and out[100.0] == 93.0

    # apply_cdc: NULL op fails loudly instead of silently deleting
    base = spark.createDataFrame([(1, "a")], "k long, v string")
    bad = spark.createDataFrame(
        [(1, "a2", None, 10)], "k long, v string, op string, ts long"
    )
    with _pytest.raises(Exception, match="NULL op"):
        apply_cdc(base, bad, ["k"]).collect()

    # compact_changelog: duplicates at a NON-winning ts are fine;
    # duplicates at the winning ts still abort
    ch = spark.createDataFrame(
        [(1, "a", "U", 5), (1, "b", "U", 5), (1, "c", "U", 9)],
        "k long, v string, op string, ts long",
    )
    assert compact_changelog(ch, ["k"]).collect()[0].v == "c"
    tie = spark.createDataFrame(
        [(1, "a", "U", 9), (1, "b", "U", 9)],
        "k long, v string, op string, ts long",
    )
    with _pytest.raises(Exception, match="winning timestamp"):
        compact_changelog(tie, ["k"]).collect()

    # trend_fit(term_scale=0): fractional metric fails loudly
    frac = spark.createDataFrame(
        [(1, 1.0, 1.7), (1, 2.0, 2.0)], "k long, x double, y double"
    )
    with _pytest.raises(Exception, match="integral"):
        trend_fit(frac, ["k"], "x", "y", term_scale=0).collect()

    # drift: empty side -> NULL readout, not a crash; swapped bounds
    # -> build-time ValueError
    vals = spark.createDataFrame([(float(i % 5),) for i in range(50)], "v double")
    empty = vals.filter("v < -1")
    psi = psi_drift(empty, vals, "v", bins=5, lo=0.0, hi=5.0).collect()
    assert psi and all(r.psi6 is None for r in psi)
    ks = ks_drift(empty, vals, "v", bins=5, lo=0.0, hi=5.0).collect()[0]
    assert ks.d_stat is None
    with _pytest.raises(ValueError, match="hi"):
        psi_drift(vals, vals, "v", bins=5, lo=5.0, hi=0.0)


def test_categorical_association_known_tables(spark):
    """2x2 hand table vs the textbook chi2/V/MI; a perfectly
    independent product table scores ~0 on everything; a single-level
    column gets dof 0 and NULL V."""
    import math
    from pigout_spark.pipeline.behavioral import categorical_association

    # table: a=x -> (b=u:30, b=v:10); a=y -> (b=u:10, b=v:30)
    rows = (
        [("x", "u")] * 30 + [("x", "v")] * 10
        + [("y", "u")] * 10 + [("y", "v")] * 30
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = categorical_association(df, "a", "b").collect()[0]
    assert (r.n, r.dof) == (80, 1)
    # chi2 = sum (o-e)^2/e with every e = 40*40/80 = 20 -> 4*(10^2/20)=20
    assert r.chi2_6 == 20.0
    assert r.cramers_v6 == 0.5  # sqrt(20/(80*1))
    mi = sum(
        (c / 80) * math.log(c * 80 / (40 * 40)) for c in (30, 10, 10, 30)
    )
    assert abs(r.mi6 - mi) < 2e-6

    indep = spark.createDataFrame(
        [(a, b) for a in "xy" for b in "uv" for _ in range(25)],
        "a string, b string",
    )
    ri = categorical_association(indep, "a", "b").collect()[0]
    assert ri.chi2_6 == 0.0 and ri.mi6 == 0.0

    one = spark.createDataFrame([("x", "u"), ("x", "v")], "a string, b string")
    ro = categorical_association(one, "a", "b").collect()[0]
    assert ro.dof == 0 and ro.cramers_v6 is None


def test_gini_and_proportion_ci(spark):
    import math
    from pigout_spark.pipeline.behavioral import gini, proportion_ci

    rows = (
        [("even", 10)] * 4                      # G = 0
        + [("skew", 0), ("skew", 0), ("skew", 0), ("skew", 100)]
        + [("one", 7)]                          # single unit -> 0
        + [("zero", 0), ("zero", 0)]            # sum 0 -> 0
        + [("even", None)]                      # NULL excluded
    )
    df = spark.createDataFrame(
        [(k, float(v) if v is not None else None) for k, v in rows],
        "k string, v double",
    )
    g = {r.k: r for r in gini(df, ["k"], "v").collect()}
    assert g["even"].n == 4 and g["even"].gini6 == 0.0
    # skew: x=(0,0,0,100), n=4: G = (2*400 - 5*100)/(4*100) = 0.75
    assert g["skew"].gini6 == 0.75
    assert g["one"].gini6 == 0.0 and g["zero"].gini6 == 0.0

    import pytest as _pytest
    bad = spark.createDataFrame([("a", -1.0)], "k string, v double")
    with _pytest.raises(Exception, match="non-negative"):
        gini(bad, ["k"], "v").collect()

    cdf = spark.createDataFrame(
        [("x", i < 30) for i in range(100)] + [("x", None)],
        "k string, f boolean",
    )
    ci = proportion_ci(cdf, ["k"], "f").collect()[0]
    assert (ci.n, ci.successes, ci.p6) == (100, 30, 0.3)
    # textbook Wilson bounds at p=0.3, n=100, z=1.959964
    z = 1.959964
    denom = 1 + z * z / 100
    center = (0.3 + z * z / 200) / denom
    half = z * math.sqrt(0.3 * 0.7 / 100 + z * z / 40000) / denom
    assert ci.lo6 == round(center - half, 6)
    assert ci.hi6 == round(center + half, 6)
    assert ci.lo6 < 0.3 < ci.hi6


def test_kaplan_meier_textbook_curve(spark):
    """The classic worked example: durations (6,6,6,7,10) events with
    censoring at (6,9,10,11,16) — S follows the product-limit formula;
    censored subjects reduce risk sets but never the survival; d=n
    drives S to exactly 0."""
    import math
    from pigout_spark.pipeline.behavioral import kaplan_meier

    rows = (
        [("g", 6, True)] * 3 + [("g", 6, False)]
        + [("g", 7, True)] + [("g", 9, False)]
        + [("g", 10, True)] + [("g", 10, False)]
        + [("g", 11, False)] + [("g", 16, False)]
    )
    df = spark.createDataFrame(
        [(k, float(t), e) for k, t, e in rows], "k string, t double, e boolean"
    )
    out = {r.t: r for r in kaplan_meier(df, "t", "e", ["k"]).collect()}
    assert set(out) == {6, 7, 10}
    assert (out[6].n_risk, out[6].d) == (10, 3)
    assert (out[7].n_risk, out[7].d) == (6, 1)
    assert (out[10].n_risk, out[10].d) == (4, 1)
    s6 = round(math.exp(round(math.log(1 - 3 / 10), 6)), 6)
    assert out[6].surv6 == s6
    logs = round(math.log(0.7), 6) + round(math.log(1 - 1 / 6), 6)
    assert out[7].surv6 == round(math.exp(logs), 6)

    # everyone dies at the end: S hits exactly 0
    alldie = spark.createDataFrame(
        [("h", 1.0, True), ("h", 2.0, True)], "k string, t double, e boolean"
    )
    o2 = {r.t: r.surv6 for r in kaplan_meier(alldie, "t", "e", ["k"]).collect()}
    assert o2[2] == 0.0 and o2[1] == 0.5


def test_r8_second_review_regressions(spark):
    """Pins for the second r8 review: psi_from_counts must surface a
    CURRENT-only bin (zero reference mass) instead of dropping it;
    categorical_association on empty/all-NULL input reads (n=0, dof=0,
    NULL stats)."""
    from pigout_spark.pipeline.behavioral import categorical_association
    from pigout_spark.pipeline.drift import psi_from_counts

    rc = spark.createDataFrame([(0, 50), (1, 50)], "bin long, n long")
    cc = spark.createDataFrame(
        [(0, 5), (5, 95)], "bin long, n_cur long"
    )  # bin 5 exists ONLY on the current side
    got = {r.bin: r for r in psi_from_counts(rc, cc).collect()}
    assert set(got) == {0, 1, 5}
    assert got[5].n_ref == 0 and got[5].n_cur == 95
    assert got[5].psi6 > 5  # (0.95 - 1e-4)·ln(0.95/1e-4) ≈ 8.7
    # totals: t_cur counts ALL cur rows (100), so p_cur(0) = 0.05
    assert got[0].n_cur == 5

    empty = spark.createDataFrame([], "a string, b string")
    r = categorical_association(empty, "a", "b").collect()[0]
    assert (r.n, r.dof) == (0, 0)
    assert r.chi2_6 is None and r.cramers_v6 is None and r.mi6 is None


def test_logrank_test_against_reference(spark):
    """Two-group log-rank pinned against a hand-computed reference
    (risk tables worked per event time); identical groups score z~0;
    a third group trips the two-group assert."""
    import math
    import pytest as _pytest
    from pigout_spark.pipeline.behavioral import logrank_test

    # group a: events at 1,2 censored 3; group b: events at 3,4 cens 5
    rows = [
        ("a", 1, True), ("a", 2, True), ("a", 3, False),
        ("b", 3, True), ("b", 4, True), ("b", 5, False),
    ]
    df = spark.createDataFrame(
        [(g, float(t), e) for g, t, e in rows],
        "g string, t double, e boolean",
    )
    r = logrank_test(df, "t", "e", "g").collect()[0]
    assert (r.n, r.n_events) == (6, 4)
    # hand reference (group1 = 'a'):
    # t=1: n=6 n1=3 d=1 d1=1 -> oe=1-3/6=0.5, v=1*(.5)(.5)(5/5)=.25
    # t=2: n=5 n1=2 d=1 d1=1 -> oe=1-2/5=0.6, v=(.4)(.6)(4/4)=.24
    # t=3: n=4 n1=1 d=1 d1=0 -> oe=-.25, v=(.25)(.75)(3/3)=.1875
    # t=4: n=2 n1=0 d=1 d1=0 -> oe=0, v=0
    oe = round(0.5, 6) + round(0.6, 6) + round(-0.25, 6) + 0.0
    var = round(0.25, 6) + round(0.24, 6) + round(0.1875, 6)
    assert abs(r.o_minus_e6 - oe) < 1e-9
    assert abs(r.var6 - var) < 1e-9
    assert r.z6 == round(oe / math.sqrt(var), 6)

    same = spark.createDataFrame(
        [("a", float(t), True) for t in (1, 2, 3)]
        + [("b", float(t), True) for t in (1, 2, 3)],
        "g string, t double, e boolean",
    )
    z0 = logrank_test(same, "t", "e", "g").collect()[0]
    assert z0.o_minus_e6 == 0.0

    three = df.union(
        spark.createDataFrame([("c", 1.0, True)], "g string, t double, e boolean")
    )
    with _pytest.raises(Exception, match="two groups"):
        logrank_test(three, "t", "e", "g").collect()

    # r13 fold rewrite: empty input keeps the all-NULL readout (the old
    # F.sum semantics), and the plan stays window-free
    empty = spark.createDataFrame([], "g string, t double, e boolean")
    er = logrank_test(empty, "t", "e", "g").collect()[0]
    assert (er.n, er.o_minus_e6, er.var6, er.z6) == (None, None, None, None)

    # r13 ADVICE regression: with a NON-NULLABLE group column and AQE
    # off, NullPropagation used to fold the old `| __g.isNull()` escape
    # to false, the then-gstats-only assert was pushed below the
    # crossJoin, and EMPTY input aborted with "exactly two groups".
    # The r14 predicate ((__ng == 2) | (__ng == 0)) is gstats-only and
    # pushdown-safe by construction, so this must read all-NULL too.
    from pyspark.sql import functions as F  # noqa: PLC0415

    empty_nn = (
        spark.createDataFrame([("a", 1.0, True)], "g string, t double, e boolean")
        .select(
            F.coalesce("g", F.lit("x")).alias("g"),  # non-nullable g
            F.col("t"),
            F.col("e"),
        )
        .filter(F.lit(False))
    )
    assert not empty_nn.schema["g"].nullable
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        er2 = logrank_test(empty_nn, "t", "e", "g").collect()[0]
        assert (er2.n, er2.o_minus_e6, er2.var6, er2.z6) == (None, None, None, None)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)

    plan = logrank_test(df, "t", "e", "g")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Window" not in plan


def test_odds_ratio_textbook(spark):
    """Classic 2x2: a=20 b=80 c=10 d=90 -> OR 2.25, RR 2.0; CI bounds
    match the log-domain Wald formulas; an empty cell reads NULL."""
    import math
    from pigout_spark.pipeline.behavioral import odds_ratio

    rows = (
        [(True, True)] * 20 + [(True, False)] * 80
        + [(False, True)] * 10 + [(False, False)] * 90
    )
    df = spark.createDataFrame(rows, "exp boolean, out boolean")
    r = odds_ratio(df, "exp", "out").collect()[0]
    assert (r.a, r.b, r.c, r.d) == (20, 80, 10, 90)
    assert r.or6 == 2.25 and r.rr6 == 2.0
    z = 1.959964
    se = math.sqrt(1 / 20 + 1 / 80 + 1 / 10 + 1 / 90)
    assert r.or_lo6 == round(math.exp(math.log(2.25) - z * se), 6)
    assert r.or_hi6 == round(math.exp(math.log(2.25) + z * se), 6)
    assert r.or_lo6 < 2.25 < r.or_hi6

    hole = spark.createDataFrame(
        [(True, True), (False, False)], "exp boolean, out boolean"
    )
    h = odds_ratio(hole, "exp", "out").collect()[0]
    assert h.or6 is None and h.rr6 is None


def test_spearman_textbook(spark):
    """Hand-checked Spearman: perfect monotone (nonlinear) relation →
    rho 1; perfect inverse → −1; ties average; constant side → NULL."""
    from pigout_spark.pipeline.behavioral import spearman_corr

    rows = (
        [("mono", float(i), float(i**3)) for i in range(1, 6)]
        + [("inv", float(i), float(-i)) for i in range(1, 6)]
        # x = 1,1,2 (tied pair), y = 2,1,3: rank_x = 1.5,1.5,3;
        # rank_y = 2,1,3 → rho = cov/sd = 0.866025...
        + [("tied", 1.0, 2.0), ("tied", 1.0, 1.0), ("tied", 2.0, 3.0)]
        + [("const", 1.0, float(i)) for i in range(3)]
    )
    df = spark.createDataFrame(rows, "k string, x double, y double")
    got = {r.k: r for r in spearman_corr(df, ["k"], "x", "y").collect()}
    assert got["mono"].rho6 == 1.0
    assert got["inv"].rho6 == -1.0
    assert got["tied"].rho6 == 0.866025
    assert got["const"].rho6 is None
    assert got["mono"].n == 5


def test_mann_whitney_textbook(spark):
    """Hand-worked U: g1 = {1,2,3}, g0 = {4,5,6,7} — g1 holds the 3
    lowest ranks, so U1 = 0, U2 = n1·n2 = 12; z = (0−6)/√(6·8/12·…)
    with no ties = −2.12132."""
    from pigout_spark.pipeline.behavioral import mann_whitney_u

    rows = [(True, 1.0), (True, 2.0), (True, 3.0),
            (False, 4.0), (False, 5.0), (False, 6.0), (False, 7.0)]
    df = spark.createDataFrame(rows, "g boolean, v double")
    r = mann_whitney_u(df, "g", "v").collect()[0]
    assert (r.n1, r.n2) == (3, 4)
    assert r.u1 == 0.0 and r.u2 == 12.0
    # var = n1 n2 (N+1)/12 = 3·4·8/12 = 8 → z = −6/√8
    assert r.z6 == round(-6 / 8**0.5, 6)
    # Cliff's delta: U1 = 0 → 2·0/12 − 1 = −1 (total stochastic order)
    assert r.cliffs_delta6 == -1.0

    # one empty group → NULL everything but the counts
    solo = mann_whitney_u(
        spark.createDataFrame([(True, 1.0)], "g boolean, v double"), "g", "v"
    ).collect()[0]
    assert solo.n2 == 0 and solo.u1 is None and solo.z6 is None


def test_bh_fdr_textbook(spark):
    """Classic worked example: p = [.005, .01, .03, .04], m = 4 →
    q = [.02, .02, .04, .04]; alpha .03 rejects the first two; ties
    collapse to one q; out-of-range p fails loudly."""
    import pytest as _pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException
    from pigout_spark.pipeline.behavioral import bh_fdr

    df = spark.createDataFrame(
        [("a", 0.01), ("b", 0.04), ("c", 0.03), ("d", 0.005)],
        "test_id string, p double",
    )
    got = {r.test_id: r for r in bh_fdr(df, "p", alpha=0.03).collect()}
    assert got["d"].q6 == 0.02 and got["a"].q6 == 0.02
    assert got["c"].q6 == 0.04 and got["b"].q6 == 0.04
    assert got["d"].reject and got["a"].reject
    assert not got["c"].reject and not got["b"].reject
    assert all(r.m == 4 for r in got.values())

    tied = bh_fdr(
        spark.createDataFrame(
            [("x", 0.02), ("y", 0.02)], "test_id string, p double"
        ),
        "p",
    ).collect()
    assert len({r.q6 for r in tied}) == 1

    with _pytest.raises(SparkRuntimeException, match="must lie"):
        bh_fdr(
            spark.createDataFrame([("z", 1.5)], "test_id string, p double"),
            "p",
        ).collect()


def test_kruskal_wallis_textbook(spark):
    """Worked example (no ties): groups {1,2,3}, {4,5,6}, {7,8,9} →
    rank sums 6/15/24, H = 12/(9·10)·(36/3+225/3+576/3) − 30 = 7.2;
    two-group KW equals the squared Mann–Whitney z (chi² = z²);
    single group and all-tied inputs read NULL."""
    from pigout_spark.pipeline.behavioral import kruskal_wallis, mann_whitney_u

    rows = [("a", float(v)) for v in (1, 2, 3)] + [
        ("b", float(v)) for v in (4, 5, 6)
    ] + [("c", float(v)) for v in (7, 8, 9)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = kruskal_wallis(df, "g", "v").first()
    assert (r.k, r.n) == (3, 9)
    assert r.h6 == 7.2

    two = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0),
         ("b", 4.0), ("b", 5.0), ("b", 6.0), ("b", 7.0)],
        "g string, v double",
    )
    h = kruskal_wallis(two, "g", "v").first().h6
    z = mann_whitney_u(
        two.withColumn("t", F.col("g") == "a"), "t", "v"
    ).first().z6
    assert abs(h - z * z) < 1e-5

    solo = spark.createDataFrame([("a", 1.0), ("a", 2.0)], "g string, v double")
    assert kruskal_wallis(solo, "g", "v").first().h6 is None
    tied = spark.createDataFrame(
        [("a", 5.0), ("b", 5.0), ("c", 5.0)], "g string, v double"
    )
    assert kruskal_wallis(tied, "g", "v").first().h6 is None


def test_brown_forsythe_hand_checked(spark):
    """Hand-worked W on groups {1,2,3,4} vs {10,20,30,40}: medians 2 and
    20 (ceil(n/2) order statistic), z-deviations {1,0,1,2} vs
    {10,0,10,20}; ANOVA on those gives W = 6·(SSB)/(1·SSW).  Equal
    spreads read a small W; identical groups read NULL (zero within-
    spread only when all deviations equal — here constant groups)."""
    from pigout_spark.pipeline.behavioral import brown_forsythe

    rows = [("a", float(v)) for v in (1, 2, 3, 4)] + [
        ("b", float(v)) for v in (10, 20, 30, 40)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    r = brown_forsythe(df, "g", "v").first()
    assert (r.k, r.n) == (2, 8)
    # z_a = [1,0,1,2], z_b = [10,0,10,20]; means 1 and 10; grand 5.5
    # SSB = 4(1-5.5)^2 + 4(10-5.5)^2 = 162; SSW = (2) + (200) = 202
    assert r.w6 == round((8 - 2) / (2 - 1) * 162 / 202, 6)

    const = spark.createDataFrame(
        [("a", 5.0), ("a", 5.0), ("b", 7.0), ("b", 7.0)],
        "g string, v double",
    )
    assert brown_forsythe(const, "g", "v").first().w6 is None


def test_fisher_exact_tea_tasting(spark):
    """The classic tea-tasting table a=3,b=1,c=1,d=3 (margins 4/4/4,
    C(8,4)=70): pmf = [1,16,36,16,1]/70 → p_two = 34/70, p_greater =
    17/70, p_less = 69/70; empty input reads the degenerate p = 1."""
    from pigout_spark.pipeline.behavioral import fisher_exact

    rows = ([(True, True)] * 3 + [(True, False)] * 1
            + [(False, True)] * 1 + [(False, False)] * 3)
    df = spark.createDataFrame(rows, "e boolean, o boolean")
    r = fisher_exact(df, "e", "o").first()
    assert (r.a, r.b, r.c, r.d) == (3, 1, 1, 3)
    assert r.p_two6 == round(34 / 70, 6)
    assert r.p_greater6 == round(17 / 70, 6)
    assert r.p_less6 == round(69 / 70, 6)

    empty = spark.createDataFrame([], "e boolean, o boolean")
    re = fisher_exact(empty, "e", "o").first()
    assert (re.p_two6, re.p_less6, re.p_greater6) == (1.0, 1.0, 1.0)

    # an all-one-margin table (no exposed rows): hypergeometric is a
    # point mass -> every p reads 1
    onem = spark.createDataFrame(
        [(False, True), (False, False)], "e boolean, o boolean"
    )
    ro = fisher_exact(onem, "e", "o").first()
    assert (ro.p_two6, ro.p_less6, ro.p_greater6) == (1.0, 1.0, 1.0)

    # r13 verdict #6: the max_n guard rides a 1-row pre-count broadcast,
    # so a violation fails loudly without a data-sized single-partition
    # pass — and the ONLY window left in the plan is the n-sized lnfact
    # fold over the generated Range relation (no row_number over the
    # input remains).
    import pytest as _pytest

    with _pytest.raises(Exception, match="max_n"):
        fisher_exact(df, "e", "o", max_n=4).first()
    plan = fisher_exact(df, "e", "o")._jdf.queryExecution(
    ).executedPlan().toString()
    # the lnfact fold lives behind the localCheckpoint (Scan
    # ExistingRDD); the data-facing plan carries NO window at all
    assert "row_number" not in plan
    assert "Window" not in plan


def test_grouped_stats_equal_perkey_loop(spark):
    """r10 (r9 verdict #4): the ``keys=`` grouped forms of the four
    single-test statistics must equal running the keyless op on each
    key's slice — same doubled-rank machinery, one key exchange instead
    of a Python loop."""
    from pigout_spark.pipeline.behavioral import (
        brown_forsythe,
        fisher_exact,
        kruskal_wallis,
        mann_whitney_u,
    )

    rows = []
    import random

    rng = random.Random(7)
    for k in ("ka", "kb", "kc"):
        for i in range(40):
            rows.append(
                (
                    k,
                    rng.random() < 0.4,
                    float(rng.randrange(12)),  # plenty of ties
                    f"g{rng.randrange(3)}",
                )
            )
    df = spark.createDataFrame(rows, "seg string, g boolean, v double, c string")

    def perkey(fn, *args):
        out = {}
        for k in ("ka", "kb", "kc"):
            out[k] = fn(df.filter(F.col("seg") == k), *args).collect()[0]
        return out

    mw_g = {r.seg: r for r in mann_whitney_u(df, "g", "v", keys=["seg"]).collect()}
    for k, want in perkey(mann_whitney_u, "g", "v").items():
        got = mw_g[k]
        assert (got.n1, got.n2, got.u1, got.u2, got.z6, got.cliffs_delta6) == (
            want.n1, want.n2, want.u1, want.u2, want.z6, want.cliffs_delta6
        )

    kw_g = {r.seg: r for r in kruskal_wallis(df, "c", "v", keys=["seg"]).collect()}
    for k, want in perkey(kruskal_wallis, "c", "v").items():
        assert (kw_g[k].k, kw_g[k].n, kw_g[k].h6) == (want.k, want.n, want.h6)

    bf_g = {r.seg: r for r in brown_forsythe(df, "c", "v", keys=["seg"]).collect()}
    for k, want in perkey(brown_forsythe, "c", "v").items():
        assert (bf_g[k].k, bf_g[k].n, bf_g[k].w6) == (want.k, want.n, want.w6)

    fdf = df.withColumn("o", F.col("v") > 6)
    fe_g = {r.seg: r for r in fisher_exact(fdf, "g", "o", keys=["seg"]).collect()}
    for k in ("ka", "kb", "kc"):
        want = fisher_exact(fdf.filter(F.col("seg") == k), "g", "o").collect()[0]
        got = fe_g[k]
        assert (got.a, got.b, got.c, got.d) == (want.a, want.b, want.c, want.d)
        assert (got.p_two6, got.p_less6, got.p_greater6) == (
            want.p_two6, want.p_less6, want.p_greater6
        )

    # a key named like an output statistic fails LOUDLY, not ambiguously
    import pytest as _pytest

    with _pytest.raises(ValueError, match="collide"):
        kruskal_wallis(df.withColumnRenamed("seg", "k"), "c", "v", keys=["k"])


def test_normal_two_sided_p_reference_values(spark):
    """A&S 26.2.17 against textbook normal-tail values: z=1.96 → p ≈
    .05, z=0 → 1, z=2.575829 → .01, NULL z → NULL; |err| < 7.5e-8 so
    ROUND-6 readouts agree with tables to the shown digit."""
    from pigout_spark.pipeline.behavioral import normal_two_sided_p

    df = spark.createDataFrame(
        [(1.959964,), (0.0,), (2.575829,), (-1.959964,), (None,)],
        "z double",
    )
    got = [r.p for r in df.select(normal_two_sided_p("z").alias("p")).collect()]
    assert got[0] == 0.05 and got[3] == 0.05  # symmetric
    assert got[1] == 1.0
    assert got[2] == 0.01
    assert got[4] is None


def test_anova_f_hand_checked(spark):
    """Hand-worked F on {1,2,3,4} vs {3,4,5,6} vs {7,8,9,10}: group
    means 2.5/4.5/8.5, grand 31/6; SSB = 4·Σ(m_j−m)² = 74 + 2/3,
    SSW = 3·Σ s_j²·(n_j−1)/(n_j−1)... computed directly below; equal
    groups read NULL (zero within-spread when all values per group
    equal and between too)."""
    from pigout_spark.pipeline.behavioral import anova_f

    groups = {"a": [1, 2, 3, 4], "b": [3, 4, 5, 6], "c": [7, 8, 9, 10]}
    rows = [(g, float(v)) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v double")
    r = anova_f(df, "g", "v").first()
    assert (r.k, r.n) == (3, 12)
    # direct formula on the same moments
    allv = [v for vs in groups.values() for v in vs]
    n, k = len(allv), len(groups)
    gm = sum(allv) / n
    ssb = sum(len(vs) * (sum(vs) / len(vs) - gm) ** 2 for vs in groups.values())
    ssw = sum(
        sum((v - sum(vs) / len(vs)) ** 2 for v in vs) for vs in groups.values()
    )
    assert r.f6 == round((n - k) / (k - 1) * ssb / ssw, 6)

    # degenerate: constant within every group -> SSW = 0 -> NULL
    const = spark.createDataFrame(
        [("a", 5.0), ("a", 5.0), ("b", 7.0), ("b", 7.0)],
        "g string, v double",
    )
    assert anova_f(const, "g", "v").first().f6 is None
    # single group -> NULL
    one = spark.createDataFrame([("a", 1.0), ("a", 2.0)], "g string, v double")
    assert one.transform(lambda d: anova_f(d, "g", "v")).first().f6 is None

    # grouped form == per-key loop
    rows2 = [("k1", g, float(v)) for g, vs in groups.items() for v in vs] + [
        ("k2", g, float(v * 2)) for g, vs in groups.items() for v in vs
    ]
    df2 = spark.createDataFrame(rows2, "s string, g string, v double")
    got = {r.s: r.f6 for r in anova_f(df2, "g", "v", keys=["s"]).collect()}
    for s in ("k1", "k2"):
        want = anova_f(
            df2.filter(F.col("s") == s), "g", "v"
        ).first().f6
        assert got[s] == want
    # scaling every value by a constant leaves F invariant
    assert got["k1"] == got["k2"]


def test_ab_power_mde_hand_checked(spark):
    """MDE and required-n against hand-computed variances; the closed
    z-table contract raises on non-standard alpha/power; degenerate
    inputs read NULL."""
    import math

    import pytest as _pytest

    from pigout_spark.pipeline.behavioral import ab_power_mde

    rows = [("a", v) for v in (10.0, 12.0, 14.0, 16.0)] + [
        ("b", v) for v in (11.0, 15.0, 19.0)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    r = ab_power_mde(df, "g", "v", alpha=0.05, power=0.80).collect()[0]
    # a: n=4, mean=13, var=20/3; b: n=3, mean=15, var=16
    na, nb, va, vb, ma = 4, 3, 20 / 3, 16.0, 13.0
    z = 1.959964 + 0.841621
    se = math.sqrt(va / na + vb / nb)
    assert (r.group_a, r.group_b, r.n_a, r.n_b) == ("a", "b", 4, 3)
    assert r.mde6 == round(z * se, 6)
    assert r.mde_rel6 == round(z * se / ma, 6)
    assert r.n_per_arm == math.ceil(z * z * (va + vb) / (2.0 * 2.0))

    with _pytest.raises(ValueError, match="alpha"):
        ab_power_mde(df, "g", "v", alpha=0.07)
    with _pytest.raises(ValueError, match="power"):
        ab_power_mde(df, "g", "v", power=0.85)

    # degenerate: one group -> NULL readout; zero effect -> NULL n
    one = spark.createDataFrame([("a", 1.0), ("a", 2.0)], "g string, v double")
    r1 = ab_power_mde(one, "g", "v").collect()[0]
    assert (r1.mde6, r1.mde_rel6, r1.n_per_arm) == (None, None, None)
    same = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 1.0), ("b", 3.0)], "g string, v double"
    )
    r2 = ab_power_mde(same, "g", "v").collect()[0]
    assert r2.mde6 is not None and r2.n_per_arm is None


def test_welch_ttest_hand_checked(spark):
    """Welch t on {1,2,3,4,5} vs {2,4,6,8,10,12}: means 3 and 7,
    sample variances 2.5 and 14; t and the Welch–Satterthwaite dof
    computed directly; group_a is the SMALLER label whatever the row
    order, so swapping labels flips t's sign deterministically."""
    from pigout_spark.pipeline.behavioral import welch_ttest

    a = [1.0, 2.0, 3.0, 4.0, 5.0]
    b = [2.0, 4.0, 6.0, 8.0, 10.0, 12.0]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    r = welch_ttest(df, "g", "v").first()
    assert (r.group_a, r.group_b, r.n_a, r.n_b) == ("a", "b", 5, 6)
    ma, mb = sum(a) / len(a), sum(b) / len(b)
    va = sum((v - ma) ** 2 for v in a) / (len(a) - 1)
    vb = sum((v - mb) ** 2 for v in b) / (len(b) - 1)
    sa, sb = va / len(a), vb / len(b)
    t = (ma - mb) / (sa + sb) ** 0.5
    dof = (sa + sb) ** 2 / (sa**2 / (len(a) - 1) + sb**2 / (len(b) - 1))
    assert r.t6 == round(t, 6)
    assert r.dof6 == round(dof, 6)

    # three groups -> degenerate NULL (the two-cohort contract)
    three = spark.createDataFrame(
        rows + [("c", 1.0), ("c", 2.0)], "g string, v double"
    )
    r3 = welch_ttest(three, "g", "v").first()
    assert r3.t6 is None and r3.dof6 is None
    # n_a < 2 -> NULL
    tiny = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("b", 3.0)], "g string, v double"
    )
    assert welch_ttest(tiny, "g", "v").first().t6 is None
    # grouped form == per-key loop
    rows2 = [("k1", g, v) for g, v in rows] + [
        ("k2", g, v + 1.0) for g, v in rows
    ]
    df2 = spark.createDataFrame(rows2, "s string, g string, v double")
    got = {r.s: (r.t6, r.dof6)
           for r in welch_ttest(df2, "g", "v", keys=["s"]).collect()}
    assert got["k1"] == (round(t, 6), round(dof, 6))
    # shifting both cohorts by a constant leaves t and dof unchanged
    assert got["k2"] == got["k1"]


def test_two_prop_ztest_hand_checked(spark):
    """Pooled z on 30/100 vs 45/100: p̂ = 0.375, z computed directly;
    group_a is the smaller label whatever the row order; p6 replays
    normal_two_sided_p from the ROUNDED z6 (the oracle-replay
    contract)."""
    from pigout_spark.pipeline.behavioral import two_prop_ztest

    rows = [("a", 1)] * 30 + [("a", 0)] * 70 + [("b", 1)] * 45 + [
        ("b", 0)
    ] * 55
    df = spark.createDataFrame(rows, "g string, s int")
    r = two_prop_ztest(df, "g", "s").first()
    assert (r.group_a, r.group_b, r.n_a, r.n_b, r.s_a, r.s_b) == (
        "a", "b", 100, 100, 30, 45
    )
    pool = 75 / 200
    z = (0.30 - 0.45) / (pool * (1 - pool) * (1 / 100 + 1 / 100)) ** 0.5
    assert r.z6 == round(z, 6)
    # p6 from the rounded z6 through the same A&S chain
    df_z = spark.createDataFrame([(r.z6,)], "z double")
    from pigout_spark.pipeline.behavioral import normal_two_sided_p

    want_p = df_z.select(normal_two_sided_p("z").alias("p")).first().p
    assert r.p6 == want_p

    # degenerate: all successes -> pooled p = 1 -> NULL
    ones = spark.createDataFrame(
        [("a", 1), ("a", 1), ("b", 1)], "g string, s int"
    )
    r1 = ones.transform(
        lambda d: two_prop_ztest(d, "g", "s")
    ).first()
    assert r1.z6 is None and r1.p6 is None
    # three groups -> NULL
    three = spark.createDataFrame(
        rows + [("c", 1), ("c", 0)], "g string, s int"
    )
    assert two_prop_ztest(three, "g", "s").first().z6 is None
    # NULL success rows excluded, boolean success accepted
    bools = spark.createDataFrame(
        [("a", True), ("a", False), ("b", True), ("b", None)],
        "g string, s boolean",
    )
    rb = two_prop_ztest(bools, "g", "s").first()
    assert (rb.n_a, rb.n_b, rb.s_a, rb.s_b) == (2, 1, 1, 1)
    # grouped form == per-key loop
    rows2 = [("k1", g, s) for g, s in rows] + [
        ("k2", g, 1 - s) for g, s in rows
    ]
    df2 = spark.createDataFrame(rows2, "src string, g string, s int")
    got = {r.src: r.z6
           for r in two_prop_ztest(df2, "g", "s", keys=["src"]).collect()}
    assert got["k1"] == round(z, 6)
    # complementing successes flips the sign of z exactly
    assert got["k2"] == round(-z, 6)


def test_theil_sen_hand_checked(spark):
    """Slope on a clean line y = 2x + 1 reads exactly 2 whatever the
    contamination of ONE wild outlier (the estimator's whole point —
    OLS would be dragged); equal-x pairs are excluded; the lower
    median and the cap follow the documented contracts."""
    from pigout_spark.pipeline.behavioral import theil_sen

    pts = [(float(x), 2.0 * x + 1.0) for x in range(9)] + [(4.5, 1000.0)]
    df = spark.createDataFrame(pts, "x double, y double")
    r = theil_sen(df, "x", "y").first()
    assert r.n_points == 10
    assert r.n_pairs == 45  # no equal-x pairs in this set
    assert r.slope6 == 2.0  # median slope ignores the outlier

    # equal-x pairs excluded: vertical pair contributes no slope
    vert = spark.createDataFrame(
        [(1.0, 1.0), (1.0, 5.0), (2.0, 2.0)], "x double, y double"
    )
    rv = theil_sen(vert, "x", "y").first()
    assert rv.n_pairs == 2  # (1,1)-(2,2) and (1,5)-(2,2); not (1,1)-(1,5)
    # all x equal -> zero pairs -> NULL slope
    allv = spark.createDataFrame(
        [(1.0, 1.0), (1.0, 2.0), (1.0, 3.0)], "x double, y double"
    )
    ra = theil_sen(allv, "x", "y").first()
    assert ra.n_pairs == 0 and ra.slope6 is None
    # single point -> NULL
    one = spark.createDataFrame([(1.0, 1.0)], "x double, y double")
    assert theil_sen(one, "x", "y").first().slope6 is None
    # NULL rows excluded before the cap rank
    nulls = spark.createDataFrame(
        [(None, 9.0)] + pts, "x double, y double"
    )
    assert theil_sen(nulls, "x", "y").first().n_points == 10

    # cap engages deterministically: first N points under (x, y) order
    capped = theil_sen(df, "x", "y", max_points_per_key=5).first()
    assert capped.n_points == 5
    # first 5 by (x,y): x = 0..3 on the line plus (4.0, 9.0) — pure line
    assert capped.slope6 == 2.0

    # grouped form == per-key loop; slopes scale with y
    rows2 = [("k1", x, y) for x, y in pts] + [
        ("k2", x, 3.0 * y) for x, y in pts
    ]
    df2 = spark.createDataFrame(rows2, "s string, x double, y double")
    got = {r.s: r.slope6
           for r in theil_sen(df2, "x", "y", keys=["s"]).collect()}
    assert got["k1"] == 2.0 and got["k2"] == 6.0


def test_nelson_aalen_hand_checked(spark):
    """Textbook NA on durations {1:event, 2:censor, 3:event, 3:event}:
    H(1) = 1/4, H(3) = 1/4 + 2/2; censoring shrinks risk sets without
    emitting a row; d = n is a regular term (no KM zero-flag)."""
    from pigout_spark.pipeline.behavioral import nelson_aalen

    rows = [
        ("a", 1.0, True),
        ("a", 2.0, False),
        ("a", 3.0, True),
        ("a", 3.0, True),
    ]
    df = spark.createDataFrame(rows, "k string, dur double, e boolean")
    got = {r.t: (r.n_risk, r.d, r.haz6)
           for r in nelson_aalen(df, "dur", "e", ["k"]).collect()}
    assert got[1] == (4, 1, 0.25)
    # t=2 is censoring-only: no emitted row
    assert 2 not in got
    # at t=3 risk set is 2, both event: H = 0.25 + 1.0
    assert got[3] == (2, 2, 1.25)

    # NULLs excluded; non-integer duration fails loudly
    withnull = spark.createDataFrame(
        rows + [("a", None, True)], "k string, dur double, e boolean"
    )
    assert len(nelson_aalen(withnull, "dur", "e", ["k"]).collect()) == 2
    import pytest as _pytest

    frac = spark.createDataFrame(
        [("a", 1.5, True)], "k string, dur double, e boolean"
    )
    with _pytest.raises(Exception, match="integer time unit"):
        nelson_aalen(frac, "dur", "e", ["k"]).collect()

    # agrees with kaplan_meier's risk-set relation on the same input
    from pigout_spark.pipeline.behavioral import kaplan_meier

    km = {r.t: (r.n_risk, r.d)
          for r in kaplan_meier(df, "dur", "e", ["k"]).collect()}
    assert {t: v[:2] for t, v in got.items()} == km


def test_mantel_haenszel_hand_checked(spark):
    """Two hand-worked strata: (a,b,c,d) = (10,5,3,12) n=30 and
    (4,6,8,2) n=20 → OR_MH = (10·12/30 + 4·2/20)/(5·3/30 + 6·8/20);
    a zero-cell stratum contributes 0 to one sum instead of exploding;
    all-concordant data reads NULL."""
    from pigout_spark.pipeline.behavioral import mantel_haenszel

    def stratum(s, a, b, c, d):
        return (
            [(s, True, True)] * a + [(s, True, False)] * b
            + [(s, False, True)] * c + [(s, False, False)] * d
        )

    rows = stratum("s1", 10, 5, 3, 12) + stratum("s2", 4, 6, 8, 2)
    df = spark.createDataFrame(rows, "s string, e boolean, o boolean")
    r = mantel_haenszel(df, "e", "o", "s").first()
    num = round(10 * 12 / 30, 6) + round(4 * 2 / 20, 6)
    den = round(5 * 3 / 30, 6) + round(6 * 8 / 20, 6)
    assert (r.n_strata, r.n) == (2, 50)
    assert r.or_mh6 == round(num / den, 6)

    # zero cell: stratum with b=0 still pools (contributes 0 to den)
    z = spark.createDataFrame(
        stratum("s1", 2, 0, 1, 3) + stratum("s2", 1, 2, 3, 4),
        "s string, e boolean, o boolean",
    )
    rz = mantel_haenszel(z, "e", "o", "s").first()
    znum = round(2 * 3 / 6, 6) + round(1 * 4 / 10, 6)
    zden = round(0 * 1 / 6, 6) + round(2 * 3 / 10, 6)
    assert rz.or_mh6 == round(znum / zden, 6)

    # no discordant pairs anywhere -> den 0 -> NULL
    conc = spark.createDataFrame(
        stratum("s1", 3, 0, 0, 3), "s string, e boolean, o boolean"
    )
    assert mantel_haenszel(conc, "e", "o", "s").first().or_mh6 is None

    # keys= form == per-key loop
    rows2 = [("k1", *t) for t in rows] + [("k2", s, o, e)
                                          for s, e, o in rows]
    df2 = spark.createDataFrame(
        rows2, "g string, s string, e boolean, o boolean"
    )
    got = {r.g: r.or_mh6
           for r in mantel_haenszel(df2, "e", "o", "s",
                                    keys=["g"]).collect()}
    assert got["k1"] == round(num / den, 6)
    # swapping exposure/outcome leaves every stratum's ad and bc
    # unchanged (2x2 transpose) -> identical OR_MH
    assert got["k2"] == got["k1"]


def test_new_stats_invariances(spark):
    """Distribution-free invariances of the r11 stats — the properties
    a wrong implementation breaks first: Theil–Sen affine
    equivariance, two-proportion label/complement antisymmetry, ANOVA
    F location invariance, Welch location shift."""
    import random

    from pigout_spark.pipeline.behavioral import (
        anova_f,
        theil_sen,
        two_prop_ztest,
        welch_ttest,
    )

    rng = random.Random(11)
    pts = [(rng.uniform(0, 50), rng.uniform(-10, 10)) for _ in range(40)]
    df = spark.createDataFrame(pts, "x double, y double")
    base = theil_sen(df, "x", "y").first().slope6
    # affine equivariance: y -> 3y + 7 scales the slope by exactly 3
    aff = spark.createDataFrame(
        [(x, 3.0 * y + 7.0) for x, y in pts], "x double, y double"
    )
    got = theil_sen(aff, "x", "y").first().slope6
    assert abs(got - 3.0 * base) < 5e-6  # ROUND-6 readouts compose
    # translation in x leaves the slope unchanged exactly (same pair
    # differences, same doubles)
    tx = spark.createDataFrame(
        [(x + 100.0, y) for x, y in pts], "x double, y double"
    )
    assert theil_sen(tx, "x", "y").first().slope6 == base

    # two-prop: complementing the success flips z's sign exactly
    rows = [("a", rng.random() < 0.3) for _ in range(60)] + [
        ("b", rng.random() < 0.5) for _ in range(50)
    ]
    pz = spark.createDataFrame(rows, "g string, s boolean")
    z1 = two_prop_ztest(pz, "g", "s").first().z6
    pz2 = spark.createDataFrame(
        [(g, not s) for g, s in rows], "g string, s boolean"
    )
    assert two_prop_ztest(pz2, "g", "s").first().z6 == -z1

    # ANOVA F: adding a constant to every value changes nothing
    vals = [(rng.choice("abc"), rng.gauss(0, 1)) for _ in range(90)]
    av = spark.createDataFrame(vals, "g string, v double")
    f1 = anova_f(av, "g", "v").first().f6
    av2 = spark.createDataFrame(
        [(g, v + 1000.0) for g, v in vals], "g string, v double"
    )
    f2 = anova_f(av2, "g", "v").first().f6
    assert f1 is not None and abs(f2 - f1) < 2e-4  # decimal-exact sums,
    # one IEEE readout; the shift only moves the last rounded digit

    # Welch: shifting ONE cohort by c moves t in the direction of c
    wv = spark.createDataFrame(vals, "g string, v double")
    two = wv.filter(F.col("g") != "c")
    t1 = welch_ttest(two, "g", "v").first().t6
    shifted = spark.createDataFrame(
        [(g, v + (5.0 if g == "a" else 0.0)) for g, v in vals
         if g != "c"],
        "g string, v double",
    )
    t2 = welch_ttest(shifted, "g", "v").first().t6
    assert t2 > t1


def test_poisson_bootstrap_hand_checked(spark):
    """Constant values pin the whole machinery: every replicate mean of
    a constant-5 column is exactly 5.0, so mean and both bounds read
    5.0; the interval brackets the mean on real data; weights are
    deterministic (re-run identical); fractional values and missing
    id_cols fail loudly; key-name collisions fail loudly."""
    import pytest

    from pigout_spark.pipeline.behavioral import poisson_bootstrap

    const = spark.createDataFrame(
        [("a", 5, i) for i in range(200)], "k string, v long, id long"
    )
    r = poisson_bootstrap(const, "v", ["id"], keys=["k"]).first()
    assert r.n == 200 and r.mean6 == 5.0
    assert r.boot_lo6 == 5.0 and r.boot_hi6 == 5.0

    varied = spark.createDataFrame(
        [("a", i % 50, i) for i in range(400)], "k string, v long, id long"
    )
    r1 = poisson_bootstrap(varied, "v", ["id"], keys=["k"]).first()
    r2 = poisson_bootstrap(varied, "v", ["id"], keys=["k"]).first()
    assert (r1.boot_lo6, r1.boot_hi6) == (r2.boot_lo6, r2.boot_hi6)
    assert r1.boot_lo6 <= r1.mean6 <= r1.boot_hi6
    assert r1.boot_lo6 < r1.boot_hi6

    # keyless single-readout form
    g = poisson_bootstrap(varied.select("v", "id"), "v", ["id"]).first()
    assert g.n == 400 and g.boot_lo6 <= g.mean6 <= g.boot_hi6

    frac = spark.createDataFrame([("a", 1.5, 1)], "k string, v double, id long")
    with pytest.raises(Exception, match="integral"):
        poisson_bootstrap(frac, "v", ["id"], keys=["k"]).collect()
    with pytest.raises(ValueError, match="id_cols"):
        poisson_bootstrap(const, "v", [], keys=["k"])
    bad = spark.createDataFrame([(1, 2, 3)], "n long, v long, id long")
    with pytest.raises(ValueError, match="collide"):
        poisson_bootstrap(bad, "v", ["id"], keys=["n"])


def test_diff_in_diff_hand_checked(spark):
    """Hand computation: treated pre 10→post 30 (+20), control pre
    5→post 10 (+5) ⇒ DiD = 15; a key missing a cell reads NULL;
    fractional values raise; key collisions raise."""
    import pytest

    from pigout_spark.pipeline.behavioral import diff_in_diff

    rows = [
        ("a", True, False, 10), ("a", True, True, 30),
        ("a", False, False, 5), ("a", False, True, 10),
        ("b", True, True, 7),  # no pre / no control cells
    ]
    df = spark.createDataFrame(rows, "k string, t boolean, p boolean, v long")
    out = {r.k: r for r in diff_in_diff(df, "t", "p", "v", ["k"]).collect()}
    assert out["a"].did6 == 15.0
    assert out["a"].n_tpost == 1 and out["a"].n_cpre == 1
    assert out["b"].did6 is None

    # keyless single-readout form
    one = diff_in_diff(
        df.filter("k = 'a'").select("t", "p", "v"), "t", "p", "v"
    ).first()
    assert one.did6 == 15.0

    frac = spark.createDataFrame(
        [("a", True, True, 1.5)], "k string, t boolean, p boolean, v double"
    )
    with pytest.raises(Exception, match="integral"):
        diff_in_diff(frac, "t", "p", "v", ["k"]).collect()
    bad = spark.createDataFrame(
        [(1, True, True, 1)], "did6 long, t boolean, p boolean, v long"
    )
    with pytest.raises(ValueError, match="collide"):
        diff_in_diff(bad, "t", "p", "v", ["did6"])


def test_trimmed_mean_hand_checked(spark):
    """1..10 at trim 0.1 drops 1 and 10 → mean(2..9) = 5.5; an outlier
    in the trimmed zone cannot move the estimate; trim 0 equals the
    plain mean; over-trimmed keys read NULL; trim bounds enforced."""
    import pytest

    from pigout_spark.pipeline.behavioral import trimmed_mean

    df = spark.createDataFrame(
        [("a", v) for v in range(1, 11)], "k string, v long"
    )
    r = trimmed_mean(df, "v", ["k"], trim=0.1).first()
    assert (r.n, r.n_trim, r.tmean6) == (10, 1, 5.5)

    spiked = spark.createDataFrame(
        [("a", v) for v in range(1, 10)] + [("a", 100000)],
        "k string, v long",
    )
    assert trimmed_mean(spiked, "v", ["k"], trim=0.1).first().tmean6 == 5.5

    assert trimmed_mean(df, "v", ["k"], trim=0.0).first().tmean6 == 5.5

    tiny = spark.createDataFrame([("a", 1), ("a", 2)], "k string, v long")
    assert trimmed_mean(tiny, "v", ["k"], trim=0.45).first().tmean6 is None

    with pytest.raises(ValueError, match="trim"):
        trimmed_mean(df, "v", ["k"], trim=0.5)


def test_conformal_quantile_hand_checked(spark):
    """Scores 1..9 at α=0.1: rank ⌈0.9·10⌉ = 9 → q̂ = 9; with n = 19,
    rank ⌈0.9·20⌉ = 18; n below the coverage bound reads NULL; alpha
    bounds enforced."""
    import pytest

    from pigout_spark.pipeline.behavioral import conformal_quantile

    df = spark.createDataFrame(
        [("a", float(v)) for v in range(1, 10)], "k string, s double"
    )
    r = conformal_quantile(df, "s", ["k"], alpha=0.1).first()
    assert (r.n, r.qhat6) == (9, 9.0)

    df19 = spark.createDataFrame(
        [("a", float(v)) for v in range(1, 20)], "k string, s double"
    )
    assert conformal_quantile(df19, "s", ["k"], 0.1).first().qhat6 == 18.0

    small = spark.createDataFrame(
        [("a", float(v)) for v in range(1, 6)], "k string, s double"
    )
    assert conformal_quantile(small, "s", ["k"], 0.1).first().qhat6 is None

    with pytest.raises(ValueError, match="alpha"):
        conformal_quantile(df, "s", ["k"], alpha=1.0)


def test_psm_match_hand_checked(spark):
    """Controls at 0.1/0.5: treated 0.3 ties both sides → backward
    (0.1); treated 0.45 → 0.5; an equal-score control matches at
    distance 0 picking the LARGEST control id below; caliper NULLs
    far matches; a key with no controls reads NULL; key collisions
    raise."""
    import pytest

    from pigout_spark.pipeline.behavioral import psm_match

    rows = [
        ("a", False, 0.1, 1), ("a", False, 0.5, 2),
        ("a", True, 0.3, 10), ("a", True, 0.45, 11),
        ("b", False, 0.3, 3), ("b", False, 0.3, 4), ("b", True, 0.3, 12),
        ("c", True, 0.9, 13),
    ]
    df = spark.createDataFrame(rows, "k string, t boolean, s double, id long")
    out = {r.id: r for r in psm_match(df, "t", "s", "id", ["k"]).collect()}
    assert out[10].match_id == 1 and out[10].dist6 == 0.2  # tie → backward
    assert out[11].match_id == 2 and round(out[11].dist6, 6) == 0.05
    assert out[12].match_id == 4 and out[12].dist6 == 0.0  # max id below
    assert out[13].match_id is None and out[13].dist6 is None
    assert set(out) == {10, 11, 12, 13}  # treated rows only

    capped = {r.id: r for r in
              psm_match(df, "t", "s", "id", ["k"], caliper=0.1).collect()}
    assert capped[10].match_id is None  # 0.2 > caliper
    assert capped[11].match_id == 2    # 0.05 <= caliper

    # keyless global pool
    g = psm_match(df.drop("k"), "t", "s", "id").collect()
    assert len(g) == 4

    bad = spark.createDataFrame(
        [(1, True, 0.1, 2)], "score long, t boolean, s double, i long"
    )
    with pytest.raises(ValueError, match="collide"):
        psm_match(bad, "t", "s", "i", ["score"])


def test_jackknife_ratio_hand_checked(spark):
    """A corpus where numerator == denominator everywhere has every
    leave-one-out ratio exactly 1 → se6 = 0; heterogeneous units give
    a strictly positive SE; a single-unit key is degenerate (some
    leave-one-out denominator empties) → NULL se6; fractional values
    and guards raise."""
    import pytest

    from pigout_spark.pipeline.behavioral import jackknife_ratio

    same = spark.createDataFrame(
        [("a", 5, 5, i) for i in range(300)], "k string, nu long, de long, u long"
    )
    r = jackknife_ratio(same, "nu", "de", ["u"], keys=["k"]).first()
    assert (r.n, r.ratio6, r.se6) == (300, 1.0, 0.0)

    varied = spark.createDataFrame(
        [("a", (i * 7) % 13, 10, i) for i in range(400)],
        "k string, nu long, de long, u long",
    )
    rv = jackknife_ratio(varied, "nu", "de", ["u"], keys=["k"]).first()
    assert rv.se6 is not None and 0 < rv.se6 < 0.2
    assert abs(rv.ratio6 - 6.0 / 10.0) < 0.1

    single = spark.createDataFrame(
        [("a", 1, 2, 42)], "k string, nu long, de long, u long"
    )
    rs = jackknife_ratio(single, "nu", "de", ["u"], keys=["k"]).first()
    assert rs.ratio6 == 0.5 and rs.se6 is None

    frac = spark.createDataFrame(
        [("a", 1.5, 2.0, 1)], "k string, nu double, de double, u long"
    )
    with pytest.raises(Exception, match="integral"):
        jackknife_ratio(frac, "nu", "de", ["u"], keys=["k"]).collect()
    with pytest.raises(ValueError, match="id_cols"):
        jackknife_ratio(single, "nu", "de", [], keys=["k"])
    with pytest.raises(ValueError, match="buckets"):
        jackknife_ratio(single, "nu", "de", ["u"], keys=["k"], buckets=1)


def test_emp_bernstein_ci_hand_checked(spark):
    """Constant data has zero variance — the interval collapses to the
    7R·ln(2/δ)/(3(n−1)) linear term, hand-computable; the interval
    always brackets the mean and shrinks with n; n=1 reads NULL
    bounds; range/delta/integrality guards raise."""
    import math

    import pytest

    from pigout_spark.pipeline.behavioral import emp_bernstein_ci

    const = spark.createDataFrame(
        [("a", 5)] * 101, "k string, v long"
    )
    r = emp_bernstein_ci(const, "v", ["k"], 0.05, 10.0).first()
    lin = 7.0 * 10.0 * math.log(2.0 / 0.05) / 3.0 / 100.0
    assert r.mean6 == 5.0
    assert abs((r.eb_hi6 - r.eb_lo6) / 2 - lin) < 1e-6

    varied = spark.createDataFrame(
        [("a", i % 10) for i in range(50)]
        + [("b", i % 10) for i in range(500)],
        "k string, v long",
    )
    out = {x.k: x for x in
           emp_bernstein_ci(varied, "v", ["k"], 0.05, 9.0).collect()}
    for x in out.values():
        assert x.eb_lo6 < x.mean6 < x.eb_hi6
    assert (out["b"].eb_hi6 - out["b"].eb_lo6) < (
        out["a"].eb_hi6 - out["a"].eb_lo6
    )

    single = spark.createDataFrame([("a", 3)], "k string, v long")
    rs = emp_bernstein_ci(single, "v", ["k"], 0.05, 10.0).first()
    assert rs.eb_lo6 is None and rs.eb_hi6 is None

    with pytest.raises(ValueError, match="value_range"):
        emp_bernstein_ci(const, "v", ["k"], 0.05, None)
    with pytest.raises(ValueError, match="delta"):
        emp_bernstein_ci(const, "v", ["k"], 1.5, 10.0)
    over = spark.createDataFrame([("a", 99)], "k string, v long")
    with pytest.raises(Exception, match="integral in"):
        emp_bernstein_ci(over, "v", ["k"], 0.05, 10.0).collect()


def test_cochran_armitage_hand_checked(spark):
    """A perfect positive dose-response (rate 0→0.5→1 over doses
    0/1/2) gives a large positive z; reversing doses flips the sign
    exactly; a flat response gives z ≈ 0; degenerate keys (all
    success, single dose) read NULL; fractional scores raise."""
    import pytest

    from pigout_spark.pipeline.behavioral import cochran_armitage

    def mk(rates, key="a"):
        rows = []
        for dose, rate in enumerate(rates):
            k = int(rate * 20)
            rows += [(key, dose, True)] * k + [(key, dose, False)] * (20 - k)
        return rows

    up = spark.createDataFrame(mk([0.0, 0.5, 1.0]), "k string, s long, y boolean")
    zu = cochran_armitage(up, "s", "y", ["k"]).first()
    assert zu.n == 60 and zu.n_succ == 30 and zu.z6 > 5

    down_rows = [(k, 2 - s, y) for k, s, y in mk([0.0, 0.5, 1.0])]
    down = spark.createDataFrame(down_rows, "k string, s long, y boolean")
    zd = cochran_armitage(down, "s", "y", ["k"]).first()
    assert zd.z6 == -zu.z6

    flat = spark.createDataFrame(mk([0.5, 0.5, 0.5]), "k string, s long, y boolean")
    assert abs(cochran_armitage(flat, "s", "y", ["k"]).first().z6) < 1e-9

    allsucc = spark.createDataFrame(
        [("a", 0, True), ("a", 1, True)], "k string, s long, y boolean"
    )
    r = cochran_armitage(allsucc, "s", "y", ["k"]).first()
    assert r.z6 is None and r.p6 is None

    frac = spark.createDataFrame([("a", 1.5, True)], "k string, s double, y boolean")
    with pytest.raises(Exception, match="integer"):
        cochran_armitage(frac, "s", "y", ["k"]).collect()


def test_by_fdr_vs_bh(spark):
    """BY is BH inflated by exactly the harmonic number c(m): on the
    same p relation every BY q equals min(1, BH-chain with the extra
    factor) and is ≥ the BH q; at m=1 (c=1) the two coincide; the
    monotone suffix-min property holds; out-of-range p raises."""
    import pytest

    from pigout_spark.pipeline.behavioral import bh_fdr, by_fdr

    ps = [0.001, 0.008, 0.02, 0.04, 0.2, 0.9]
    df = spark.createDataFrame([(f"t{i}", p) for i, p in enumerate(ps)],
                               "t string, p double")
    bh = {r.t: r.q6 for r in bh_fdr(df, "p").collect()}
    by = {r.t: r.q6 for r in by_fdr(df, "p").collect()}
    c6 = sum(round(1.0 / i, 12) for i in range(1, 7))
    for t_ in bh:
        assert by[t_] >= bh[t_]
        assert by[t_] <= min(1.0, round(bh[t_] * c6, 5) + 1e-5)

    one = spark.createDataFrame([("x", 0.03)], "t string, p double")
    assert by_fdr(one, "p").first().q6 == bh_fdr(one, "p").first().q6 == 0.03

    qs = sorted((r.p, r.q6) for r in by_fdr(df, "p").collect())
    assert all(qs[i][1] <= qs[i + 1][1] for i in range(len(qs) - 1))

    bad = spark.createDataFrame([("x", 1.5)], "t string, p double")
    with pytest.raises(Exception, match="lie in"):
        by_fdr(bad, "p").collect()


def test_msprt_hand_checked(spark):
    """mSPRT trajectory on a tiny two-period experiment, the λ chain
    replicated in plain Python; the always-valid p is the running min
    and never increases; an empty arm reads honest NULLs; non-integral
    values fail loudly."""
    import math

    import pytest

    from pigout_spark.pipeline.behavioral import msprt

    rows = [
        (1, True, 100), (1, True, 120), (1, False, 90), (1, False, 110),
        (2, True, 130), (2, False, 80),
    ]
    df = spark.createDataFrame(rows, "t long, arm boolean, v long")
    got = {r.t: r for r in msprt(df, "t", "arm", "v", tau2=100.0).collect()}

    def expect(nt, st, sst, nc, sc, ssc, tau2=100.0):
        dof = nt + nc - 2.0
        s2 = (sst - st * st / nt + ssc - sc * sc / nc) / dof
        vn = s2 * (1.0 / nt + 1.0 / nc)
        delta = st / nt - sc / nc
        loglam = 0.5 * math.log(vn / (vn + tau2)) + tau2 * delta * delta / (
            2.0 * vn * (vn + tau2)
        )
        return round(delta, 6), round(loglam, 6)

    d1, l1 = expect(2, 220, 24400, 2, 200, 20200)
    d2, l2 = expect(3, 350, 41300, 3, 280, 26600)
    assert (got[1].n_t, got[1].n_c) == (2, 2)
    assert got[1].delta6 == d1 and got[1].loglam6 == l1
    assert got[1].p_av6 == round(math.exp(-max(l1, 0.0)), 6)
    assert got[2].delta6 == d2 and got[2].loglam6 == l2
    # running max of ln-lambda -> p never increases
    assert got[2].p_av6 == round(math.exp(-max(l1, l2, 0.0)), 6)
    assert got[2].p_av6 <= got[1].p_av6

    # keyed mode + an arm still empty in the first period -> NULLs there
    kd = spark.createDataFrame(
        [("a", 1, True, 10), ("a", 2, False, 12), ("a", 2, True, 14)],
        "k string, t long, arm boolean, v long",
    )
    kg = {r.t: r for r in msprt(kd, "t", "arm", "v", 50.0, keys=["k"]).collect()}
    assert kg[1].loglam6 is None and kg[1].p_av6 is None
    bad = spark.createDataFrame([(1, True, 1.5)], "t long, arm boolean, v double")
    with pytest.raises(Exception, match="integral"):
        msprt(bad, "t", "arm", "v", 100.0).collect()
    with pytest.raises(ValueError, match="tau2"):
        msprt(df, "t", "arm", "v", 0.0)


def test_jackknife_degenerate_key_oracle_parity(spark, tmp_path):
    """r13 ADVICE #1 pinned cross-engine: a key whose denominator lives
    entirely in one md5 bucket (here: a single-order key) must read
    NULL se6 from BOTH the Spark operator and the DuckDB oracle — the
    ungated oracle used to abort the whole query on the inf→DECIMAL
    cast instead of degrading like the operator."""
    import duckdb
    import pandas as pd

    from pigout_spark.queries.behavioral_q import _jk_sql

    rows = [
        # key 'A': 200 orders — healthy spread over 32 buckets
        *[("A", float(100 + i), 0.10, i) for i in range(200)],
        # key 'Z': ONE order — its bucket holds the whole denominator
        ("Z", 500.0, 0.20, 9_999),
    ]
    pdf = pd.DataFrame(
        rows,
        columns=["l_returnflag", "l_extendedprice", "l_discount", "l_orderkey"],
    )
    pdf.to_parquet(tmp_path / "lineitem.parquet")

    from pigout_spark.pipeline.behavioral import jackknife_ratio

    sdf = spark.read.parquet(str(tmp_path / "lineitem.parquet"))
    got = {
        r.l_returnflag: r
        for r in jackknife_ratio(
            sdf.select(
                "l_returnflag",
                F.round(F.col("l_extendedprice") * F.col("l_discount") * 100)
                .cast("bigint")
                .alias("nu"),
                F.round(F.col("l_extendedprice") * 100)
                .cast("bigint")
                .alias("de"),
                "l_orderkey",
            ),
            "nu",
            "de",
            ["l_orderkey"],
            keys=["l_returnflag"],
        ).collect()
    }
    assert got["Z"].se6 is None and got["Z"].ratio6 is not None
    assert got["A"].se6 is not None

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"'{tmp_path / 'lineitem.parquet'}'"
    )
    # the gated oracle must RUN (no inf->decimal abort) and agree
    ora = {r[0]: r for r in con.execute(_jk_sql()).fetchall()}
    assert ora["Z"][3] is None  # se6
    assert ora["Z"][2] == got["Z"].ratio6
    assert ora["A"][3] == got["A"].se6
    assert ora["A"][2] == got["A"].ratio6


def test_mann_kendall_hand_checked(spark):
    """r14: S, tie-corrected var_num and z against hand arithmetic —
    monotone sequences hit |S| = n(n-1)/2, ties reduce var_num by the
    documented term, all-tied and single-point inputs read NULL z."""
    from pigout_spark.pipeline.behavioral import mann_kendall

    # strictly increasing: S = C(5,2) = 10, no ties
    inc = spark.createDataFrame(
        [(float(i), float(i) * 3.0) for i in range(5)], "x double, y double"
    )
    r = mann_kendall(inc, "x", "y").first()
    assert (r.n_points, r.s_stat) == (5, 10)
    assert r.var_num == 5 * 4 * 15  # n(n-1)(2n+5), no tie term
    import math
    want_z = round((10 - 1.0) / math.sqrt(300 / 18.0), 6)
    assert r.z6 == want_z

    # strictly decreasing mirrors the sign
    dec = spark.createDataFrame(
        [(float(i), -float(i)) for i in range(5)], "x double, y double"
    )
    rd = mann_kendall(dec, "x", "y").first()
    assert rd.s_stat == -10 and rd.z6 == -want_z

    # one tied pair of y values: tie term t=2 -> 2*1*9 = 18
    tied = spark.createDataFrame(
        [(0.0, 1.0), (1.0, 2.0), (2.0, 2.0), (3.0, 5.0)],
        "x double, y double",
    )
    rt = mann_kendall(tied, "x", "y").first()
    # pairs: (1,2)+ (1,2)+ (1,5)+ (2,2)0 (2,5)+ (2,5)+ -> S = 5
    assert rt.s_stat == 5
    assert rt.var_num == 4 * 3 * 13 - 18

    # all y tied -> S = 0, var_num = 0 -> NULL z/p
    flat = spark.createDataFrame(
        [(float(i), 7.0) for i in range(4)], "x double, y double"
    )
    rf = mann_kendall(flat, "x", "y").first()
    assert (rf.s_stat, rf.var_num, rf.z6, rf.p6) == (0, 0, None, None)

    # single point -> NULL; NULLs excluded before the cap
    one = spark.createDataFrame([(1.0, 1.0)], "x double, y double")
    assert mann_kendall(one, "x", "y").first().z6 is None
    nulls = spark.createDataFrame(
        [(None, 9.0), (0.0, 0.0), (1.0, 1.0), (2.0, 2.0)],
        "x double, y double",
    )
    assert mann_kendall(nulls, "x", "y").first().n_points == 3

    # per-key + cap: keys stay independent, cap takes the FIRST n
    two = spark.createDataFrame(
        [("a", float(i), float(i)) for i in range(6)]
        + [("b", float(i), -float(i)) for i in range(4)],
        "k string, x double, y double",
    )
    got = {r.k: r for r in mann_kendall(two, "x", "y", ["k"]).collect()}
    assert got["a"].s_stat == 15 and got["b"].s_stat == -6
    capped = {
        r.k: r
        for r in mann_kendall(
            two, "x", "y", ["k"], max_points_per_key=3
        ).collect()
    }
    assert capped["a"].n_points == 3 and capped["a"].s_stat == 3


def test_fs_linkage_weights_hand_checked(spark):
    """r14: Fellegi-Sunter weights against hand arithmetic — u from
    the exact value distribution, agreement/disagreement log2 terms,
    NULL fields contribute zero and n_known counts evidence; constant
    and all-NULL fields raise loudly."""
    import math

    import pytest as _pytest

    from pigout_spark.pipeline.dedup import fs_linkage_weights

    recs = spark.createDataFrame(
        [(1, "x", "p"), (2, "x", "q"), (3, "y", None), (4, "z", "q")],
        "id long, f1 string, f2 string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (3, 4)], "id_a long, id_b long"
    )
    out = {
        (r.id_a, r.id_b): r
        for r in fs_linkage_weights(
            recs, pairs, "id", ["f1", "f2"], default_m=0.9
        ).collect()
    }
    # f1 counts: x=2, y=1, z=1 over N=4 -> u1 = 6/16; f2: p=1, q=2
    # over N=3 -> u2 = 5/9
    u1, u2 = 6 / 16, 5 / 9
    wa1 = round(math.log2(0.9 / u1), 6)
    wd1 = round(math.log2(0.1 / (1 - u1)), 6)
    wa2 = round(math.log2(0.9 / u2), 6)
    wd2 = round(math.log2(0.1 / (1 - u2)), 6)
    # (1,2): f1 agree, f2 disagree
    r12 = out[(1, 2)]
    assert (r12.n_known, r12.n_agree) == (2, 1)
    assert r12.weight6 == round(wa1 + wd2, 6)
    # (1,3): f1 disagree, f2 unknown (NULL side) -> contributes 0
    r13 = out[(1, 3)]
    assert (r13.n_known, r13.n_agree) == (1, 0)
    assert r13.weight6 == round(wd1 + 0.0, 6)
    # (3,4): f1 disagree, f2 unknown
    assert out[(3, 4)].weight6 == round(wd1 + 0.0, 6)

    # loud contracts
    const = spark.createDataFrame(
        [(1, "same"), (2, "same")], "id long, f1 string"
    )
    with _pytest.raises(ValueError, match="constant"):
        fs_linkage_weights(const, pairs, "id", ["f1"])
    allnull = spark.createDataFrame(
        [(1, None), (2, None)], "id long, f1 string"
    )
    with _pytest.raises(ValueError, match="no observed"):
        fs_linkage_weights(allnull, pairs, "id", ["f1"])
    with _pytest.raises(ValueError, match="at least one field"):
        fs_linkage_weights(recs, pairs, "id", [])
    with _pytest.raises(ValueError, match="in \\(0, 1\\)"):
        fs_linkage_weights(recs, pairs, "id", ["f1"], default_m=1.0)


def test_cox_ph_binary_reference_and_guards(spark):
    """r14: the quantized 4-step Newton chain against a pure-Python
    replica; beta sign follows the orientation contract (group 1 =
    lexicographic min); loud two-group / integer-duration contracts;
    honest NULLs on separation and empty input."""
    import math
    import random
    from decimal import Decimal

    import pytest as _pytest

    from pigout_spark.pipeline.behavioral import cox_ph_binary

    def ref(rows, steps=4):
        g1 = min(g for _, _, g in rows)
        times = sorted({t for t, e, _ in rows if e})
        pts = []
        for t in times:
            d_all = sum(1 for tt, e, _ in rows if tt == t and e)
            d1 = sum(1 for tt, e, g in rows if tt == t and e and g == g1)
            n1 = sum(1 for tt, _, g in rows if tt >= t and g == g1)
            n0 = sum(1 for tt, _, g in rows if tt >= t and g != g1)
            pts.append((d_all, d1, n1, n0))
        b = 0.0
        for _ in range(steps):
            if b is None:
                break
            U = Decimal(0)
            I = Decimal(0)
            r = math.exp(b)
            for d_all, d1, n1, n0 in pts:
                p = (n1 * r) / (n1 * r + n0)
                U += Decimal(str(round(d1 - d_all * p, 6) + 0.0)
                             ).quantize(Decimal("0.000001"))
                I += Decimal(str(round(d_all * p * (1 - p), 6) + 0.0)
                             ).quantize(Decimal("0.000001"))
            U, I = float(U), float(I)
            nxt = b + U / I if I > 0 else None
            b = (round(nxt, 6) + 0.0
                 if nxt is not None and abs(nxt) <= 30 else None)
        if b is None:
            return None
        r = math.exp(b)
        I = float(sum(
            Decimal(str(round(d_all * ((n1 * r) / (n1 * r + n0))
                              * (1 - (n1 * r) / (n1 * r + n0)), 6) + 0.0))
            for d_all, d1, n1, n0 in pts
        ))
        return (b, round(math.exp(b), 6) + 0.0,
                round(1 / math.sqrt(I), 6) + 0.0,
                round(b * math.sqrt(I), 6) + 0.0)

    rng = random.Random(13)
    rows = []
    for i in range(80):
        g = "a" if i % 2 == 0 else "b"
        lam = 2.0 if g == "a" else 1.0
        t = max(1, int(-math.log(rng.random()) / lam * 10))
        rows.append((t, rng.random() < 0.8, g))
    df = spark.createDataFrame(rows, "t int, e boolean, g string")
    got = cox_ph_binary(df, "t", "e", "g").first()
    want = ref(rows)
    assert (got.beta6, got.hr6, got.se6, got.z6) == want
    assert got.beta6 > 0  # 'a' (lexicographic min) has the 2x hazard
    assert got.n == 80

    # loud contracts
    three = spark.createDataFrame(
        [(1, True, "a"), (2, True, "b"), (3, True, "c")],
        "t int, e boolean, g string",
    )
    with _pytest.raises(Exception, match="exactly two groups"):
        cox_ph_binary(three, "t", "e", "g").collect()
    frac = spark.createDataFrame(
        [(1.5, True, "a"), (2.0, True, "b")],
        "t double, e boolean, g string",
    )
    with _pytest.raises(Exception, match="integer time unit"):
        cox_ph_binary(frac, "t", "e", "g").collect()

    # complete separation (all events in one group): the true MLE is
    # +inf; the FIXED schedule reports the large finite 4-step
    # iterate (documented contract) with a correspondingly huge SE
    sep = spark.createDataFrame(
        [(1, True, "a")] * 20 + [(100, False, "b")] * 20,
        "t int, e boolean, g string",
    )
    rs = cox_ph_binary(sep, "t", "e", "g").first()
    assert rs.beta6 is not None and rs.beta6 > 4.0
    assert rs.se6 > 1.0  # the separation signature downstream screens use

    # empty input: one row of honest NULLs, zero events
    empty = spark.createDataFrame([], "t int, e boolean, g string")
    re_ = cox_ph_binary(empty, "t", "e", "g").first()
    assert re_.n_events == 0 and re_.beta6 is None


def test_logrank_stratified_reference(spark):
    """r14: the stratified log-rank pools per-stratum O-E/variance —
    with ONE stratum it must equal plain logrank_test; with two
    strata it must equal the sum of the per-stratum statistics; loud
    two-group and integer-duration contracts; missing-group strata
    contribute zeros."""
    import pytest as _pytest

    from pigout_spark.pipeline.behavioral import (
        logrank_test,
        logrank_test_stratified,
    )

    rows = [
        (1, True, "a"), (2, True, "a"), (3, False, "a"), (5, True, "a"),
        (2, True, "b"), (4, False, "b"), (6, True, "b"), (7, True, "b"),
    ]
    one = spark.createDataFrame(
        [(t, e, g, "s0") for t, e, g in rows],
        "t int, e boolean, g string, s string",
    )
    plain = logrank_test(
        spark.createDataFrame(rows, "t int, e boolean, g string"),
        "t", "e", "g",
    ).first()
    strat = logrank_test_stratified(one, "t", "e", "g", "s").first()
    assert strat.n_strata == 1
    assert (strat.o_minus_e6, strat.var6, strat.z6) == (
        plain.o_minus_e6, plain.var6, plain.z6,
    )

    # two disjoint strata: pooled O-E/V = sums of the per-stratum runs
    rows2 = [(t + 1, not e, g) for t, e, g in rows]
    both = spark.createDataFrame(
        [(t, e, g, "s0") for t, e, g in rows]
        + [(t, e, g, "s1") for t, e, g in rows2],
        "t int, e boolean, g string, s string",
    )
    p1 = logrank_test(
        spark.createDataFrame(rows2, "t int, e boolean, g string"),
        "t", "e", "g",
    ).first()
    got = logrank_test_stratified(both, "t", "e", "g", "s").first()
    assert got.n_strata == 2 and got.n == 16
    assert got.o_minus_e6 == round(plain.o_minus_e6 + p1.o_minus_e6, 6)
    assert got.var6 == round(plain.var6 + p1.var6, 6)

    # a stratum missing one group contributes that side's zeros, not
    # an error (the two-group contract is GLOBAL)
    lop = spark.createDataFrame(
        [(t, e, g, "s0") for t, e, g in rows]
        + [(1, True, "a", "s9"), (2, True, "a", "s9")],
        "t int, e boolean, g string, s string",
    )
    gl = logrank_test_stratified(lop, "t", "e", "g", "s").first()
    assert gl.n_strata == 2  # s9 contributes O-E = 0 terms (all group a)

    three = spark.createDataFrame(
        [(1, True, "a", "x"), (2, True, "b", "x"), (3, True, "c", "x")],
        "t int, e boolean, g string, s string",
    )
    with _pytest.raises(Exception, match="exactly two groups"):
        logrank_test_stratified(three, "t", "e", "g", "s").collect()
