"""Unit tests for the round-5 third-wave curation operators:
eval-set decontamination (n-gram overlap) and the corpus-unigram
log-probability quality score.  Oracle parity runs via
test_oracle_queries.py's registry sweep; these pin hand-checkable
semantics on tiny frames.
"""

from __future__ import annotations

import math

from flashml_spark.operators import textops

# --- decontamination_audit --------------------------------------------------


def _rows(df):
    return {r["doc_id"]: r for r in df.collect()}


def test_decontamination_flags_shared_grams(spark):
    # train doc 1 repeats the eval doc's opening 5-gram verbatim; doc 2
    # shares nothing.  n=3 keeps the hand arithmetic small.
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over"),  # grams: 4, 1 shared
            (2, "completely different text entirely here now"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "the quick brown cat")], "doc_id long, text string"
    )
    out = _rows(
        textops.decontamination_audit(train, ev, "text", "doc_id", n=3)
    )
    assert out[1]["n_grams"] == 4
    assert out[1]["n_hit"] == 1  # "the quick brown"
    assert out[1]["contamination"] == 0.25
    assert out[2]["n_hit"] == 0
    assert out[2]["contamination"] == 0.0


def test_decontamination_distinct_grams_count_once(spark):
    # a train doc repeating the contaminated gram twice still reports it
    # as ONE distinct gram hit, and a fully-contained doc scores 1.0
    train = spark.createDataFrame(
        [(1, "a b c x a b c"), (2, "a b c")], "doc_id long, text string"
    )
    ev = spark.createDataFrame([(9, "a b c")], "doc_id long, text string")
    out = _rows(textops.decontamination_audit(train, ev, "text", "doc_id", n=3))
    # doc 1 distinct 3-grams: "a b c","b c x","c x a","x a b" -> 4, hit 1
    assert out[1]["n_grams"] == 4 and out[1]["n_hit"] == 1
    assert out[2]["contamination"] == 1.0


def test_decontamination_short_docs_drop_out(spark):
    train = spark.createDataFrame(
        [(1, "too short"), (2, None)], "doc_id long, text string"
    )
    ev = spark.createDataFrame([(9, "a b c d e")], "doc_id long, text string")
    assert (
        textops.decontamination_audit(train, ev, "text", "doc_id", n=5).count()
        == 0
    )


# --- unigram_logprob_score --------------------------------------------------


def test_unigram_logprob_hand_values(spark):
    # corpus: "a a b" + "b c" -> counts a=2 b=2 c=1, N=5
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    out = _rows(textops.unigram_logprob_score(df, "text", "doc_id"))
    n = {"a": 2.0, "b": 2.0, "c": 1.0}
    exp1 = (math.log(n["a"]) + math.log(n["a"]) + math.log(n["b"])) / 3 - math.log(5)
    exp2 = (math.log(n["b"]) + math.log(n["c"])) / 2 - math.log(5)
    assert out[1]["n_tokens"] == 3
    assert abs(out[1]["avg_logp"] - exp1) < 1e-6
    assert out[2]["n_tokens"] == 2
    assert abs(out[2]["avg_logp"] - exp2) < 1e-6


def test_unigram_logprob_rare_tokens_score_lower(spark):
    df = spark.createDataFrame(
        [
            (1, "common common common common"),
            (2, "rare1 rare2 rare3 rare4"),
        ],
        "doc_id long, text string",
    )
    out = _rows(textops.unigram_logprob_score(df, "text", "doc_id"))
    assert out[1]["avg_logp"] > out[2]["avg_logp"]


# --- correlation_matrix -----------------------------------------------------


def test_correlation_matrix_hand_values(spark):
    from flashml_spark.operators import relational

    # y = 2x exactly (r=1); z anti-correlated with x (r=-1); w constant
    # (corr undefined -> NULL)
    df = spark.createDataFrame(
        [(1.0, 2.0, 3.0, 5.0), (2.0, 4.0, 2.0, 5.0), (3.0, 6.0, 1.0, 5.0)],
        "x double, y double, z double, w double",
    )
    out = {
        (r["col_a"], r["col_b"]): r["pearson_r"]
        for r in relational.correlation_matrix(df, ["x", "y", "z", "w"]).collect()
    }
    assert len(out) == 6  # C(4,2) ordered pairs
    assert out[("x", "y")] == 1.0
    assert out[("x", "z")] == -1.0
    assert out[("x", "w")] is None  # zero variance


def test_correlation_matrix_is_single_pass(spark):
    from flashml_spark.operators import relational

    df = spark.range(100).selectExpr("id * 1.0 AS a", "id * 2.0 AS b", "id % 7 * 1.0 AS c")
    plan = relational.correlation_matrix(df, ["a", "b", "c"])._jdf.queryExecution().executedPlan().toString()
    # all pairs ride ONE aggregate over one scan: exactly one exchange
    assert plan.count("Exchange") <= 1


# --- markov_transitions -----------------------------------------------------


def test_markov_transitions_hand_matrix(spark):
    from flashml_spark.operators import events as ev

    rows = [
        # user 1: a -> b -> a -> c   (a->b, b->a, a->c)
        (1, 1, 1, "a"), (2, 1, 2, "b"), (3, 1, 3, "a"), (4, 1, 4, "c"),
        # user 2: a -> b            (a->b)
        (5, 2, 1, "a"), (6, 2, 2, "b"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, event_type string"
    )
    out = {
        (r["state"], r["next_state"]): (r["n"], r["p"])
        for r in ev.markov_transitions(
            df, "user_id", "ts", "event_id", "event_type"
        ).collect()
    }
    assert out[("a", "b")] == (2, round(2 / 3, 6))
    assert out[("a", "c")] == (1, round(1 / 3, 6))
    assert out[("b", "a")] == (1, 1.0)
    # final events per user have no successor: no ("c", *) and no ("b", None)
    assert all(k[0] != "c" for k in out)


def test_markov_transitions_no_cross_user_leak(spark):
    from flashml_spark.operators import events as ev

    # user 1 ends with "x", user 2 starts with "y" — must NOT produce x->y
    df = spark.createDataFrame(
        [(1, 1, 1, "x"), (2, 2, 2, "y"), (3, 2, 3, "z")],
        "event_id long, user_id long, ts long, event_type string",
    )
    out = ev.markov_transitions(df, "user_id", "ts", "event_id", "event_type")
    assert {(r["state"], r["next_state"]) for r in out.collect()} == {("y", "z")}


# --- rfm_segments -----------------------------------------------------------


def test_rfm_ntile_matches_sql_semantics(spark):
    from flashml_spark.operators import events as ev

    # 7 users, buckets=5: NTILE gives the first 2 tiles 2 rows, rest 1.
    # user u gets one event at ts=u hours, value=u*10 -> all three
    # metrics order users identically (recency DESCENDS with u, so
    # r_tile reverses).
    rows = [
        (u, f"2024-01-01 0{u}:00:00", float(u * 10)) for u in range(1, 8)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, value double"
    ).selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "value")
    out = {r["user_id"]: r for r in ev.rfm_segments(df, "user_id", "ts", "value").collect()}
    # frequency all 1 -> ties broken by user_id: tiles 1,1,2,2,3,4,5
    assert [out[u]["f_tile"] for u in range(1, 8)] == [1, 1, 2, 2, 3, 4, 5]
    # monetary ascends with user_id: same tiling
    assert [out[u]["m_tile"] for u in range(1, 8)] == [1, 1, 2, 2, 3, 4, 5]
    # recency: user 7 is most recent (0 us) -> r_tile 1; user 1 oldest -> 5
    assert [out[u]["r_tile"] for u in (7, 6, 5, 4, 3, 2, 1)] == [1, 1, 2, 2, 3, 4, 5]
    assert out[7]["recency_us"] == 0
    assert out[7]["rfm"] == "1-5-5"


def test_rfm_monetary_null_values_fold_to_zero(spark):
    from flashml_spark.operators import events as ev

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", None), (2, "2024-01-01 01:00:00", 5.0)],
        "user_id long, ts string, value double",
    ).selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "value")
    out = {r["user_id"]: r for r in ev.rfm_segments(df, "user_id", "ts", "value").collect()}
    assert out[1]["monetary"] == 0.0
    assert out[2]["monetary"] == 5.0


# --- tfidf_keywords ---------------------------------------------------------


def test_tfidf_keywords_hand_ranking(spark):
    import math

    from flashml_spark.operators import textops as t

    # "rare" appears only in doc 1 (idf=ln(3)); "common" in all (idf=0)
    df = spark.createDataFrame(
        [
            (1, "rare rare common alpha"),
            (2, "common beta beta"),
            (3, "common gamma"),
        ],
        "doc_id long, text string",
    )
    out = [
        (r["token"], r["tf"], r["score"], r["rk"])
        for r in t.tfidf_keywords(df, "text", "doc_id", k=2)
        .where("doc_id = 1")
        .orderBy("rk")
        .collect()
    ]
    assert out[0][0] == "rare" and out[0][1] == 2
    assert abs(out[0][2] - round(2 * math.log(3), 6)) < 1e-9
    assert out[1][0] == "alpha"  # ln(3) beats common's 0
    assert len(out) == 2


def test_tfidf_keywords_tie_breaks_token_asc(spark):
    from flashml_spark.operators import textops as t

    # all tokens unique to the doc and tf=1 -> identical scores; order
    # must be token-ascending
    df = spark.createDataFrame([(1, "zeta alpha mid")], "doc_id long, text string")
    toks = [
        r["token"]
        for r in t.tfidf_keywords(df, "text", "doc_id", k=3).orderBy("rk").collect()
    ]
    assert toks == ["alpha", "mid", "zeta"]


# --- kaplan_meier_survival --------------------------------------------------


def test_km_survival_textbook_example(spark):
    from flashml_spark.operators import events as ev

    # lifetimes: deaths at t=1 (u1), t=2 (u2); u3 censored at t=2 (active
    # on the max day); u4 death at t=0.
    # max day = 2024-01-03.  Timeline: t=0: 4 at risk, 1 death -> S=0.75
    # t=1: 3 at risk, 1 death -> S=0.5; t=2: 2 at risk, 1 death+1 cens
    # -> S=0.25
    rows = [
        (1, "2024-01-01"), (1, "2024-01-02"),                 # t=1 death
        (2, "2024-01-01"), (2, "2024-01-03"),                 # t=2 death? last==max -> censored!
        (3, "2024-01-01"), (3, "2024-01-03"),                 # t=2 censored
        (4, "2024-01-02"),                                    # t=0 death
    ]
    df = spark.createDataFrame(rows, "user_id long, d string").selectExpr(
        "user_id", "CAST(d AS TIMESTAMP) AS ts"
    )
    out = {r["t"]: r for r in ev.kaplan_meier_survival(df, "user_id", "ts").collect()}
    # t=0: ending u4 (death), at_risk 4 -> S = 0.75
    assert out[0]["at_risk"] == 4 and out[0]["deaths"] == 1
    assert out[0]["survival"] == 0.75
    # t=1: u1 death, at_risk 3 -> S = 0.75 * 2/3 = 0.5
    assert out[1]["at_risk"] == 3 and out[1]["survival"] == 0.5
    # t=2: u2 and u3 BOTH end on the max day -> both censored, S stays 0.5
    assert out[2]["censored_n"] == 2 and out[2]["deaths"] == 0
    assert out[2]["survival"] == 0.5


def test_km_survival_hits_zero_when_all_die(spark):
    from flashml_spark.operators import events as ev

    # both users' last activity precedes the max day user 3 sets
    rows = [
        (1, "2024-01-01"), (1, "2024-01-02"),
        (2, "2024-01-01"), (2, "2024-01-02"),
        (3, "2024-01-05"),
    ]
    df = spark.createDataFrame(rows, "user_id long, d string").selectExpr(
        "user_id", "CAST(d AS TIMESTAMP) AS ts"
    )
    out = {r["t"]: r for r in ev.kaplan_meier_survival(df, "user_id", "ts").collect()}
    # t=0: u3 censored (its last IS the max day), 3 at risk, 0 deaths
    assert out[0]["survival"] == 1.0
    # t=1: u1, u2 die; at_risk 2, deaths 2 -> survival 0 (no ln(0) NULL)
    assert out[1]["deaths"] == 2 and out[1]["survival"] == 0.0


# --- position_attribution ---------------------------------------------------


def test_position_attribution_u_shape(spark):
    from flashml_spark.operators import events as ev

    # one user, journey: view, click, error, view -> purchase
    rows = [
        (1, 1, 1, "view"), (2, 1, 2, "click"), (3, 1, 3, "error"),
        (4, 1, 4, "view"), (5, 1, 5, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, event_type string"
    )
    out = {
        r["channel"]: r["credit"]
        for r in ev.position_attribution(
            df, "user_id", "ts", "event_id", "event_type", "purchase"
        ).collect()
    }
    # first view 0.4 + last view 0.4 = 0.8; click/error middles 0.1 each
    assert out["view"] == 0.8
    assert out["click"] == 0.1 and out["error"] == 0.1


def test_position_attribution_edge_journeys(spark):
    from flashml_spark.operators import events as ev

    rows = [
        # user 1: single-touch journey -> 1.0 to click
        (1, 1, 1, "click"), (2, 1, 2, "purchase"),
        # user 2: two-touch journey -> 0.5 / 0.5
        (3, 2, 1, "view"), (4, 2, 2, "error"), (5, 2, 3, "purchase"),
        # user 3: trailing touches with NO closing purchase -> no credit
        (6, 3, 1, "view"), (7, 3, 2, "click"),
        # user 4: purchase with no prior touch -> unattributed
        (8, 4, 1, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, event_type string"
    )
    out = {
        r["channel"]: (r["credit"], r["n_touches"])
        for r in ev.position_attribution(
            df, "user_id", "ts", "event_id", "event_type", "purchase"
        ).collect()
    }
    assert out["click"] == (1.0, 1)
    assert out["view"] == (0.5, 1)
    assert out["error"] == (0.5, 1)
    assert sum(c for c, _ in out.values()) == 2.0  # user 3/4 journeys excluded
