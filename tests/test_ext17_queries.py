"""Round-7 extension operators: mergeable moment sketches, Holt linear
forecast, reciprocal-NN canonicalization, difference-in-differences."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# --- x234 moment sketch -----------------------------------------------------
def test_moment_registers_merge_is_exact_addition(spark):
    """The sketch contract: per-group power sums merged by ADDITION are
    IDENTICAL to the directly-computed global sums (exact integers, so
    bit-equality, not tolerance)."""
    from flashml_spark.operators.sketches import moment_registers

    rows = [(f"g{i % 3}", (i * 37) % 101) for i in range(500)]
    df = spark.createDataFrame(rows, "g string, v long")
    per = moment_registers(df, ["g"], "v")
    merged = per.agg(
        *[F.sum(c).alias(c) for c in ("n", "s1", "s2", "s3", "s4")]
    ).first()
    direct = moment_registers(df, [], "v").first()
    for c in ("n", "s1", "s2", "s3", "s4"):
        assert merged[c] == direct[c], c
    # and the sums equal the python mirror exactly
    vals = [v for _, v in rows]
    assert int(merged["s1"]) == sum(vals)
    assert int(merged["s4"]) == sum(v**4 for v in vals)


def test_moment_quantile_audit_normal_data_is_accurate(spark):
    """On symmetric near-normal integer data the Cornish-Fisher estimate
    lands close to the exact quantile (within a few % of sd), and the
    exact column IS the lower quantile."""
    from flashml_spark.operators.sketches import moment_quantile_audit

    # binomial(60, 0.5) via deterministic bit-counts: mean 30, sd ~3.9
    rows = [
        ("s", bin((i * 2654435761) % (1 << 60)).count("1"))
        for i in range(4000)
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {r["q"]: r for r in moment_quantile_audit(df, "g", "v").collect()}
    vals = sorted(v for _, v in rows)
    n = len(vals)
    for q in (0.25, 0.5, 0.75):
        exact = vals[math.ceil(q * n) - 1]
        assert out[q]["exact"] == exact
        assert abs(out[q]["est"] - exact) < 2.0  # within half an sd
        assert out[q]["abs_err"] == pytest.approx(
            abs(out[q]["est"] - exact), abs=2e-6
        )


def test_moment_quantile_audit_skew_shifts_estimates(spark):
    """A right-skewed distribution must push the median estimate BELOW
    the mean (Cornish-Fisher's skew term working), and the exact median
    must sit below the mean too."""
    from flashml_spark.operators.sketches import moment_quantile_audit

    # geometric-ish right skew: many small, few huge
    rows = [("s", 1 + ((i * 7) % 97) ** 2 // 30) for i in range(3000)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {r["q"]: r for r in moment_quantile_audit(df, "g", "v").collect()}
    mean = sum(v for _, v in rows) / len(rows)
    assert out[0.5]["est"] < mean
    assert out[0.5]["exact"] < mean


# --- x235 Holt linear forecast ----------------------------------------------
def _holt_mirror(ys, a=0.3, b=0.1):
    l, t, errsum = ys[0], 0.0, 0.0
    for i, y in enumerate(ys):
        if i == 0:
            continue
        if i == 1:
            l, t = y, y - l
            continue
        errsum += abs(y - (l + t))
        lnew = a * y + (1 - a) * (l + t)
        t = b * (lnew - l) + (1 - b) * t
        l = lnew
    return l, t, errsum


def test_holt_recovers_exact_linear_trend(spark):
    """On a perfectly linear daily series the recursion keeps l_t = y_t
    and b_t = slope by induction, so every forecast continues the line
    EXACTLY and the backtest MAE is 0."""
    from datetime import datetime, timedelta

    from flashml_spark.operators.events import holt_linear_forecast

    rows = [
        (datetime(2024, 1, 1) + timedelta(days=i), 100.0 + 2.5 * i)
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = {r["h"]: r for r in holt_linear_forecast(df, "ts", "value").collect()}
    last = 100.0 + 2.5 * 19
    for h in range(1, 8):
        assert out[h]["forecast"] == pytest.approx(last + 2.5 * h, abs=1e-6)
        assert out[h]["backtest_mae"] == 0.0


def test_holt_matches_python_mirror(spark):
    """Arbitrary series: the fold == the textbook Python recursion, and
    multiple same-day events aggregate into the daily total first."""
    from datetime import datetime, timedelta

    from flashml_spark.operators.events import holt_linear_forecast

    vals = [5.0, 9.25, 3.5, 14.0, 11.75, 6.25, 19.5, 2.0, 8.125, 13.0]
    rows = []
    for i, v in enumerate(vals):
        rows.append((datetime(2024, 3, 1, 6) + timedelta(days=i), v / 2))
        rows.append((datetime(2024, 3, 1, 18) + timedelta(days=i), v / 2))
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = {r["h"]: r for r in holt_linear_forecast(df, "ts", "value").collect()}
    l, t, errsum = _holt_mirror(vals)
    for h in range(1, 8):
        assert out[h]["forecast"] == pytest.approx(l + h * t, abs=1e-6)
        assert out[h]["backtest_mae"] == pytest.approx(
            errsum / (len(vals) - 2), abs=1e-6
        )


# --- x236 reciprocal NN -----------------------------------------------------
def test_reciprocal_nn_finds_mutual_pairs_only(spark):
    """Two tight pairs are mutual; a hub-chaser whose favourite vector
    prefers its own twin must NOT pair (the mutuality criterion doing
    its job vs a plain threshold)."""
    from flashml_spark.operators.similarity import reciprocal_nn_pairs

    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.99, 0.14, 0.0]),     # 0 <-> 1 mutual
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.99, 0.14]),     # 2 <-> 3 mutual
        (4, [0.7, 0.1, 0.7]),       # closest to 0, but 0 prefers 1
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {(r["id_a"], r["id_b"]) for r in
           reciprocal_nn_pairs(df, "embedding", "vec_id").collect()}
    assert out == {(0, 1), (2, 3)}


def test_reciprocal_nn_matches_python_mirror(spark):
    """Deterministic pseudo-random vectors: the mutual set equals a
    brute-force python mirror applying the SAME round-then-rank rule."""
    import math

    from flashml_spark.operators.similarity import reciprocal_nn_pairs

    vecs = {
        i: [((i * 37 + j * 11) % 19) - 9.0 for j in range(8)]
        for i in range(30)
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id long, embedding array<double>",
    )
    got = {(r["id_a"], r["id_b"]) for r in
           reciprocal_nn_pairs(df, "embedding", "vec_id").collect()}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(d / (na * nb), 6)

    def nn(i):
        return min(
            ((-cos(vecs[i], vecs[j]), j) for j in vecs if j != i)
        )[1]

    want = {
        (i, nn(i)) for i in vecs if nn(nn(i)) == i and i < nn(i)
    }
    assert got == want and got  # non-trivial mutual set


# --- x237 difference-in-differences ------------------------------------------
def test_did_recovers_planted_effect(spark):
    """Control drifts +2 post; treated drifts +2 AND gets a +5 lift:
    DiD must isolate exactly the +5 (the parallel-trends subtraction),
    with a z far above significance."""
    from datetime import datetime, timedelta

    from flashml_spark.operators.events import diff_in_diff

    rows = []
    for u in range(200):
        treat = u % 2
        for d in range(10):
            post = d >= 5
            base = 10.0 + (u % 7) * 0.25       # unit heterogeneity
            y = base + (2.0 if post else 0.0) + (5.0 if treat and post else 0.0)
            rows.append((datetime(2024, 1, 1) + timedelta(days=d), u, y))
    df = spark.createDataFrame(rows, "ts timestamp, user_id long, value double")
    out = diff_in_diff(
        df, "ts", "user_id", "value",
        treat_col=(F.col("user_id") % 2 == 1).cast("int"),
        cutover=F.lit("2024-01-06").cast("date"),
    ).first()
    assert out["did"] == pytest.approx(5.0, abs=1e-6)
    assert out["mean_ctrl_post"] - out["mean_ctrl_pre"] == pytest.approx(
        2.0, abs=1e-6
    )
    assert out["z"] > 10


def test_did_matches_python_mirror(spark):
    """Arbitrary cell values: means, DiD, pooled SE and z all equal the
    textbook four-cell mirror."""
    import math
    from datetime import datetime, timedelta

    from flashml_spark.operators.events import diff_in_diff

    rows = []
    for u in range(40):
        for d in range(8):
            y = ((u * 13 + d * 7) % 23) / 3.0 + (u % 2) * ((d >= 4) * 1.5)
            rows.append((datetime(2024, 2, 1) + timedelta(days=d), u, y))
    df = spark.createDataFrame(rows, "ts timestamp, user_id long, value double")
    out = diff_in_diff(
        df, "ts", "user_id", "value",
        treat_col=(F.col("user_id") % 2 == 1).cast("int"),
        cutover=F.lit("2024-02-05").cast("date"),
    ).first()

    cells = {}
    for (ts, u, y) in rows:
        key = (u % 2, int(ts >= datetime(2024, 2, 5)))
        cells.setdefault(key, []).append(y)

    def mv(k):
        xs = cells[k]
        m = sum(xs) / len(xs)
        v = sum((x - m) ** 2 for x in xs) / (len(xs) - 1)
        return m, v, len(xs)

    (mt1, vt1, nt1), (mt0, vt0, nt0) = mv((1, 1)), mv((1, 0))
    (mc1, vc1, nc1), (mc0, vc0, nc0) = mv((0, 1)), mv((0, 0))
    did = (mt1 - mt0) - (mc1 - mc0)
    se = math.sqrt(vt1 / nt1 + vt0 / nt0 + vc1 / nc1 + vc0 / nc0)
    assert out["mean_treat_post"] == pytest.approx(mt1, abs=1e-6)
    assert out["mean_ctrl_pre"] == pytest.approx(mc0, abs=1e-6)
    assert out["did"] == pytest.approx(did, abs=1e-6)
    assert out["se"] == pytest.approx(se, abs=1e-5)
    assert out["z"] == pytest.approx(did / se, abs=1e-4)


# --- x238 CMS join-size estimation -------------------------------------------
def test_cms_join_size_never_underestimates_and_is_tight(spark):
    """CMS inner product >= exact join size always; with |keys| << w the
    collision mass is tiny so the estimate is exact or near-exact, and
    the exact column equals the true join row count."""
    from flashml_spark.operators.sketches import cms_join_size

    a = spark.createDataFrame(
        [(i % 50,) for i in range(1000)], "k long"
    )
    b = spark.createDataFrame(
        [(i % 80,) for i in range(1600)], "k long"
    )
    out = cms_join_size(a, "k", b, "k").first()
    true_size = a.join(b, "k").count()
    assert out["exact"] == true_size
    assert out["cms_estimate"] >= out["exact"]
    assert out["overestimate"] == out["cms_estimate"] - out["exact"]
    # 50+80 distinct keys in 1024 buckets: collisions contribute < 5%
    assert out["rel_error"] < 0.05


def test_cms_join_size_disjoint_keys_stay_near_zero(spark):
    """Disjoint key ranges: exact is 0; the estimate is pure collision
    mass, bounded well below N_a*N_b/w * d safety margin."""
    from flashml_spark.operators.sketches import cms_join_size

    a = spark.createDataFrame([(i,) for i in range(200)], "k long")
    b = spark.createDataFrame([(i + 10_000,) for i in range(300)], "k long")
    out = cms_join_size(a, "k", b, "k").first()
    assert out["exact"] == 0
    assert 0 <= out["cms_estimate"] <= 200 * 300 // 256  # << naive product


# --- x239 PSI drift timeline --------------------------------------------------
def test_psi_timeline_flags_the_drifted_day(spark):
    """Stationary days read near-zero PSI; a day whose distribution
    shifts up by half the range must spike far above them."""
    from datetime import datetime, timedelta

    from flashml_spark.metrics.stability import psi_timeline

    rows = []
    for d in range(12):
        for i in range(400):
            v = (i % 100) / 100.0          # uniform [0, 1)
            if d == 10:
                v = 0.5 + (i % 100) / 200.0  # drifted: uniform [0.5, 1)
            rows.append((datetime(2024, 5, 1) + timedelta(days=d), v))
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = {r["d"].day: r["psi"] for r in
           psi_timeline(df, "ts", "value", base_days=7, bins=10).collect()}
    stationary = [out[d] for d in range(1, 11)]   # May 1-10 (day 11 = drift)
    assert all(abs(p) < 1e-6 for p in stationary)
    assert out[11] > 20            # the drifted day (inner-join convention
    # drops the day-empty low bins, damping but not hiding the spike)
    assert abs(out[12]) < 1e-6     # back to normal
    # every day present, n column carried
    assert len(out) == 12


def test_reciprocal_nn_lsh_recall_gate(spark):
    """The banded-LSH scale path recovers nearly all exact mutual pairs
    on the real embeddings table (measured 0.97 at the 3-plane/12-band
    default; a SINGLE-table variant measured 0.08 at 6 planes — the
    banding is load-bearing, not a tuning nicety)."""
    from flashml_spark.operators.similarity import (
        reciprocal_nn_pairs,
        reciprocal_nn_pairs_lsh,
    )
    from flashml_spark.sources.readers import load_table
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    exact = {(r["id_a"], r["id_b"]) for r in
             reciprocal_nn_pairs(emb, "embedding", "vec_id").collect()}
    approx = {(r["id_a"], r["id_b"]) for r in
              reciprocal_nn_pairs_lsh(emb, "embedding", "vec_id").collect()}
    assert exact, "exact mutual set must be non-trivial on testdata"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"recall {recall:.2f} below the gate"


# --- x241 contrastive triplets -----------------------------------------------
def test_contrastive_triplets_structure(spark):
    """Every mutual pair yields exactly two triplets (both anchor
    orientations); negatives never equal the anchor or positive; the
    negative pick is deterministic across runs."""
    from flashml_spark.operators.similarity import (
        contrastive_triplets,
        reciprocal_nn_pairs,
    )

    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.99, 0.14, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.99, 0.14]),
        (4, [0.7, 0.1, 0.7]),
        (5, [-1.0, 0.2, 0.1]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    trips = contrastive_triplets(df, "embedding", "vec_id").collect()
    pairs = reciprocal_nn_pairs(df, "embedding", "vec_id").collect()
    assert len(trips) == 2 * len(pairs) > 0
    anchors = {(t["anchor"], t["positive"]) for t in trips}
    for p in pairs:
        assert (p["id_a"], p["id_b"]) in anchors
        assert (p["id_b"], p["id_a"]) in anchors
    for t in trips:
        assert t["negative"] not in (t["anchor"], t["positive"])
    again = contrastive_triplets(df, "embedding", "vec_id").collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, trips))


# --- x242 CUSUM drift ---------------------------------------------------------
def test_cusum_accumulates_small_persistent_shift(spark):
    """A +1σ persistent shift from day 11 never crosses a 3σ per-day
    outlier bar, but the CUSUM statistic accumulates ~0.5σ/day and
    alarms within a few days; the pre-shift days stay quiet."""
    from datetime import datetime, timedelta

    from flashml_spark.operators.events import cusum_drift

    # base: deterministic noise around 100 (sd ~2.9); shift: +3 from day 11
    vals = [100.0 + ((i * 7) % 11) - 5 for i in range(25)]
    for i in range(10, 25):
        vals[i] += 3.0
    rows = [
        (datetime(2024, 6, 1) + timedelta(days=i), v)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = {r["d"].day: r for r in
           cusum_drift(df, "ts", "value", base_days=10).collect()}
    assert all(out[d]["alarm"] == 0 for d in range(1, 11))
    assert all(abs(out[d]["z"]) < 3.0 for d in range(1, 26))  # no 3σ day
    assert any(out[d]["alarm"] == 1 for d in range(12, 26))
    # one-sided: the positive statistic fires, the negative stays low
    assert max(out[d]["cusum_neg"] for d in range(1, 26)) < 5.0


def test_cusum_matches_python_mirror(spark):
    """Arbitrary series: z, both statistics and alarms equal the
    textbook recursion."""
    from datetime import datetime, timedelta

    from flashml_spark.operators.events import cusum_drift

    vals = [10.0, 12.5, 9.0, 11.0, 8.5, 14.0, 10.5, 3.0, 2.5, 18.0, 17.5]
    rows = [
        (datetime(2024, 7, 1) + timedelta(days=i), v)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = cusum_drift(df, "ts", "value", k=0.5, h=2.0, base_days=7).collect()

    base = vals[:7]
    mu = sum(base) / len(base)
    sd = (sum(v * v for v in base) / len(base) - mu * mu) ** 0.5
    sp = sn = 0.0
    for r, v in zip(out, vals):
        z = (v - mu) / sd
        sp = max(0.0, sp + z - 0.5)
        sn = max(0.0, sn - z - 0.5)
        assert r["z"] == pytest.approx(z, abs=1e-6)
        assert r["cusum_pos"] == pytest.approx(sp, abs=1e-6)
        assert r["cusum_neg"] == pytest.approx(sn, abs=1e-6)
        assert r["alarm"] == int(sp > 2.0 or sn > 2.0)


# --- x243 O'Brien-Fleming boundary --------------------------------------------
def test_obf_boundary_shrinks_to_fixed_horizon_z(spark):
    """Boundary = z_.975/sqrt(t): huge at early looks, exactly z_.975 at
    the final look; crossed only when |z| beats the boundary, so an
    early wander that would 'win' under naive peeking stays uncrossed."""
    from datetime import datetime, timedelta

    from flashml_spark.operators.events import OBF_Z975, obf_boundary_curve

    rows = []
    # 10 users/day for 10 days; variant by parity; early conversions
    # lopsided (day-1 users: all variant-0 convert), later balanced
    for d in range(10):
        for u in range(10):
            uid = d * 10 + u
            rows.append((datetime(2024, 8, 1) + timedelta(days=d), uid, "view"))
            converts = (uid % 2 == 0 and d == 0) or (d > 0 and uid % 4 == 1)
            if converts:
                rows.append(
                    (datetime(2024, 8, 1) + timedelta(days=d), uid, "purchase")
                )
    df = spark.createDataFrame(rows, "ts timestamp, user_id long, event_type string")
    out = obf_boundary_curve(
        df, "user_id", "ts",
        (F.col("user_id") % 2).cast("int"),
        F.col("event_type") == "purchase",
    ).collect()
    assert out[-1]["info_frac"] == 1.0
    assert out[-1]["boundary"] == pytest.approx(OBF_Z975, abs=1e-6)
    # monotone: boundary never increases as information accrues
    bounds = [r["boundary"] for r in out]
    assert bounds == sorted(bounds, reverse=True)
    # day 1: z is extreme (5/5 vs 0/5) but the boundary is sqrt(10)x
    # the fixed-horizon bar — naive peeking would declare, OBF does not
    assert abs(out[0]["z"]) > OBF_Z975
    assert out[0]["crossed"] == 0
    for r in out:
        assert r["crossed"] == int(abs(r["z"]) > r["boundary"])


# --- x244 Neyman allocation ---------------------------------------------------
def test_neyman_shifts_budget_to_varied_strata(spark):
    """Equal-size strata with very different spreads: Neyman gives the
    high-variance stratum most of the budget while proportional splits
    evenly; allocations sum to the budget; var_ratio <= 1 (Neyman never
    loses) and is substantially below 1 here."""
    from flashml_spark.operators.sketches import neyman_allocation

    rows = (
        [("flat", 100)] * 500                                   # sd = 0
        + [("mild", 100 + (i % 11) - 5) for i in range(500)]    # small sd
        + [("wild", 100 + ((i * 7) % 101) * 10) for i in range(500)]
    )
    df = spark.createDataFrame(rows, "source string, n_chars long")
    out = {r["source"]: r for r in
           neyman_allocation(df, "source", "n_chars", budget=900).collect()}
    assert out["flat"]["n_neyman"] == 0.0            # zero variance -> zero
    assert out["wild"]["n_neyman"] > 800
    assert all(r["n_proportional"] == 300.0 for r in out.values())
    total = sum(r["n_neyman"] for r in out.values())
    assert total == pytest.approx(900.0, abs=1e-3)
    vr = out["wild"]["var_ratio"]
    assert all(r["var_ratio"] == vr for r in out.values())
    assert 0 < vr < 0.8  # strong design effect on this mix


def test_neyman_equal_spreads_match_proportional(spark):
    """When every stratum has the SAME sd, Neyman == proportional and
    the variance ratio is exactly 1 (no design effect to harvest)."""
    from flashml_spark.operators.sketches import neyman_allocation

    # sizes are multiples of 7 so every stratum sees the identical
    # residue mix (hence identical sd)
    rows = [
        (g, 50 + (i % 7)) for g in ("a", "b") for i in range(196)
    ] + [("c", 50 + (i % 7)) for i in range(392)]
    df = spark.createDataFrame(rows, "source string, n_chars long")
    out = {r["source"]: r for r in
           neyman_allocation(df, "source", "n_chars", budget=100).collect()}
    for r in out.values():
        assert r["n_neyman"] == pytest.approx(r["n_proportional"], abs=1e-5)
        assert r["var_ratio"] == pytest.approx(1.0, abs=1e-9)
    assert out["c"]["n_neyman"] == pytest.approx(50.0, abs=1e-3)


# --- x245 semantic decontamination --------------------------------------------
def test_semantic_decontamination_flags_planted_paraphrase(spark):
    """A corpus vector planted as a tiny rotation of a benchmark vector
    is flagged with its true nearest benchmark id; orthogonal corpus
    vectors stay clean; benchmark members aren't in the corpus side."""
    from flashml_spark.operators.similarity import semantic_decontamination

    bench = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0]), (200, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    corpus = spark.createDataFrame(
        [
            (1, [0.99, 0.12, 0.0]),   # near benchmark 100
            (2, [0.0, 0.05, 1.0]),    # clean
            (3, [0.1, 0.98, 0.05]),   # near benchmark 200
        ],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r for r in semantic_decontamination(
        corpus, bench, "embedding", "vec_id", threshold=0.9
    ).collect()}
    assert set(out) == {1, 3}
    assert out[1]["nearest_benchmark_id"] == 100
    assert out[3]["nearest_benchmark_id"] == 200
    assert out[1]["max_sim"] > 0.99 and out[3]["max_sim"] > 0.97


def test_lit_doubles_matches_per_element_literals(spark):
    # r12: lit_doubles builds the array literal through ONE parsed SQL
    # expression; it must round-trip binary64 EXACTLY (repr shortest
    # form -> Java parseDouble -> same bits) and fall back safely.
    import math
    import random

    from pyspark.sql import functions as F

    from flashml_spark.functions import vector as V

    rng = random.Random(7)
    vals = (
        [rng.gauss(0.0, 1.0) for _ in range(64)]
        + [0.0, -0.0, 1e-308, -1e300, 12345.6789, 3.0000000000000004]
    )
    row = spark.range(1).select(
        V.lit_doubles(vals).alias("a"),
        F.array(*[F.lit(float(x)) for x in vals]).alias("b"),
    ).first()
    assert len(row["a"]) == len(vals)
    for got, want in zip(row["a"], row["b"]):
        assert got == want and math.copysign(1, got) == math.copysign(1, want)
    # empty + non-finite fall back without error
    assert spark.range(1).select(V.lit_doubles([]).alias("e")).first()["e"] == []
    nf = spark.range(1).select(
        V.lit_doubles([1.0, float("nan"), float("inf")]).alias("n")
    ).first()["n"]
    assert nf[0] == 1.0 and math.isnan(nf[1]) and math.isinf(nf[2])
