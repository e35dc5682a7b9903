"""Similarity search over embedding columns (``array<float>``).

Two paths:
  * brute-force cosine top-k — the exact baseline; per-row JVM-side vector
    math (``F.aggregate``/``F.zip_with``), TakeOrderedAndProject for the
    top-k (per-partition heaps, k-row driver merge — no global sort).
  * random-hyperplane LSH ANN — the 100 TB path: bucket vectors by the sign
    pattern of projections onto R fixed hyperplanes (deterministic seeded
    planes broadcast as literals), search only the query's bucket (and
    optionally Hamming-adjacent probes).

Embedding near-dup dedup reuses the same LSH buckets with a cosine
threshold inside each bucket.
"""

from __future__ import annotations

import heapq
import random

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flashml_spark.functions import hashing as H
from flashml_spark.functions import vector as V


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def cosine_to_query(df: DataFrame, vec_col: str, query_vec: list[float],
                    out_col: str = "sim") -> DataFrame:
    """Append cosine similarity to a fixed query vector.

    The query vector ships as a literal array (broadcast in the plan); the
    scan stays a pure map stage.
    """
    q = V.lit_doubles(query_vec)
    return df.withColumn(out_col, V.cosine(_as_double(F.col(vec_col)), q))


def knn_brute_force(
    df: DataFrame, vec_col: str, id_col: str, query_vec: list[float], k: int = 10,
    round_to: int | None = 6,
) -> DataFrame:
    """Exact top-k by cosine: ``id, sim`` ordered desc, ties by id.

    ``orderBy().limit(k)`` compiles to TakeOrderedAndProject — each
    partition keeps a k-heap, driver merges k rows per partition.
    """
    sim = cosine_to_query(df, vec_col, query_vec)
    out = sim.select(F.col(id_col), F.col("sim"))
    if round_to is not None:
        out = out.select(id_col, F.round("sim", round_to).alias("sim"))
    return out.orderBy(F.desc("sim"), id_col).limit(k)


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic unit-free hyperplanes (seeded PRNG on the driver —
    tiny, shipped as literals)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id: bit b set iff dot(vec, plane_b) > 0.

    Each plane ships as ONE array literal (``F.lit(list)``), not a
    per-row ``CreateArray`` of dim literals — the unrolled form
    re-evaluated dim boxed literals per plane per ROW (2304 evals/row
    at dim=64, n_planes=3, 12 bands), a measured 1.6x drag on the
    bucket-assignment stage (r11; bit-identical output, diff 0)."""
    out = F.lit(0).cast("bigint")
    vd = _as_double(vec)  # bind the cast once, not once per plane (r12)
    for b, plane in enumerate(planes):
        p = V.lit_doubles(plane)
        out = out + F.when(V.dot(vd, p) > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return out


def with_lsh_bucket(df: DataFrame, vec_col: str, planes: list[list[float]],
                    out_col: str = "bucket") -> DataFrame:
    return df.withColumn(out_col, lsh_bucket(F.col(vec_col), planes))


def probe_sequence(
    query_vec: list[float], planes: list[list[float]], n_probes: int
) -> list[int]:
    """Multi-probe bucket sequence (Lv et al., VLDB 2007): the query's own
    bucket first, then buckets reached by flipping the sign bits with the
    smallest projection margins ``|dot(q, plane_b)|`` — the bits a true
    near-neighbor is most likely to disagree on.

    Perturbation sets are enumerated best-first with a heap over subsets of
    the margin-sorted bit indices (successor rule: extend-with-next /
    shift-last), so cost is O(n_probes log n_probes) regardless of
    ``2**n_planes``.  Pure driver-side arithmetic — planes and query are
    both known on the driver; the result ships into the plan as an
    ``isin`` literal list.
    """
    dots = [sum(q * p for q, p in zip(query_vec, plane)) for plane in planes]
    base = 0
    for b, d in enumerate(dots):
        if d > 0:
            base |= 1 << b
    probes = [base]
    if n_probes <= 1 or not planes:
        return probes[:n_probes] if n_probes > 0 else probes[:1]
    margins = sorted((abs(d), b) for b, d in enumerate(dots))
    heap: list[tuple[float, tuple[int, ...]]] = [(margins[0][0], (0,))]
    seen: set[tuple[int, ...]] = set()
    while heap and len(probes) < n_probes:
        cost, subset = heapq.heappop(heap)
        if subset in seen:
            continue
        seen.add(subset)
        mask = 0
        for i in subset:
            mask |= 1 << margins[i][1]
        probes.append(base ^ mask)
        last = subset[-1]
        if last + 1 < len(margins):
            heapq.heappush(heap, (cost + margins[last + 1][0], subset + (last + 1,)))
            heapq.heappush(
                heap,
                (cost - margins[last][0] + margins[last + 1][0], subset[:-1] + (last + 1,)),
            )
    return probes


def knn_lsh(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    n_probes: int = 1,
) -> DataFrame:
    """ANN top-k: restrict the scan to the query's LSH bucket (plus the
    ``n_probes - 1`` nearest Hamming-adjacent buckets by projection margin
    — see :func:`probe_sequence`), then exact cosine within the probed set.

    Recall/cost dial: scanning ``n_probes / 2**n_planes`` of the buckets
    recovers the recall a single probe loses when a near-neighbor lands on
    the far side of a low-margin hyperplane.  At 100 TB, write the table
    bucketed/partitioned by ``bucket`` so the probe ``isin`` filter becomes
    partition pruning instead of a full scan.
    """
    dim = len(query_vec)
    planes = random_hyperplanes(dim, n_planes, seed)
    probes = probe_sequence(query_vec, planes, n_probes)
    bucketed = with_lsh_bucket(df, vec_col, planes).filter(F.col("bucket").isin(*probes))
    return knn_brute_force(bucketed, vec_col, id_col, query_vec, k)


# Element budget (rows x dim) for solving the bounded k-means on the
# DRIVER: 16M float64 elements = 128 MB of sample — well inside the 8g
# driver, and 100x the default 100k-row/dim-64 fit sample.  Past it the
# fit falls back to distributed Lloyd (pyspark.ml).
_DRIVER_FIT_MAX_ELEMS = 16_000_000


def fit_ivf_centroids(
    df: DataFrame,
    vec_col: str,
    n_lists: int = 16,
    seed: int = 42,
    sample_fraction: float | None = None,
    sample_rows: int | None = None,
    max_iter: int = 20,
    init_mode: str = "k-means||",
) -> list[list[float]]:
    """Coarse quantizer for IVF: k-means centroids fit on a (sampled)
    vector column.  The centroid table is tiny (n_lists × dim) — it ships
    to executors as literals/broadcast, never as a shuffle side.

    Solver (r11 optimization): the fit input is BOUNDED by design
    (``sample_rows`` hard cap — at 100 TB the iterative fit must never
    run full passes over the corpus; assignment via
    :func:`with_ivf_list` stays full-corpus either way), and a bounded
    problem does not deserve a distributed solver: pyspark.ml's KMeans
    costs ~(init_steps + iterations) driver jobs of pure scheduling
    overhead for a sample that fits in one numpy array.  So when the
    sample is inside ``_DRIVER_FIT_MAX_ELEMS`` the solve happens on the
    driver (vectorized Lloyd, greedy-k-means++ or seeded-random init,
    same 1e-4 movement tolerance as pyspark.ml) — ONE bounded collect
    instead of ~30 jobs; larger samples fall back to pyspark.ml KMeans
    unchanged.  Both solvers are deterministic under (seed, sample), so
    refits reproduce previously-written index assignments
    (:func:`write_ivf_index`) — the contract is within-engine refit
    stability, and planted-structure recovery is pinned by the fixture
    oracles (x27/x72/x278/x282/x283) and unit tests.  Callers that only
    need a rough coarse partition opt into the fast profile
    (``init_mode="random"``, small ``max_iter``).

    Bounding the fit input: ``sample_fraction`` takes a Bernoulli sample;
    ``sample_rows`` is a hard row cap (fraction derived from a count, then
    ``limit``).
    """
    train = _bounded_fit_sample(df, sample_fraction, sample_rows, seed)
    sized = train.select(
        _as_double(F.col(vec_col)).alias("__x"), F.size(vec_col).alias("__d")
    )
    head = sized.select("__d").first()
    if head is None:
        raise ValueError("fit_ivf_centroids: empty fit input")
    dim = int(head["__d"])
    cap_rows = max(1, _DRIVER_FIT_MAX_ELEMS // max(1, dim))
    bound = sample_rows if sample_rows is not None else train.count()
    if bound <= cap_rows:
        import numpy as np

        X = np.asarray(
            [r["__x"] for r in sized.select("__x").collect()], dtype=np.float64
        )
        return _lloyd_driver(X, n_lists, seed, max_iter, init_mode)

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = train.select(array_to_vector(_as_double(F.col(vec_col))).alias("__v"))
    km = KMeans(
        k=n_lists, seed=seed, featuresCol="__v", maxIter=max_iter, initMode=init_mode
    )
    model = km.fit(vecs)
    return [list(map(float, c)) for c in model.clusterCenters()]


def _lloyd_driver(
    X,
    n_lists: int,
    seed: int,
    max_iter: int,
    init_mode: str,
    tol: float = 1e-4,
) -> list[list[float]]:
    """Deterministic vectorized Lloyd on the driver for the BOUNDED fit
    sample.  ``init_mode="random"`` seeds from k distinct sample rows
    (the fast-profile semantics); any other mode (``"k-means||"``, the
    recall-robust profile) uses greedy k-means++ (the scikit-learn
    default: per step, 2+log2(k) D²-weighted candidates, keep the one
    with lowest resulting inertia) — on separable planted data this
    recovers one seed per true cluster, which is the property the
    fixture oracles pin.  Stops when every center moves < ``tol``
    (pyspark.ml's movement tolerance) or after ``max_iter`` rounds;
    empty clusters keep their previous center (pyspark.ml behavior)."""
    import numpy as np

    n = X.shape[0]
    k = max(1, min(int(n_lists), n))
    rng = np.random.RandomState(seed)
    if init_mode == "random":
        idx = rng.choice(n, size=k, replace=False)
        C = X[idx].copy()
    else:
        C = np.empty((k, X.shape[1]), dtype=np.float64)
        C[0] = X[rng.randint(n)]
        d2 = ((X - C[0]) ** 2).sum(axis=1)
        n_cand = 2 + int(np.log2(max(2, k)))
        for j in range(1, k):
            tot = d2.sum()
            if tot <= 0.0:  # all points coincide with chosen seeds
                C[j:] = C[0]
                break
            probs = d2 / tot
            cand = rng.choice(n, size=n_cand, p=probs)
            best_pot, best_i = None, cand[0]
            for i in cand:
                pot = np.minimum(d2, ((X - X[i]) ** 2).sum(axis=1)).sum()
                if best_pot is None or pot < best_pot:
                    best_pot, best_i = pot, i
            C[j] = X[best_i]
            d2 = np.minimum(d2, ((X - C[j]) ** 2).sum(axis=1))
    for _ in range(max_iter):
        # argmin with first-min tie-break (matches _assign_ivf)
        d2all = (
            (X * X).sum(axis=1)[:, None] - 2.0 * (X @ C.T) + (C * C).sum(axis=1)
        )
        asg = d2all.argmin(axis=1)
        moved = 0.0
        newC = C.copy()
        for j in range(k):
            members = X[asg == j]
            if len(members):
                newC[j] = members.mean(axis=0)
                moved = max(moved, float(((newC[j] - C[j]) ** 2).sum()))
        C = newC
        if moved < tol * tol:
            break
    return [list(map(float, c)) for c in C]


def _bounded_fit_sample(
    df: DataFrame,
    sample_fraction: float | None,
    sample_rows: int | None,
    seed: int,
) -> DataFrame:
    """Bound an iterative fit's input: Bernoulli fraction, or a hard row
    cap (count → fraction → ``limit`` — the count is one column-pruned
    pass; the fit it bounds is ``max_iter`` full passes, so the trade
    always wins at scale)."""
    if sample_fraction is not None:
        return df.sample(False, sample_fraction, seed)
    if sample_rows is not None:
        n = df.count()
        if n > sample_rows:
            # oversample 20% so the limit (hard cap) stays full
            frac = min(1.0, 1.2 * sample_rows / n)
            return df.sample(False, frac, seed).limit(sample_rows)
    return df


# Above this cluster count the literal-expression argmin stops being a
# reasonable plan: the expression tree carries k x dim literal nodes
# (analysis + codegen cost grows with it, and codegen eventually falls
# back to interpreted).  Larger quantizers assign through ONE
# Arrow-vectorized pandas_udf over a broadcast numpy centroid matrix —
# the same first-min argmin, BLAS-shaped (batch x dim) @ (dim x k).
_IVF_EXPR_MAX_LISTS = 64


def _assign_ivf(
    df: DataFrame,
    vec_col: str,
    centroids: list[list[float]],
    out_col: str = "ivf_list",
    dist_col: str | None = None,
    expr_max_lists: int | None = None,
) -> DataFrame:
    """Append the nearest-centroid index (and, when ``dist_col`` is
    given, the exact L2 distance to that centroid).

    Path choice: k <= ``expr_max_lists`` stays a pure column expression
    inside whole-stage codegen (zero Python in the hot path); larger k
    — the regime :func:`plan_ivf_lists` reaches at scale — switches to
    a vectorized pandas_udf computing ``|x|² - 2xCᵀ + |c|²`` against
    the broadcast centroid matrix, then re-derives the reported
    distance as the direct ``|x - c*|`` so it matches the expression
    path's arithmetic to float precision.  Both paths break argmin
    ties toward the FIRST minimal index, so assignments agree exactly
    whenever distances differ by more than float rounding."""
    if expr_max_lists is None:
        expr_max_lists = _IVF_EXPR_MAX_LISTS  # read at CALL time (testable)
    vec = _as_double(F.col(vec_col))
    if len(centroids) <= expr_max_lists:
        dists = F.array(
            *[
                V.l2_distance(vec, V.lit_doubles(c))
                for c in centroids
            ]
        )
        tmp = df.withColumn("__dists", dists)
        out = tmp.withColumn(
            out_col,
            (
                F.array_position(F.col("__dists"), F.array_min("__dists")) - 1
            ).cast("int"),
        )
        if dist_col is not None:
            out = out.withColumn(dist_col, F.array_min("__dists"))
        return out.drop("__dists")

    import numpy as np
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)
    c_sq = (C * C).sum(axis=1)

    @pandas_udf("ivf_list int, dist double")
    def assign(s: pd.Series) -> pd.DataFrame:
        if not len(s):
            return pd.DataFrame(
                {
                    "ivf_list": pd.Series([], dtype="int32"),
                    "dist": pd.Series([], dtype="float64"),
                }
            )
        X = np.asarray([np.asarray(v, dtype=np.float64) for v in s])
        d2 = (X * X).sum(axis=1)[:, None] - 2.0 * (X @ C.T) + c_sq[None, :]
        idx = d2.argmin(axis=1)  # first minimal index, like array_position
        diff = X - C[idx]
        dist = np.sqrt((diff * diff).sum(axis=1))
        return pd.DataFrame({"ivf_list": idx.astype("int32"), "dist": dist})

    tmp = df.withColumn("__asg", assign(vec))
    out = tmp.withColumn(out_col, F.col("__asg.ivf_list"))
    if dist_col is not None:
        out = out.withColumn(dist_col, F.col("__asg.dist"))
    return out.drop("__asg")


def plan_ivf_lists(
    n_rows: int,
    pair_budget: int = 2_000_000,
    max_lists: int = 131_072,
    fit_rows: int | None = None,
) -> int:
    """Size a SemDeDup/D4 cluster count from ONE corpus COUNT so the
    within-cluster pair join holds a target expected-pair budget —
    the ``bands="auto"`` pattern (:func:`~flashml_spark.operators.dedup.
    plan_lsh_bands`) applied to the IVF dial (r10 VERDICT item 1).

    Cost model (SemDeDup's own, Abbas et al. 2023 §2): balanced
    clusters of ~n/k rows make the cluster-keyed pair join cost
    Σ|cluster|² ≈ n²/k, so ``k = ceil(n² / pair_budget)`` holds the
    expected pair frame ~flat at ``pair_budget`` as the corpus grows —
    k scales with n², which is exactly why the paper runs ~110k
    clusters at web scale while a fixed default of 16 becomes ~n²/16.

    Caps: ``max_lists`` bounds the quantizer itself (fit cost and the
    broadcast centroid matrix; past it the per-cluster frame grows
    linearly again — the paper's regime, flagged to the caller by the
    returned value equalling the cap); the fit-sample cap keeps >= 4
    sample points per centroid so the bounded k-means stays
    determined.  Skew caveat: real clusters are not balanced — the
    budget is the balanced EXPECTATION (the paper's cost model too);
    heavy skew shifts mass into fewer, larger clusters.
    """
    if pair_budget <= 0:
        raise ValueError(f"pair_budget must be positive, got {pair_budget}")
    n = int(n_rows)
    if n <= 1:
        return 1
    k = -((-n * n) // int(pair_budget))  # ceil(n^2 / budget)
    fit_n = n if fit_rows is None else min(n, int(fit_rows))
    return max(1, min(k, int(max_lists), max(1, fit_n // 4)))


def _resolve_n_lists(
    df: DataFrame,
    n_lists: "int | str",
    pair_budget: int,
    fit_sample_rows: int | None,
) -> int:
    """``n_lists="auto"`` → :func:`plan_ivf_lists` from one COUNT."""
    if n_lists == "auto":
        return plan_ivf_lists(
            df.count(), pair_budget=pair_budget, fit_rows=fit_sample_rows
        )
    return int(n_lists)


def with_ivf_list(
    df: DataFrame, vec_col: str, centroids: list[list[float]], out_col: str = "ivf_list"
) -> DataFrame:
    """Assign each vector to its inverted list.  At rest, write the table
    partitioned by this column so probing becomes partition pruning.
    Large centroid sets (> ``_IVF_EXPR_MAX_LISTS``) assign through the
    vectorized pandas_udf path — see :func:`_assign_ivf`."""
    return _assign_ivf(df, vec_col, centroids, out_col=out_col)


def knn_ivf(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    k: int = 10,
    centroids: list[list[float]] | None = None,
    n_lists: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF ANN top-k: exact cosine restricted to the ``n_probe`` inverted
    lists whose centroids are closest to the query.

    Scale path vs ``knn_lsh``: centroids adapt to the data distribution
    (LSH planes are data-oblivious), so probe lists capture denser true
    neighborhoods.  With the table partitioned by ``ivf_list``, each query
    scans n_probe/n_lists of the data.
    """
    if centroids is None:
        centroids = fit_ivf_centroids(df, vec_col, n_lists=n_lists, seed=seed)
    q = [float(x) for x in query_vec]

    def sq_l2(c: list[float]) -> float:
        return sum((a - b) ** 2 for a, b in zip(q, c))

    probe = sorted(range(len(centroids)), key=lambda i: sq_l2(centroids[i]))[:n_probe]
    listed = with_ivf_list(df, vec_col, centroids)
    candidates = listed.filter(F.col("ivf_list").isin(*probe))
    return knn_brute_force(candidates, vec_col, id_col, q, k)


def write_ivf_index(
    df: DataFrame,
    path: str,
    vec_col: str,
    centroids: list[list[float]],
    list_col: str = "ivf_list",
) -> None:
    """Materialize the IVF index at rest: parquet hive-partitioned by the
    inverted-list id.  This is the 100 TB layout — each inverted list is a
    partition directory, so a probe query's ``isin`` filter becomes a
    PartitionFilter (only n_probe/n_lists directories are listed/read,
    verified by the physical plan in tests).
    """
    with_ivf_list(df, vec_col, centroids, out_col=list_col).write.mode(
        "overwrite"
    ).partitionBy(list_col).parquet(path)


def knn_ivf_indexed(
    spark,
    path: str,
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    centroids: list[list[float]],
    k: int = 10,
    n_probe: int = 4,
    list_col: str = "ivf_list",
) -> DataFrame:
    """IVF ANN top-k over an at-rest index written by ``write_ivf_index``.

    The list assignment was paid once at write time; the probe filter prunes
    whole partition directories before any row is read, so query cost scales
    with n_probe/n_lists of the table regardless of total size.
    """
    q = [float(x) for x in query_vec]

    def sq_l2(c: list[float]) -> float:
        return sum((a - b) ** 2 for a, b in zip(q, c))

    probe = sorted(range(len(centroids)), key=lambda i: sq_l2(centroids[i]))[:n_probe]
    listed = spark.read.parquet(path).filter(F.col(list_col).isin(*probe))
    return knn_brute_force(listed, vec_col, id_col, q, k)


def embedding_neardup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold.

    LSH-bucketed self-join: pairs are only compared inside a bucket, so the
    join key is the bucket id (one shuffle, co-partitioned).  High-cosine
    pairs land in the same bucket with probability (1 - θ/π)^R per plane
    set; for recall-critical dedup run multiple plane seeds and union.
    """
    if dim is None:
        first = df.select(F.size(vec_col).alias("d")).first()
        dim = first["d"]
    planes = random_hyperplanes(dim, n_planes, seed)
    bucketed = with_lsh_bucket(df, vec_col, planes).select(
        F.col(id_col), F.col("bucket"), _as_double(F.col(vec_col)).alias("__v")
    )
    a, b = bucketed.alias("a"), bucketed.alias("b")
    sim = V.cosine(F.col("a.__v"), F.col("b.__v"))
    return (
        a.join(b, "bucket")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(sim, 6).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def label_centroids(df: DataFrame, vec_col: str, label_col: str) -> DataFrame:
    """Per-label mean embedding: ``<label>, centroid`` (array<double>).

    Distributed elementwise mean via posexplode → hash agg on
    (label, pos) → re-assemble sorted by position.  The explode multiplies
    rows by dim, but partial aggregation collapses map-side to
    |labels| x dim partials before the (tiny) shuffle — this is the
    100 TB-safe pattern; ``collect_list`` of whole vectors would move every
    embedding to one reducer per label.
    """
    ex = df.select(
        F.col(label_col),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "v"),
    )
    cent = ex.groupBy(label_col, "pos").agg(F.avg("v").alias("m"))
    return (
        cent.groupBy(label_col)
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("__sm"))
        .select(
            label_col, F.transform("__sm", lambda s: s.getField("m")).alias("centroid")
        )
    )


def label_centroid_similarity(df: DataFrame, vec_col: str, label_col: str) -> DataFrame:
    """Pairwise cosine between label centroids: ``label_a, label_b, cos``
    for label_a < label_b.  The centroid table is |labels| rows — the
    pairwise step is an explicit broadcast of a tiny frame, never a
    shuffle of the embeddings themselves."""
    cent = label_centroids(df, vec_col, label_col)
    a = cent.select(F.col(label_col).alias("label_a"), F.col("centroid").alias("__ca"))
    b = cent.select(F.col(label_col).alias("label_b"), F.col("centroid").alias("__cb"))
    return (
        a.join(F.broadcast(b), F.col("label_a") < F.col("label_b"))
        .select(
            "label_a",
            "label_b",
            F.round(V.cosine(F.col("__ca"), F.col("__cb")), 6).alias("cos"),
        )
    )


def quantization_error(
    df: DataFrame, vec_col: str, id_col: str, bits: int = 8
) -> DataFrame:
    """Per-vector relative error of symmetric scalar quantization to
    ``bits`` (int8 by default): scale = max|v| / (2^(bits-1) - 1),
    q_i = floor(v_i/scale + 0.5), error = ||v - q*scale|| / ||v||.

    The sizing question for embedding storage at 100 TB — int8 cuts the
    column 4× — answered with one shuffle-free pass of array HOFs.
    Rounding is pinned to floor(x + 0.5) (engine-portable; banker's vs
    half-away round() differences never enter).  Zero vectors report 0.
    """
    qmax = (1 << (bits - 1)) - 1
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scale = F.array_max(F.transform(v, F.abs)) / F.lit(float(qmax))
    deq = F.transform(v, lambda x: F.floor(x / scale + 0.5) * scale)
    sq = lambda a: F.aggregate(  # noqa: E731
        F.zip_with(a, a, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    err2 = F.aggregate(
        F.zip_with(v, deq, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    rel = F.when(sq(v) > 0, F.round(F.sqrt(err2 / sq(v)), 6)).otherwise(F.lit(0.0))
    return df.select(F.col(id_col), rel.alias("rel_err"))


def cluster_balanced_sample(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    n_lists: int = 8,
    k_per_cluster: int = 4,
    seed: int = 42,
    fit_sample_rows: int = 100_000,
    max_iter: int = 10,
    init_mode: str = "random",
) -> DataFrame:
    """Diversity sampling for training-data curation: cluster the embedding
    space (the IVF coarse quantizer — k-means, fixed seed) and take a
    deterministic quota from EVERY cluster, so rare regions survive the
    cut that a uniform sample would starve.

    Reuses the IVF machinery: centroids fit on a bounded sample (hard cap
    ``fit_sample_rows`` — the 10-iteration fit never scans the full
    corpus; a 100k-row sample pins 8-64 coarse centroids just as well),
    cluster assignment is a codegen'd argmin over broadcast centroids, and
    the per-cluster quota is a ranked-window top-k (bounded by cluster
    size).  The default fast quantizer profile (random init, 10 iters)
    is explicit here: a rough coarse partition is all diversity quotas
    need; callers that need the recall-robust profile (planted-fixture
    audits, tiny k) opt into ``init_mode="k-means||"``.
    Output: ``<id_col>, ivf_list, rn``."""
    from flashml_spark.operators.sampling import quota_per_group

    centroids = fit_ivf_centroids(
        df,
        vec_col,
        n_lists=n_lists,
        seed=seed,
        sample_rows=fit_sample_rows,
        max_iter=max_iter,
        init_mode=init_mode,
    )
    assigned = with_ivf_list(df, vec_col, centroids)
    return quota_per_group(
        assigned, "ivf_list", id_col, k=k_per_cluster, rank_col="rn"
    ).select(id_col, "ivf_list", "rn")


def semantic_dedup(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-space near-dup removal end-to-end: LSH-bucketed cosine
    pairs → transitive components (min-label propagation) → keep the
    min-id row of every duplicate group.  The semantic twin of
    ``dedup.minhash_dedup`` — same component machinery, cosine recall
    semantics instead of shingle overlap."""
    from flashml_spark.operators.dedup import connected_components

    pairs = embedding_neardup_pairs(
        df, vec_col, id_col, threshold, n_planes, seed, dim
    )
    comp = connected_components(pairs)
    dupes = comp.filter(F.col("id") != F.col("component")).select("id")
    return df.join(dupes, df[id_col] == dupes["id"], "left_anti")


def centroid_shift(
    a: DataFrame, b: DataFrame, vec_col: str, label_col: str
) -> DataFrame:
    """Embedding-drift audit between two corpus snapshots (or halves):
    per label, the cosine between snapshot A's and snapshot B's mean
    embedding — the first-line check that a re-embedded / re-ingested
    corpus still occupies the same space.  Reuses the distributed
    posexplode centroid agg (|labels|×dim partials, never whole-vector
    collect); the final join is |labels|-sized.
    Output: ``<label_col>, cos, shift`` (shift = 1 − cos, rounded 6).
    """
    ca = label_centroids(a, vec_col, label_col).withColumnRenamed("centroid", "__ca")
    cb = label_centroids(b, vec_col, label_col).withColumnRenamed("centroid", "__cb")
    cos = V.cosine(F.col("__ca"), F.col("__cb"))
    return (
        ca.join(cb, label_col)
        .select(
            label_col,
            F.round(cos, 6).alias("cos"),
            F.round(1 - cos, 6).alias("shift"),
        )
    )


def embedding_norm_stats(df: DataFrame, vec_col: str, label_col: str) -> DataFrame:
    """Per-label L2-norm audit of an embedding column — the pre-flight
    check before any cosine/ANN stage: un-normalized vectors silently
    skew dot-product similarity, and a label whose norm distribution
    drifts from the rest usually means a different encoder version wrote
    it.  Pure map (per-row fold) + one hash agg; output is |labels|-sized.
    Output: ``<label_col>, n, avg_norm, min_norm, max_norm, sd_norm``.
    """
    v = _as_double(F.col(vec_col))
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    return (
        df.select(F.col(label_col), norm.alias("__n"))
        .groupBy(label_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("__n"), 6).alias("avg_norm"),
            F.round(F.min("__n"), 6).alias("min_norm"),
            F.round(F.max("__n"), 6).alias("max_norm"),
            F.round(F.stddev_samp("__n"), 6).alias("sd_norm"),
        )
    )


def fisher_separation(
    df: DataFrame, vec_col: str, label_col: str, id_col: str
) -> DataFrame:
    """Per-dimension Fisher ratio of an embedding table — between-class
    variance over mean within-class variance — the "does this embedding
    actually separate my labels, and on which axes" audit run before
    training a probe or pruning dimensions.

    All variances are spelled as explicit (count, sum v, sum v²) moment
    sums — NOT the engine's fused variance aggregate — so the float
    arithmetic is identical on any SQL engine (DuckDB's Welford-style
    var_pop would diverge in the last bits).

    Scale shape: posexplode to (label, dim, v) — |rows| × dim, the only
    corpus-sized frame — then one (label, dim) hash agg, then a |labels|
    × dim combine agg per dim.  No windows, no driver state.
    Output: ``dim, between_var, within_var, fisher`` (rounded to 6; dim
    is 1-based to match SQL subscripts).
    """
    comp = (
        df.select(
            F.col(label_col).alias("label"),
            F.posexplode(F.col(vec_col)).alias("pos", "v"),
        )
        .select("label", (F.col("pos") + 1).alias("dim"), F.col("v").cast("double").alias("v"))
    )
    per_class = comp.groupBy("label", "dim").agg(
        F.count(F.lit(1)).cast("double").alias("n_c"),
        F.sum("v").alias("s1"),
        F.sum(F.col("v") * F.col("v")).alias("s2"),
    )
    mu_c = F.col("s1") / F.col("n_c")
    var_c = F.col("s2") / F.col("n_c") - mu_c * mu_c
    staged = per_class.select(
        "dim", "n_c", mu_c.alias("mu_c"), var_c.alias("var_c"), "s1", "s2"
    )
    out = staged.groupBy("dim").agg(
        F.sum("n_c").alias("n"),
        F.sum("s1").alias("t1"),
        F.sum(F.col("n_c") * F.col("var_c")).alias("w_num"),
        F.sum(F.col("n_c") * F.col("mu_c") * F.col("mu_c")).alias("b_raw"),
    )
    mu = F.col("t1") / F.col("n")
    between = F.col("b_raw") / F.col("n") - mu * mu
    within = F.col("w_num") / F.col("n")
    # a perfectly-separating dimension has zero within-class variance;
    # report NULL rather than tripping ANSI divide-by-zero (both engines)
    fisher = F.when(within != 0, F.round(between / within, 6))
    return out.select(
        F.col("dim").cast("bigint").alias("dim"),
        F.round(between, 6).alias("between_var"),
        F.round(within, 6).alias("within_var"),
        fisher.alias("fisher"),
    )


def jl_signs(dim: int, k: int, label: str = "jl") -> list[list[float]]:
    """Deterministic Rademacher (+-1) projection matrix from md5 — the
    same derivation is expressible in SQL (``md5('jl:i:j')`` hex-prefix
    parity), so an oracle can rebuild the identical matrix."""
    import hashlib

    return [
        [
            1.0
            if int(hashlib.md5(f"{label}:{i}:{j}".encode()).hexdigest()[:8], 16) % 2 == 0
            else -1.0
            for i in range(dim)
        ]
        for j in range(k)
    ]


def random_projection(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    dim: int | None = None,
    label: str = "jl",
) -> DataFrame:
    """Johnson-Lindenstrauss random projection: reduce an embedding
    column to ``k`` dimensions with a deterministic Rademacher sign
    matrix, scaled by ``1/sqrt(k)`` so pairwise distances are preserved
    in expectation — the standard cheapening pass before brute-force or
    LSH similarity at 100 TB (64d -> 8d is an 8x cut in every downstream
    dot product and shuffle byte).

    Scale shape: the matrix is k x dim LITERALS baked into the plan
    (driver cost: k*dim hash calls once); each output dim is one
    ``aggregate(zip_with(...))`` HOF — whole-stage codegen, no UDF, no
    shuffle at all (pure projection).  Output long form:
    ``id_col, out_dim, value``.
    """
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    signs = jl_signs(dim, k, label)
    inv = 1.0 / (k ** 0.5)
    v = _as_double(F.col(vec_col))
    outs = []
    for j in range(k):
        sj = V.lit_doubles(signs[j])
        dot = F.aggregate(
            F.zip_with(v, sj, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        outs.append(F.struct(F.lit(j).alias("out_dim"), (dot * inv).alias("value")))
    return df.select(
        F.col(id_col), F.explode(F.array(*outs)).alias("o")
    ).select(
        id_col,
        F.col("o.out_dim").cast("int").alias("out_dim"),
        F.round(F.col("o.value"), 6).alias("value"),
    )


def pairwise_distance_profile(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    strides: tuple[int, ...] = (1, 7, 101),
    bins: int = 20,
) -> DataFrame:
    """Embedding-space geometry audit: the distribution of cosine
    similarity over DETERMINISTIC id-stride pairs (id, id+stride) — a
    cheap proxy for the full pairwise distribution that detects
    embedding collapse (mass near 1) and anisotropy (mean far above 0)
    without sampling randomness or an all-pairs join.  Multiple strides
    guard against id-locality artifacts (adjacent ids could share a
    shard or a source).

    Scale shape: one keyed self-equi-join per stride (id + stride is a
    pure projection — co-partitioned, AQE-sized), a per-pair HOF cosine
    (codegen, zero shuffle), and a (stride, bin) hash agg — |strides| x
    ``bins`` output rows on fixed [-1, 1] edges.

    Output: ``stride, bin, n, cos_lo`` (bin = floor((cos+1)/2*bins),
    top edge folds; cos_lo rounded 6).
    """
    vec = F.col(vec_col).cast("array<double>")
    base = df.select(F.col(id_col).alias("__id"), vec.alias("__v"))
    parts = []
    for k in strides:
        a = base.select(F.col("__id"), F.col("__v").alias("__va"))
        b = base.select(
            (F.col("__id") - k).alias("__id"), F.col("__v").alias("__vb")
        )
        dot = F.aggregate(
            F.zip_with("__va", "__vb", lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        na = F.sqrt(
            F.aggregate("__va", F.lit(0.0), lambda acc, x: acc + x * x)
        )
        nb = F.sqrt(
            F.aggregate("__vb", F.lit(0.0), lambda acc, x: acc + x * x)
        )
        cos = dot / (na * nb)
        parts.append(
            a.join(b, "__id")
            .select(cos.alias("__cos"))
            .where(F.col("__cos").isNotNull())
            .select(
                F.lit(k).cast("bigint").alias("stride"),
                F.least(
                    F.floor((F.col("__cos") + 1.0) / 2.0 * bins),
                    F.lit(bins - 1),
                )
                .cast("bigint")
                .alias("bin"),
            )
        )
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    return allp.groupBy("stride", "bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.first(F.col("bin")) * 2.0 / bins - 1.0, 6).alias("cos_lo"),
    )


def _top1_per_id(pairs: DataFrame) -> DataFrame:
    """Each id's single top candidate from a ``(ia, ib, sim)`` frame,
    ordered by ``sim`` desc then ``ib`` asc — as ONE ``max_by``
    aggregation instead of a rank window.  The window shuffled and
    sorted EVERY candidate pair to pick one row per id; the aggregation
    reduces map-side (partial ``max_by`` per partition), so only ~|ids|
    rows per input partition ever cross the exchange.  ``max_by``'s key
    ``struct(sim, -ib)`` maximizes lexicographically = sim desc, ib asc
    — the window's exact total order (Catalyst's double ordering, NaN
    greatest, applies identically in both)."""
    return (
        pairs.groupBy("ia")
        .agg(
            F.max_by(
                F.struct(F.col("ib"), F.col("sim")),
                F.struct(F.col("sim"), (-F.col("ib")).alias("__nib")),
            ).alias("__t")
        )
        .select("ia", F.col("__t.ib").alias("ib"), F.col("__t.sim").alias("sim"))
    )


def _mutual_pairs(top: DataFrame) -> DataFrame:
    """Mutual-top-1 pairs from a ``(ia, ib, sim)`` frame holding each
    vector's single top-1 row: ``(a, b)`` is mutual iff BOTH
    orientations appear.  One hash aggregation on the unordered pair
    key replaces the former ``top`` self-join — the self-join executed
    the ENTIRE candidate + rank subtree once per side (the operator's
    dominant cost, twice), plus a join exchange; here the subtree runs
    once and a group of size 2 certifies mutuality (``top`` has exactly
    one row per ``ia``, so an unordered-pair group has at most two rows
    — the two orientations).  ``sim`` is taken from the ``ia < ib`` row
    exactly as the join's ``t``-side projection did (both orientations
    round to the same value; the pick keeps the provenance identical).
    """
    return (
        top.groupBy(
            F.least(F.col("ia"), F.col("ib")).alias("id_a"),
            F.greatest(F.col("ia"), F.col("ib")).alias("id_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("__c"),
            F.max(
                F.when(F.col("ia") < F.col("ib"), F.col("sim"))
            ).alias("sim"),
        )
        .where(F.col("__c") == 2)
        .select("id_a", "id_b", "sim")
        .orderBy("id_a")
    )


def reciprocal_nn_pairs(
    df: DataFrame, vec_col: str, id_col: str, round_to: int = 6
) -> DataFrame:
    """Reciprocal-nearest-neighbour canonical pairs: (a, b) such that b
    is a's cosine top-1 AND a is b's — the classic mutual-NN criterion
    for embedding-level duplicate canonicalization (far stricter than a
    similarity threshold: each side must PREFER the other over every
    other vector, so chains and hubs don't glue unrelated docs).

    Determinism: similarities are ROUNDED to ``round_to`` BEFORE
    ranking and ties break on the smaller neighbour id, so the top-1
    choice — and therefore the mutual set — replays identically on any
    engine regardless of last-ulp float differences.

    Scale shape: this is the EXACT audit variant (all-pairs dot
    products, |n|² — the same posture as x06/x144's exact baselines);
    norms are computed once per row before the join, and the top-1 per
    id is a k=1 window over each id's candidate row group.  The 100 TB
    path applies the same mutual-top-1 criterion to LSH/IVF candidate
    pairs (knn_lsh / ivf_probe) instead of the cross product.
    Output: ``id_a < id_b, sim``.
    """
    from pyspark.sql import Window

    v = V  # module alias for readability below
    # pinned ONCE: both sides of the all-pairs join consume this frame,
    # re-executing the scan + norm per side otherwise (r11)
    src = (
        df.select(
            F.col(id_col).alias("__id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__v"),
        )
        .withColumn("__n", v.norm(F.col("__v")))
        .localCheckpoint()
    )
    a = src.select(
        F.col("__id").alias("ia"), F.col("__v").alias("va"),
        F.col("__n").alias("na"),
    )
    b = src.select(
        F.col("__id").alias("ib"), F.col("__v").alias("vb"),
        F.col("__n").alias("nb"),
    )
    # similarities only for CANONICAL ia < ib pairs — half the n² dot
    # products — then explode-symmetrize: sim is orientation-invariant
    # bit-exactly (element products commute, the sum runs in the same
    # index order, na*nb == nb*na), so each unordered pair feeds both
    # ids' rank groups with the identical value the ia != ib join
    # produced
    pairs = (
        a.join(b, F.col("ia") < F.col("ib"))
        .select(
            "ia",
            "ib",
            F.round(
                v.dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
                round_to,
            ).alias("sim"),
        )
        .select(
            F.explode(
                F.array(
                    F.struct(F.col("ia"), F.col("ib"), F.col("sim")),
                    F.struct(
                        F.col("ib").alias("ia"),
                        F.col("ia").alias("ib"),
                        F.col("sim"),
                    ),
                )
            ).alias("__p")
        )
        .select("__p.ia", "__p.ib", "__p.sim")
    )
    return _mutual_pairs(_top1_per_id(pairs))


def reciprocal_nn_pairs_lsh(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    n_planes: int = 3,
    n_bands: int = 12,
    seed: int = 42,
    round_to: int = 6,
) -> DataFrame:
    """The 100 TB path for :func:`reciprocal_nn_pairs`: candidate pairs
    come from BANDED LSH (OR-amplification — ``n_bands`` independent
    sign-bucket tables of ``n_planes`` hyperplanes each; a pair is a
    candidate if it shares ANY band's bucket), then the SAME
    round-then-rank mutual-top-1 criterion applies within each vector's
    candidate set.

    Banding is what makes the recall dial honest: a pair at angle θ
    survives one band with p = (1 − θ/π)^n_planes, and any of L bands
    with 1 − (1 − p)^L — without it (the single-table variant this
    replaced) recall DECAYS geometrically in the plane count, measured
    at 0.08 for 6 planes on the test embeddings.  Near-duplicates
    (θ ≈ 0, the canonicalization workload) have p ≈ 1, so production
    configs raise ``n_planes`` (smaller buckets, less pair work) and
    keep a few bands.

    Scale shape: ``n_bands`` projection passes assign buckets (one scan,
    posexplode of the band array); the candidate frame is
    Σ_bands Σ|bucket|², dedup'd on (ia, ib) BEFORE the dot products so
    each surviving pair pays ONE similarity evaluation.  Recall gate vs
    the exact operator lives in the unit tests.  Output: ``id_a < id_b,
    sim``.
    """
    from pyspark.sql import Window

    # Pin the normalized vectors ONCE and the narrow (id, band, bucket)
    # frame ONCE (r11): the bucket self-join's two sides plus the two
    # vector-attach joins otherwise re-execute the scan + norm + the
    # n_bands·n_planes projection dots per consumer — four corpus scans
    # and two full bucket passes for one pipeline.  The bucket pin
    # carries NO vectors (ids and two ints), so the heavy payload is
    # materialized exactly once (guide §2.3 "shuffle keys and metadata
    # instead of payloads", §5 localCheckpoint).
    base = (
        df.select(
            F.col(id_col).alias("__id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__v"),
        )
        .withColumn("__n", V.norm(F.col("__v")))
        .localCheckpoint()
    )
    # ONE agg over the pinned blocks surfaces the vector dimension (the
    # former ``df.select(vec_col).first()`` — an extra parquet scan) AND
    # the id bounds that gate the packed pair key below (the x164
    # pattern: ride the bound on an action the operator already pays).
    from pyspark.sql import types as _T

    stats = base.agg(
        F.max(F.size("__v")).alias("dim"),
        F.min("__id").alias("mn"),
        F.max("__id").alias("mx"),
    ).first()
    if stats["dim"] is None:
        raise ValueError("reciprocal_nn_pairs_lsh: empty input")
    dim = int(stats["dim"])
    bands = [
        random_hyperplanes(dim, n_planes, seed + 1000 * l)
        for l in range(n_bands)
    ]
    packable = (
        isinstance(
            base.schema["__id"].dataType,
            (_T.ByteType, _T.ShortType, _T.IntegerType, _T.LongType),
        )
        and stats["mn"] is not None
        and int(stats["mn"]) >= 0
        and int(stats["mx"]) < (1 << 31)
    )
    bucketed = (
        base.select(
            "__id",
            F.posexplode(
                F.array(*[lsh_bucket(F.col("__v"), planes) for planes in bands])
            ).alias("band", "bucket"),
        )
        .localCheckpoint()
    )
    a = bucketed.select(
        F.col("__id").alias("ia"), F.col("band").alias("la"),
        F.col("bucket").alias("ba"),
    )
    b = bucketed.select(
        F.col("__id").alias("ib"), F.col("band").alias("lb"),
        F.col("bucket").alias("bb"),
    )
    # CANONICAL ia < ib candidates only: the band/bucket condition is
    # symmetric, so every unordered candidate pair would otherwise
    # appear in both orientations — twice the distinct, twice the
    # vector-attach shuffles, twice the dot products.  Halve all three
    # and explode-symmetrize after the similarity (bit-exact either
    # orientation: element products commute, same summation order,
    # na*nb == nb*na), feeding both ids' rank groups as before.
    joined = a.join(
        b,
        (F.col("la") == F.col("lb"))
        & (F.col("ba") == F.col("bb"))
        & (F.col("ia") < F.col("ib")),
    )
    if packable:
        # (ia, ib) packs INJECTIVELY into one bigint (ia*2^32 + ib, no
        # overflow: ia*2^32 <= 2^63 - 2^32), so the million-pair distinct
        # hash-aggregates on a single long key — 8 grouping bytes instead
        # of 16 through both the map-side partial and the exchange
        # (guide §2.3 narrower types; r11 verdict item 5)
        shift = F.lit(1 << 32).cast("bigint")
        idt = base.schema["__id"].dataType
        cand = (
            joined.select(
                (
                    F.col("ia").cast("bigint") * shift
                    + F.col("ib").cast("bigint")
                ).alias("__pk")
            )
            .distinct()  # one similarity evaluation per surviving pair
            .select(
                F.shiftright("__pk", 32).cast(idt).alias("ia"),
                F.col("__pk")
                .bitwiseAND(F.lit((1 << 32) - 1))
                .cast(idt)
                .alias("ib"),
            )
        )
    else:
        cand = (
            joined.select("ia", "ib")
            .distinct()  # one similarity evaluation per surviving pair
        )
    va = base.select(
        F.col("__id").alias("ia"), F.col("__v").alias("va"),
        F.col("__n").alias("na"),
    )
    vb = base.select(
        F.col("__id").alias("ib"), F.col("__v").alias("vb"),
        F.col("__n").alias("nb"),
    )
    pairs = (
        cand.join(va, "ia")
        .join(vb, "ib")
        .select(
            "ia",
            "ib",
            F.round(
                V.dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
                round_to,
            ).alias("sim"),
        )
        .select(
            F.explode(
                F.array(
                    F.struct(F.col("ia"), F.col("ib"), F.col("sim")),
                    F.struct(
                        F.col("ib").alias("ia"),
                        F.col("ia").alias("ib"),
                        F.col("sim"),
                    ),
                )
            ).alias("__p")
        )
        .select("__p.ia", "__p.ib", "__p.sim")
    )
    return _mutual_pairs(_top1_per_id(pairs))


def contrastive_triplets(
    df: DataFrame, vec_col: str, id_col: str, round_to: int = 6
) -> DataFrame:
    """Contrastive training triplets from embedding structure:
    (anchor, positive) = each reciprocal-NN canonical pair (both
    orientations — a pair yields two anchors, the standard in-batch
    convention), negative = a DETERMINISTIC md5-picked row from the
    whole table (rank = md5(anchor:positive) % n over the vec-id-sorted
    index, stepping past collisions with the pair itself) — the
    random-negative baseline of triplet mining, reproducible on any
    engine because the pick is hash arithmetic, not RNG.

    Scale shape: the mutual-pair frame (see
    :func:`reciprocal_nn_pairs`; at scale, feed the banded-LSH variant)
    plus ONE global row_number index over the id column built with the
    range-partitioned ranking machinery (``functions.windows.
    global_row_number`` — per-partition counts + offsets, NO
    single-partition window over corpus rows; precompute and reuse the
    index in a real pipeline) and a 3-candidate broadcastable join.
    Output: ``anchor, positive, negative, sim_pos``.
    """
    from pyspark.sql import Window

    from flashml_spark.functions.windows import global_row_number

    # pin the mutual-pair frame ONCE: ``both`` consumes it twice (one
    # branch per orientation), and without the pin the entire all-pairs
    # reciprocal-NN subtree — the operator's dominant cost — executes
    # once per union branch.  The pinned frame is |mutual pairs| rows
    # (<= n/2), never corpus-scale.
    pairs = reciprocal_nn_pairs(
        df, vec_col, id_col, round_to=round_to
    ).localCheckpoint()
    both = pairs.select(
        F.col("id_a").alias("anchor"),
        F.col("id_b").alias("positive"),
        F.col("sim").alias("sim_pos"),
    ).unionByName(
        pairs.select(
            F.col("id_b").alias("anchor"),
            F.col("id_a").alias("positive"),
            F.col("sim").alias("sim_pos"),
        )
    )
    n = df.count()  # scalar: the modulus for the hash rank
    idx = global_row_number(
        df.select(F.col(id_col).alias("cand")), ["cand"], out_col="rn"
    ).withColumn("rn", F.col("rn") - 1)
    base_rank = H.md5_long(
        F.concat(
            F.col("anchor").cast("string"),
            F.lit(":"),
            F.col("positive").cast("string"),
        ),
        8,
    ) % F.lit(n)
    # 3 candidate ranks (with their step index for first-pick ordering):
    # at most 2 can collide with {anchor, positive}
    cands = both.select(
        "*",
        F.posexplode(
            F.array(
                *[((base_rank + F.lit(k)) % F.lit(n)) for k in range(3)]
            )
        ).alias("step", "rn"),
    )
    picked = (
        cands.join(idx, "rn")
        .where(
            (F.col("cand") != F.col("anchor"))
            & (F.col("cand") != F.col("positive"))
        )
        .withColumn(
            "__pick",
            F.row_number().over(
                Window.partitionBy("anchor", "positive").orderBy("step")
            ),
        )
        .where(F.col("__pick") == 1)
    )
    return picked.select(
        "anchor",
        "positive",
        F.col("cand").alias("negative"),
        "sim_pos",
    ).orderBy("anchor", "positive")


def semantic_decontamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.4,
) -> DataFrame:
    """Embedding-level holdout decontamination — the semantic
    complement to token-overlap decontamination (x55/x178): flag every
    corpus vector whose max cosine against ANY benchmark vector clears
    ``threshold`` (paraphrases and translations that share no n-grams
    still sit next to their source in embedding space).

    Scale shape: the benchmark side is SMALL by nature (eval suites),
    so it ships as a broadcast and the whole operator is ONE map-side
    pass over the corpus — no shuffle until the final |flagged|-bounded
    projection; corpus norms computed once per row, benchmark norms
    once per broadcast row.  Output: flagged ``<id>, max_sim,
    nearest_benchmark_id`` ordered by id (sim rounded 6 BEFORE the
    max/argmax, ties to the smaller benchmark id — engine-exact).
    """
    from pyspark.sql import Window

    c = corpus.select(
        F.col(id_col).alias("cid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("cv"),
    ).withColumn("cn", V.norm(F.col("cv")))
    b = benchmark.select(
        F.col(id_col).alias("bid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("bv"),
    ).withColumn("bn", V.norm(F.col("bv")))
    sims = c.join(F.broadcast(b)).select(
        "cid",
        "bid",
        F.round(
            V.dot(F.col("cv"), F.col("bv")) / (F.col("cn") * F.col("bn")),
            6,
        ).alias("sim"),
    )
    w = Window.partitionBy("cid").orderBy(F.desc("sim"), F.asc("bid"))
    return (
        sims.withColumn("__rn", F.row_number().over(w))
        .where((F.col("__rn") == 1) & (F.col("sim") >= F.lit(float(threshold))))
        .select(
            F.col("cid").alias(id_col),
            F.col("sim").alias("max_sim"),
            F.col("bid").alias("nearest_benchmark_id"),
        )
        .orderBy(id_col)
    )


def matryoshka_fidelity(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    dims: list[int],
    sample_mod: int | None = 10,
    round_to: int = 6,
    target_pairs: int = 200_000,
) -> DataFrame:
    """Truncation-fidelity audit for Matryoshka-style embeddings: how
    faithfully does cosine similarity computed on a DIMENSION PREFIX
    reproduce the full-dimension similarity?  The audit a pipeline runs
    before switching its ANN index (or its dedup threshold) to truncated
    vectors — prefix dims are the MRL deployment contract, and a low
    Pearson r at dim d says d is below the corpus's intrinsic dimension.

    Determinism/scale shape: the pair sample is hash-free arithmetic —
    ids with ``id % sample_mod == 0`` cross ids with ``id % sample_mod
    == sample_mod // 2`` (a (n/mod)² pair frame, sample-bounded, both
    sides broadcastable slices of one scan; never the |n|² corpus
    cross).  Per-pair full and truncated cosines round to ``round_to``
    and accumulate as EXACT DECIMALS (sums are order-independent in
    both engines); the Pearson/mean reductions then run in double with
    one written operation order.  Output (|dims| rows): ``dim, n_pairs,
    mean_abs_err, pearson_r`` ordered by dim.

    **A FIXED ``sample_mod`` is quadratic in n** — the r9 ×1..×8 probe
    measured a 1.24 tail slope at mod=10, exactly the (n/mod)² pair
    frame emerging from under fixed costs.  ``sample_mod=None`` engages
    the scale path: one COUNT scan sizes the modulus so the pair frame
    stays ≈ ``target_pairs`` (mod = max(10, ceil(n / sqrt(2·target)))),
    making the audit a constant-size statistical sample over any corpus
    — the fidelity estimate needs sampling sufficiency, not corpus
    coverage.  The SQL-oracled x246 keeps an explicit fixed mod (the
    auto modulus depends on a COUNT the oracle would have to mirror
    ulp-exactly through a sqrt; a fixture-pinned unit test covers the
    auto path instead).
    """
    if sample_mod is None:
        import math as _math

        n = df.count()  # one cheap scalar scan, the price of auto-sizing
        sample_mod = max(10, _math.ceil(n / _math.sqrt(2.0 * target_pairs)))
    base = df.select(
        F.col(id_col).alias("__id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__v"),
    )
    a = base.where(F.col("__id") % sample_mod == 0).select(
        F.col("__id").alias("ia"), F.col("__v").alias("va")
    )
    b = base.where(F.col("__id") % sample_mod == sample_mod // 2).select(
        F.col("__id").alias("ib"), F.col("__v").alias("vb")
    )
    pairs = a.join(F.broadcast(b), F.col("ia") < F.col("ib"))

    def cos_prefix(d: int | None):
        va, vb = F.col("va"), F.col("vb")
        if d is not None:
            va, vb = F.slice(va, 1, d), F.slice(vb, 1, d)
        return V.dot(va, vb) / (V.norm(va) * V.norm(vb))

    # ONE pass over the pair frame: all dims' per-pair sims in one select,
    # all power sums in one aggregate, rows assembled by explode — the
    # pair evaluation is never recomputed per dim.
    full = F.round(cos_prefix(None), round_to).cast("decimal(18,6)")
    ds = sorted(dims)
    per = pairs.select(
        full.alias("f"),
        *[
            F.round(cos_prefix(d), round_to)
            .cast("decimal(18,6)")
            .alias(f"k{d}")
            for d in ds
        ],
    )
    aggs = [F.count(F.lit(1)).alias("n"), F.sum("f").alias("sf"),
            F.sum(F.col("f") * F.col("f")).alias("sff")]
    for d in ds:
        k = F.col(f"k{d}")
        aggs += [
            F.sum(k).alias(f"sk{d}"),
            F.sum(k * k).alias(f"skk{d}"),
            F.sum(F.col("f") * k).alias(f"sfk{d}"),
            F.sum(F.abs(F.col("f") - k)).alias(f"sabs{d}"),
        ]
    agg = per.agg(*aggs)
    n = F.col("n").cast("double")
    sf = F.col("sf").cast("double")
    sff = F.col("sff").cast("double")
    rows = []
    for d in ds:
        sk = F.col(f"sk{d}").cast("double")
        skk = F.col(f"skk{d}").cast("double")
        sfk = F.col(f"sfk{d}").cast("double")
        rows.append(
            F.struct(
                F.lit(d).alias("dim"),
                F.col("n").cast("bigint").alias("n_pairs"),
                F.round(F.col(f"sabs{d}").cast("double") / n, round_to).alias(
                    "mean_abs_err"
                ),
                F.round(
                    (n * sfk - sf * sk)
                    / (
                        F.sqrt(n * sff - sf * sf)
                        * F.sqrt(n * skk - sk * sk)
                    ),
                    round_to,
                ).alias("pearson_r"),
            )
        )
    return (
        agg.select(F.explode(F.array(*rows)).alias("r"))
        .select("r.*")
        .orderBy("dim")
    )


def bucket_balanced_sample(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k_per_bucket: int = 3,
    n_planes: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Deterministic diversity sample: partition embedding space by LSH
    sign buckets (seeded hyperplanes — data-oblivious but geometry-
    respecting) and keep the ``k_per_bucket`` smallest md5-rank rows of
    each bucket.  The hash-clustered sibling of the k-means
    ``cluster_balanced_sample`` (x72): same balanced-coverage intent,
    but every step is closed-form arithmetic, so the full output is
    SQL-derivable — the oracle-checked member of the diversity-sampling
    family.

    Scale shape: one map-side bucket assignment (plane literals
    broadcast in the plan), one KEYED window per bucket (parallel
    across buckets), no global ordering anywhere.  Output: ``bucket,
    <id_col>, pick`` ordered by (bucket, pick).
    """
    from pyspark.sql import Window

    dim = len(df.select(vec_col).first()[0])
    planes = random_hyperplanes(dim, n_planes, seed)
    bucketed = with_lsh_bucket(
        df.select(F.col(id_col), F.col(vec_col)), vec_col, planes
    )
    ranked = bucketed.select(
        "bucket",
        F.col(id_col),
        H.md5_long(F.col(id_col).cast("string"), 8).alias("__r"),
    )
    w = Window.partitionBy("bucket").orderBy(F.col("__r").asc(), F.col(id_col).asc())
    return (
        ranked.withColumn("pick", F.row_number().over(w))
        .where(F.col("pick") <= k_per_bucket)
        .select("bucket", id_col, "pick")
        .orderBy("bucket", "pick")
    )


def pq_codebook(
    dim: int, subspaces: int, codes: int
) -> list[list[list[float]]]:
    """Deterministic literal product-quantization codebook:
    ``codebook[m][k][j] = ((k*31 + (m*sub_dim + j)*17) % 7 - 3) * 0.25``
    — small spread values every engine represents exactly (multiples of
    0.25).  A real pipeline would k-means these; the audit's job is the
    ASSIGNMENT + error accounting, which is codebook-agnostic, and a
    closed-form codebook keeps the whole audit SQL-checkable."""
    sub = dim // subspaces
    return [
        [
            [
                ((k * 31 + (m * sub + j) * 17) % 7 - 3) * 0.25
                for j in range(sub)
            ]
            for k in range(codes)
        ]
        for m in range(subspaces)
    ]


def pq_codebook_audit(
    df: DataFrame,
    vec_col: str,
    subspaces: int = 4,
    codes: int = 4,
    round_to: int = 6,
) -> DataFrame:
    """Product-quantization assignment audit: split each vector into
    ``subspaces`` contiguous sub-vectors, assign each to its nearest
    codebook centroid (L2, deterministic lowest-code tie-break on the
    ROUNDED distance), and report per (subspace, code) the cell count
    and mean quantization error — the codebook-balance/distortion
    readout that decides whether a PQ index is usable before building
    it.  Unbalanced cells (one code soaking up a subspace) mean the
    codebook wastes bits; the per-cell MSE is the distortion floor.

    Exactness contract: distances expand as
    ``dot(x,x) − 2·dot(x,c) + dot(c,c)`` — sequential-sum dot products
    written in the same order as the DuckDB oracle's
    ``list_dot_product`` — rounded to ``round_to`` BEFORE the argmin,
    so the code choice is identical cross-engine even at an ulp
    boundary; per-cell errors then accumulate as exact decimals.

    Scale shape: pure map to (subspace, code, err) — |subspaces| rows
    per vector — then one keyed agg to the |subspaces|·|codes| frame.
    Output: ``subspace, code, n_vecs, mean_err`` ordered by
    (subspace, code).
    """
    dim_row = df.select(F.size(vec_col).alias("d")).first()
    dim = int(dim_row["d"])
    if dim % subspaces:
        raise ValueError(f"dim {dim} not divisible by {subspaces} subspaces")
    sub = dim // subspaces
    book = pq_codebook(dim, subspaces, codes)

    x = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    entries = []
    for m in range(subspaces):
        xm = F.slice(x, m * sub + 1, sub)
        xx = V.dot(xm, xm)
        dists = []
        for k in range(codes):
            c = book[m][k]
            carr = V.lit_doubles(c)
            cc = float(sum(v * v for v in c))
            dists.append(
                F.round(xx - 2.0 * V.dot(xm, carr) + F.lit(cc), round_to)
            )
        # argmin with lowest-code tie-break: fold left, strict <
        best_k = F.lit(0)
        best_d = dists[0]
        for k in range(1, codes):
            is_better = dists[k] < best_d
            best_k = F.when(is_better, F.lit(k)).otherwise(best_k)
            best_d = F.when(is_better, dists[k]).otherwise(best_d)
        entries.append(
            F.struct(
                F.lit(m).alias("subspace"),
                best_k.alias("code"),
                best_d.cast("decimal(18,6)").alias("err"),
            )
        )
    per = df.select(F.explode(F.array(*entries)).alias("e")).select("e.*")
    return (
        per.groupBy("subspace", "code")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(
                F.sum("err").cast("double") / F.count(F.lit(1)), round_to
            ).alias("mean_err"),
        )
        .orderBy("subspace", "code")
    )


def embedding_isotropy_audit(
    df: DataFrame, vec_col: str, round_to: int = 6
) -> DataFrame:
    """Isotropy/health audit of an embedding column: the corpus
    centroid's norm relative to the mean vector norm, and the mean
    cosine of each vector to the centroid.  Anisotropic embedding
    spaces (all vectors leaning into one cone — mean cosine-to-centroid
    near 1) are the classic failure that wrecks cosine-based dedup and
    ANN recall; the audit to run before trusting any cosine threshold.

    Exactness: cosine is scale-invariant, so the audit uses the EXACT
    per-dimension SUM vector as the centroid direction — elements
    quantized to DECIMAL(28,12) and summed order-free, with NO division
    or rounding inside the plan (a float mean would ride on Σ-order and
    round-mode ulps).  The sum vector re-enters the plan as
    correctly-rounded double literals; per-row norms and cosines round
    to ``round_to`` and accumulate as exact decimals.  The reported
    ``centroid_norm`` is ``‖Σv‖ / n`` computed once on the driver.

    Scale shape: one posexplode pass to |dims| partial sums (map-side
    combined, |dims| scalars to the driver), one scan for the per-row
    stats.  Output: ONE row — ``n_vecs, mean_norm, centroid_norm,
    mean_cos_to_centroid``.
    """
    x = _as_double(F.col(vec_col))
    exploded = df.select(F.posexplode(x).alias("pos", "v"))
    cent = exploded.groupBy("pos").agg(
        F.sum(F.col("v").cast("decimal(28,12)")).alias("c"),
        F.count(F.lit(1)).alias("n"),
    )
    rows = cent.orderBy("pos").collect()  # |dims| scalars
    svec = [float(r["c"]) for r in rows]  # exact decimal -> nearest double
    n_vecs = int(rows[0]["n"]) if rows else 0
    snorm = float(sum(v * v for v in svec)) ** 0.5  # left-to-right order
    carr = V.lit_doubles(svec)
    per = df.select(
        F.round(V.norm(x), round_to).cast("decimal(18,6)").alias("nrm"),
        F.round(
            V.dot(x, carr) / (V.norm(x) * F.lit(snorm)), round_to
        )
        .cast("decimal(18,6)")
        .alias("cs"),
    )
    return per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.round(
            F.sum("nrm").cast("double") / F.count(F.lit(1)), round_to
        ).alias("mean_norm"),
        F.round(F.lit(snorm / n_vecs if n_vecs else 0.0), round_to).alias(
            "centroid_norm"
        ),
        F.round(
            F.sum("cs").cast("double") / F.count(F.lit(1)), round_to
        ).alias("mean_cos_to_centroid"),
    )


def semdedup(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    n_lists: "int | str" = 16,
    threshold: float = 0.95,
    seed: int = 42,
    fit_sample_rows: int | None = 100_000,
    max_iter: int = 10,
    init_mode: str = "random",
    centroids: list[list[float]] | None = None,
    pair_budget: int = 2_000_000,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup — CLUSTER-scoped semantic deduplication ("SemDeDup:
    Data-efficient learning at web-scale through semantic
    deduplication", Abbas et al. 2023, arXiv:2303.09540): k-means the
    embedding space, compare cosines only WITHIN each cluster, link
    pairs >= ``threshold`` into duplicate groups, keep the min-id row
    of every group.  The published web-scale recipe — where
    :func:`semantic_dedup` buckets by data-oblivious LSH planes,
    SemDeDup's clusters adapt to the density, so the quadratic
    comparison is spent where near-dups actually live.

    Scale shape: the k-means fit is bounded (``fit_sample_rows`` hard
    cap — never full-corpus iterations); assignment is the broadcast
    argmin (pure map); the within-cluster pair join is keyed on the
    cluster id (ONE shuffle) and its cost is Σ|cluster|² — the paper's
    own cost model, controlled by ``n_lists`` (clusters of ~n/k);
    components + keep-min reuse the dedup machinery.

    ``n_lists="auto"`` (r10 VERDICT item 1) sizes k from ONE corpus
    COUNT via :func:`plan_ivf_lists` so the expected Σ|cluster|² holds
    ``pair_budget`` — the data-driven dial that keeps the pair join
    ~flat as the corpus scales instead of growing n²/16.

    Output (one row per input row): ``id_col, ivf_list, group_id,
    is_kept`` — ``group_id`` is the min id of the row's duplicate
    group (its own id when unique), ``is_kept`` 1 for the survivor.
    """
    from flashml_spark.operators.dedup import connected_components

    if assigned is None:
        if centroids is None:
            n_lists = _resolve_n_lists(df, n_lists, pair_budget, fit_sample_rows)
            centroids = fit_ivf_centroids(
                df,
                vec_col,
                n_lists=n_lists,
                seed=seed,
                sample_rows=fit_sample_rows,
                max_iter=max_iter,
                init_mode=init_mode,
            )
        # Materialize the assignment ONCE (the paper's own layout — SemDeDup
        # stores the cluster-sorted embeddings before the pair stage).  The
        # frame is read three times (both pair-join sides + the final
        # join-back); without the checkpoint each read re-executes the
        # k-centroid argmin map — at n_lists="auto" scale (up to ~131k
        # lists) that is the single most expensive map in the pipeline,
        # evaluated 3x for no reason (guide §2.4/§5: duplicated subtrees;
        # localCheckpoint spills to disk past storage memory).  Per-row
        # norms ride along so the pair cosine is ONE dot per pair instead
        # of three aggregates — same arithmetic, same multiply order
        # (dot/(norm_a*norm_b)), bit-identical result.  A caller that has
        # already materialized this exact frame (``d4_curation`` shares
        # ONE assignment across both stages) passes it via ``assigned=``
        # (columns ``id_col, ivf_list, __v, __n``; extra columns ride
        # along harmlessly) and nothing is recomputed.
        assigned = (
            with_ivf_list(df, vec_col, centroids)
            .select(
                F.col(id_col), F.col("ivf_list"), _as_double(F.col(vec_col)).alias("__v")
            )
            .withColumn("__n", V.norm(F.col("__v")))
            .localCheckpoint()
        )
    a, b = assigned.alias("a"), assigned.alias("b")
    sim = V.dot(F.col("a.__v"), F.col("b.__v")) / (F.col("a.__n") * F.col("b.__n"))
    pairs = (
        a.join(b, "ivf_list")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(sim, 6).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b")
    )
    comp = connected_components(pairs)
    return (
        assigned.select(id_col, "ivf_list")
        .join(comp.withColumnRenamed("id", id_col), id_col, "left")
        .select(
            id_col,
            "ivf_list",
            F.coalesce("component", F.col(id_col)).alias("group_id"),
            (F.coalesce("component", F.col(id_col)) == F.col(id_col))
            .cast("int")
            .alias("is_kept"),
        )
    )


def prototype_prune(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    n_lists: "int | str" = 16,
    drop_frac: float = 0.2,
    seed: int = 42,
    fit_sample_rows: int | None = 100_000,
    max_iter: int = 10,
    init_mode: str = "random",
    centroids: list[list[float]] | None = None,
    pair_budget: int = 2_000_000,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """SSL-prototypes pruning — D4's second stage ("D4: Improving LLM
    Pretraining via Document De-Duplication and Diversification",
    Tirumala et al. 2023, arXiv:2308.12284, building on Sorscher et
    al.'s SSL prototypes): cluster the embedding space and DROP the
    ``drop_frac`` most PROTOTYPICAL points of every cluster (nearest
    their centroid) — near-centroid mass is semantically redundant
    "template" data, while the cluster fringe carries the diversity.
    Composes with :func:`semdedup` into the full D4 recipe (dedup the
    clones, then diversify the remainder; pass the same ``centroids``
    to share one fit).

    Scale shape: bounded k-means fit (or caller-shared centroids),
    broadcast argmin assignment + L2-to-own-centroid as one pure map
    (column expression, or the vectorized pandas_udf past
    ``_IVF_EXPR_MAX_LISTS``), a cluster-keyed rank window, and a
    per-cluster drop count from the exact cluster size — no
    corpus-global frame.  ``n_lists="auto"`` sizes k from one COUNT
    via :func:`plan_ivf_lists` (rank windows cost ~n log(n/k) per
    cluster, so the same balanced-budget dial applies).

    Determinism: ranking orders by (rounded-6 distance ASC, id ASC),
    so ties cut identically in every engine/partitioning.

    Output (one row per input row): ``id_col, ivf_list, proto_rank``
    (1 = most prototypical), ``cluster_n``, ``is_kept`` (0 for the
    dropped prototypical head; ceil-free ``floor(drop_frac * n)`` rows
    drop per cluster, so tiny clusters never vanish entirely).
    """
    from pyspark.sql import Window

    if not 0.0 <= drop_frac < 1.0:
        raise ValueError(f"drop_frac must be in [0, 1), got {drop_frac}")
    if assigned is None:
        if centroids is None:
            n_lists = _resolve_n_lists(df, n_lists, pair_budget, fit_sample_rows)
            centroids = fit_ivf_centroids(
                df,
                vec_col,
                n_lists=n_lists,
                seed=seed,
                sample_rows=fit_sample_rows,
                max_iter=max_iter,
                init_mode=init_mode,
            )
        assigned = _assign_ivf(df, vec_col, centroids, dist_col="__d0")
    # ``assigned=`` callers (``d4_curation``) pass the SAME pre-pinned
    # frame (``id_col, ivf_list, __d0``) both stages read — the argmin
    # map runs once per corpus instead of once per stage.
    scored = assigned.select(
        F.col(id_col),
        "ivf_list",
        F.round(F.col("__d0"), 6).alias("__d"),
    )
    w = Window.partitionBy("ivf_list").orderBy(
        F.col("__d").asc(), F.col(id_col).asc()
    )
    wn = Window.partitionBy("ivf_list")
    ranked = scored.select(
        id_col,
        "ivf_list",
        F.row_number().over(w).alias("proto_rank"),
        F.count(F.lit(1)).over(wn).cast("bigint").alias("cluster_n"),
    )
    return ranked.select(
        id_col,
        "ivf_list",
        "proto_rank",
        "cluster_n",
        (
            F.col("proto_rank")
            > F.floor(F.lit(drop_frac) * F.col("cluster_n"))
        )
        .cast("int")
        .alias("is_kept"),
    )


def d4_curation(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    n_lists: "int | str" = 16,
    dedup_threshold: float = 0.95,
    drop_frac: float = 0.2,
    seed: int = 42,
    fit_sample_rows: int | None = 100_000,
    max_iter: int = 10,
    init_mode: str = "random",
    pair_budget: int = 2_000_000,
) -> DataFrame:
    """D4 end-to-end (Tirumala et al. 2023): SemDeDup the clones, then
    prototype-prune the survivors — ONE k-means fit shared by both
    stages (the paper's recipe; refitting between stages would both
    waste the iterations and let cluster boundaries drift between the
    dedup and the diversify pass).

    Scale shape: the bounded fit once, then each stage's documented
    shape (cluster-keyed pair join + components; pure-map distance +
    cluster-keyed rank window) over monotonically shrinking frames.

    Output (one row per input row): ``id_col, ivf_list, stage`` —
    ``stage`` is ``'kept'``, ``'dedup_dropped'`` or
    ``'prune_dropped'`` (prune ranks are computed over the dedup
    SURVIVORS only, so the prototypical cut never double-counts a
    clone).  ``n_lists="auto"`` sizes the SHARED fit from one COUNT
    via :func:`plan_ivf_lists` against ``pair_budget``.
    """
    n_lists = _resolve_n_lists(df, n_lists, pair_budget, fit_sample_rows)
    centroids = fit_ivf_centroids(
        df,
        vec_col,
        n_lists=n_lists,
        seed=seed,
        sample_rows=fit_sample_rows,
        max_iter=max_iter,
        init_mode=init_mode,
    )
    # ONE corpus assignment map shared by BOTH stages (r11): the argmin
    # against k centroids — the pipeline's most expensive map at
    # n_lists="auto" scale — previously ran once inside semdedup and
    # AGAIN inside prototype_prune (over the survivors, after a corpus
    # re-read + join to recover their vectors).  The same pinned frame
    # carries everything each stage needs: ``__v``/``__n`` for the pair
    # cosines, ``__d0`` for the prototype ranks; the survivor filter is
    # a keyed semi-join on the pinned blocks, never a second corpus
    # scan.  Same expressions, same values — bit-identical stages.
    assigned = (
        _assign_ivf(df, vec_col, centroids, dist_col="__d0")
        .select(
            F.col(id_col),
            "ivf_list",
            F.col("__d0"),
            _as_double(F.col(vec_col)).alias("__v"),
        )
        .withColumn("__n", V.norm(F.col("__v")))
        .localCheckpoint()
    )
    deduped = semdedup(
        df, vec_col, id_col,
        threshold=dedup_threshold, centroids=centroids, assigned=assigned,
    )
    survivors = assigned.join(
        deduped.where(F.col("is_kept") == 1).select(id_col), id_col, "left_semi"
    )
    pruned = prototype_prune(
        survivors, vec_col, id_col,
        drop_frac=drop_frac, centroids=centroids, assigned=survivors,
    )
    return (
        deduped.select(id_col, "ivf_list", "is_kept")
        .join(
            pruned.select(
                F.col(id_col), F.col("is_kept").alias("__pk")
            ),
            id_col,
            "left",
        )
        .select(
            id_col,
            "ivf_list",
            F.when(F.col("is_kept") == 0, F.lit("dedup_dropped"))
            .when(F.col("__pk") == 0, F.lit("prune_dropped"))
            .otherwise(F.lit("kept"))
            .alias("stage"),
        )
    )
