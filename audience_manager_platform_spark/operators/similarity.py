"""Approximate-nearest-neighbor search over embedding columns
(BASELINE.json north star; fixture table ``embeddings``: vec_id,
embedding array<float>, label).

Two strategies:

- :func:`cosine_topk` — brute-force top-k for a bounded query set.
  Distributed as broadcast(queries) ⋈ all vectors: each partition scores
  its vectors against every query and only k rows per query survive the
  window. Cost O(|queries| * N / partitions) per executor — the right
  baseline, and exact.
- :func:`lsh_near_pairs` — random-hyperplane LSH for all-pairs search:
  L tables x m sign-bits per vector; only bucket collisions are paired
  and verified. This is the 100 TB path: the shuffle key is the bucket,
  never the vector id cross product.

Vector math on the hot paths uses explicit per-element expressions
(``v[0]*u[0] + v[1]*u[1] + …`` over EMBED_DIM terms) — the SAME
left-to-right IEEE summation order as the ``zip_with``+``aggregate``
fold it replaces (so doubles still match the DuckDB oracle's
``list_dot_product``/``list_cosine_similarity``), but whole-stage
codegen compiles it instead of interpreting a lambda per element:
measured 6x faster on the 255k-pair verification stage at sf0.1.
Hyperplanes are deterministic literals shared with the oracle.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import cosine_similarity
from .partitioning import materialize, spread

# --------------------------------------------------- hyperplane constants
LSH_TABLES = 8
LSH_BITS = 6
EMBED_DIM = 64


def _planes() -> list[list[float]]:
    """Deterministic pseudo-gaussian hyperplanes (Box-Muller over an LCG;
    no numpy state, reproducible everywhere, embedded as literals in both
    engines)."""
    state = 88172645463325252
    out: list[list[float]] = []

    def nxt() -> float:
        nonlocal state
        state ^= (state << 13) % (2**64)
        state ^= state >> 7
        state ^= (state << 17) % (2**64)
        return (state % 10**9) / 10**9  # uniform (0,1)

    for _ in range(LSH_TABLES * LSH_BITS):
        plane = []
        for _ in range(0, EMBED_DIM, 2):
            u1, u2 = max(nxt(), 1e-12), nxt()
            r = math.sqrt(-2.0 * math.log(u1))
            plane.append(round(r * math.cos(2 * math.pi * u2), 6))
            plane.append(round(r * math.sin(2 * math.pi * u2), 6))
        out.append(plane[:EMBED_DIM])
    return out


PLANES = _planes()


def _vec_double(col: str = "embedding") -> Column:
    return F.col(col).cast("array<double>")


def _dot_expr(a: str, b: str) -> Column:
    """Codegen'd dot product: explicit left-assoc sum over EMBED_DIM
    element products. Identical IEEE ordering to the
    ``aggregate(zip_with(a, b, *), 0.0, +)`` fold (0.0 + p0 == p0), but
    compiled by whole-stage codegen instead of per-element lambda
    interpretation — the difference between ~45µs and sub-µs per dot.

    Built as ONE ``F.expr`` string, not a Python Column tree: composing
    ~190 Column operators costs ~3.6 s of py4j round-trips PER CALL on
    the driver (measured), while a single SQL string parses JVM-side in
    milliseconds. SQL ``+`` is left-associative, so the summation order
    is unchanged."""
    return F.expr(" + ".join(f"{a}[{i}] * {b}[{i}]" for i in range(EMBED_DIM)))


def _norm_expr(v: str) -> Column:
    """Codegen'd L2 norm, same summation order as the HOF fold (single
    ``F.expr`` string — see :func:`_dot_expr` for why)."""
    return F.sqrt(
        F.expr(" + ".join(f"{v}[{i}] * {v}[{i}]" for i in range(EMBED_DIM)))
    )


# ------------------------------------------------------------ brute force
def cosine_topk(
    emb: DataFrame, query_ids: list[int], k: int = 5
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id (self excluded).
    Ranking key is (rounded similarity desc, vec_id asc) — total order,
    deterministic across engines."""
    base = emb.select("vec_id", _vec_double().alias("v"))
    queries = base.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("q")
    )
    scored = (
        base.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine_similarity(F.col("q"), F.col("v")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_topk_sql(query_ids: list[int], k: int = 5, src: str = "embeddings") -> str:
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {src}),
        q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id IN ({ids})),
        scored AS (
          SELECT q.query_id, e.vec_id AS neighbor_id,
                 ROUND(list_cosine_similarity(q.qv, e.v), 6) AS cosine
          FROM e CROSS JOIN q WHERE e.vec_id != q.query_id
        )
        SELECT query_id, neighbor_id, cosine, rank FROM (
          SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
          FROM scored
        ) r WHERE rank <= {k}
    """


# ---------------------------------------------------------------- LSH ANN
def _bucketed(base: DataFrame) -> DataFrame:
    """Bucket keys for every vector: all LSH_TABLES x LSH_BITS plane dot
    products in ONE vectorized Arrow batch (numpy matmul in a pandas_udf).

    This is the sanctioned slow-path escape hatch: 3072 interpreted
    higher-order-function dots per row measured ~45µs each; the batched
    matmul does the identical math at memory bandwidth. Sign bits feed the
    bucket keys; the exact-cosine verification stays JVM-side."""
    planes_t = np.array(PLANES, dtype=np.float64).T  # dim x (tables*bits)

    @F.pandas_udf("array<int>")
    def bucket_ids(vs: pd.Series) -> pd.Series:
        mat = np.vstack(vs.to_numpy())  # batch x dim
        signs = (mat @ planes_t) > 0  # batch x (tables*bits)
        out = []
        for row in signs:
            out.append(
                [
                    int(
                        sum(
                            (1 << b) if row[t * LSH_BITS + b] else 0
                            for b in range(LSH_BITS)
                        )
                    )
                    for t in range(LSH_TABLES)
                ]
            )
        return pd.Series(out)

    b = base.withColumn("buckets", bucket_ids("v"))
    return b.select(
        "vec_id",
        "v",
        *[F.col("buckets")[t].alias(f"t{t}") for t in range(LSH_TABLES)],
    )


def lsh_near_pairs(emb: DataFrame, threshold: float = 0.35) -> DataFrame:
    """Approximate all-pairs search: vectors colliding in >=1 of the
    LSH_TABLES bucket keys are candidate pairs; candidates are verified
    with exact cosine >= threshold. Deterministic (fixed planes), and the
    oracle replicates the identical pipeline — recall < 1 is the
    *documented semantics* of the operator, not noise."""
    base = spread(emb).select("vec_id", _vec_double().alias("v"))
    bucketed = _bucketed(base)
    # the self-join carries ONLY (vec_id, bucket) — shuffling the vectors
    # through the bucket join would move |v| bytes per candidate; instead
    # candidates are deduped as id pairs and the vector table is joined
    # back per side. Bucket keys are ints (table_id * 2^bits + sign_bits):
    # cheaper to hash/shuffle than the former "t_bits" strings.
    long = bucketed.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    (F.lit(t * (1 << LSH_BITS)) + F.col(f"t{t}")).cast("long")
                    for t in range(LSH_TABLES)
                ]
            )
        ).alias("bucket"),
    )
    # RELIABLE checkpoint, not persist(): the bucket table feeds both
    # sides of the self-join, and exchange reuse does NOT fire across the
    # aliased branches (measured: the Arrow matmul ran twice, doubling the
    # stage). Materializing the (vec_id, bucket) table — ids only, tiny —
    # runs the matmul exactly once and leaves nothing in the block manager
    # for the session's lifetime (VERDICT r1 finding 5). ``base`` itself
    # stays un-materialized: its recompute per consumer is a pruned
    # parquet scan + codegen'd norm, cheaper at 100 TB than writing every
    # vector back to disk.
    long = materialize(long)
    # shuffle-hash (not sort-merge): bucket groups are bounded by design
    # (LSH_BITS splits the space), so the per-partition hash side always
    # fits; skipping both sorts measured 2-5x faster at every scale tried
    cand = (
        long.alias("x")
        .hint("shuffle_hash")
        .join(long.alias("y").hint("shuffle_hash"), "bucket")
        .filter(F.col("x.vec_id") < F.col("y.vec_id"))
        .select(
            F.col("x.vec_id").alias("id_a"),
            F.col("y.vec_id").alias("id_b"),
        )
        .distinct()
    )
    # AQE coalesces the tiny id-pair exchange by BYTES (255k pairs ≈ a
    # few MB → 1-2 partitions), starving the 64-dim verify below of
    # parallelism (measured 7.0 s → 1.1 s at sf0.1 once respread). The
    # keyed repartition also IS the verify join's required distribution
    # on id_a, so it replaces that exchange rather than adding one.
    cand = cand.repartition(
        cand.sparkSession.sparkContext.defaultParallelism, "id_a"
    )
    # norms once per vector (N sums), not once per candidate pair
    # (|candidates| >> N)
    va = base.select(
        F.col("vec_id").alias("id_a"),
        F.col("v").alias("va"),
        _norm_expr("v").alias("na"),
    )
    vb = base.select(
        F.col("vec_id").alias("id_b"),
        F.col("v").alias("vb"),
        _norm_expr("v").alias("nb"),
    )
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                _dot_expr("va", "vb") / (F.col("na") * F.col("nb")), 6
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def lsh_near_pairs_sql(threshold: float = 0.35, src: str = "embeddings") -> str:
    bucket_exprs = []
    for t in range(LSH_TABLES):
        bits = []
        for b in range(LSH_BITS):
            plane = PLANES[t * LSH_BITS + b]
            lit = "[" + ", ".join(repr(x) for x in plane) + "]"
            bits.append(
                f"CASE WHEN list_dot_product(v, {lit}) > 0 THEN {1 << b} ELSE 0 END"
            )
        bucket_exprs.append(
            f"({t * (1 << LSH_BITS)} + {' + '.join(bits)}) AS t{t}"
        )
    buckets = ",\n                 ".join(bucket_exprs)
    bucket_list = ", ".join(f"t{t}" for t in range(LSH_TABLES))
    return f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {src}),
        bucketed AS (
          SELECT vec_id, v,
                 {buckets}
          FROM e
        ),
        long AS (
          SELECT vec_id, v, UNNEST([{bucket_list}]) AS bucket FROM bucketed
        ),
        cand AS (
          SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
          FROM long x JOIN long y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
        )
        SELECT cand.id_a, cand.id_b,
               ROUND(list_cosine_similarity(ea.v, eb.v), 6) AS cosine
        FROM cand
        JOIN e ea ON ea.vec_id = cand.id_a
        JOIN e eb ON eb.vec_id = cand.id_b
        WHERE ROUND(list_cosine_similarity(ea.v, eb.v), 6) >= {threshold}
    """


# ---------------------------------------------------------------- IVF ANN
IVF_CENTROIDS = 16
IVF_PROBES = 4


def ivf_topk(
    emb: DataFrame, query_ids: list[int], k: int = 5
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: vectors are assigned to
    their nearest centroid (the coarse quantizer); a query scores only the
    vectors in its IVF_PROBES nearest cells instead of the whole corpus.

    Centroid choice is deterministic — the first IVF_CENTROIDS vectors by
    vec_id — so the full pipeline (assignment included) is reproducible by
    the SQL oracle. On a real deployment the centroids come from k-means
    (MLlib KMeans with a fixed seed) and live in a small table; the plan
    shape is identical: broadcast centroids ⋈ vectors → cell assignment →
    per-cell shuffle — candidate scoring cost drops by
    ~IVF_PROBES/IVF_CENTROIDS versus brute force.

    Like every ANN operator here, recall < 1 is the documented semantics:
    a neighbor assigned to a non-probed cell is missed.
    """
    base = emb.select("vec_id", _vec_double().alias("v"))
    model = [
        (int(r["vec_id"]), [float(x) for x in r["v"]])
        for r in base.filter(F.col("vec_id") < IVF_CENTROIDS).collect()
    ]
    return _ivf_probe(
        base, _model_df(emb.sparkSession, model), query_ids, k, model=model
    )


def _py_norm(vec: list[float]) -> float:
    """Driver-side L2 norm with the SAME summation order as
    :func:`_norm_expr` (left-assoc chain; the leading ``0.0 +`` is an
    IEEE no-op for non-negative squares), so a Python-computed centroid
    norm is bit-identical to the JVM's and can be inlined as a literal."""
    s = 0.0
    for x in vec:
        s = s + x * x
    return math.sqrt(s)


def _centroid_struct_exprs(
    model: list[tuple[int, list[float]]]
) -> list[tuple[int, str]]:
    """One (cent_id, SQL-struct-expr) per centroid scoring a vector
    column ``v`` (with its norm pre-computed in ``nv``) against the
    DRIVER-SIDE centroid — struct lexicographic order encodes
    (csim DESC, cent_id ASC) exactly like :func:`_assign`'s
    ``max(struct(...))``.

    Why inline literals instead of a broadcast join: the model is O(K x
    dim) driver state already (Lloyd's update collects it every
    iteration), and folding it into the projection makes assignment a
    NARROW map — no broadcast exchange, no K-row blow-up, and crucially
    no ``groupBy(vec_id)`` shuffle of the full corpus per iteration.
    ``repr(float)`` round-trips doubles exactly, and the centroid norm
    is computed driver-side with matching IEEE order (:func:`_py_norm`),
    so every csim is bit-identical to the join formulation and the SQL
    oracle still reproduces each assignment decision."""
    out = []
    for cid, cv in model:
        dot = " + ".join(f"v[{i}] * {cv[i]!r}" for i in range(EMBED_DIM))
        out.append(
            (
                cid,
                f"named_struct('csim', round(({dot}) / (nv * {_py_norm(cv)!r}), 6), "
                f"'neg', {-cid}L, 'cent_id', {cid}L)",
            )
        )
    return out


def _assign_inline(
    base: DataFrame, model: list[tuple[int, list[float]]]
) -> DataFrame:
    """Shuffle-free twin of :func:`_assign` for driver-side models:
    scan -> project -> project. Same output columns, same values.

    TWO projections, not one: each centroid's struct is its own column
    in the first (whole-stage codegen splits separate columns into
    separate methods), and the argmax is a small ``greatest()`` over
    those columns in the second. Collapsed into a single
    ``greatest(<K x dim terms>)`` expression the generated code is one
    unsplittable method that blows janino's 64 KB limit and drops the
    whole stage to interpreted eval (measured 2.5x slower) — the
    nondeterministic ``_mid`` column exists solely to stop
    CollapseProject from doing that inlining."""
    if not model:
        # no centroids => no assignments (the join twin's natural result)
        return (
            base.withColumn("cent_id", F.lit(None).cast("bigint"))
            .withColumn("csim", F.lit(None).cast("double"))
            .select("vec_id", "v", "cent_id", "csim")
            .filter(F.lit(False))
        )
    structs = [
        F.expr(e).alias(f"_s{cid}") for cid, e in _centroid_struct_exprs(model)
    ]
    scored = base.withColumn("nv", _norm_expr("v")).select(
        "vec_id",
        "v",
        F.monotonically_increasing_id().alias("_mid"),
        *structs,
    )
    best = (
        F.greatest(*[F.col(f"_s{cid}") for cid, _ in model])
        if len(model) > 1
        else F.col(f"_s{model[0][0]}")
    )
    return scored.select(
        "vec_id",
        "v",
        best.getField("cent_id").alias("cent_id"),
        best.getField("csim").alias("csim"),
    )


def _assign(base: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: broadcast the (small) centroid table,
    score every vector against every centroid, keep the argmax-cosine
    cell. One map-side broadcast join + one window per vector — the
    shuffle key is vec_id, never a cross product that leaves the
    executor. Ties break on cent_id asc; csim is rounded to 6dp so the
    argmax is reproducible by the SQL oracle."""
    # codegen'd dot/norm (identical IEEE ordering to the HOF fold and the
    # oracle's list_cosine_similarity) — at N x K scored rows per pass the
    # interpreted lambda is the difference between seconds and minutes.
    # The argmax is a hash aggregate over max(struct(csim, -cent_id)),
    # NOT a row_number window: partial aggregation collapses the K
    # candidate rows map-side, so the shuffle carries N rows, not N x K,
    # and nothing is sorted. Ordering (csim DESC, cent_id ASC) is encoded
    # by the struct's lexicographic comparison.
    # norms once per vector / centroid (N + K sums), not once per scored
    # pair (N x K): the norm of a given array is bit-identical wherever
    # it is computed, so the oracle's per-pair list_cosine_similarity
    # still matches exactly.
    scored = (
        base.withColumn("nv", _norm_expr("v"))
        .join(
            F.broadcast(cents.withColumn("ncv", _norm_expr("cv"))), how="cross"
        )
        .select(
            "vec_id",
            "v",
            "cent_id",
            F.round(
                _dot_expr("v", "cv") / (F.col("nv") * F.col("ncv")), 6
            ).alias("csim"),
        )
    )
    return (
        scored.groupBy("vec_id")
        .agg(
            F.first("v").alias("v"),  # constant within the group
            F.max(
                F.struct(
                    F.col("csim"), (-F.col("cent_id")).alias("neg"), F.col("cent_id")
                )
            ).alias("best"),
        )
        .select(
            "vec_id",
            "v",
            F.col("best.cent_id").alias("cent_id"),
            F.col("best.csim").alias("csim"),
        )
    )


def _ivf_probe(
    base: DataFrame,
    cents: DataFrame,
    query_ids: list[int],
    k: int,
    n_probes: int = IVF_PROBES,
    model: list[tuple[int, list[float]]] | None = None,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """Shared IVF probe pipeline: per-vector cell assignment (argmax
    cosine — a narrow inline map when the centroids are already
    driver-side, else broadcast-join) -> queries probe their ``n_probes``
    nearest cells -> exact scoring inside probed cells only. A caller
    sweeping ``n_probes`` passes a precomputed ``assigned`` table so the
    corpus is cell-assigned once, not once per sweep point."""
    if assigned is not None:
        pass
    elif model is not None:
        assigned = assign_cells_arrow(base, model, keep_vec=True).select(
            "vec_id", "v", "cent_id"
        )
    else:
        assigned = _assign(base, cents).select("vec_id", "v", "cent_id")
    # queries probe their IVF_PROBES nearest cells
    queries = base.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("q")
    )
    w_probe = Window.partitionBy("query_id").orderBy(F.desc("qsim"), F.asc("cent_id"))
    probes = (
        queries.join(F.broadcast(cents), how="cross")
        .select(
            "query_id",
            "q",
            "cent_id",
            F.round(cosine_similarity(F.col("q"), F.col("cv")), 6).alias("qsim"),
        )
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= n_probes)
        .select("query_id", "q", "cent_id")
    )
    scored = (
        probes.join(assigned, "cent_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine_similarity(F.col("q"), F.col("v")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_topk_sql(query_ids: list[int], k: int = 5, src: str = "embeddings") -> str:
    prefix = f"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {src}),
        cents AS (
          SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < {IVF_CENTROIDS}
        )"""
    return _ivf_probe_sql(prefix, query_ids, k)


def _ivf_probe_sql(
    prefix_ctes: str,
    query_ids: list[int],
    k: int,
    n_probes: int = IVF_PROBES,
) -> str:
    """SQL twin of :func:`_ivf_probe`. ``prefix_ctes`` must define ``e``
    (vec_id, v DOUBLE[]) and ``cents`` (cent_id, cv DOUBLE[])."""
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
        WITH {prefix_ctes},
        assigned AS (
          SELECT vec_id, v, cent_id FROM (
            SELECT e.vec_id, e.v, cents.cent_id,
                   ROW_NUMBER() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY ROUND(list_cosine_similarity(e.v, cents.cv), 6) DESC,
                              cents.cent_id ASC) AS rn
            FROM e CROSS JOIN cents
          ) a WHERE rn = 1
        ),
        q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id IN ({ids})),
        probes AS (
          SELECT query_id, qv, cent_id FROM (
            SELECT q.query_id, q.qv, cents.cent_id,
                   ROW_NUMBER() OVER (
                     PARTITION BY q.query_id
                     ORDER BY ROUND(list_cosine_similarity(q.qv, cents.cv), 6) DESC,
                              cents.cent_id ASC) AS rn
            FROM q CROSS JOIN cents
          ) p WHERE rn <= {n_probes}
        ),
        scored AS (
          SELECT probes.query_id, assigned.vec_id AS neighbor_id,
                 ROUND(list_cosine_similarity(probes.qv, assigned.v), 6) AS cosine
          FROM probes JOIN assigned USING (cent_id)
          WHERE assigned.vec_id != probes.query_id
        )
        SELECT query_id, neighbor_id, cosine, rank FROM (
          SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
          FROM scored
        ) r WHERE rank <= {k}
    """


# -------------------------------------------------- distributed k-means
KMEANS_K = 16
KMEANS_ITERS = 2


# ------------------------------------- order-free quantized model means
# Model state (k-means centroids, PQ codewords, label centroids) must be
# bit-identical across engines AND across partitionings — `avg(double)`
# accumulates in partition order, so `round(avg(x), 6)` can flip its last
# digit when a mean straddles a 0.5e-6 boundary (the r4 driver-red PQ
# rows were exactly that).  The order-free contract:
#
#   scaled(x)  = floor(x * 1e12 + 0.5)     -- one IEEE multiply, one IEEE
#                                             add, one exact floor: every
#                                             step is bit-deterministic
#                                             double arithmetic with NO
#                                             engine-specific decimal /
#                                             string-repr path (DuckDB's
#                                             round(double) is not
#                                             exact-value HALF_UP at
#                                             ~1e12 magnitudes; floor is)
#   S          = SUM(scaled(x))            -- exact integer sum, fully
#                                             commutative (decimal(38,0)
#                                             in Spark, HUGEINT in DuckDB)
#   mean6      = sign(S) * ((|S| + n*5e5) // (n*1e6)) / 1e6
#                                          -- ONE half-away-from-zero
#                                             rounding done in exact
#                                             integer arithmetic (Python
#                                             //, DuckDB //, Spark `div`
#                                             all agree on non-negative
#                                             operands)
#
# tri-engine agreement is pinned by tests/test_pq.py::test_mean6_*.


def _mean6(s_int: int, n: int) -> float:
    """Driver-side half of the contract: 6dp mean of an exact
    1e-12-scaled integer sum, rounded half-away-from-zero in exact
    integer arithmetic."""
    d = n * 1_000_000
    micro = (abs(int(s_int)) + d // 2) // d
    return (-micro if s_int < 0 else micro) / 1e6


def _sum12_agg(v: str, n_dims: int, offset: int = 0):
    """Spark aggregate producing the per-dim exact scaled sums as
    ``array<decimal(38,0)>`` (one expr string -> one py4j call)."""
    return F.expr(
        "array("
        + ", ".join(
            f"sum(cast(floor({v}[{offset + i}] * 1e12 + 0.5d) as decimal(38,0)))"
            for i in range(n_dims)
        )
        + ")"
    )


def _mean6_from_rows(rows, key: str, n_dims_unused: int = 0):
    """(key, sv, n) rows -> sorted [(key, [mean6 ...])] model list."""
    return sorted(
        (
            int(r[key]),
            [_mean6(int(s), int(r["n"])) for s in r["sv"]],
        )
        for r in rows
    )


def _mean6_sql_items(v: str, n_dims: int, offset: int = 0) -> str:
    """DuckDB twin of the contract: per-dim mean expressions (1-based
    list indexing) for a GROUP BY aggregate."""
    items = []
    for i in range(n_dims):
        s = f"SUM(CAST(floor({v}[{offset + i + 1}] * 1e12 + 0.5) AS HUGEINT))"
        micro = f"((abs({s}) + COUNT(*) * 500000) // (COUNT(*) * 1000000))"
        items.append(
            f"CAST(CASE WHEN {s} < 0 THEN -{micro} ELSE {micro} END"
            f" AS DOUBLE) / 1e6"
        )
    return ", ".join(items)


def _mean6_spark_items(v: str, n_dims: int, offset: int = 0) -> str:
    """Spark-SQL-side twin for operators whose centroids stay in the
    DataFrame (e.g. per-label centroids): same integer formula, `div`
    (truncating, operands kept non-negative) for the exact division."""
    items = []
    for i in range(n_dims):
        s = f"sum(cast(floor({v}[{offset + i}] * 1e12 + 0.5d) as decimal(38,0)))"
        micro = f"((abs({s}) + count(*) * 500000) div (count(*) * 1000000))"
        items.append(
            f"cast(case when {s} < 0 then -{micro} else {micro} end"
            f" as double) / 1e6"
        )
    return ", ".join(items)


def kmeans_fit(
    emb: DataFrame, k: int = KMEANS_K, iters: int = KMEANS_ITERS
) -> DataFrame:
    """Lloyd's k-means over the embedding column, expressed as DataFrame
    ops (spherical variant: assignment by cosine, like the IVF coarse
    quantizer it trains).

    Per iteration: assign with the Arrow kernel
    (:func:`assign_cells_arrow`, bit-equal to the literal-fold
    :func:`_assign_inline` which stays as the oracle-shape reference —
    a NARROW map, no broadcast exchange, no corpus shuffle), then
    recompute each centroid as the element-wise mean via EMBED_DIM
    codegen'd ``avg(v[i])`` aggregates — the only exchange per iteration,
    carrying at most K x EMBED_DIM doubles after map-side partial
    aggregation regardless of corpus size. The K-row result (the model)
    is collected to the driver for the next iteration — the same
    driver-side model update MLlib's KMeans performs; model state is
    O(K x dim), never data-sized.

    Determinism: init centroids are the vectors with ``vec_id < k`` (the
    reference-free deterministic seed the oracle can replicate);
    per-iteration means are 6dp-quantized model state computed through
    the order-free exact-integer contract (see the block above
    :data:`KMEANS_K`): scaled-integer sums are exact and commutative, so
    the model is bit-identical on ANY partitioning and any engine — the
    r4 ``round(avg(..), 6)`` boundary-straddle hazard is closed, not
    just improbable. Clusters that lose all members drop out on both
    engines (GROUP BY semantics).
    """
    return _model_df(emb.sparkSession, kmeans_fit_model(emb, k, iters))


def _model_df(
    spark: SparkSession, model: list[tuple[int, list[float]]]
) -> DataFrame:
    # A SQL VALUES LocalRelation, not createDataFrame (r11): the model
    # is driver state, and a pickled-RDD frame re-ran a
    # defaultParallelism-task deserialize job plus the repartition(1)
    # shuffle inside EVERY consumer action (measured 0.3-0.6 s per
    # action under contention; the r6 repartition(1) note chronicles
    # the previous round of this same cost). A VALUES list parses
    # JVM-side in milliseconds into a single-partition local relation:
    # zero jobs, zero shuffles, broadcast-ready, and the K x K
    # self-cross-join stays a handful of tasks. Literals round-trip
    # exactly (repr doubles / L-suffixed bigints — see
    # _values_relation), so values are bit-identical to the
    # createDataFrame path.
    if not model:
        return spark.createDataFrame([], "cent_id bigint, cv array<double>")
    return _values_relation(
        spark,
        [
            f"({int(cid)}L, array({','.join(_d(float(x)) for x in cv)}))"
            for cid, cv in model
        ],
        "cent_id, cv",
    )


def kmeans_fit_model(
    emb: DataFrame, k: int = KMEANS_K, iters: int = KMEANS_ITERS
) -> list[tuple[int, list[float]]]:
    """:func:`kmeans_fit` returning the model as driver-side rows —
    internal callers feed it to :func:`_assign_inline` so the whole fit
    runs with ZERO corpus-sized shuffles: per iteration one narrow
    assignment map plus one map-side-combined mean aggregate whose
    exchange carries at most K x EMBED_DIM doubles."""
    from .partitioning import spread

    # single-file fixture scans otherwise run each iteration's Arrow
    # assignment pass in ONE task (spread is a no-op on real tables)
    base = spread(emb).select("vec_id", _vec_double().alias("v"))
    # seed collect reads the UNSPREAD scan: the K seed rows come from a
    # pushed-down vec_id < k filter, and routing them through spread's
    # repartition paid a full scan+shuffle for a 16-row collect (r11;
    # same rows either way)
    model = [
        (int(r["vec_id"]), [float(x) for x in r["v"]])
        for r in emb.select("vec_id", _vec_double().alias("v"))
        .filter(F.col("vec_id") < k)
        .collect()
    ]
    # exact scaled-integer sums (order-free; see the contract block above
    # KMEANS_K) collected with the count; the single 6dp rounding happens
    # driver-side — the model is driver state already
    sum_vec = _sum12_agg("v", EMBED_DIM).alias("sv")
    for _ in range(iters):
        rows = (
            assign_cells_arrow(base, model, keep_vec=True)
            .groupBy("cent_id")
            .agg(sum_vec, F.count("*").alias("n"))
            .collect()
        )  # K rows: the model, not the data
        model = _mean6_from_rows(rows, "cent_id")
    return model


def kmeans_clusters(
    emb: DataFrame,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    model: list[tuple[int, list[float]]] | None = None,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """Gate-facing k-means summary: final cluster sizes, within-cluster
    mean cosine (spherical inertia analogue) and centroid norms — scalar
    per-cluster facts both engines can hash, instead of raw 64-dim
    arrays whose string renderings differ.

    ``model``: a pre-fitted model (e.g. the registry's memoized fit —
    production systems train an index once and serve many queries);
    must have been fitted with the same (k, iters) on the same corpus."""
    base = emb.select("vec_id", _vec_double().alias("v"))
    model = kmeans_fit_model(emb, k, iters) if model is None else model
    cents = _model_df(emb.sparkSession, model)
    if assigned is None:
        assigned = assign_cells_arrow(base, model)
    return (
        assigned
        .groupBy("cent_id")
        .agg(
            F.count("*").alias("size"),
            F.round(F.avg("csim"), 6).alias("mean_sim"),
        )
        .join(
            cents.select("cent_id", F.round(_norm_expr("cv"), 6).alias("centroid_norm")),
            "cent_id",
        )
        .select(
            F.col("cent_id").alias("cluster_id"), "size", "mean_sim", "centroid_norm"
        )
    )


def ivf_kmeans_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_clusters: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    model: list[tuple[int, list[float]]] | None = None,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """IVF top-k with a LEARNED coarse quantizer: train k-means on the
    corpus, then run the shared probe pipeline against the fitted
    centroids. Same plan as :func:`ivf_topk`, better cells — this is the
    deployment-shaped IVF (VERDICT r1 noted the fixed-centroid variant's
    quantizer was a placeholder)."""
    base = emb.select("vec_id", _vec_double().alias("v"))
    if model is None:
        model = kmeans_fit_model(emb, n_clusters, iters)
    return _ivf_probe(
        base, _model_df(emb.sparkSession, model), query_ids, k,
        model=model, assigned=assigned,
    )


def _kmeans_ctes(k: int = KMEANS_K, iters: int = KMEANS_ITERS,
                 src: str = "embeddings") -> str:
    """DuckDB CTE chain replicating :func:`kmeans_fit`: c0 = seed
    vectors, then per iteration an argmax-cosine assignment CTE and a
    64-column unrolled AVG mean CTE (DuckDB lists are 1-indexed). The
    final centroid table is exposed as ``cents`` (cent_id, cv)."""
    avg_items = _mean6_sql_items("v", EMBED_DIM)
    parts = [
        f"e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {src})",
        f"c0 AS (SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < {k})",
    ]
    for it in range(1, iters + 1):
        parts.append(f"""a{it} AS (
          SELECT vec_id, v, cent_id, csim FROM (
            SELECT e.vec_id, e.v, c.cent_id,
                   ROUND(list_cosine_similarity(e.v, c.cv), 6) AS csim,
                   ROW_NUMBER() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY ROUND(list_cosine_similarity(e.v, c.cv), 6) DESC,
                              c.cent_id ASC) AS rn
            FROM e CROSS JOIN c{it - 1} c
          ) x WHERE rn = 1
        )""")
        parts.append(
            f"c{it} AS (SELECT cent_id, [{avg_items}] AS cv FROM a{it} GROUP BY cent_id)"
        )
    parts.append(f"cents AS (SELECT cent_id, cv FROM c{iters})")
    return ",\n        ".join(parts)


def kmeans_clusters_sql(
    k: int = KMEANS_K, iters: int = KMEANS_ITERS, src: str = "embeddings"
) -> str:
    return f"""
        WITH {_kmeans_ctes(k, iters, src)},
        final AS (
          SELECT vec_id, cent_id, csim FROM (
            SELECT e.vec_id, c.cent_id,
                   ROUND(list_cosine_similarity(e.v, c.cv), 6) AS csim,
                   ROW_NUMBER() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY ROUND(list_cosine_similarity(e.v, c.cv), 6) DESC,
                              c.cent_id ASC) AS rn
            FROM e CROSS JOIN cents c
          ) x WHERE rn = 1
        )
        SELECT final.cent_id AS cluster_id,
               COUNT(*) AS size,
               ROUND(AVG(csim), 6) AS mean_sim,
               ROUND(SQRT(list_dot_product(cents.cv, cents.cv)), 6) AS centroid_norm
        FROM final JOIN cents ON final.cent_id = cents.cent_id
        GROUP BY final.cent_id, cents.cv
    """


def ivf_kmeans_topk_sql(
    query_ids: list[int],
    k: int = 5,
    n_clusters: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    src: str = "embeddings",
) -> str:
    return _ivf_probe_sql(_kmeans_ctes(n_clusters, iters, src), query_ids, k)


def embedding_near_dup(emb: DataFrame, threshold: float = 0.9) -> DataFrame:
    """Embedding-cosine near-duplicate detection = LSH pairs at a high
    threshold (dedup semantics over dense representations)."""
    return lsh_near_pairs(emb, threshold=threshold)


# ------------------------------------------- planted near-dup derivation
NEAR_DUP_SHIFT = 0.05
NEAR_DUP_ID_OFFSET = 1_000_000


def plant_near_dups(
    emb: DataFrame,
    n: int = 40,
    shift: float = NEAR_DUP_SHIFT,
    id_offset: int = NEAR_DUP_ID_OFFSET,
) -> DataFrame:
    """Derive a corpus containing GENUINE near-duplicates so the near-dup
    operator can be exercised at its honest threshold (VERDICT r1: the
    raw fixture's best candidate cosine is ≈0.47, so any 0.9-threshold
    query over it is vacuous).

    Each of the first ``n`` vectors gets a twin with every component
    shifted by a constant (+0.05): cosine(v, v + 0.05·1) lands at
    0.92-0.94 on this fixture — true near-dup territory — while
    unrelated pairs stay below 0.5. The shift happens AFTER the cast to
    double, a single IEEE add per component, so the DuckDB twin
    (:func:`near_dup_src_sql`) reproduces it bit-identically."""
    base = emb.select("vec_id", _vec_double().alias("embedding"))
    dups = base.filter(F.col("vec_id") < n).select(
        (F.col("vec_id") + id_offset).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(shift)).alias("embedding"),
    )
    return base.unionByName(dups)


def near_dup_src_sql(
    n: int = 40,
    shift: float = NEAR_DUP_SHIFT,
    id_offset: int = NEAR_DUP_ID_OFFSET,
    src: str = "embeddings",
) -> str:
    """DuckDB twin of :func:`plant_near_dups`, usable as the ``src`` of
    :func:`lsh_near_pairs_sql`."""
    return (
        f"(SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM {src} "
        f"UNION ALL "
        f"SELECT vec_id + {id_offset}, "
        f"list_transform(CAST(embedding AS DOUBLE[]), x -> x + {shift}) "
        f"FROM {src} WHERE vec_id < {n}) planted"
    )


# ------------------------------------------------------- semantic dedup
def semantic_dedup(
    emb: DataFrame,
    threshold: float = 0.9,
    k: int = KMEANS_K,
    iters: int = 1,
    model: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embeddings with the k-means coarse
    quantizer, compare pairs ONLY within a cluster, and greedily keep
    the lowest ``vec_id`` of every semantic-duplicate pair.

    Output: ``(vec_id, cluster_id, is_kept)`` — ``is_kept`` is FALSE iff
    some lower-id vector in the SAME cluster has cosine >= threshold.

    Scale posture: the pairwise stage is an equi-join keyed on
    ``cent_id`` — cost Σ|cell|², never corpus² — and ``k`` is the knob
    that bounds |cell| (at 100 TB you raise k until cells are
    executor-sized; the paper clusters 5B embeddings into 11k cells).
    The keep rule is one join-shaped decision, not an iterative
    connected-components pass: dropping every non-minimum member of a
    duplicate pair is the paper's policy and costs a single shuffle.
    Cross-cluster duplicates are deliberately never compared (the
    documented SemDeDup recall trade-off); the choice is deterministic
    — 6dp-rounded cosines, cent_id tie-break — so the DuckDB twin
    (:func:`semantic_dedup_sql`) reproduces every keep/drop decision.

    The assignment subplan (an Arrow kernel pass) feeds both sides of
    the pair join and the final projection; exchange reuse does not
    fire across the aliased branches, so the (vec_id, v, cent_id) table
    is :func:`~.partitioning.materialize`'d once — nothing is persisted
    in the block manager.

    The reference stops at set-algebra dedup of segment memberships
    (SURVEY.md §2.4); embedding-level corpus dedup is part of the
    LLM-pipeline extension mandated by BASELINE.json.
    """
    from .partitioning import materialize, spread

    # spread BEFORE the Arrow kernel: the single-file fixture scan (and
    # the AQE-coalesced tail of derived inputs) otherwise runs the whole
    # assignment pass in ONE Python task; no-op on multi-split tables
    base = spread(emb).select("vec_id", _vec_double().alias("v"))
    if model is None:
        model = kmeans_fit_model(emb, k, iters)

    assigned = materialize(
        assign_cells_arrow(base, model, keep_vec=True).select(
            "vec_id", "v", "cent_id"
        )
    )
    a = assigned.select(
        "cent_id", F.col("vec_id").alias("a_id"), F.col("v").alias("va")
    )
    b = assigned.select(
        "cent_id", F.col("vec_id").alias("b_id"), F.col("v").alias("vb")
    )
    dropped = (
        a.join(b, "cent_id")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(
            F.round(cosine_similarity(F.col("va"), F.col("vb")), 6)
            >= threshold
        )
        .select(F.col("b_id").alias("vec_id"))
        .distinct()
        .withColumn("dup", F.lit(True))
    )
    return assigned.join(dropped, "vec_id", "left").select(
        "vec_id",
        F.col("cent_id").alias("cluster_id"),
        F.col("dup").isNull().alias("is_kept"),
    )


def semantic_dedup_sql(
    threshold: float = 0.9,
    k: int = KMEANS_K,
    iters: int = 1,
    src: str = "embeddings",
) -> str:
    """DuckDB twin of :func:`semantic_dedup`: same k-means CTE chain,
    same argmax-cosine assignment, same within-cluster pair predicate
    and keep-min-id rule."""
    return f"""
        WITH {_kmeans_ctes(k, iters, src)},
        assigned AS (
          SELECT vec_id, v, cent_id FROM (
            SELECT e.vec_id, e.v, c.cent_id,
                   ROW_NUMBER() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY ROUND(list_cosine_similarity(e.v, c.cv), 6) DESC,
                              c.cent_id ASC) AS rn
            FROM e CROSS JOIN cents c
          ) x WHERE rn = 1
        ),
        dropped AS (
          SELECT DISTINCT y.vec_id
          FROM assigned x JOIN assigned y
            ON x.cent_id = y.cent_id AND x.vec_id < y.vec_id
          WHERE ROUND(list_cosine_similarity(x.v, y.v), 6) >= {threshold}
        )
        SELECT a.vec_id, a.cent_id AS cluster_id,
               dropped.vec_id IS NULL AS is_kept
        FROM assigned a LEFT JOIN dropped ON a.vec_id = dropped.vec_id
    """


def assign_cells_arrow(
    base: DataFrame, model: list[tuple[int, list[float]]], keep_vec: bool = False
) -> DataFrame:
    """Production twin of :func:`_assign_inline` (same output columns
    minus the carried vector unless ``keep_vec``): the argmax-cosine
    assignment as numpy
    over Arrow batches — vectorized across rows, SEQUENTIAL across dims,
    so every dot/norm is the identical left-associative IEEE sum and the
    result is bit-equal to the inline path (test-pinned). Use when the
    janino fallback of the K x dim literal projection matters (large
    corpora); the inline path remains the oracle-gated reference.

    ``keep_vec=True`` passes the vector column through the Arrow batch,
    for consumers (the k-means mean step, IVF probe scans) that need
    (v, cent_id) together without a join back to the scan.

    HALF_UP 6dp is emulated sign-aware (round-half-away-from-zero) since
    cosines can be negative."""
    import numpy as np

    if not model:
        out = (
            base.withColumn("cent_id", F.lit(None).cast("bigint"))
            .withColumn("csim", F.lit(None).cast("double"))
            .filter(F.lit(False))
        )
        cols = ["vec_id", "v", "cent_id", "csim"] if keep_vec else [
            "vec_id", "cent_id", "csim"
        ]
        return out.select(*cols)

    # sort by cent_id so the strict-> tie-break resolves to the LOWEST
    # cent_id exactly like _assign_inline's struct order, regardless of
    # the caller's list order
    cents = [(cid, np.array(cv, dtype=np.float64)) for cid, cv in sorted(model)]

    def half_up(x: "np.ndarray") -> "np.ndarray":
        return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6

    def assign(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.vstack(pdf["v"].to_numpy())
            nv = np.zeros(len(X))
            for i in range(X.shape[1]):
                nv = nv + X[:, i] * X[:, i]
            nv = np.sqrt(nv)
            best_s = None
            best_c = None
            for cid, cv in cents:
                ncv = 0.0
                for x in cv:
                    ncv = ncv + x * x
                ncv = float(np.sqrt(ncv))
                dot = np.zeros(len(X))
                for i in range(X.shape[1]):
                    dot = dot + X[:, i] * cv[i]
                csim = half_up(dot / (nv * ncv))
                if best_s is None:
                    best_s = csim
                    best_c = np.full(len(X), cid, dtype=np.int64)
                else:
                    m = csim > best_s  # strict: ties keep the lower cent_id
                    best_s = np.where(m, csim, best_s)
                    best_c = np.where(m, np.int64(cid), best_c)
            out = {"vec_id": pdf["vec_id"]}
            if keep_vec:
                out["v"] = pdf["v"]
            out["cent_id"] = best_c
            out["csim"] = best_s
            yield pd.DataFrame(out)

    import pandas as pd  # noqa: F811 — late import, closure resolves it

    schema = (
        "vec_id long, v array<double>, cent_id long, csim double"
        if keep_vec
        else "vec_id long, cent_id long, csim double"
    )
    return base.select("vec_id", "v").mapInPandas(assign, schema=schema)


# ----------------------------------------------------- range search
def cosine_range_search(
    emb: DataFrame, query_ids: list[int], threshold: float = 0.3
) -> DataFrame:
    """Range search: ALL neighbors within cosine >= threshold of each
    query (self excluded) — the dual of top-k (radius fixed, count
    open), used for recall-critical retrieval where a k cutoff would
    truncate dense neighborhoods. Same broadcast-queries scan shape as
    :func:`cosine_topk`; no window at all, so the whole query is one
    narrow scan over the corpus."""
    base = emb.select("vec_id", _vec_double().alias("v"))
    queries = base.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("q")
    )
    from ..functions import cosine_similarity

    return (
        base.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine_similarity(F.col("q"), F.col("v")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def cosine_range_search_sql(
    query_ids: list[int], threshold: float = 0.3, src: str = "embeddings"
) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {src}),
        q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id IN ({ids}))
        SELECT q.query_id, e.vec_id AS neighbor_id,
               ROUND(list_cosine_similarity(q.qv, e.v), 6) AS cosine
        FROM e CROSS JOIN q
        WHERE e.vec_id != q.query_id
          AND ROUND(list_cosine_similarity(q.qv, e.v), 6) >= {threshold}
    """


# ------------------------------------------------------- norm profile
def norm_stats_by_label(emb: DataFrame) -> DataFrame:
    """Per-label L2-norm profile of the embedding column: count and
    min/max/mean of the (6dp-rounded) vector norms — the drift check an
    embedding pipeline runs after every encoder change (a label whose
    norm band shifts was embedded differently). One narrow map (norms
    are per-row, left-assoc IEEE identical to the SQL twin) + one
    map-side-combinable aggregate; min/max are order-free over rounded
    values, the mean is rounded to 4dp on both engines."""
    norm = F.round(_norm_expr("v"), 6)
    return (
        emb.select("label", _vec_double().alias("v"))
        .select("label", norm.alias("nrm"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            F.min("nrm").alias("min_norm"),
            F.max("nrm").alias("max_norm"),
            F.round(F.avg("nrm"), 4).alias("avg_norm"),
        )
    )


def norm_stats_by_label_sql(src: str = "embeddings") -> str:
    sq = " + ".join(f"v[{i + 1}] * v[{i + 1}]" for i in range(EMBED_DIM))
    return f"""
        WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM {src}),
        n AS (SELECT label, ROUND(SQRT({sq}), 6) AS nrm FROM e)
        SELECT label, COUNT(*) AS n_vectors,
               MIN(nrm) AS min_norm, MAX(nrm) AS max_norm,
               ROUND(AVG(nrm), 4) AS avg_norm
        FROM n GROUP BY label
    """


# ------------------------------------------------------- retrieval QA
def recall_eval(
    emb: DataFrame, query_ids: list[int], k: int = 5
) -> DataFrame:
    """Recall@k of the probed IVF path against the exact scan — the QA
    number every ANN deployment tracks before trading recall for probe
    count. Output: (query_id, hits, recall_at_k).

    Plan shape: both sides are tiny (|queries| x k rows), so the compare
    join and the per-query aggregate are driver-scale no matter the
    corpus size; the cost is the two retrieval plans themselves, which
    are the operators under test."""
    exact = cosine_topk(emb, query_ids, k).select("query_id", "neighbor_id")
    approx = ivf_topk(emb, query_ids, k).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    return (
        exact.join(approx, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("hit").alias("hits"),
            F.round(F.count("hit") / F.lit(float(k)), 4).alias("recall_at_k"),
        )
    )


def recall_eval_sql(
    query_ids: list[int], k: int = 5, src: str = "embeddings"
) -> str:
    exact = cosine_topk_sql(query_ids, k, src)
    approx = ivf_topk_sql(query_ids, k, src)
    return f"""
        SELECT e.query_id,
               COUNT(a.neighbor_id) AS hits,
               ROUND(COUNT(a.neighbor_id) / CAST({k} AS DOUBLE), 4)
                 AS recall_at_k
        FROM ({exact}) e
        LEFT JOIN ({approx}) a
          ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
        GROUP BY e.query_id
    """



# ----------------------------------------------------- ranking-quality eval
# 1/log2(i+1) position discounts, floor(x*1e9 + 0.5) — mathematical
# constants inlined so no cross-engine libm call sits in the contract.
NDCG_DISCOUNT_E9 = {
    1: 1000000000,
    2: 630929754,
    3: 500000000,
    4: 430676558,
    5: 386852807,
    6: 356207187,
    7: 333333333,
    8: 315464877,
    9: 301029996,
    10: 289064826,
}


def ndcg_eval(emb: DataFrame, query_ids: list[int], k: int = 10) -> DataFrame:
    """nDCG@k of the probed IVF ranking against the exact scan — the
    *order-aware* companion to :func:`recall_eval` (recall@k can't tell
    "found all k but scrambled" from "perfect"; production retrieval
    dashboards track both). Graded relevance of a returned neighbor is
    its exact-scan standing: ``rel = k + 1 - exact_rank`` (the true
    nearest is worth k, the k-th is worth 1, anything outside the exact
    top-k is worth 0).

    Determinism: relevances and position discounts are exact integers
    (discounts are the inlined e9 constants above), so DCG is an exact
    bigint sum; the ideal DCG is the same constant on both engines
    (the exact list always has k graded items); one floor-scaled e6
    division at the edge.

    Shape at scale: the compare join is |queries| x k rows regardless
    of corpus size — the cost is the two retrieval plans under test."""
    idcg = sum((k + 1 - i) * NDCG_DISCOUNT_E9[i] for i in range(1, k + 1))
    exact = cosine_topk(emb, query_ids, k).select(
        "query_id",
        "neighbor_id",
        (F.lit(k + 1) - F.col("rank")).cast("long").alias("rel"),
    )
    disc = F.create_map(
        *[
            F.lit(x)
            for i in range(1, k + 1)
            for x in (i, NDCG_DISCOUNT_E9[i])
        ]
    )
    approx = ivf_topk(emb, query_ids, k).select(
        "query_id", "neighbor_id", disc[F.col("rank")].alias("disc_e9")
    )
    return (
        approx.join(exact, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.sum(
                F.coalesce(F.col("rel"), F.lit(0)) * F.col("disc_e9")
            ).alias("dcg_e9"),
            F.count(F.col("rel")).alias("graded_hits"),
        )
        .select(
            "query_id",
            "dcg_e9",
            F.col("graded_hits").cast("long").alias("graded_hits"),
            F.expr(
                f"CAST(floor(dcg_e9 / CAST({idcg} AS DOUBLE) * 1e6 + 0.5)"
                " AS BIGINT)"
            ).alias("ndcg_e6"),
        )
    )


def ndcg_eval_sql(
    query_ids: list[int], k: int = 10, src: str = "embeddings"
) -> str:
    idcg = sum((k + 1 - i) * NDCG_DISCOUNT_E9[i] for i in range(1, k + 1))
    disc_rows = ", ".join(
        f"({i}, {NDCG_DISCOUNT_E9[i]})" for i in range(1, k + 1)
    )
    exact = cosine_topk_sql(query_ids, k, src)
    approx = ivf_topk_sql(query_ids, k, src)
    return f"""
        WITH disc(pos, disc_e9) AS (VALUES {disc_rows}),
        ex AS (
          SELECT query_id, neighbor_id,
                 CAST({k} + 1 - rank AS BIGINT) AS rel
          FROM ({exact})
        ),
        ap AS (
          SELECT a.query_id, a.neighbor_id, d.disc_e9
          FROM ({approx}) a JOIN disc d ON d.pos = a.rank
        )
        SELECT ap.query_id,
               CAST(SUM(COALESCE(ex.rel, 0) * ap.disc_e9) AS BIGINT)
                 AS dcg_e9,
               CAST(COUNT(ex.rel) AS BIGINT) AS graded_hits,
               CAST(floor(SUM(COALESCE(ex.rel, 0) * ap.disc_e9)
                          / CAST({idcg} AS DOUBLE) * 1e6 + 0.5) AS BIGINT)
                 AS ndcg_e6
        FROM ap LEFT JOIN ex
          ON ex.query_id = ap.query_id AND ex.neighbor_id = ap.neighbor_id
        GROUP BY ap.query_id
    """



# ------------------------------------------------------ MMR diverse rerank
MMR_POOL = 15  # candidate shortlist per query fed to the greedy


def mmr_rerank_topk(
    emb: DataFrame, query_ids: list[int], k: int = 5, pool: int = MMR_POOL
) -> DataFrame:
    """Maximal-Marginal-Relevance re-ranking (Carbonell & Goldstein,
    SIGIR'98): from each query's exact top-``pool`` shortlist, greedily
    pick k results maximizing ``λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s)``
    — the diversification stage a RAG retriever runs so the k passages
    aren't five near-copies of the same chunk.

    Determinism contract: λ = 0.7 is held as INTEGERS (score10_e6 =
    ``7·sim_e6 − 3·max_red_e6`` over e6-quantized similarities), and the
    greedy argmax tie-breaks on neighbor_id — so the whole sequential
    selection is exact integer arithmetic, replayed step-for-step by a
    DuckDB recursive-CTE twin (LATERAL argmax per step). The sequential
    dependence is *inherent* to MMR (pick r depends on picks 1..r−1);
    it runs per query over a ≤pool-row group — the sanctioned
    custom-stateful shape (Holt/KM precedent), cogrouped applyInPandas.

    Shape at scale: the two retrieval joins build |q|·pool shortlist rows
    and |q|·pool² pairwise rows (ids + e6 ints, never vectors after
    scoring); the Python greedy touches only those."""
    cands = cosine_topk(emb, query_ids, pool).select(
        "query_id",
        "neighbor_id",
        F.expr("CAST(floor(cosine * 1e6 + 0.5) AS BIGINT)").alias("sim_e6"),
    )
    base = emb.select("vec_id", _vec_double().alias("v"))
    pa, pb = cands.alias("pa"), cands.alias("pb")
    pairs = (
        pa.join(
            pb,
            (F.col("pa.query_id") == F.col("pb.query_id"))
            & (F.col("pa.neighbor_id") != F.col("pb.neighbor_id")),
        )
        .select(
            F.col("pa.query_id").alias("query_id"),
            F.col("pa.neighbor_id").alias("a_id"),
            F.col("pb.neighbor_id").alias("b_id"),
        )
        .join(base.select(F.col("vec_id").alias("a_id"), F.col("v").alias("va")), "a_id")
        .join(base.select(F.col("vec_id").alias("b_id"), F.col("v").alias("vb")), "b_id")
        .withColumn(
            "pair_cos",
            F.round(cosine_similarity(F.col("va"), F.col("vb")), 6),
        )
        .select(
            "query_id",
            "a_id",
            "b_id",
            F.expr(
                "CAST(floor(pair_cos * 1e6 + 0.5) AS BIGINT)"
            ).alias("pair_e6"),
        )
    )

    def greedy(cdf: pd.DataFrame, pdf: pd.DataFrame) -> pd.DataFrame:
        if cdf.empty:
            return pd.DataFrame(
                columns=["query_id", "neighbor_id", "pick_rank", "score10_e6"]
            )
        qid = int(cdf["query_id"].iloc[0])
        sims = {
            int(n): int(s)
            for n, s in zip(cdf["neighbor_id"], cdf["sim_e6"])
        }
        pair = {
            (int(r_a), int(r_b)): int(p)
            for r_a, r_b, p in zip(pdf["a_id"], pdf["b_id"], pdf["pair_e6"])
        }
        picked: list[int] = []
        out = []
        while len(picked) < min(k, len(sims)):
            best_nid, best_score = None, None
            for nid in sims:
                if nid in picked:
                    continue
                red = max((pair[(nid, p)] for p in picked), default=0)
                score = 7 * sims[nid] - 3 * red
                if (
                    best_score is None
                    or score > best_score
                    or (score == best_score and nid < best_nid)
                ):
                    best_nid, best_score = nid, score
            picked.append(best_nid)
            out.append((qid, best_nid, len(picked), best_score))
        return pd.DataFrame(
            out, columns=["query_id", "neighbor_id", "pick_rank", "score10_e6"]
        )

    return (
        cands.groupBy("query_id")
        .cogroup(pairs.groupBy("query_id"))
        .applyInPandas(
            greedy,
            "query_id long, neighbor_id long, pick_rank int, score10_e6 long",
        )
    )


def mmr_rerank_topk_sql(
    query_ids: list[int],
    k: int = 5,
    pool: int = MMR_POOL,
    src: str = "embeddings",
) -> str:
    shortlist = cosine_topk_sql(query_ids, pool, src)
    return f"""
        WITH RECURSIVE cand AS MATERIALIZED (
          SELECT query_id, neighbor_id,
                 CAST(floor(cosine * 1e6 + 0.5) AS BIGINT) AS sim_e6
          FROM ({shortlist})
        ),
        vecs AS MATERIALIZED (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {src}
        ),
        cpair AS MATERIALIZED (
          SELECT a.query_id, a.neighbor_id AS a_id, b.neighbor_id AS b_id,
                 CAST(floor(ROUND(list_cosine_similarity(va.v, vb.v), 6)
                            * 1e6 + 0.5) AS BIGINT) AS pair_e6
          FROM cand a
          JOIN cand b ON b.query_id = a.query_id
                     AND b.neighbor_id != a.neighbor_id
          JOIN vecs va ON va.vec_id = a.neighbor_id
          JOIN vecs vb ON vb.vec_id = b.neighbor_id
        ),
        sel AS (
          SELECT query_id, neighbor_id, 1 AS pick_rank,
                 7 * sim_e6 AS score10_e6,
                 [neighbor_id] AS picked
          FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY sim_e6 DESC, neighbor_id) AS rn
            FROM cand
          ) b WHERE rn = 1
          UNION ALL
          SELECT s.query_id, best.neighbor_id, s.pick_rank + 1,
                 best.score10_e6, list_append(s.picked, best.neighbor_id)
          FROM sel s, LATERAL (
            SELECT c.neighbor_id,
                   7 * c.sim_e6 - 3 * COALESCE((
                     SELECT MAX(p.pair_e6) FROM cpair p
                     WHERE p.query_id = s.query_id
                       AND p.a_id = c.neighbor_id
                       AND list_contains(s.picked, p.b_id)), 0) AS score10_e6
            FROM cand c
            WHERE c.query_id = s.query_id
              AND NOT list_contains(s.picked, c.neighbor_id)
            ORDER BY score10_e6 DESC, c.neighbor_id
            LIMIT 1
          ) best
          WHERE s.pick_rank < {int(k)}
        )
        SELECT query_id, CAST(neighbor_id AS BIGINT) AS neighbor_id,
               CAST(pick_rank AS INTEGER) AS pick_rank,
               CAST(score10_e6 AS BIGINT) AS score10_e6
        FROM sel
    """


# --------------------------------------- Johnson-Lindenstrauss projection
JL_OUT_DIM = 16


def _jl_signs() -> list[list[int]]:
    """Deterministic ±1 Rademacher projection matrix (JL_OUT_DIM x
    EMBED_DIM), derived from the same LCG family as the MinHash/LSH
    constants — shared verbatim with the SQL twin."""
    signs = []
    state = 0x9E3779B97F4A7C15
    for _ in range(JL_OUT_DIM):
        row = []
        for _ in range(EMBED_DIM):
            state = (state * 6_364_136_223_846_793_005 + 1_442_695_040_888_963_407) % (
                2**63
            )
            row.append(1 if (state >> 32) & 1 else -1)
        signs.append(row)
    return signs


JL_SIGNS = _jl_signs()


def _jl_dot_terms(row: list[int], idx) -> str:
    # identical string for both engines apart from the indexing base;
    # left-assoc chain keeps the IEEE summation order shared
    return " ".join(
        ("+ " if s > 0 else "- ") + idx(i) for i, s in enumerate(row)
    ).lstrip("+ ")


def jl_distortion(emb: DataFrame) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction audit: project
    every embedding 64 → 16 dims through a deterministic Rademacher ±1
    matrix (scaled 1/sqrt(k)) and report the per-vector norm distortion
    ``|f(v)| / |v|`` — the metric that decides whether the reduced space
    is safe to run ANN in (JL guarantees distortion ≈ 1 ± ε w.h.p.).

    Because entries are ±1, each projected coordinate is a pure
    ADD/SUBTRACT chain over the input — no multiplies — and the whole
    audit is ONE whole-stage-codegen projection per row: no shuffle, no
    UDF, embarrassingly parallel at any corpus size. Both engines
    evaluate the identical left-associative chains, so distortion is
    deterministic cross-engine at 6dp."""
    base = emb.select("vec_id", _vec_double().alias("v"))
    dots = [
        f"({_jl_dot_terms(row, lambda i: f'v[{i}]')})" for row in JL_SIGNS
    ]
    proj_sq = " + ".join(f"{d} * {d}" for d in dots)
    return base.select(
        "vec_id",
        F.round(_norm_expr("v"), 6).alias("norm_orig"),
        F.round(
            F.expr(f"sqrt(({proj_sq}) / {JL_OUT_DIM})"), 6
        ).alias("norm_jl"),
        F.round(
            F.expr(f"sqrt(({proj_sq}) / {JL_OUT_DIM})") / _norm_expr("v"), 6
        ).alias("distortion"),
    )


def jl_distortion_sql(src: str = "embeddings") -> str:
    dots = [
        f"({_jl_dot_terms(row, lambda i: f'v[{i + 1}]')})" for row in JL_SIGNS
    ]
    proj_sq = " + ".join(f"{d} * {d}" for d in dots)
    norm = "SQRT(" + " + ".join(
        f"v[{i + 1}] * v[{i + 1}]" for i in range(EMBED_DIM)
    ) + ")"
    return f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {src})
        SELECT vec_id,
               ROUND({norm}, 6) AS norm_orig,
               ROUND(SQRT(({proj_sq}) / {JL_OUT_DIM}), 6) AS norm_jl,
               ROUND(SQRT(({proj_sq}) / {JL_OUT_DIM}) / {norm}, 6)
                 AS distortion
        FROM e
    """


# --------------------------------------- k-center diversity selection
KCENTER_K = 8


def kcenter_select(emb: DataFrame, k: int = KCENTER_K) -> DataFrame:
    """Greedy farthest-point (Gonzalez k-center) selection: pick the
    min-id vector as the seed, then repeatedly add the vector FARTHEST
    (lowest max-cosine) from the chosen set — the classic 2-approx
    core-set that training-data curation uses to pick a maximally
    DIVERSE exemplar subset (the opposite pull of SemDeDup's
    redundancy removal).

    Scale shape: per round, one narrow Arrow-kernel assignment pass
    (:func:`assign_cells_arrow` against the ≤k chosen vectors — no
    shuffle) and a TakeOrdered(1) to elect the farthest vector; driver
    state is the chosen set, O(k × dim), exactly the k-means model
    discipline. k rounds total — the corpus is scanned k times but
    never shuffled.

    Output: every vector assigned to its nearest center (max rounded
    cosine, ties to the lowest center id), with the cosine DISTANCE and
    an ``is_center`` flag. Deterministic cross-engine: the same 6dp
    quantization + tie-break contract the k-means family certifies.

    Precondition: ``k`` must not exceed the number of distinct vectors
    (with fewer vectors than k the greedy loop would re-elect an
    already-chosen point and the SQL twin, which unrolls exactly k
    stages, would diverge).
    """
    base = emb.select("vec_id", _vec_double().alias("v"))
    seed = base.orderBy(F.asc("vec_id")).limit(1).collect()[0]
    chosen: list[tuple[int, list[float]]] = [
        (int(seed.vec_id), [float(x) for x in seed.v])
    ]
    for _ in range(k - 1):
        nxt = (
            assign_cells_arrow(base, chosen, keep_vec=True)
            .orderBy(F.asc("csim"), F.asc("vec_id"))
            .limit(1)
            .collect()[0]
        )
        chosen.append((int(nxt.vec_id), [float(x) for x in nxt.v]))
        chosen.sort()
    final = assign_cells_arrow(base, chosen)
    return final.select(
        "vec_id",
        F.col("cent_id").alias("center_id"),
        F.round(F.lit(1.0) - F.col("csim"), 6).alias("dist"),
        (F.col("vec_id") == F.col("cent_id")).alias("is_center"),
    )


def kcenter_select_sql(k: int = KCENTER_K, src: str = "embeddings") -> str:
    """DuckDB twin of :func:`kcenter_select`: the greedy loop unrolled
    as CTE stages — per round an argmax-cosine assignment against the
    accumulated chosen set and a LIMIT-1 farthest election."""

    def assign(i: int) -> str:
        return f"""a{i} AS (
          SELECT vec_id, v, cent_id, csim FROM (
            SELECT e.vec_id, e.v, c.cent_id,
                   ROUND(list_cosine_similarity(e.v, c.cv), 6) AS csim,
                   ROW_NUMBER() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY ROUND(list_cosine_similarity(e.v, c.cv), 6) DESC,
                              c.cent_id ASC) AS rn
            FROM e CROSS JOIN ch{i} c
          ) x WHERE rn = 1
        )"""

    parts = [
        f"e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {src})",
        "ch1 AS (SELECT vec_id AS cent_id, v AS cv FROM e "
        "WHERE vec_id = (SELECT MIN(vec_id) FROM e))",
    ]
    for i in range(1, k):
        parts.append(assign(i))
        parts.append(
            f"n{i} AS (SELECT vec_id FROM a{i} "
            f"ORDER BY csim ASC, vec_id ASC LIMIT 1)"
        )
        parts.append(
            f"ch{i + 1} AS (SELECT cent_id, cv FROM ch{i} UNION ALL "
            f"SELECT e.vec_id, e.v FROM e JOIN n{i} USING (vec_id))"
        )
    parts.append(assign(k))
    ctes = ",\n        ".join(parts)
    return f"""
        WITH {ctes}
        SELECT vec_id, cent_id AS center_id,
               ROUND(1.0 - csim, 6) AS dist,
               vec_id = cent_id AS is_center
        FROM a{k}
    """


# ----------------------------------------------- PCA variance audit
def pca_variance(emb: DataFrame, k: int = 8) -> list[tuple[int, float, float]]:
    """Principal-component variance profile of the embedding corpus —
    the intrinsic-dimensionality QA an embedding pipeline runs before
    committing to quantizers or dimension reduction (a spectrum where a
    handful of components carry everything says the encoder collapsed;
    a flat tail says JL/PQ budgets can shrink).

    Returns ``[(component, eigenvalue, explained_ratio)]`` for the top
    ``k`` components. Distributed part: per-batch Gram matrix
    ``X^T X``, column sums and counts via an Arrow kernel (numpy outer
    products at memory bandwidth), reduced by ONE Spark aggregate over
    the flattened dim² array — the shuffle carries dim² doubles per
    partition, never rows. Driver part: assemble the covariance from
    the reduced moments and eigendecompose — O(dim³) on dim=64, model
    state only. The eigen step is why this is a test-pinned operator
    (no SQL twin): no ANSI-SQL engine expresses eigenvalues.
    """
    import numpy as np

    d = EMBED_DIM
    base = emb.select(_vec_double().alias("v"))

    def moments(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.vstack(pdf["v"].to_numpy())
            g = X.T @ X  # dim x dim
            yield pd.DataFrame(
                {
                    "n": [float(len(X))],
                    "sums": [X.sum(axis=0).tolist()],
                    "gram": [g.flatten().tolist()],
                }
            )

    from .partitioning import materialize

    # one row PER BATCH survives the kernel; materialize so the three
    # tiny reductions below share one corpus pass. The gram reduction
    # goes through posexplode + groupBy — a dim²-row shuffle — instead
    # of a dim²-column aggregate (4096 codegen'd sum expressions stall
    # janino and the plan builder; measured 87 s → 9 s at dim=64)
    part = materialize(
        base.mapInPandas(
            moments, schema="n double, sums array<double>, gram array<double>"
        )
    )
    n = float(part.agg(F.sum("n")).collect()[0][0])
    sums = {
        r["pos"]: r["s"]
        for r in part.select(F.posexplode("sums").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.sum("x").alias("s"))
        .collect()
    }
    gram_rows = {
        r["pos"]: r["s"]
        for r in part.select(F.posexplode("gram").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.sum("x").alias("s"))
        .collect()
    }
    mu = np.array([sums[i] for i in range(d)]) / n
    gram = np.array([gram_rows[i] for i in range(d * d)]).reshape(d, d)
    cov = gram / n - np.outer(mu, mu)
    evals = np.linalg.eigvalsh(cov)[::-1]  # descending
    total = float(evals.sum())
    return [
        (i, float(evals[i]), float(evals[i] / total))
        for i in range(min(k, d))
    ]


# ------------------------------------------- label centroid separation
def label_centroid_separation(emb: DataFrame) -> DataFrame:
    """Inter-class separation QA: the pairwise cosine between per-label
    MEAN vectors — the companion to :func:`norm_stats_by_label` (norms
    say the encoder's scale drifted; centroid cosines say the classes
    COLLAPSED: two labels whose centroids read ≈1.0 are
    indistinguishable to any downstream classifier or ANN filter).

    One label-keyed aggregate reduces the corpus to |labels| centroid
    rows (EMBED_DIM codegen'd avgs, map-side combinable, 6dp-quantized
    like the k-means means); the pairwise stage is a |labels|² driver-
    scale cross of that tiny table. Same rounded-cosine contract the
    k-means family certifies."""
    mean_vec = F.expr(
        "array(" + _mean6_spark_items("v", EMBED_DIM) + ")"
    ).alias("cv")
    cents = (
        emb.select("label", _vec_double().alias("v"))
        .groupBy("label")
        .agg(mean_vec)
    )
    a = cents.select(F.col("label").alias("label_a"), F.col("cv").alias("va"))
    b = cents.select(F.col("label").alias("label_b"), F.col("cv").alias("vb"))
    return (
        a.join(b, F.col("label_a") < F.col("label_b"))
        .select(
            "label_a",
            "label_b",
            F.round(
                _dot_expr("va", "vb")
                / (_norm_expr("va") * _norm_expr("vb")),
                6,
            ).alias("centroid_cosine"),
        )
    )


def label_centroid_separation_sql(src: str = "embeddings") -> str:
    avg_items = _mean6_sql_items("v", EMBED_DIM)
    return f"""
        WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM {src}),
        cents AS (
          SELECT label, [{avg_items}] AS cv FROM e GROUP BY label
        )
        SELECT a.label AS label_a, b.label AS label_b,
               ROUND(list_cosine_similarity(a.cv, b.cv), 6)
                 AS centroid_cosine
        FROM cents a JOIN cents b ON a.label < b.label
    """


# ------------------------------------------------- IVF probe-count sweep
def ivf_probe_sweep(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    probe_counts: tuple[int, ...] = (1, 2, 4),
) -> DataFrame:
    """Recall@k per probe count — the IVF TUNING CURVE (recall rises
    with probes, cost rises linearly; a deployment picks the knee).
    One row per sweep point: (n_probes, n_queries, mean_recall).

    The corpus is cell-assigned ONCE (the assignment table is
    :func:`~.partitioning.materialize`'d and shared by every sweep
    point — re-assigning per probe count would multiply the dominant
    cost by |sweep|); each sweep point then only re-runs the
    probe-selection + in-cell scoring, whose cost is the point being
    measured. The exact top-k baseline is likewise computed once."""
    from .partitioning import materialize

    base = emb.select("vec_id", _vec_double().alias("v"))
    model = [
        (int(r["vec_id"]), [float(x) for x in r["v"]])
        for r in base.filter(F.col("vec_id") < IVF_CENTROIDS).collect()
    ]
    cents = _model_df(emb.sparkSession, model)
    assigned = materialize(
        assign_cells_arrow(base, model, keep_vec=True).select(
            "vec_id", "v", "cent_id"
        )
    )
    exact = materialize(
        cosine_topk(emb, query_ids, k).select("query_id", "neighbor_id")
    )
    outs = []
    for p in probe_counts:
        approx = _ivf_probe(
            base, cents, query_ids, k, n_probes=p, assigned=assigned
        ).select("query_id", "neighbor_id", F.lit(1).alias("hit"))
        outs.append(
            exact.join(approx, ["query_id", "neighbor_id"], "left").agg(
                F.lit(p).cast("int").alias("n_probes"),
                F.countDistinct("query_id").cast("long").alias("n_queries"),
                F.round(
                    F.count("hit")
                    / (F.lit(float(k)) * F.countDistinct("query_id")),
                    4,
                ).alias("mean_recall"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def ivf_probe_sweep_sql(
    query_ids: list[int],
    k: int = 5,
    probe_counts: tuple[int, ...] = (1, 2, 4),
    src: str = "embeddings",
) -> str:
    exact = cosine_topk_sql(query_ids, k, src)
    prefix = f"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {src}),
        cents AS (
          SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < {IVF_CENTROIDS}
        )"""
    points = []
    for p in probe_counts:
        approx = _ivf_probe_sql(prefix, query_ids, k, n_probes=p)
        points.append(
            f"""
        SELECT CAST({p} AS INTEGER) AS n_probes,
               CAST(COUNT(DISTINCT x.query_id) AS BIGINT) AS n_queries,
               ROUND(COUNT(a.neighbor_id)
                     / (CAST({k} AS DOUBLE) * COUNT(DISTINCT x.query_id)), 4)
                 AS mean_recall
        FROM ({exact}) x
        LEFT JOIN ({approx}) a
          ON x.query_id = a.query_id AND x.neighbor_id = a.neighbor_id
        """
        )
    return " UNION ALL ".join(points)


# --------------------------------------------- embedding snapshot drift
def snapshot_drift(emb: DataFrame) -> DataFrame:
    """Embedding-distribution drift between two corpus snapshots — the
    monitoring gate a production retrieval/dedup stack runs when the
    encoder or the corpus changes (silent encoder drift quietly breaks
    every cached ANN index and SemDeDup threshold downstream). Per
    label: both snapshots' sizes, the L2 distance between their
    centroids, and the mean-norm delta. Snapshots here are the vec_id
    parity split (a deterministic stand-in for version tags — swap in a
    real ``snapshot`` column at parity).

    Determinism: centroids and mean norms ride the order-free exact-
    integer contract (floor-scaled decimal sums, ONE half-up rounding —
    the block above ``KMEANS_K``), so both engines compute bit-identical
    model state on any partitioning; the drift distance is then a fixed
    left-associative expression over 6dp-exact operands.

    Shape at scale: ONE corpus scan into a (label, side)-keyed
    map-side-combinable aggregate (exchange carries |labels|·2 rows of
    O(dim) state); the old/new join runs on the MATERIALIZED aggregate,
    so the corpus is never re-scanned for the second side."""
    from .partitioning import materialize

    base = emb.select(
        (F.col("vec_id") % 2 == 1).alias("is_new"),
        "label",
        _vec_double().alias("v"),
    ).withColumn("nrm", _norm_expr("v"))
    s = "sum(cast(floor(nrm * 1e12 + 0.5d) as decimal(38,0)))"
    micro = f"((abs({s}) + count(*) * 500000) div (count(*) * 1000000))"
    mean_norm = F.expr(
        f"cast(case when {s} < 0 then -{micro} else {micro} end"
        " as double) / 1e6"
    )
    agg = materialize(
        base.groupBy("label", "is_new").agg(
            F.count("*").cast("long").alias("n"),
            F.expr(
                "array(" + _mean6_spark_items("v", EMBED_DIM) + ")"
            ).alias("c"),
            mean_norm.alias("mean_norm"),
        )
    )
    old = agg.filter(~F.col("is_new")).select(
        "label",
        F.col("n").alias("n_old"),
        F.col("c").alias("c_old"),
        F.col("mean_norm").alias("norm_old"),
    )
    new = agg.filter(F.col("is_new")).select(
        "label",
        F.col("n").alias("n_new"),
        F.col("c").alias("c_new"),
        F.col("mean_norm").alias("norm_new"),
    )
    dist = F.sqrt(
        F.expr(
            " + ".join(
                f"(c_new[{i}] - c_old[{i}]) * (c_new[{i}] - c_old[{i}])"
                for i in range(EMBED_DIM)
            )
        )
    )
    return old.join(new, "label").select(
        "label",
        "n_old",
        "n_new",
        F.round(dist, 6).alias("centroid_shift"),
        F.round(F.col("norm_new") - F.col("norm_old"), 6).alias(
            "mean_norm_delta"
        ),
    )


def snapshot_drift_sql(src: str = "embeddings") -> str:
    norm = " + ".join(f"v[{i + 1}] * v[{i + 1}]" for i in range(EMBED_DIM))
    s = "SUM(CAST(floor(nrm * 1e12 + 0.5) AS HUGEINT))"
    micro = f"((abs({s}) + COUNT(*) * 500000) // (COUNT(*) * 1000000))"
    mean_norm = (
        f"CAST(CASE WHEN {s} < 0 THEN -{micro} ELSE {micro} END"
        " AS DOUBLE) / 1e6"
    )
    dist = " + ".join(
        f"(n.c[{i + 1}] - o.c[{i + 1}]) * (n.c[{i + 1}] - o.c[{i + 1}])"
        for i in range(EMBED_DIM)
    )
    return f"""
        WITH base AS (
          SELECT (vec_id % 2 = 1) AS is_new, label,
                 CAST(embedding AS DOUBLE[]) AS v
          FROM {src}
        ),
        based AS (SELECT is_new, label, v, sqrt({norm}) AS nrm FROM base),
        agg AS MATERIALIZED (
          SELECT label, is_new, CAST(COUNT(*) AS BIGINT) AS n,
                 [{_mean6_sql_items("v", EMBED_DIM)}] AS c,
                 {mean_norm} AS mean_norm
          FROM based GROUP BY 1, 2
        )
        SELECT o.label, o.n AS n_old, n.n AS n_new,
               ROUND(sqrt({dist}), 6) AS centroid_shift,
               ROUND(n.mean_norm - o.mean_norm, 6) AS mean_norm_delta
        FROM agg o JOIN agg n
          ON o.label = n.label AND NOT o.is_new AND n.is_new
    """


def kmeans_quality(
    emb: DataFrame,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    model: list[tuple[int, list[float]]] | None = None,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """Cluster-quality audit (Davies-Bouldin, spherical form): the
    go/no-go number for the fitted coarse quantizer the IVF / SemDeDup
    stack serves from. Per cluster: cosine scatter S_i = 1 - mean member
    cosine to the centroid, and the DB component
    ``max_j (S_i + S_j) / M_ij`` with M_ij = 1 - cos(c_i, c_j) — high
    components mean the cell overlaps a neighbor (probe counts and
    SemDeDup thresholds tuned on it will leak).

    Cost shape: ONE corpus assignment pass (the shared Arrow kernel) into
    a map-side-combinable per-cell aggregate; everything after runs on
    K-row model tables (a K x K centroid cross join is model-scale, not
    data-scale). Scatter means ride the exact-integer contract: csim is
    already on the 1e-6 grid, so ``sum(bigint micro-csim)`` is exact and
    order-free on both engines; one rounding after the division."""
    base = emb.select("vec_id", _vec_double().alias("v"))
    if model is None:
        model = kmeans_fit_model(emb, k, iters)
    if assigned is None:
        assigned = assign_cells_arrow(base, model)
    per = (
        assigned.groupBy("cent_id")
        .agg(
            F.count("*").alias("size"),
            F.sum(
                F.expr("cast(floor(csim * 1e6 + 0.5d) as bigint)")
            ).alias("sm"),
        )
        .select(
            "cent_id",
            "size",
            F.round(
                F.lit(1.0)
                - F.col("sm").cast("double")
                / (F.col("size").cast("double") * F.lit(1000000.0)),
                6,
            ).alias("scatter"),
        )
    )
    cents = _model_df(emb.sparkSession, model)
    ca = cents.select(F.col("cent_id").alias("ci"), F.col("cv").alias("cva"))
    cb = cents.select(F.col("cent_id").alias("cj"), F.col("cv").alias("cvb"))
    sep = (
        ca.crossJoin(cb)
        .filter(F.col("ci") != F.col("cj"))
        .select(
            "ci",
            "cj",
            F.round(
                F.lit(1.0)
                - _dot_expr("cva", "cvb")
                / (_norm_expr("cva") * _norm_expr("cvb")),
                6,
            ).alias("m"),
        )
    )
    si = per.select(
        F.col("cent_id").alias("ci"), F.col("scatter").alias("s_i"), "size"
    )
    sj = per.select(F.col("cent_id").alias("cj"), F.col("scatter").alias("s_j"))
    ratio = F.when(
        F.col("m") > 0, (F.col("s_i") + F.col("s_j")) / F.col("m")
    )
    return (
        sep.join(si, "ci")
        .join(sj, "cj")
        .groupBy("ci", "size", "s_i")
        .agg(F.round(F.max(ratio), 6).alias("db_component"))
        .select(
            F.col("ci").alias("cluster_id"),
            "size",
            F.col("s_i").alias("scatter"),
            "db_component",
        )
    )


def kmeans_quality_sql(
    k: int = KMEANS_K, iters: int = KMEANS_ITERS, src: str = "embeddings"
) -> str:
    return f"""
        WITH {_kmeans_ctes(k, iters, src)},
        assigned AS (
          SELECT vec_id, cent_id, csim FROM (
            SELECT e.vec_id, c.cent_id,
                   ROUND(list_cosine_similarity(e.v, c.cv), 6) AS csim,
                   ROW_NUMBER() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY ROUND(list_cosine_similarity(e.v, c.cv), 6) DESC,
                              c.cent_id ASC) AS rn
            FROM e CROSS JOIN cents c
          ) x WHERE rn = 1
        ),
        sc AS (
          SELECT cent_id, COUNT(*) AS size,
                 ROUND(1.0 - CAST(SUM(CAST(floor(csim * 1e6 + 0.5) AS HUGEINT))
                                  AS DOUBLE)
                           / (COUNT(*) * 1000000.0), 6) AS scatter
          FROM assigned GROUP BY cent_id
        ),
        sep AS (
          SELECT a.cent_id AS ci, b.cent_id AS cj,
                 ROUND(1.0 - list_cosine_similarity(a.cv, b.cv), 6) AS m
          FROM cents a JOIN cents b ON a.cent_id != b.cent_id
        )
        SELECT si.cent_id AS cluster_id,
               si.size AS size,
               si.scatter AS scatter,
               ROUND(MAX(CASE WHEN sep.m > 0
                              THEN (si.scatter + sj.scatter) / sep.m END),
                     6) AS db_component
        FROM sep
        JOIN sc si ON sep.ci = si.cent_id
        JOIN sc sj ON sep.cj = sj.cent_id
        GROUP BY si.cent_id, si.size, si.scatter
    """


def hard_negatives(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    pos_threshold: float = 0.9,
) -> DataFrame:
    """Hard-negative mining for retrieval/embedding training: for each
    query, the TOP-scoring neighbors that are NOT positives — self and
    anything at/above ``pos_threshold`` cosine (near-duplicates of the
    query, which would be false negatives poisoning the contrastive
    loss) are excluded, then the highest-cosine survivors are the hard
    negatives the trainer wants.

    Same plan shape as :func:`cosine_topk` (queries broadcast over one
    corpus scan; |queries| x corpus scored rows reduce to k per query
    via TakeOrdered-style window ranking) plus one codegen filter; the
    positive cut compares on the shared 6dp grid so both engines drop
    the same rows."""
    base = emb.select("vec_id", _vec_double().alias("v"))
    queries = base.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("q")
    )
    scored = (
        base.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine_similarity(F.col("q"), F.col("v")), 6).alias(
                "cosine"
            ),
        )
        .filter(F.col("cosine") < pos_threshold)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def hard_negatives_sql(
    query_ids: list[int],
    k: int = 5,
    pos_threshold: float = 0.9,
    src: str = "embeddings",
) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM {src}),
        q AS (SELECT vec_id AS query_id, v AS qv FROM e
              WHERE vec_id IN ({ids})),
        scored AS (
          SELECT q.query_id, e.vec_id AS neighbor_id,
                 ROUND(list_cosine_similarity(q.qv, e.v), 6) AS cosine
          FROM e CROSS JOIN q WHERE e.vec_id != q.query_id
        )
        SELECT query_id, neighbor_id, cosine, rank FROM (
          SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC)
            AS rank
          FROM scored WHERE cosine < {pos_threshold}
        ) r WHERE rank <= {k}
    """


# ------------------------------------------- margin-based mutual-kNN mining
MARGIN_K = 4
MARGIN_THRESHOLD = 1.1


def margin_mutual_knn(
    emb: DataFrame,
    k: int = MARGIN_K,
    threshold: float = MARGIN_THRESHOLD,
) -> DataFrame:
    """Margin-based mutual-kNN alignment mining — the LASER / CCMatrix
    bitext-mining operator (Artetxe & Schwenk, "Margin-based Parallel
    Corpus Mining"): given two embedding sides, each point's CANDIDATES
    are its k nearest cross-side neighbors; every candidate pair is
    scored by the RATIO margin ``cos(x,y) / mean(kNN-cos(x) ∪
    kNN-cos(y))`` (raw cosine over-selects hubs — points near
    everything; dividing by the local neighborhood density cancels
    hubness), and a pair is mined when each side is the other's best
    margin match (mutual argmax) above the threshold. This is how
    parallel training corpora are mined from independently-crawled
    monolingual sides at web scale.

    The fixtures carry one embedding table, so the two "languages" are
    the even/odd ``vec_id`` halves; with real data each side is its own
    table and everything below is unchanged.

    Determinism contract: cosines are 6dp-rounded on both engines; the
    k-NN denominator is an exact bigint sum of 1e-6-grid micro-cosines
    (``floor(csim*1e6 + 0.5)``), and the margin is computed in the
    integer-friendly form ``csim * 2k·1e6 / (sm_x + sm_y)`` — identical
    doubles bit-for-bit on Spark, DuckDB, and any partitioning.

    Scale shape: the exact-kNN stage is the brute bipartite baseline on
    the fixtures (at production scale candidates come from the IVF cell
    join — :func:`ivf_kmeans_topk`'s probe discipline — and everything
    downstream is unchanged); crucially the full score table is NEVER
    materialized — each orientation's window emits only the |side|·k
    candidate rows, and margins/argmaxes run on those model-scale
    tables with keyed joins against the |side|-row denominator
    aggregates.
    """
    import numpy as np

    base = emb.select("vec_id", _vec_double().alias("v"))
    # The B side was ALWAYS shipped whole to every executor (the former
    # form was a.crossJoin(broadcast(b))) — the r10 rewrite keeps that
    # exact memory posture but moves the scoring + per-side top-k INTO
    # one Arrow kernel pass over the spread A side: the |A|·|B| scored
    # table (1M rows at sf0.1) is never materialized and the two full
    # windows over it are gone; the kernel emits the complete per-A
    # top-k plus per-partition per-B candidates (≤ |parts|·|B|·k rows),
    # and one partitioned window finishes the per-B top-k. Arithmetic
    # is the assign_cells_arrow contract — numpy vectorized across rows,
    # SEQUENTIAL across dims, sign-aware HALF_UP 6dp — so every csim is
    # bit-identical to the codegen'd round(dot/(na*nb), 6) it replaces
    # (oracle + pinned hashes verify). The registered scale path remains
    # the IVF-gated miner; this is the documented fixture baseline.
    b_rows = (
        base.filter(F.col("vec_id") % 2 == 1).orderBy("vec_id").collect()
    )
    b_ids = np.array([int(r["vec_id"]) for r in b_rows], dtype=np.int64)
    B = np.array(
        [[float(x) for x in r["v"]] for r in b_rows], dtype=np.float64
    )
    nb = np.zeros(len(B))
    for i in range(B.shape[1]):
        nb = nb + B[:, i] * B[:, i]
    nb = np.sqrt(nb)

    def half_up(x: "np.ndarray") -> "np.ndarray":
        return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.vstack(pdf["v"].to_numpy())
            aid = pdf["vec_id"].to_numpy().astype(np.int64)
            na = np.zeros(len(X))
            for i in range(X.shape[1]):
                na = na + X[:, i] * X[:, i]
            na = np.sqrt(na)
            acc = np.zeros((len(X), len(B)))
            for i in range(X.shape[1]):
                acc = acc + X[:, i : i + 1] * B[:, i][None, :]
            csim = half_up(acc / (na[:, None] * nb[None, :]))
            kk = min(k, len(b_ids))
            sides, aa, bb, cc = [], [], [], []
            # complete per-A top-k: every B candidate is visible here
            for r in range(len(X)):
                top = np.lexsort((b_ids, -csim[r]))[:kk]
                sides.extend([0] * len(top))
                aa.extend([aid[r]] * len(top))
                bb.extend(b_ids[top])
                cc.extend(csim[r][top])
            # per-B LOCAL top-k (this partition's A rows only): the
            # global per-B cut is one partitioned window downstream
            kb = min(k, len(X))
            for j in range(len(b_ids)):
                top = np.lexsort((aid, -csim[:, j]))[:kb]
                sides.extend([1] * len(top))
                aa.extend(aid[top])
                bb.extend([b_ids[j]] * len(top))
                cc.extend(csim[:, j][top])
            yield pd.DataFrame(
                {
                    "side": np.array(sides, dtype=np.int32),
                    "a_id": np.array(aa, dtype=np.int64),
                    "b_id": np.array(bb, dtype=np.int64),
                    "csim": np.array(cc, dtype=np.float64),
                }
            )

    a = spread(base.filter(F.col("vec_id") % 2 == 0))
    out = materialize(
        a.mapInPandas(
            score, "side int, a_id long, b_id long, csim double"
        )
    )
    top_a = out.filter(F.col("side") == 0).select("a_id", "b_id", "csim")
    wb = Window.partitionBy("b_id").orderBy(F.desc("csim"), F.asc("a_id"))
    top_b = (
        out.filter(F.col("side") == 1)
        .withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") <= k)
        .select("a_id", "b_id", "csim")
    )
    return _margin_tail(top_a, top_b, k, threshold)


def _margin_pipeline(
    scored: DataFrame, k: int, threshold: float
) -> DataFrame:
    """Shared downstream of the IVF-gated margin miner: per-side top-k
    candidate windows over the materialized ``scored`` (a_id, b_id,
    csim) table, then the :func:`_margin_tail` margins/mutual-argmax.
    (The exact miner emits its per-side tops straight from the scoring
    kernel and enters at :func:`_margin_tail` — r10.)"""
    wa = Window.partitionBy("a_id").orderBy(F.desc("csim"), F.asc("b_id"))
    wb = Window.partitionBy("b_id").orderBy(F.desc("csim"), F.asc("a_id"))
    top_a = materialize(
        scored.withColumn("rn", F.row_number().over(wa)).filter(
            F.col("rn") <= k
        )
    ).drop("rn")
    top_b = materialize(
        scored.withColumn("rn", F.row_number().over(wb)).filter(
            F.col("rn") <= k
        )
    ).drop("rn")
    return _margin_tail(top_a, top_b, k, threshold)


def _margin_tail(
    top_a: DataFrame, top_b: DataFrame, k: int, threshold: float
) -> DataFrame:
    """Margins + mutual argmax over the per-side top-k candidate tables
    (a_id, b_id, csim): exact-bigint kNN denominators, ratio margins,
    per-side best-margin windows, mutual join, threshold. Everything
    here runs on |side|·k-row candidate tables — swapping the candidate
    generator (kernel top-k vs IVF cell join) leaves this untouched."""
    micro = F.expr("cast(floor(csim * 1e6 + 0.5d) as bigint)")
    sm_a = top_a.groupBy("a_id").agg(F.sum(micro).alias("sm_a"))
    sm_b = top_b.groupBy("b_id").agg(F.sum(micro).alias("sm_b"))
    scale = F.lit(float(2 * k * 1_000_000))

    def margins(cand: DataFrame) -> DataFrame:
        return (
            cand.join(sm_a, "a_id")
            .join(sm_b, "b_id")
            .select(
                "a_id",
                "b_id",
                "csim",
                (F.col("csim") * scale / (F.col("sm_a") + F.col("sm_b"))).alias(
                    "margin"
                ),
            )
        )

    wma = Window.partitionBy("a_id").orderBy(F.desc("margin"), F.asc("b_id"))
    wmb = Window.partitionBy("b_id").orderBy(F.desc("margin"), F.asc("a_id"))
    best_a = (
        margins(top_a)
        .withColumn("mrn", F.row_number().over(wma))
        .filter(F.col("mrn") == 1)
        .drop("mrn")
    )
    best_b = (
        margins(top_b)
        .withColumn("mrn", F.row_number().over(wmb))
        .filter(F.col("mrn") == 1)
        .select("a_id", "b_id")
    )
    return (
        best_a.join(best_b, ["a_id", "b_id"])
        .filter(F.col("margin") >= threshold)
        .select(
            "a_id",
            "b_id",
            F.col("csim").alias("cosine"),
            F.round("margin", 6).alias("margin"),
        )
        .orderBy(F.desc("margin"), F.asc("a_id"))
    )


def _margin_tail_sql(k: int, threshold: float) -> str:
    """SQL twin of :func:`_margin_pipeline`: the CTE chain downstream of
    a ``scored`` (a_id, b_id, csim) relation, shared by the exact and
    IVF-gated margin miners."""
    return f"""
        ta AS MATERIALIZED (
          SELECT a_id, b_id, csim FROM (
            SELECT *, ROW_NUMBER() OVER (
              PARTITION BY a_id ORDER BY csim DESC, b_id ASC) rn
            FROM scored) x WHERE rn <= {int(k)}
        ),
        tb AS MATERIALIZED (
          SELECT a_id, b_id, csim FROM (
            SELECT *, ROW_NUMBER() OVER (
              PARTITION BY b_id ORDER BY csim DESC, a_id ASC) rn
            FROM scored) x WHERE rn <= {int(k)}
        ),
        da AS (
          SELECT a_id, SUM(CAST(FLOOR(csim*1e6 + 0.5) AS BIGINT)) sm_a
          FROM ta GROUP BY a_id
        ),
        db AS (
          SELECT b_id, SUM(CAST(FLOOR(csim*1e6 + 0.5) AS BIGINT)) sm_b
          FROM tb GROUP BY b_id
        ),
        ma AS (
          SELECT t.a_id, t.b_id, t.csim,
                 t.csim * {float(2 * k * 1_000_000)} / (da.sm_a + db.sm_b)
                   AS margin
          FROM ta t JOIN da USING (a_id) JOIN db USING (b_id)
        ),
        mb AS (
          SELECT t.a_id, t.b_id, t.csim,
                 t.csim * {float(2 * k * 1_000_000)} / (da.sm_a + db.sm_b)
                   AS margin
          FROM tb t JOIN da USING (a_id) JOIN db USING (b_id)
        ),
        ba AS (
          SELECT a_id, b_id, csim, margin FROM (
            SELECT *, ROW_NUMBER() OVER (
              PARTITION BY a_id ORDER BY margin DESC, b_id ASC) rn
            FROM ma) x WHERE rn = 1
        ),
        bb AS (
          SELECT a_id, b_id FROM (
            SELECT *, ROW_NUMBER() OVER (
              PARTITION BY b_id ORDER BY margin DESC, a_id ASC) rn
            FROM mb) x WHERE rn = 1
        )
        SELECT ba.a_id, ba.b_id, ba.csim AS cosine,
               ROUND(ba.margin, 6) AS margin
        FROM ba JOIN bb USING (a_id, b_id)
        WHERE ba.margin >= {threshold}
        ORDER BY margin DESC, a_id ASC
    """


def margin_mutual_knn_sql(
    k: int = MARGIN_K,
    threshold: float = MARGIN_THRESHOLD,
    src: str = "embeddings",
) -> str:
    return f"""
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM {src}
        ),
        a AS (SELECT vec_id a_id, v av FROM e WHERE vec_id % 2 = 0),
        b AS (SELECT vec_id b_id, v bv FROM e WHERE vec_id % 2 = 1),
        scored AS MATERIALIZED (
          SELECT a_id, b_id,
                 ROUND(list_cosine_similarity(av, bv), 6) csim
          FROM a CROSS JOIN b
        ),{_margin_tail_sql(k, threshold)}"""


def margin_mutual_knn_ivf(
    emb: DataFrame,
    k: int = MARGIN_K,
    threshold: float = MARGIN_THRESHOLD,
    n_probes: int = IVF_PROBES,
    n_clusters: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    model: list[tuple[int, list[float]]] | None = None,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """IVF-gated margin mutual-kNN mining — the scale-safe registered
    plan for :func:`margin_mutual_knn` (r7 verdict: the exact variant's
    bipartite cross join is the documented fixture baseline, but the
    production candidate generator must be the IVF cell join).

    Candidate generation follows :func:`ivf_kmeans_topk`'s probe
    discipline: every vector is cell-assigned once (Arrow kernel,
    bit-equal to the SQL argmax); the A side probes its ``n_probes``
    nearest cells and candidates are the A x B pairs meeting inside a
    probed cell — an equi-join on cent_id whose cost is the cell
    occupancy product, never |A|·|B|. Each (a, b) pair arises at most
    once because B sits in exactly one home cell. kNN denominators and
    margins are computed WITHIN the candidate set (the standard gated
    approximation; :func:`margin_recall_eval` measures the pair recall
    against the exact miner). Downstream is :func:`_margin_pipeline`,
    unchanged from the exact variant."""
    base = emb.select("vec_id", _vec_double().alias("v"))
    if model is None:
        model = kmeans_fit_model(emb, n_clusters, iters)
    cents = _model_df(emb.sparkSession, model)
    if assigned is None:
        assigned = assign_cells_arrow(base, model, keep_vec=True)
    b = assigned.select("vec_id", "v", "cent_id").filter(
        F.col("vec_id") % 2 == 1
    ).select(
        F.col("vec_id").alias("b_id"),
        F.col("v").alias("bv"),
        _norm_expr("v").alias("nb"),
        "cent_id",
    )
    # the A side probes its n_probes nearest cells: |A| x K scored rows
    # against the broadcast K-row model, argmax discipline identical to
    # _ivf_probe (round 6dp, tie on cent_id asc)
    a = spread(base.filter(F.col("vec_id") % 2 == 0)).select(
        F.col("vec_id").alias("a_id"),
        F.col("v").alias("av"),
        _norm_expr("v").alias("na"),
    )
    w_probe = Window.partitionBy("a_id").orderBy(
        F.desc("qsim"), F.asc("cent_id")
    )
    aprobe = (
        a.join(F.broadcast(cents.withColumn("ncv", _norm_expr("cv"))), how="cross")
        .select(
            "a_id",
            "av",
            "na",
            "cent_id",
            F.round(
                _dot_expr("av", "cv") / (F.col("na") * F.col("ncv")), 6
            ).alias("qsim"),
        )
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= n_probes)
        .select("a_id", "av", "na", "cent_id")
    )
    scored = materialize(
        aprobe.join(b, "cent_id").select(
            "a_id",
            "b_id",
            F.round(
                _dot_expr("av", "bv") / (F.col("na") * F.col("nb")), 6
            ).alias("csim"),
        )
    )
    return _margin_pipeline(scored, k, threshold)


def _margin_ivf_scored_ctes(
    n_probes: int = IVF_PROBES,
    n_clusters: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    src: str = "embeddings",
) -> str:
    """CTE chain ending in ``scored`` (a_id, b_id, csim) for the
    IVF-gated margin miner: shared k-means fit, home-cell assignment for
    the B side, top-``n_probes`` probe cells for the A side, candidates
    from the cell equi-join."""
    return f"""{_kmeans_ctes(n_clusters, iters, src)},
        bside AS (
          SELECT b_id, bv, cent_id FROM (
            SELECT e.vec_id b_id, e.v bv, c.cent_id,
                   ROW_NUMBER() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY ROUND(list_cosine_similarity(e.v, c.cv), 6) DESC,
                              c.cent_id ASC) rn
            FROM e CROSS JOIN cents c WHERE e.vec_id % 2 = 1
          ) x WHERE rn = 1
        ),
        aprobe AS (
          SELECT a_id, av, cent_id FROM (
            SELECT e.vec_id a_id, e.v av, c.cent_id,
                   ROW_NUMBER() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY ROUND(list_cosine_similarity(e.v, c.cv), 6) DESC,
                              c.cent_id ASC) rn
            FROM e CROSS JOIN cents c WHERE e.vec_id % 2 = 0
          ) x WHERE rn <= {int(n_probes)}
        ),
        scored AS MATERIALIZED (
          SELECT a_id, b_id,
                 ROUND(list_cosine_similarity(av, bv), 6) csim
          FROM aprobe JOIN bside USING (cent_id)
        )"""


def margin_mutual_knn_ivf_sql(
    k: int = MARGIN_K,
    threshold: float = MARGIN_THRESHOLD,
    n_probes: int = IVF_PROBES,
    n_clusters: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    src: str = "embeddings",
) -> str:
    return f"""
        WITH {_margin_ivf_scored_ctes(n_probes, n_clusters, iters, src)},{
        _margin_tail_sql(k, threshold)}"""


def margin_recall_eval(
    emb: DataFrame,
    k: int = MARGIN_K,
    threshold: float = MARGIN_THRESHOLD,
    n_probes: int = IVF_PROBES,
    n_clusters: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    model: list[tuple[int, list[float]]] | None = None,
    assigned: DataFrame | None = None,
    exact_df: DataFrame | None = None,
    gated_df: DataFrame | None = None,
) -> DataFrame:
    """Pair recall of the IVF-gated margin miner against the exact miner
    — the measured-recall eval every approximate stage ships (the
    :func:`recall_eval` discipline applied to mined PAIRS instead of
    neighbor lists). One row: exact pair count, gated pair count, the
    intersection, and recall as an exact small-integer ratio. The cost
    is the two mining plans themselves; the compare join runs on
    |pairs|-row tables."""
    # both miners' outputs are standing tables a mining deployment keeps
    # (the registry shares them with the miner queries themselves via
    # the _shared cache) — the eval is then a |pairs|-row compare
    if exact_df is None:
        exact_df = margin_mutual_knn(emb, k, threshold)
    if gated_df is None:
        gated_df = margin_mutual_knn_ivf(
            emb, k, threshold, n_probes, n_clusters, iters, model=model,
            assigned=assigned,
        )
    exact = exact_df.select("a_id", "b_id")
    gated = gated_df.select("a_id", "b_id", F.lit(1).alias("hit"))
    common = exact.join(gated.drop("hit"), ["a_id", "b_id"]).agg(
        F.count("*").cast("long").alias("n_common")
    )
    n_exact = exact.agg(F.count("*").cast("long").alias("n_exact_pairs"))
    n_gated = gated.agg(F.count("*").cast("long").alias("n_ivf_pairs"))
    return (
        n_exact.crossJoin(n_gated)
        .crossJoin(common)
        .select(
            "n_exact_pairs",
            "n_ivf_pairs",
            "n_common",
            F.expr(
                "CASE WHEN n_exact_pairs = 0 THEN NULL ELSE"
                " round(n_common / n_exact_pairs, 6) END"
            ).alias("pair_recall"),
        )
    )


def margin_recall_eval_sql(
    k: int = MARGIN_K,
    threshold: float = MARGIN_THRESHOLD,
    n_probes: int = IVF_PROBES,
    n_clusters: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    src: str = "embeddings",
) -> str:
    exact = margin_mutual_knn_sql(k, threshold, src)
    gated = margin_mutual_knn_ivf_sql(
        k, threshold, n_probes, n_clusters, iters, src
    )
    return f"""
        WITH ex AS MATERIALIZED (SELECT a_id, b_id FROM ({exact}) x),
        gt AS MATERIALIZED (SELECT a_id, b_id FROM ({gated}) y)
        SELECT
          (SELECT CAST(COUNT(*) AS BIGINT) FROM ex) AS n_exact_pairs,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM gt) AS n_ivf_pairs,
          (SELECT CAST(COUNT(*) AS BIGINT)
             FROM ex JOIN gt USING (a_id, b_id)) AS n_common,
          CASE WHEN (SELECT COUNT(*) FROM ex) = 0 THEN NULL
               ELSE ROUND((SELECT COUNT(*) FROM ex JOIN gt USING (a_id, b_id))
                          / CAST((SELECT COUNT(*) FROM ex) AS DOUBLE), 6)
          END AS pair_recall
    """


# ------------------------------------------------ IVF probe-recall curve
PROBE_SWEEP = (1, 2, 4, 8)


def probe_recall_curve(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    probes: tuple[int, ...] = PROBE_SWEEP,
) -> DataFrame:
    """Recall@k as a function of IVF probe count — the tuning curve an
    ANN deployment reads before picking its latency/recall operating
    point (the IVF analogue of :func:`~.dedup` LSH threshold ROI sweep):
    each added probe widens the scanned fraction ~1/IVF_CENTROIDS and
    buys back the neighbors that landed in unprobed cells.

    The corpus is cell-assigned ONCE (materialized) and every sweep
    point reuses it — the sweep costs |probes| small probe-join plans,
    not |probes| assignment passes. The exact baseline is likewise
    materialized once. Mean recall is hits/(k·|queries|), an exact
    small-integer ratio on both engines.
    """
    spark = emb.sparkSession
    base = emb.select("vec_id", _vec_double().alias("v"))
    model = [
        (int(r["vec_id"]), [float(x) for x in r["v"]])
        for r in base.filter(F.col("vec_id") < IVF_CENTROIDS).collect()
    ]
    cents = _model_df(spark, model)
    assigned = materialize(
        assign_cells_arrow(base, model, keep_vec=True).select(
            "vec_id", "v", "cent_id"
        )
    )
    exact = materialize(
        cosine_topk(emb, query_ids, k).select("query_id", "neighbor_id")
    )
    denom = float(k * len(query_ids))
    out = None
    for p in probes:
        approx = _ivf_probe(
            base, cents, query_ids, k, n_probes=p, assigned=assigned
        ).select("query_id", "neighbor_id", F.lit(1).alias("hit"))
        row = (
            exact.join(approx, ["query_id", "neighbor_id"], "left")
            .agg(F.count("hit").cast("long").alias("hits"))
            .select(
                F.lit(p).cast("int").alias("n_probes"),
                "hits",
                F.round(F.col("hits") / F.lit(denom), 6).alias(
                    "mean_recall"
                ),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("n_probes")


def probe_recall_curve_sql(
    query_ids: list[int],
    k: int = 5,
    probes: tuple[int, ...] = PROBE_SWEEP,
    src: str = "embeddings",
) -> str:
    exact = cosine_topk_sql(query_ids, k, src)
    denom = k * len(query_ids)
    parts = []
    for p in probes:
        prefix = f"""e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {src}),
        cents AS (
          SELECT vec_id AS cent_id, v AS cv FROM e
          WHERE vec_id < {IVF_CENTROIDS}
        )"""
        approx = _ivf_probe_sql(prefix, query_ids, k, n_probes=p)
        parts.append(f"""
        SELECT CAST({p} AS INTEGER) AS n_probes,
               CAST(COUNT(a.neighbor_id) AS BIGINT) AS hits,
               ROUND(COUNT(a.neighbor_id) / CAST({denom} AS DOUBLE), 6)
                 AS mean_recall
        FROM ({exact}) e
        LEFT JOIN ({approx}) a
          ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
        """)
    u = " UNION ALL ".join(parts)
    return f"SELECT * FROM ({u}) s ORDER BY n_probes"


# ------------------------------------------------ filtered vector search
def filtered_cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    allowed_labels: list[int],
    k: int = 5,
) -> DataFrame:
    """Filtered vector search (the RAG workhorse: "nearest neighbors
    WHERE tenant/label/date matches"): the metadata predicate is applied
    PRE-search, so the top-k is exact over the filtered sub-corpus —
    the semantics post-filtering cannot give (post-filtering a k-list
    returns < k rows whenever neighbors fail the predicate, with recall
    loss growing as the filter tightens). In Spark the predicate is just
    a pushed filter on the scan side of the scoring join, so "filtered
    ANN" costs LESS than unfiltered — the index-side machinery (IVF
    cells, PQ codes) composes unchanged on the filtered relation.
    """
    base = emb.select("vec_id", "label", _vec_double().alias("v")).filter(
        F.col("label").isin(allowed_labels)
    )
    queries = (
        emb.select("vec_id", _vec_double().alias("v"))
        .filter(F.col("vec_id").isin(query_ids))
        .select(F.col("vec_id").alias("query_id"), F.col("v").alias("q"))
    )
    scored = base.join(
        F.broadcast(queries), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        "label",
        F.round(cosine_similarity(F.col("q"), F.col("v")), 6).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def filtered_cosine_topk_sql(
    query_ids: list[int],
    allowed_labels: list[int],
    k: int = 5,
    src: str = "embeddings",
) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    labels = ", ".join(str(x) for x in allowed_labels)
    return f"""
        WITH e AS (
          SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM {src}
        ),
        q AS (
          SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id IN ({ids})
        ),
        scored AS (
          SELECT q.query_id, e.vec_id AS neighbor_id, e.label,
                 ROUND(list_cosine_similarity(q.qv, e.v), 6) AS cosine
          FROM e CROSS JOIN q
          WHERE e.vec_id != q.query_id AND e.label IN ({labels})
        )
        SELECT query_id, neighbor_id, label, cosine, rank FROM (
          SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
          ) AS rank
          FROM scored
        ) r WHERE rank <= {k}
    """


# ------------------------------------- nearest-centroid classifier eval
def centroid_classifier_eval(emb: DataFrame) -> DataFrame:
    """Nearest-centroid classification graded against the labels — the
    vector-space twin of the language-ID confusion audit, and the
    fastest possible "are these embeddings linearly usable" probe (a
    label whose members scatter to other centroids is not separable for
    ANY downstream head). Per (true label, predicted label): count and
    row-normalized share (recall on the diagonal).

    Centroids ride the order-free exact-integer mean contract (the
    k-means certification); assignment is one |labels|-fan-out cross of
    the corpus against the centroid table (model-scale side) with a
    per-vector top-1 window; the confusion rollup is |labels|² rows.
    Centroids include each vector's own contribution (resubstitution
    eval — the standard nearest-centroid sanity number)."""
    base = emb.select("vec_id", "label", _vec_double().alias("v"))
    mean_vec = F.expr(
        "array(" + _mean6_spark_items("v", EMBED_DIM) + ")"
    ).alias("cv")
    cents = base.groupBy(F.col("label").alias("_cl")).agg(mean_vec)
    scored = base.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "label",
        F.col("_cl").alias("pred"),
        F.round(
            _dot_expr("v", "cv") / (_norm_expr("v") * _norm_expr("cv")), 6
        ).alias("csim"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("csim"), F.asc("pred"))
    assigned = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("label", "pred")
    )
    per = assigned.groupBy("label", "pred").agg(
        F.count("*").cast("long").alias("n_vecs")
    )
    wl = Window.partitionBy("label")
    return per.select(
        "label",
        "pred",
        "n_vecs",
        F.round(
            F.col("n_vecs") / F.sum("n_vecs").over(wl).cast("double"), 6
        ).alias("share"),
    )


def centroid_classifier_eval_sql(src: str = "embeddings") -> str:
    avg_items = _mean6_sql_items("v", EMBED_DIM)
    return f"""
        WITH e AS (
          SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM {src}
        ),
        cents AS (
          SELECT label AS _cl, [{avg_items}] AS cv FROM e GROUP BY label
        ),
        assigned AS (
          SELECT label, pred FROM (
            SELECT e.vec_id, e.label, c._cl AS pred,
                   ROW_NUMBER() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY ROUND(list_cosine_similarity(e.v, c.cv), 6)
                       DESC, c._cl ASC) AS rn
            FROM e CROSS JOIN cents c
          ) x WHERE rn = 1
        ),
        per AS (
          SELECT label, pred, CAST(COUNT(*) AS BIGINT) AS n_vecs
          FROM assigned GROUP BY 1, 2
        )
        SELECT label, pred, n_vecs,
               ROUND(n_vecs / CAST(SUM(n_vecs) OVER (
                 PARTITION BY label) AS DOUBLE), 6) AS share
        FROM per
    """


# --------------------------------------------- binary (1-bit) quantization
# The last rung of the compression ladder (float64 512B -> SQ8 64B -> PQ
# 8B -> binary 8B-as-ONE-WORD): sign-binarize each embedding into a
# single 64-bit code, shortlist by Hamming distance (one xor + popcount
# per candidate -- the cheapest distance computable), then re-rank the
# shortlist with exact cosine over re-fetched full vectors. This is the
# memory-tier layout production vector stores use for billion-vector
# first-pass filtering (sign random projection, Charikar 2002; the
# hashing-trick embeddings are already de-correlated, so the identity
# rotation stands in for the random hyperplanes).
HAMMING_SHORTLIST = 4  # shortlist size = HAMMING_SHORTLIST * k per query

# bit 63 is the two's-complement sign bit; BOTH engines reject 1<<63 as
# a positive literal, so it is emitted pre-wrapped
_SIGN_BIT_WEIGHTS = [1 << i for i in range(63)] + [-(1 << 63)]


def _sign_code_expr(v: str = "v") -> Column:
    """Pack the sign bits of a dim-``EMBED_DIM`` vector into ONE BIGINT
    code word (bit d set iff v[d] > 0), as a single codegen expression —
    the encode is a pure projection, no shuffle, no Python."""
    assert EMBED_DIM <= 64, "one code word holds at most 64 sign bits"
    terms = [
        f"IF({v}[{i}] > 0, CAST({_SIGN_BIT_WEIGHTS[i]} AS BIGINT), 0L)"
        for i in range(EMBED_DIM)
    ]
    return F.expr(" | ".join(terms))


def hamming_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    shortlist: int | None = None,
) -> DataFrame:
    """Binary-quantized top-k with exact re-rank: Hamming shortlist of
    ``shortlist`` (default ``HAMMING_SHORTLIST * k``) candidates per
    query over the 64-bit sign codes, then exact cosine over the
    shortlist only. Output (query_id, neighbor_id, hamming, cosine,
    rank), ranked (cosine desc, neighbor_id asc) like the exact scan.

    Plan shape at 100 TB: the code table is 64x smaller than the
    vectors and scans at memory bandwidth (xor+popcount is one fused
    codegen expression); the full vectors are touched ONLY for the
    |queries| x shortlist re-rank join — exactly the codes-in-RAM /
    vectors-on-disk split a deployment runs. Integer Hamming distances
    and id tiebreaks make the shortlist engine-exact; the re-rank reuses
    the 6dp-rounded cosine contract of :func:`cosine_topk`."""
    from ..functions import cosine_similarity

    r = shortlist if shortlist is not None else HAMMING_SHORTLIST * k
    base = emb.select("vec_id", _vec_double().alias("v"))
    codes = base.select("vec_id", _sign_code_expr("v").alias("code"))
    queries = base.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        _sign_code_expr("v").alias("qcode"),
    )
    ham = codes.join(
        F.broadcast(queries), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.expr("CAST(bit_count(code ^ qcode) AS INT)").alias("hamming"),
        "qv",
    )
    w_short = Window.partitionBy("query_id").orderBy(
        F.asc("hamming"), F.asc("neighbor_id")
    )
    short = (
        ham.withColumn("srank", F.row_number().over(w_short))
        .filter(F.col("srank") <= r)
        .drop("srank")
    )
    # re-fetch full vectors for the shortlist only (codes RAM-resident,
    # vectors cold storage); |short| = |queries| * shortlist -> broadcast
    scored = base.withColumnRenamed("vec_id", "neighbor_id").join(
        F.broadcast(short), "neighbor_id"
    ).select(
        "query_id",
        "neighbor_id",
        "hamming",
        F.round(cosine_similarity(F.col("qv"), F.col("v")), 6).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def _sign_code_sql(src_cte: str = "e") -> str:
    """DuckDB twin of :func:`_sign_code_expr`: bit_or over unnested
    dims (1-indexed), bit 63 via the pre-wrapped literal."""
    return f"""
        SELECT vec_id,
               bit_or(CASE WHEN x > 0 THEN
                 CASE WHEN d = 64
                      THEN CAST(-9223372036854775808 AS BIGINT)
                      ELSE (CAST(1 AS BIGINT) << (d - 1)) END
                 ELSE CAST(0 AS BIGINT) END) AS code
        FROM (SELECT vec_id, UNNEST(v) AS x,
                     generate_subscripts(v, 1) AS d FROM {src_cte}) u
        GROUP BY vec_id
    """


def hamming_topk_sql(
    query_ids: list[int],
    k: int = 5,
    shortlist: int | None = None,
    src: str = "embeddings",
) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    r = shortlist if shortlist is not None else HAMMING_SHORTLIST * k
    return f"""
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {src}
        ),
        codes AS ({_sign_code_sql("e")}),
        q AS (
          SELECT c.vec_id AS query_id, c.code AS qcode, e.v AS qv
          FROM codes c JOIN e USING (vec_id)
          WHERE c.vec_id IN ({ids})
        ),
        short AS (
          SELECT query_id, neighbor_id, hamming, qv FROM (
            SELECT q.query_id, c.vec_id AS neighbor_id,
                   CAST(bit_count(xor(c.code, q.qcode)) AS INT) AS hamming,
                   q.qv,
                   ROW_NUMBER() OVER (
                     PARTITION BY q.query_id
                     ORDER BY bit_count(xor(c.code, q.qcode)) ASC,
                              c.vec_id ASC) AS srank
            FROM codes c CROSS JOIN q WHERE c.vec_id != q.query_id
          ) s WHERE srank <= {r}
        ),
        scored AS (
          SELECT s.query_id, s.neighbor_id, s.hamming,
                 ROUND(list_cosine_similarity(s.qv, e.v), 6) AS cosine
          FROM short s JOIN e ON e.vec_id = s.neighbor_id
        )
        SELECT query_id, neighbor_id, hamming, cosine, rank FROM (
          SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id ASC) AS rank
          FROM scored
        ) r WHERE rank <= {k}
    """


def hamming_recall_eval(
    emb: DataFrame, query_ids: list[int], k: int = 5
) -> DataFrame:
    """Recall@k of the binary-code path against the exact scan — the QA
    number that prices the 64x compression (companion to
    :func:`recall_eval` for IVF). Output (query_id, hits, recall_at_k)."""
    exact = cosine_topk(emb, query_ids, k).select("query_id", "neighbor_id")
    approx = hamming_topk(emb, query_ids, k).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    return (
        exact.join(approx, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("hit").alias("hits"),
            F.round(F.count("hit") / F.lit(float(k)), 4).alias("recall_at_k"),
        )
    )


def hamming_recall_eval_sql(
    query_ids: list[int], k: int = 5, src: str = "embeddings"
) -> str:
    exact = cosine_topk_sql(query_ids, k, src)
    approx = hamming_topk_sql(query_ids, k, src=src)
    return f"""
        SELECT e.query_id,
               COUNT(a.neighbor_id) AS hits,
               ROUND(COUNT(a.neighbor_id) / CAST({k} AS DOUBLE), 4)
                 AS recall_at_k
        FROM ({exact}) e
        LEFT JOIN ({approx}) a
          ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
        GROUP BY e.query_id
    """


# ------------------------------------------- matryoshka truncation eval
MATRYOSHKA_DIMS = (8, 16, 32, 64)


def matryoshka_recall(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    dims: tuple[int, ...] = MATRYOSHKA_DIMS,
) -> DataFrame:
    """Recall@k of dimension-PREFIX retrieval against the full-dim exact
    scan, one row per prefix length — the eval behind matryoshka-style
    (MRL, Kusupati et al. 2022) deployment tiers, where the first m
    coordinates of an embedding serve as a cheaper index (m/dim of the
    scan bandwidth) and the full vector only re-ranks. Output
    (dim_prefix, hits, recall_at_k), recall 4dp over |queries| x k
    ground-truth pairs.

    Shape: |dims| truncated scans, each the same broadcast-query plan as
    :func:`cosine_topk` (the operator under test dominates; the compare
    joins are |queries| x k). The fixture's hashing-trick embeddings are
    not MRL-trained, so the curve here prices raw truncation — the
    operator is the eval harness, not a claim about the encoder."""
    exact = cosine_topk(emb, query_ids, k).select("query_id", "neighbor_id")
    total = float(len(query_ids) * k)
    outs = []
    for m in dims:
        trunc = emb.select(
            "vec_id", F.slice(_vec_double(), 1, m).alias("embedding")
        )
        approx = cosine_topk(trunc, query_ids, k).select(
            "query_id", "neighbor_id", F.lit(1).alias("hit")
        )
        outs.append(
            exact.join(approx, ["query_id", "neighbor_id"], "left").agg(
                F.lit(m).cast("int").alias("dim_prefix"),
                F.count("hit").alias("hits"),
                F.round(F.count("hit") / F.lit(total), 4).alias(
                    "recall_at_k"
                ),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("dim_prefix")


def matryoshka_recall_sql(
    query_ids: list[int],
    k: int = 5,
    dims: tuple[int, ...] = MATRYOSHKA_DIMS,
    src: str = "embeddings",
) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    total = len(query_ids) * k
    branches = []
    for m in dims:
        branches.append(f"""
        SELECT {m} AS dim_prefix,
               COUNT(a.neighbor_id) AS hits,
               ROUND(COUNT(a.neighbor_id) / CAST({total} AS DOUBLE), 4)
                 AS recall_at_k
        FROM (
          SELECT query_id, neighbor_id FROM (
            SELECT q.query_id, e.vec_id AS neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY q.query_id
                     ORDER BY ROUND(list_cosine_similarity(q.qv, e.v), 6)
                       DESC, e.vec_id ASC) AS rank
            FROM e CROSS JOIN q WHERE e.vec_id != q.query_id
          ) x WHERE rank <= {k}
        ) ex
        LEFT JOIN (
          SELECT query_id, neighbor_id FROM (
            SELECT q.query_id, e.vec_id AS neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY q.query_id
                     ORDER BY ROUND(list_cosine_similarity(
                       q.qv[1:{m}], e.v[1:{m}]), 6) DESC,
                       e.vec_id ASC) AS rank
            FROM e CROSS JOIN q WHERE e.vec_id != q.query_id
          ) y WHERE rank <= {k}
        ) a ON ex.query_id = a.query_id AND ex.neighbor_id = a.neighbor_id
        """)
    u = "\n        UNION ALL\n".join(branches)
    return f"""
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {src}
        ),
        q AS (SELECT vec_id AS query_id, v AS qv FROM e
              WHERE vec_id IN ({ids}))
        SELECT * FROM ({u}) all_dims ORDER BY dim_prefix
    """


def ivf_ingest_summary_sql(
    k: int = KMEANS_K, iters: int = KMEANS_ITERS, src: str = "embeddings"
) -> str:
    """Oracle for the settled streaming IVF-ingest log: the one-shot
    batch assignment (shared :func:`_kmeans_ctes` fit + argmax-cosine
    final CTE, exactly :func:`kmeans_clusters_sql`'s) summarized per
    cell — if the incremental fold converges to batch semantics, the
    per-cell counts, id bounds, and mean similarity all match."""
    return f"""
        WITH {_kmeans_ctes(k, iters, src)},
        final AS (
          SELECT vec_id, cent_id, csim FROM (
            SELECT e.vec_id, c.cent_id,
                   ROUND(list_cosine_similarity(e.v, c.cv), 6) AS csim,
                   ROW_NUMBER() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY ROUND(list_cosine_similarity(e.v, c.cv), 6) DESC,
                              c.cent_id ASC) AS rn
            FROM e CROSS JOIN cents c
          ) x WHERE rn = 1
        )
        SELECT cent_id, COUNT(*) AS n_vecs,
               MIN(vec_id) AS min_vec_id, MAX(vec_id) AS max_vec_id,
               ROUND(AVG(csim), 6) AS mean_sim
        FROM final GROUP BY cent_id
    """


# --------------------------------------------------- graph-based ANN (NSW)
# Navigable-small-world beam search (Malkov & Yashunin, "Efficient and
# robust approximate nearest neighbor search using HNSW", layer-0
# discipline) re-expressed as BOUNDED Spark supersteps: the one ANN index
# family (graph-based) the IVF/PQ/LSH/Hamming registry families don't
# cover. Reference parity note: the reference platform has no ANN at all
# (extension surface, SURVEY §2 scope note); the semantics follow the
# public NSW papers, the determinism contract follows this module's IVF
# family (6dp cosines, (sim DESC, id ASC) total orders).
GRAPH_M = 6  # out-degree of the kNN graph before symmetrization
GRAPH_BEAM = 8  # beam width per superstep
GRAPH_STEPS = 2  # bounded expansion supersteps
GRAPH_ENTRIES = 2  # entry seeds = top-E probed cells' min-id nodes
GRAPH_TARGET_CELL = 200  # auto-sized cell target (measured, see below)


def graph_auto_n_clusters(n_vectors: int, k_min: int = KMEANS_K) -> int:
    """Cell count that keeps the edge-build's Σ|cell|² = n·(cell size)
    LINEAR in the corpus: one cell per ~:data:`GRAPH_TARGET_CELL`
    vectors, floored at the fixture K so tiny corpora keep their exact
    historical plans (and hashes)."""
    return max(k_min, int(n_vectors) // GRAPH_TARGET_CELL)


def graph_knn_edges(
    emb: DataFrame,
    m: int = GRAPH_M,
    n_clusters: int | None = None,
    iters: int = KMEANS_ITERS,
    model: list[tuple[int, list[float]]] | None = None,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """Build side of :func:`graph_beam_topk`: a symmetrized within-cell
    top-``m`` neighbor graph, materialized — the standing index table a
    graph-ANN deployment persists per corpus snapshot.

    Candidates come from the IVF cell equi-join (cost Σ|cell|², the
    SemDeDup bound — never |n|²); per-node top-``m`` is a PARTITIONED
    window; symmetrization unions the reversed edges (NSW keeps
    back-links so greedy search can escape a poor entry).

    Cell-sizing discipline (measured, tools/scale_smoke.py): Σ|cell|² =
    n·(cell size), so the cell count must scale linearly with the corpus
    to hold cell size at a constant target (~200): 100k vecs / 512
    cells builds 19.5M pairs in ~80 s one-time; the same corpus at 64
    cells (1.5k/cell) is 156M pairs and 8x the wall clock. When neither
    ``model`` nor ``n_clusters`` is given the build therefore AUTO-SIZES
    from one cheap ``count()`` via :func:`graph_auto_n_clusters`
    (r9 verdict #2 — the fixture K=16 default was a quadratic-at-scale
    trap for anyone building at 100x); passing either pins the historical
    behavior, which is what the registry's shared fixture model does.

    Past :data:`HIER_K_THRESHOLD` auto-sized cells the FLAT assign is
    itself the quadratic stage (n·K = n²/200 dots), so the auto path
    switches to the two-level quantizer (:func:`hier_fit_model` +
    :func:`assign_cells_two_level`, n·2√K dots) — the r10 close of the
    r9 "sampled/hierarchical coarse quantizer — documented, not
    implemented" residual."""
    base = emb.select("vec_id", _vec_double().alias("v"))
    if model is None:
        if n_clusters is None:
            n_clusters = graph_auto_n_clusters(base.count())
        if n_clusters > HIER_K_THRESHOLD and assigned is None:
            m1, m2 = hier_fit_model(emb, n_clusters, iters)
            model = hier_flat_model(m2)
            assigned = assign_cells_two_level(base, m1, m2, keep_vec=True)
        else:
            model = kmeans_fit_model(emb, n_clusters, iters)
    if assigned is None:
        assigned = assign_cells_arrow(base, model, keep_vec=True)
    left = assigned.select(
        "cent_id",
        F.col("vec_id").alias("src"),
        F.col("v").alias("sv"),
        _norm_expr("v").alias("ns"),
    )
    right = assigned.select(
        "cent_id",
        F.col("vec_id").alias("dst"),
        F.col("v").alias("dv"),
        _norm_expr("v").alias("nd"),
    )
    scored = (
        left.join(right, "cent_id")
        .filter(F.col("src") != F.col("dst"))
        .select(
            "src",
            "dst",
            F.round(
                _dot_expr("sv", "dv") / (F.col("ns") * F.col("nd")), 6
            ).alias("csim"),
        )
    )
    w = Window.partitionBy("src").orderBy(F.desc("csim"), F.asc("dst"))
    top = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= m)
        .select("src", "dst")
    )
    return materialize(
        top.union(
            top.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
    )


def _values_relation(spark: SparkSession, rows: list[str], cols: str) -> DataFrame:
    """Model-scale literal table as a SQL ``VALUES`` LocalRelation.

    ``createDataFrame(rows)`` ships the rows as a PICKLED RDD sliced
    across defaultParallelism — every downstream action re-runs a
    32-task deserialize job (plus the repartition(1) shuffle the
    _model_df note documents), which dominated the driver-orchestrated
    beam search (profiled: 0.3–0.6 s PER ACTION for a 40-row table). A
    ``VALUES`` list parses JVM-side in milliseconds into a
    LocalRelation: zero jobs, zero shuffles, broadcast-ready. Literals
    are rendered by the CALLER with exact round-trips (``repr`` for
    doubles — shortest-roundtrip in Python, correctly-rounded re-parse
    in Java — ``str`` + ``L`` suffix for bigints), so values are
    bit-identical to the collected originals."""
    return spark.sql(f"SELECT * FROM VALUES {','.join(rows)} AS t({cols})")


def _d(x: float | None) -> str:
    """Exact double literal for :func:`_values_relation` rows."""
    return "CAST(NULL AS DOUBLE)" if x is None else f"{x!r}D"


def graph_beam_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    m: int = GRAPH_M,
    beam: int = GRAPH_BEAM,
    steps: int = GRAPH_STEPS,
    entries: int = GRAPH_ENTRIES,
    n_clusters: int | None = None,
    iters: int = KMEANS_ITERS,
    model: list[tuple[int, list[float]]] | None = None,
    assigned: DataFrame | None = None,
    edges: DataFrame | None = None,
    superstep_rows: list[int] | None = None,
) -> DataFrame:
    """NSW-style beam search over the prebuilt kNN graph: each query
    enters at the min-id seed node of its ``entries`` nearest coarse
    cells, then ``steps`` bounded supersteps expand the beam along graph
    edges, exactly re-scoring every frontier node (codegen dot, 6dp) and
    re-cutting to the ``beam`` best per query; output is the final
    top-``k`` (self excluded, ranking key (csim DESC, node ASC) — the
    :func:`cosine_topk` total order).

    Scale shape: per superstep the frontier is ≤ beam·(m·2+1) rows PER
    QUERY (model-scale), each expansion an equi-join against the
    standing edge table; nothing data-sized crosses a window, and the
    corpus is touched only through the (node → vector) equi-join. The
    probe-side cents cross join is the declared K-row-model shape."""
    if steps < 1:
        raise ValueError(f"steps must be >= 1, got {steps}")
    if k > beam:  # the final cut comes from the beam-width frontier, so
        # k > beam would silently return only beam rows per query
        raise ValueError(f"k ({k}) must be <= beam ({beam})")
    base = emb.select("vec_id", _vec_double().alias("v"))
    if model is None:
        if n_clusters is None:
            n_clusters = graph_auto_n_clusters(base.count())
        if n_clusters > HIER_K_THRESHOLD and assigned is None:
            # large-K auto path: two-level fit/assign (see graph_knn_edges)
            m1, m2 = hier_fit_model(emb, n_clusters, iters)
            model = hier_flat_model(m2)
            assigned = assign_cells_two_level(base, m1, m2, keep_vec=True)
        else:
            model = kmeans_fit_model(emb, n_clusters, iters)
    if assigned is None:
        assigned = assign_cells_arrow(base, model, keep_vec=True)
    if edges is None:
        edges = graph_knn_edges(
            emb, m, n_clusters, iters, model=model, assigned=assigned
        )
    # --- driver-orchestrated search over the standing tables (r11) ---
    # r10 already collected the inter-superstep beam (bounded by
    # |query_ids|·beam rows — model-scale by the same contract as the
    # k-means fit) to stop the lazy subtree doubling per step; the
    # remaining cost was pure plan-construct: 17 jobs of probe windows,
    # seed aggregates, frontier unions and per-step rank windows over
    # row sets that never exceed a few hundred rows (profiled: 3.2 s of
    # a 4.6 s warm wall was Catalyst planning/codegen, guide §1/§7.2).
    # The search state is model-scale THROUGHOUT — probes ≤ |q|·entries,
    # frontier ≤ |q|·beam·(2m+1) pairs, candidate vectors ≤ that many
    # 64-dim rows — so the orchestration (set algebra, beam cuts on
    # already-rounded doubles) moves to the driver, and Spark executes
    # only the data-sized touches: one pushed-isin filter scan of the
    # standing EDGE table and one of the corpus table per superstep,
    # plus one tiny probe job. Every similarity stays the identical
    # codegen arithmetic (_dot_expr/_norm_expr + HALF_UP round 6) the
    # window version ran — the driver never does float math, it only
    # orders by values Spark already rounded (ties impossible: the cut
    # key (csim, node) is unique per pair), so results are value-equal
    # (oracle-gated at sf0.01/sf0.001).
    spark = emb.sparkSession
    ids = [int(i) for i in query_ids]
    q_rows = (
        base.filter(F.col("vec_id").isin(ids))
        .select("vec_id", "v", _norm_expr("v").alias("nq"))
        .collect()
    )  # ≤ |query_ids| rows of dim doubles — model-scale
    out_schema = (
        "query_id bigint, neighbor_id bigint, csim double, rank int"
    )
    if not q_rows:
        return spark.createDataFrame([], out_schema)
    qdf = _values_relation(
        spark,
        [
            f"({int(r['vec_id'])}L, "
            f"array({','.join(_d(float(x)) for x in r['v'])}), "
            f"{_d(float(r['nq']))})"
            for r in q_rows
        ],
        "query_id, qv, nq",
    )
    cents = _values_relation(
        spark,
        [
            f"({int(cid)}L, array({','.join(_d(float(x)) for x in cv)}))"
            for cid, cv in sorted(model)
        ],
        "cent_id, cv",
    )
    probe_rows = (
        qdf.crossJoin(F.broadcast(cents.withColumn("nc", _norm_expr("cv"))))
        .select(
            "query_id",
            "cent_id",
            F.round(
                _dot_expr("qv", "cv") / (F.col("nq") * F.col("nc")), 6
            ).alias("qsim"),
        )
        .collect()
    )  # |q| x K rows — the same K-row-model cross the window version did
    by_query: dict[int, list] = {}
    for r in probe_rows:
        by_query.setdefault(r["query_id"], []).append(r)
    probed: set[tuple[int, int]] = set()
    for qid, rows in by_query.items():
        rows.sort(key=lambda r: (-r["qsim"], r["cent_id"]))
        probed.update((qid, r["cent_id"]) for r in rows[:entries])
    cells = sorted({c for _, c in probed})
    seed_rows = (
        assigned.filter(F.col("cent_id").isin(cells))
        .groupBy("cent_id")
        .agg(F.min("vec_id").alias("node"))
        .collect()
    )  # ≤ |q|·entries rows
    seed_of = {r["cent_id"]: r["node"] for r in seed_rows}
    cur: set[tuple[int, int]] = {
        (qid, seed_of[c]) for qid, c in probed if c in seed_of
    }
    last_scored: dict[int, list[tuple[float, int]]] = {}
    for _ in range(steps):
        frontier_nodes = sorted({n for _, n in cur})
        edge_rows = (
            edges.filter(F.col("src").isin(frontier_nodes))
            .select("src", "dst")
            .collect()
        )  # ≤ |frontier|·2m rows — the node out-degree bound
        adj: dict[int, list[int]] = {}
        for r in edge_rows:
            adj.setdefault(r["src"], []).append(r["dst"])
        pairs = set(cur)
        for qid, n in cur:
            for d in adj.get(n, ()):
                pairs.add((qid, d))
        if superstep_rows is not None:
            # debug/smoke instrumentation: record each superstep's
            # actual frontier size so the documented <= |q|*beam*(2m+1)
            # bound is a measured number, not prose
            superstep_rows.append(len(pairs))
        cand_nodes = sorted({n for _, n in pairs})
        pair_df = _values_relation(
            spark,
            [f"({qid}L, {n}L)" for qid, n in sorted(pairs)],
            "query_id, node",
        )
        scored_rows = (
            assigned.filter(F.col("vec_id").isin(cand_nodes))
            .select(
                F.col("vec_id").alias("node"),
                F.col("v").alias("nv"),
                _norm_expr("v").alias("nn"),
            )
            .join(F.broadcast(pair_df), "node")
            .join(F.broadcast(qdf), "query_id")
            .filter(F.col("node") != F.col("query_id"))
            .select(
                "query_id",
                "node",
                F.round(
                    _dot_expr("qv", "nv") / (F.col("nq") * F.col("nn")), 6
                ).alias("csim"),
            )
            .collect()
        )  # ≤ |pairs| rows
        by_q: dict[int, list[tuple[float, int]]] = {}
        for r in scored_rows:
            by_q.setdefault(r["query_id"], []).append(
                (r["csim"], r["node"])
            )
        cur = set()
        for qid, lst in by_q.items():
            # the window version's (csim DESC NULLS LAST, node ASC)
            lst.sort(key=lambda t: (t[0] is None, -(t[0] or 0.0), t[1]))
            cur.update((qid, n) for _, n in lst[:beam])
        last_scored = by_q
    out = [
        f"({qid}L, {n}L, {_d(c)}, {rank})"
        for qid, lst in last_scored.items()
        for rank, (c, n) in enumerate(lst[:k], start=1)
    ]
    if not out:
        return spark.createDataFrame([], out_schema)
    return _values_relation(
        spark, out, "query_id, neighbor_id, csim, rank"
    )


def graph_beam_topk_sql(
    query_ids: list[int],
    k: int = 5,
    m: int = GRAPH_M,
    beam: int = GRAPH_BEAM,
    steps: int = GRAPH_STEPS,
    entries: int = GRAPH_ENTRIES,
    n_clusters: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    src: str = "embeddings",
) -> str:
    """DuckDB twin of :func:`graph_beam_topk`: the shared k-means CTE
    fit, the final-model assignment, the within-cell top-m symmetrized
    edge CTE, then the supersteps UNROLLED (steps is a small fixed
    constant, so no recursion is needed and every engine sees the same
    bounded plan)."""
    ids = ", ".join(str(int(i)) for i in query_ids)
    parts = [f"""af AS (
          SELECT vec_id, v, cent_id FROM (
            SELECT e.vec_id, e.v, c.cent_id,
                   ROW_NUMBER() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY ROUND(list_cosine_similarity(e.v, c.cv), 6) DESC,
                              c.cent_id ASC) AS rn
            FROM e CROSS JOIN cents c
          ) x WHERE rn = 1
        )""", f"""eg0 AS (
          SELECT src, dst FROM (
            SELECT l.vec_id AS src, r.vec_id AS dst,
                   ROW_NUMBER() OVER (
                     PARTITION BY l.vec_id
                     ORDER BY ROUND(list_cosine_similarity(l.v, r.v), 6) DESC,
                              r.vec_id ASC) AS rn
            FROM af l JOIN af r
              ON l.cent_id = r.cent_id AND l.vec_id <> r.vec_id
          ) x WHERE rn <= {int(m)}
        )""", """edges AS (
          SELECT src, dst FROM eg0 UNION SELECT dst, src FROM eg0
        )""", f"""q AS (
          SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id IN ({ids})
        )""", f"""probes AS (
          SELECT query_id, cent_id FROM (
            SELECT q.query_id, c.cent_id,
                   ROW_NUMBER() OVER (
                     PARTITION BY q.query_id
                     ORDER BY ROUND(list_cosine_similarity(q.qv, c.cv), 6) DESC,
                              c.cent_id ASC) AS rn
            FROM q CROSS JOIN cents c
          ) x WHERE rn <= {int(entries)}
        )""", """seeds AS (
          SELECT cent_id, MIN(vec_id) AS node FROM af GROUP BY cent_id
        )""", """b0 AS (
          SELECT DISTINCT query_id, node FROM probes JOIN seeds USING (cent_id)
        )"""]
    for s in range(1, steps + 1):
        parts.append(f"""f{s} AS (
          SELECT query_id, node FROM b{s - 1}
          UNION
          SELECT b.query_id, ed.dst FROM b{s - 1} b
          JOIN edges ed ON b.node = ed.src
        )""")
        parts.append(f"""s{s} AS (
          SELECT query_id, node, csim,
                 ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY csim DESC, node ASC) AS rn
          FROM (
            SELECT f.query_id, f.node,
                   ROUND(list_cosine_similarity(q.qv, af.v), 6) AS csim
            FROM f{s} f
            JOIN af ON f.node = af.vec_id
            JOIN q ON f.query_id = q.query_id
            WHERE f.node <> f.query_id
          ) y
        )""")
        parts.append(
            f"b{s} AS (SELECT query_id, node FROM s{s} WHERE rn <= {int(beam)})"
        )
    chain = ",\n        ".join(parts)
    return f"""
        WITH {_kmeans_ctes(n_clusters, iters, src)},
        {chain}
        SELECT query_id, node AS neighbor_id, csim,
               CAST(rn AS INTEGER) AS rank
        FROM s{int(steps)} WHERE rn <= {int(k)}
    """


def graph_beam_recall_eval(
    emb: DataFrame, query_ids: list[int], k: int = 5, **kw
) -> DataFrame:
    """Recall@k of the NSW beam search against the exact scan — the
    measured-recall eval every approximate retrieval path in this module
    ships (:func:`recall_eval` discipline). The cost is the two
    retrieval plans; the compare join is |queries|·k rows."""
    exact = cosine_topk(emb, query_ids, k).select("query_id", "neighbor_id")
    approx = graph_beam_topk(emb, query_ids, k, **kw).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    return (
        exact.join(approx, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("hit").alias("hits"),
            F.round(F.count("hit") / F.lit(float(k)), 4).alias("recall_at_k"),
        )
    )


def graph_beam_recall_eval_sql(
    query_ids: list[int],
    k: int = 5,
    iters: int = KMEANS_ITERS,
    src: str = "embeddings",
) -> str:
    exact = cosine_topk_sql(query_ids, k, src)
    approx = graph_beam_topk_sql(query_ids, k, iters=iters, src=src)
    return f"""
        SELECT e.query_id,
               COUNT(a.neighbor_id) AS hits,
               ROUND(COUNT(a.neighbor_id) / CAST({k} AS DOUBLE), 4)
                 AS recall_at_k
        FROM ({exact}) e
        LEFT JOIN ({approx}) a
          ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
        GROUP BY e.query_id
    """

# --------------------------------- hierarchical (two-level) coarse quantizer
# The auto-sized flat quantizer (graph_auto_n_clusters: K = n / 200) keeps
# the EDGE-BUILD pair stage linear, but its own assign stage is n·K dot
# products = n²/200 — the r9/r10 honest residual ("a real deployment
# switches to a sampled/hierarchical coarse quantizer — documented, not
# implemented").  This section implements it: the classic IMI / faiss
# train-on-sample design (Jégou et al., "Product Quantization for Nearest
# Neighbor Search", IEEE TPAMI 2011 §IV; Babenko & Lempitsky, "The Inverted
# Multi-Index", CVPR 2012), re-expressed Spark-first:
#
#   fit:    ONE bounded deterministic sample (vec_id stride) is collected to
#           the driver (≤ HIER_SAMPLE_ROWS × dim doubles — model-scale, the
#           same O(sample) state faiss's train() holds in RAM); level-1 =
#           √K super-centroids fit on the sample; level-2 = per-super-cell
#           sub-fits whose cell counts are proportional to the cell's sample
#           share (ΣK2_j ≈ K).  No corpus-sized shuffle anywhere in the fit.
#   assign: one narrow Arrow map — per batch argmax over the K1 supers, then
#           argmax over ONLY the winning super's sub-centroids: n·(K1 +
#           avg K2) ≈ 2·n·√K dots instead of n·K.  With the auto rule
#           K = n/200 that turns the assign from O(n²) into O(n^1.5): at
#           10M vectors, ~450 dots/vector instead of 50,000.
#
# The trade is the standard IVF-tree one: a vector near a super-cell
# boundary may land in a slightly different cell than the flat argmax would
# give.  For the NSW edge build (cells are only candidate buckets) that
# shifts a few candidate edges, not correctness of the search contract —
# and the measured-recall evals stay the gate.  The registry exercises the
# PRODUCTION kernel at fixture scale via two_level_seed_assign (seed
# centroids, fully SQL-expressible), so the kernel's numerics are
# oracle-pinned even though the large-K fit path itself is driver state.
#
# Honest ceilings (measured and arithmetic, not aspiration):
#   - sub-cell count is capped by the SAMPLE (each sub-fit can mint at most
#     its cell's sample-member count of centroids), so K beyond
#     ~sample_rows needs sample_rows raised in step — fine to K ≈ 100k
#     (sample 100k x 64 doubles ≈ 50 MB driver RAM, the faiss norm);
#   - the assign kernel ships the full flattened model in its closure, so
#     K ≈ 100k x dim 64 ≈ 50 MB per executor is the practical model-state
#     ceiling.  With the auto rule K = n/200 both ceilings land at the
#     same corpus size, ~20M vectors per index SHARD — past that a real
#     deployment shards the corpus (each shard its own quantizer, results
#     merged by score — exactly the IVF sharding faiss/Milvus use) or
#     keeps the model table-resident and assigns by equi-join on the
#     super cell.  Neither is needed at this repo's measured scales; the
#     sharded-merge path already exists as cosine_topk over unions.
HIER_K_THRESHOLD = 4096  # flat assign up to here (n ≈ 800k at auto sizing)
HIER_SAMPLE_ROWS = 20_000
HIER_ID_STRIDE = 1 << 20  # global sub-cell id = super_id·STRIDE + local idx


def _np_half_up6(x: "np.ndarray") -> "np.ndarray":
    return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6


def _np_argmax_cosine(
    X: "np.ndarray", nv: "np.ndarray", cents: list[tuple[int, "np.ndarray"]]
) -> tuple["np.ndarray", "np.ndarray"]:
    """Shared argmax-cosine inner loop for the two-level Arrow kernel:
    identical operation order to :func:`assign_cells_arrow` (sequential
    across dims, half-up 6dp, strict ``>`` so ties keep the LOWEST id in
    the sorted ``cents`` list) — the established oracle-parity math."""
    best_s = None
    best_c = None
    for cid, cv in cents:
        ncv = 0.0
        for x in cv:
            ncv = ncv + x * x
        ncv = float(np.sqrt(ncv))
        dot = np.zeros(len(X))
        for i in range(X.shape[1]):
            dot = dot + X[:, i] * cv[i]
        csim = _np_half_up6(dot / (nv * ncv))
        if best_s is None:
            best_s = csim
            best_c = np.full(len(X), cid, dtype=np.int64)
        else:
            m = csim > best_s
            best_s = np.where(m, csim, best_s)
            best_c = np.where(m, np.int64(cid), best_c)
    return best_c, best_s


def _np_lloyd(
    X: "np.ndarray", k: int, iters: int
) -> list[tuple[int, list[float]]]:
    """Driver-side spherical Lloyd over an in-memory (vec_id-sorted)
    sample — the faiss train() analogue.  Deterministic: init = the first
    ``k`` rows, assignment ties keep the lowest centroid id, per-dim means
    go through the exact-integer mean6 contract (scaled int64 sums +
    half-away-from-zero — same formula as the distributed fit), empty
    clusters drop.  Model state is O(k·dim); the sample is already bounded
    by the caller."""
    k = min(int(k), len(X))
    cents = [(j, X[j].astype(np.float64).copy()) for j in range(k)]
    nv = np.sqrt(np.einsum("ij,ij->i", X, X))
    for _ in range(int(iters)):
        C = np.vstack([cv for _, cv in cents])
        sims = (X @ C.T) / (
            np.maximum(nv, 1e-300)[:, None]
            * np.maximum(np.sqrt(np.einsum("ij,ij->i", C, C)), 1e-300)[None, :]
        )
        sims = _np_half_up6(sims)
        # argmax returns the FIRST maximal index = lowest centroid id
        best = np.argmax(sims, axis=1)
        nxt = []
        scaled = np.floor(X * 1e12 + 0.5).astype(np.int64)
        for j, (cid, _) in enumerate(cents):
            idx = np.where(best == j)[0]
            if not len(idx):
                continue  # empty cluster drops (GROUP BY semantics)
            s = scaled[idx].sum(axis=0, dtype=np.int64)
            nxt.append(
                (cid, np.array([_mean6(int(v), len(idx)) for v in s]))
            )
        cents = nxt
    return [(int(cid), [float(x) for x in cv]) for cid, cv in cents]


def hier_fit_model(
    emb: DataFrame,
    n_clusters: int,
    iters: int = KMEANS_ITERS,
    sample_rows: int = HIER_SAMPLE_ROWS,
    n_vectors: int | None = None,
) -> tuple[list[tuple[int, list[float]]], dict[int, list[tuple[int, list[float]]]]]:
    """Fit the two-level quantizer on a bounded deterministic sample.

    Returns ``(model1, model2)``: ``model1`` = [(super_id, centroid)],
    ``model2`` = {super_id: [(global cent_id, centroid), ...]} with
    ``cent_id = super_id·HIER_ID_STRIDE + local index``; ΣK2_j ≈
    ``n_clusters`` with each super's share proportional to its sample
    mass (so dense regions get more sub-cells — the IMI imbalance fix).
    Supers that capture no sample vectors drop from both levels."""
    base = emb.select("vec_id", _vec_double().alias("v"))
    n = int(n_vectors) if n_vectors is not None else base.count()
    stride = max(1, n // max(1, int(sample_rows)))
    rows = base.filter(F.col("vec_id") % stride == 0).collect()
    rows.sort(key=lambda r: int(r["vec_id"]))
    X = np.array([[float(x) for x in r["v"]] for r in rows], dtype=np.float64)
    if not len(X):
        raise ValueError("hier_fit_model: empty sample")
    K = max(1, int(n_clusters))
    K1 = max(1, math.isqrt(max(0, K - 1)) + 1)  # ceil(sqrt(K))
    model1 = _np_lloyd(X, K1, iters)
    nv = np.sqrt(np.einsum("ij,ij->i", X, X))
    sup, _ = _np_argmax_cosine(
        X, nv, [(cid, np.asarray(cv)) for cid, cv in model1]
    )
    model2: dict[int, list[tuple[int, list[float]]]] = {}
    for sid, _cv in model1:
        idx = np.where(sup == sid)[0]
        if not len(idx):
            continue
        k2 = max(1, round(K * len(idx) / len(X)))
        sub = _np_lloyd(X[idx], k2, iters)
        model2[sid] = [
            (sid * HIER_ID_STRIDE + local, cv) for local, cv in sub
        ]
    model1 = [(sid, cv) for sid, cv in model1 if sid in model2]
    return model1, model2


def hier_flat_model(
    model2: dict[int, list[tuple[int, list[float]]]]
) -> list[tuple[int, list[float]]]:
    """Flatten level-2 into the flat [(cent_id, cv)] shape the probe-side
    consumers (query→cell cross joins — query-scale, never corpus-scale)
    already take."""
    return sorted(
        (cid, cv) for subs in model2.values() for cid, cv in subs
    )


def assign_cells_two_level(
    base: DataFrame,
    model1: list[tuple[int, list[float]]],
    model2: dict[int, list[tuple[int, list[float]]]],
    keep_vec: bool = False,
) -> DataFrame:
    """Production two-level assignment: one narrow Arrow map, zero
    shuffles.  Per batch: argmax over the K1 supers, then argmax over
    ONLY the winning super's sub-centroids — n·(K1 + avg K2) dots.
    Same numerics as :func:`assign_cells_arrow` (sequential dims, half-up
    6dp, strict ``>`` ties→lowest id), so the seed-model registry twin is
    oracle-exact.  Output: (vec_id[, v], super_id, cent_id, csim) where
    ``csim`` is the level-2 cosine."""
    if not model1 or not model2:
        out = (
            base.withColumn("super_id", F.lit(None).cast("bigint"))
            .withColumn("cent_id", F.lit(None).cast("bigint"))
            .withColumn("csim", F.lit(None).cast("double"))
            .filter(F.lit(False))
        )
        cols = (["vec_id", "v"] if keep_vec else ["vec_id"]) + [
            "super_id", "cent_id", "csim"
        ]
        return out.select(*cols)
    supers = [
        (cid, np.asarray(cv, dtype=np.float64))
        for cid, cv in sorted(model1)
        if cid in model2
    ]
    subs = {
        sid: [
            (cid, np.asarray(cv, dtype=np.float64))
            for cid, cv in sorted(cells)
        ]
        for sid, cells in model2.items()
    }

    def assign(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.vstack(pdf["v"].to_numpy())
            nv = np.zeros(len(X))
            for i in range(X.shape[1]):
                nv = nv + X[:, i] * X[:, i]
            nv = np.sqrt(nv)
            sup, _ = _np_argmax_cosine(X, nv, supers)
            cent = np.empty(len(X), dtype=np.int64)
            csim = np.empty(len(X), dtype=np.float64)
            for sid in np.unique(sup):
                idx = np.where(sup == sid)[0]
                bc, bs = _np_argmax_cosine(X[idx], nv[idx], subs[int(sid)])
                cent[idx] = bc
                csim[idx] = bs
            out = {"vec_id": pdf["vec_id"]}
            if keep_vec:
                out["v"] = pdf["v"]
            out["super_id"] = sup
            out["cent_id"] = cent
            out["csim"] = csim
            yield pd.DataFrame(out)

    schema = (
        "vec_id long, v array<double>, super_id long, cent_id long, "
        "csim double"
        if keep_vec
        else "vec_id long, super_id long, cent_id long, csim double"
    )
    return base.select("vec_id", "v").mapInPandas(assign, schema=schema)


def two_level_seed_assign(
    emb: DataFrame, k1: int = 4, k2: int = 4
) -> DataFrame:
    """Registry face of the hierarchical quantizer — seed centroids so
    the whole construction is SQL-expressible and the PRODUCTION kernel
    (:func:`assign_cells_two_level`) is oracle-pinned end to end.

    Level-1 centroids = the first ``k1`` vectors; level-2 sub-centroids
    of a super-cell = its first ``k2`` members by vec_id (cent_id = the
    seed's own vec_id, a natural globally-unique id).  Every vector is
    then two-level-assigned, and the output is the scalar per-sub-cell
    summary (super_id, cent_id, size, mean_sim) — the
    :func:`kmeans_clusters` hashable-face discipline.

    Plan shape: two narrow Arrow maps over the corpus + two bounded
    collects (k1 rows; ≤ k1·k2 seed rows) + one map-side-combined
    aggregate.  Zero corpus-sized shuffles, zero windows over the corpus
    (the seed-election window partitions by super-cell)."""
    base = emb.select("vec_id", _vec_double().alias("v"))
    model1 = [
        (int(r["vec_id"]), [float(x) for x in r["v"]])
        for r in base.filter(F.col("vec_id") < int(k1)).collect()
    ]
    a1 = assign_cells_arrow(base, model1)
    w = Window.partitionBy("cent_id").orderBy("vec_id")
    seed_ids = (
        a1.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= int(k2))
        .select(F.col("cent_id").alias("super_id"), "vec_id")
    )
    seeds = seed_ids.join(base, "vec_id").collect()  # ≤ k1·k2 rows
    model2: dict[int, list[tuple[int, list[float]]]] = {}
    for r in sorted(seeds, key=lambda r: (int(r["super_id"]), int(r["vec_id"]))):
        model2.setdefault(int(r["super_id"]), []).append(
            (int(r["vec_id"]), [float(x) for x in r["v"]])
        )
    assigned = assign_cells_two_level(base, model1, model2)
    return (
        assigned.groupBy("super_id", "cent_id")
        .agg(
            F.count("*").alias("size"),
            F.round(F.avg("csim"), 6).alias("mean_sim"),
        )
    )


def two_level_seed_assign_sql(
    k1: int = 4, k2: int = 4, src: str = "embeddings"
) -> str:
    """DuckDB twin of :func:`two_level_seed_assign`: level-1 argmax over
    the first-k1 seed vectors, per-super seed election by vec_id, then
    the level-2 argmax restricted to the winner's seeds."""
    return f"""
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {src}
        ),
        c1 AS (SELECT vec_id AS super_id, v AS cv FROM e
               WHERE vec_id < {int(k1)}),
        a1 AS (
          SELECT vec_id, super_id FROM (
            SELECT e.vec_id, c1.super_id,
                   ROW_NUMBER() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY ROUND(list_cosine_similarity(e.v, c1.cv), 6)
                                DESC,
                              c1.super_id ASC) AS rn
            FROM e CROSS JOIN c1
          ) x WHERE rn = 1
        ),
        sc AS (
          SELECT super_id, cent_id, v AS cv FROM (
            SELECT a1.super_id, a1.vec_id AS cent_id, e.v,
                   ROW_NUMBER() OVER (
                     PARTITION BY a1.super_id ORDER BY a1.vec_id) AS rn
            FROM a1 JOIN e ON e.vec_id = a1.vec_id
          ) y WHERE rn <= {int(k2)}
        ),
        a2 AS (
          SELECT vec_id, super_id, cent_id, csim FROM (
            SELECT a1.vec_id, sc.super_id, sc.cent_id,
                   ROUND(list_cosine_similarity(e.v, sc.cv), 6) AS csim,
                   ROW_NUMBER() OVER (
                     PARTITION BY a1.vec_id
                     ORDER BY ROUND(list_cosine_similarity(e.v, sc.cv), 6)
                                DESC,
                              sc.cent_id ASC) AS rn
            FROM a1
            JOIN e ON e.vec_id = a1.vec_id
            JOIN sc ON sc.super_id = a1.super_id
          ) z WHERE rn = 1
        )
        SELECT super_id, cent_id, COUNT(*) AS size,
               ROUND(AVG(csim), 6) AS mean_sim
        FROM a2 GROUP BY super_id, cent_id
    """
