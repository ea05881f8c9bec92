"""Similarity search over embedding columns (north star, SURVEY §2.9).

Exact brute-force top-k cosine (oracle-checkable) plus two approximate
scale paths: random-projection LSH and an IVF-style coarse quantizer
(KMeans partitions). The reference has no vector search; its closest
analogue is the argmax over topic-distribution vectors (T5,
LDALoader.scala:131-140), which is also implemented here.

Scale design (100 TB):
* Exact: queries are broadcast against a partitioned candidate set; each
  executor scans its shard once; per-query top-k via window rank on
  (query_id) — shuffle carries only |queries|·k rows after a map-side
  rank prune. Dot products are JVM ``zip_with``/``aggregate`` — no Python.
* LSH: `BucketedRandomProjectionLSH` on L2-normalized vectors turns
  cosine into euclidean; the bucket join bounds the pair space.
* IVF: KMeans centroids (tiny, broadcast) → assign partition → probe the
  nearest few partitions only — classic FAISS-IVF reshaped as a join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .._registry import Registry
from ..catalog import load_table, spread

REG = Registry()

N_QUERIES = 10
TOP_K = 5


def _as_double(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _l2norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


@REG.register(
    "argmax_array",
    oracle="""
    SELECT vec_id,
           CAST(list_position(embedding, list_aggregate(embedding, 'max')) - 1 AS BIGINT)
             AS argmax_idx
    FROM embeddings
    """,
)
def argmax_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax over an array column (reference T5: main-topic argmax loop,
    LDALoader.scala:131-140 — first-index tie rule, 0-based; the
    reference's last-index ``<=`` rule is a documented divergence)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        (F.array_position(F.col("embedding"), F.array_max("embedding")) - 1)
        .cast("long")
        .alias("argmax_idx"),
    )


_KNN_ORACLE = f"""
WITH ex AS (
  SELECT vec_id,
         CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings),
norms AS (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM ex GROUP BY vec_id),
dots AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, SUM(a.v * b.v) AS dot
  FROM ex a JOIN ex b ON a.i = b.i AND b.vec_id <> a.vec_id
  WHERE a.vec_id < {N_QUERIES}
  GROUP BY a.vec_id, b.vec_id),
scored AS (
  SELECT d.query_id, d.neighbor_id, d.dot / (qn.nrm * nn.nrm) AS cos
  FROM dots d
  JOIN norms qn ON qn.vec_id = d.query_id AND qn.nrm > 0
  JOIN norms nn ON nn.vec_id = d.neighbor_id AND nn.nrm > 0)
SELECT query_id, neighbor_id,
       round(cos, 6) AS cosine_sim,
       CAST(rn AS INTEGER) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY round(cos, 6) DESC, neighbor_id) AS rn
      FROM scored)
WHERE rn <= {TOP_K}
"""


@REG.register("knn_cosine_exact", oracle=_KNN_ORACLE)
def knn_cosine_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k cosine neighbors for the first N_QUERIES vectors.

    Brute-force baseline: broadcast the (tiny) query set against the full
    candidate table, JVM-side dot products in double precision, per-query
    top-k via window rank with neighbor-id tiebreak. The candidate scan is
    embarrassingly parallel; the only shuffle is the |queries|-keyed rank.
    """
    emb = load_table(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull()
    ).select("vec_id", _as_double("embedding").alias("e"))
    # zero-norm vectors have undefined cosine: excluded by definition
    # (mirrored in the oracle via nrm > 0 join conditions — DuckDB's x/0.0
    # is NULL, which would otherwise survive into ranked rows)
    emb = emb.withColumn("nrm", _l2norm(F.col("e"))).where(F.col("nrm") > 0)
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe"), F.col("nrm").alias("qn")
    )
    cand = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("e").alias("ce"), F.col("nrm").alias("cn")
    )
    pairs = cand.crossJoin(F.broadcast(q)).where(F.col("neighbor_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        (_dot(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn"))).alias("cos"),
    )
    # rank on the ROUNDED score (ADVICE r13): the displayed 6-dp rounding
    # must also decide rank, or two docs whose cosines differ by only
    # summation-order/libm ulps at the k-boundary could order differently
    # across engines (Spark vs DuckDB oracle vs the GEMM twin).
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("cos", 6)), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cosine_sim"), "rank")
    )


@REG.register("knn_cosine_lsh")  # rows-only: LSH is approximate (seeded, deterministic)
def knn_cosine_lsh(
    spark: SparkSession,
    sf_dir: str,
    *,
    euclid_threshold: float = 1.0,
    num_hash_tables: int = 4,
) -> DataFrame:
    """Approximate neighbor pairs via random-projection LSH on L2-normalized
    vectors (cosine ≥ ~0.5 ⇔ euclidean ≤ 1.0 after normalization; in
    general cos ≥ t ⇔ euclid ≤ sqrt(2-2t)).

    Scale path for the exact query above: the bucketed join restricts
    comparisons to same-bucket candidates. Measured pair-recall vs exact
    enumeration (tests/test_search.py::test_ann_recall_lsh, sf0.01):
    ≥0.97 at cos≥0.4 with 4 hash tables, ≥0.99 with 8 — the keyword args
    let callers trade tables for recall; the registered key uses the
    defaults.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    emb = load_table(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull()
    ).select("vec_id", _as_double("embedding").alias("e")).where(
        # zero-norm vectors have undefined cosine: excluded by definition,
        # same policy as the exact/ivf/gemm variants (a zero vector
        # "normalized by 1" would otherwise report cosine 0.5 vs any unit
        # vector through the euclidean->cosine identity below)
        _l2norm(F.col("e")) > 0
    )
    if emb.isEmpty():  # LSH cannot fit on zero rows: empty-in -> empty-out
        return spark.createDataFrame([], "id_a long, id_b long, cosine_sim double")
    # when() keeps array_to_vector lazy: Catalyst is free to reorder a
    # deterministic UDF above the isNotNull filter, so the guard must live
    # INSIDE the expression, not in a preceding .where().
    # spread first: the checkpoint freezes the layout, and a single-split
    # corpus would pin the hash transform + approxSimilarityJoin map side
    # to ONE core (round-14 grain lesson; 4.2 -> 0.9 s warm at sf0.1)
    normed = spread(spark, emb).select(
        "vec_id",
        F.when(
            F.col("e").isNotNull(),
            array_to_vector(
                F.transform("e", lambda x: x / _l2norm(F.col("e")))
            ),
        ).alias("features"),
    ).where(F.col("features").isNotNull())
    # Catalyst reorders deterministic UDFs across filters (the LSH hash was
    # observed evaluating on rows the isNotNull filter should have removed),
    # so materialize the filtered frame and cut the lineage before fit —
    # per CALL: the frame feeds the fit and both approxSimilarityJoin
    # sides (round 15, VERDICT r14 #1: no cross-call memo of
    # corpus-derived work).
    normed = normed.localCheckpoint(eager=True)
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=0.5,
        numHashTables=num_hash_tables,
        seed=42,
    )
    model = lsh.fit(normed)
    pairs = model.approxSimilarityJoin(normed, normed, euclid_threshold, distCol="euclid")
    return (
        pairs.where(F.col("datasetA.vec_id") < F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.vec_id").alias("id_a"),
            F.col("datasetB.vec_id").alias("id_b"),
            F.round(1 - F.col("euclid") * F.col("euclid") / 2, 6).alias("cosine_sim"),
        )
    )


@REG.register("knn_cosine_ivf")  # rows-only: IVF probe is approximate (seeded, deterministic)
def knn_cosine_ivf(
    spark: SparkSession,
    sf_dir: str,
    *,
    n_clusters: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """IVF-style ANN: KMeans coarse quantizer partitions the corpus; each
    query probes only its nearest ``nprobe`` partitions.

    The centroid table is tiny → broadcast; candidate scan cost drops by
    ~n_clusters/nprobe vs brute force. This is the 100 TB shape: cluster
    assignment is a one-time batch job, probes are partition-pruned scans.

    Recall@5 vs exact is measured and pinned in
    tests/test_search.py::test_ann_recall_ivf (the testdata embeddings are
    near-random — worst case for a coarse quantizer — so the nprobe→recall
    curve is documented in COVERAGE.md rather than assumed); nprobe ==
    n_clusters provably degenerates to exact brute force and the test
    asserts that equality.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array
    # null embeddings carry no vector; zero-norm vectors have undefined
    # cosine — both are excluded from index and queries by definition
    emb = load_table(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull()
    ).select("vec_id", _as_double("embedding").alias("e")).where(
        _l2norm(F.col("e")) > 0
    )
    # bounded probe: we only need the exact count when it is <= n_clusters,
    # so scan at most n_clusters+1 rows instead of aggregating the table
    n_probe = emb.limit(n_clusters + 1).count()
    if n_probe < 2:  # KMeans needs k>=2; <2 vectors admit no neighbor pairs
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cosine_sim double, rank int"
        )
    # Round 15 (VERDICT r14 #1): the coarse-quantizer fit runs FRESH on
    # every call — the r14 per-(app, sf_dir, k) memo let the bench's
    # measured runs probe an index whose construction only the warmup
    # paid. The fit is seeded, so repeated calls still return identical
    # rows; the checkpoint below is intra-call (assignment feeds the
    # query side and the candidate join).
    vecs = emb.select(
        "vec_id",
        "e",
        F.when(F.col("e").isNotNull(), array_to_vector(F.col("e"))).alias("features"),
    ).where(F.col("features").isNotNull())
    # materialize the fit input ONCE before the iterative fit (guide §5
    # caching rule; round 15): KMeans' ~20 iteration jobs otherwise
    # re-evaluate the scan+projection lineage per job — measured 14.7 ->
    # 3.1 s at local[32] with IDENTICAL cluster centers (localCheckpoint
    # changes lineage only, never partitioning, so the seeded k-means||
    # init sees the same data in the same places).
    vecs = vecs.localCheckpoint(eager=True)
    # KMeans aborts when k exceeds the number of points (tiny corpora)
    km = KMeans(k=min(n_clusters, n_probe), seed=42, maxIter=20, featuresCol="features")
    model = km.fit(vecs)
    assigned = model.transform(vecs).select(
        "vec_id", "e", _l2norm(F.col("e")).alias("nrm"), F.col("prediction").alias("cluster")
    ).localCheckpoint(eager=True)

    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cluster int, centroid array<double>",
    )
    q = assigned.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe"), F.col("nrm").alias("qn")
    )
    # nearest nprobe centroids per query (centroid table is tiny)
    qc = (
        q.crossJoin(F.broadcast(centroids))
        .select(
            "query_id",
            "qe",
            "qn",
            "cluster",
            _dot(F.col("qe"), F.col("centroid")).alias("score"),
        )
        .withColumn(
            "r",
            F.row_number().over(Window.partitionBy("query_id").orderBy(F.desc("score"), "cluster")),
        )
        .where(F.col("r") <= nprobe)
        .select("query_id", "qe", "qn", "cluster")
    )
    cand = assigned.select(
        F.col("vec_id").alias("neighbor_id"), F.col("e").alias("ce"), F.col("nrm").alias("cn"), "cluster"
    )
    scored = (
        qc.join(cand, "cluster")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn"))).alias("cos"),
        )
    )
    # rank on the ROUNDED score (ADVICE r13): the displayed 6-dp rounding
    # must also decide rank, or two docs whose cosines differ by only
    # summation-order/libm ulps at the k-boundary could order differently
    # across engines (Spark vs DuckDB oracle vs the GEMM twin).
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("cos", 6)), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cosine_sim"), "rank")
    )


_EMB_DEDUP_ORACLE = """
WITH ex AS (
  SELECT vec_id, label,
         CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings),
norms AS (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM ex GROUP BY vec_id),
dots AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, SUM(a.v * b.v) AS dot
  FROM ex a JOIN ex b ON a.i = b.i AND a.label = b.label AND a.vec_id < b.vec_id
  GROUP BY a.vec_id, b.vec_id),
scored AS (
  SELECT d.id_a, d.id_b, d.dot / (na.nrm * nb.nrm) AS cos
  FROM dots d JOIN norms na ON na.vec_id = d.id_a AND na.nrm > 0
  JOIN norms nb ON nb.vec_id = d.id_b AND nb.nrm > 0)
SELECT id_a, id_b, round(cos, 6) AS cosine_sim
FROM scored WHERE cos >= 0.9
"""


@REG.register("dedup_embedding_cosine", oracle=_EMB_DEDUP_ORACLE)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs: cosine ≥ 0.9 within a label block.

    Blocking on ``label`` stands in for the LSH/IVF candidate stage — the
    exact-verify join only runs inside blocks, which is the scalable shape
    (never the full n² cross join).
    """
    emb = load_table(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull() & F.col("label").isNotNull()
    ).select("vec_id", "label", _as_double("embedding").alias("e"))
    emb = emb.withColumn("nrm", _l2norm(F.col("e"))).where(F.col("nrm") > 0)
    a = emb.select(
        F.col("vec_id").alias("id_a"), F.col("label").alias("la"), F.col("e").alias("ea"), F.col("nrm").alias("na")
    )
    b = emb.select(
        F.col("vec_id").alias("id_b"), F.col("label").alias("lb"), F.col("e").alias("eb"), F.col("nrm").alias("nb")
    )
    pairs = a.join(b, (F.col("la") == F.col("lb")) & (F.col("id_a") < F.col("id_b")))
    scored = pairs.select(
        "id_a", "id_b", (_dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))).alias("cos")
    )
    return scored.where(F.col("cos") >= 0.9).select(
        "id_a", "id_b", F.round("cos", 6).alias("cosine_sim")
    )


@REG.register("knn_cosine_gemm", oracle=_KNN_ORACLE)  # round 13: exact by
# construction, so it carries knn_cosine_exact's oracle (identical output
# was already equality-asserted in tests; the BLAS-vs-JVM summation-order
# difference is ~1 ulp, invisible at the 1e-6 rounding both the compare
# and the emitted cosine_sim column apply)
def knn_cosine_gemm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k cosine via numpy GEMM inside mapInPandas: the query
    matrix (Q×d, model-sized) is captured in the closure and broadcast once
    per executor; each Arrow batch of candidates does ONE matrix multiply
    (C·Qᵀ) in BLAS instead of per-pair JVM lambda folds.

    Same semantics as `knn_cosine_exact` (tests assert identical output) —
    this is the high-throughput path when d is large: BLAS does ~10-50×
    the FLOPs/s of per-element codegen. Each batch emits only its PARTIAL
    top-k per query (np.argpartition), so the shuffle into the final
    global window carries batches×Q×k rows instead of n×Q — at 100 TB
    that is the difference between a broadcast-sized rank input and a
    corpus-sized one (top-k of per-partition top-k == global top-k).
    """
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull()
    ).where(_l2norm(_as_double("embedding")) > 0)
    q_rows = (
        emb.where(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    )  # model-sized (N_QUERIES × d), the broadcast query set
    if not q_rows:  # empty corpus/query set -> empty result, not a crash
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cosine_sim double, rank int"
        )
    q_ids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r["embedding"] for r in q_rows], dtype=np.float64)
    q_norm = np.linalg.norm(q_mat, axis=1)

    def score_batches(batches):
        for pdf in batches:
            c_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            c_mat = np.array(list(pdf["embedding"]), dtype=np.float64)
            if len(c_mat) == 0:
                continue
            c_norm = np.linalg.norm(c_mat, axis=1)
            cos = (c_mat @ q_mat.T) / np.outer(c_norm, q_norm)  # (batch, Q)
            n, q = cos.shape
            # self-pairs masked to -inf BEFORE the partial top-k so a
            # query's own row can never displace a genuine neighbor
            np.copyto(cos, -np.inf, where=c_ids[:, None] == q_ids[None, :])
            kk = min(TOP_K, n)
            # batch-local top-k per query (column): unordered partial
            # select is O(n) vs O(n log n) sort; global order is restored
            # by the window rank downstream
            part = np.argpartition(-cos, kk - 1, axis=0)[:kk]  # (kk, Q)
            out = pd.DataFrame(
                {
                    "query_id": np.broadcast_to(q_ids, (kk, q)).reshape(-1),
                    "neighbor_id": c_ids[part].reshape(-1),
                    "cos": np.take_along_axis(cos, part, axis=0).reshape(-1),
                }
            )
            yield out[np.isfinite(out["cos"].to_numpy())]

    scored = emb.select("vec_id", "embedding").mapInPandas(
        score_batches, schema="query_id long, neighbor_id long, cos double"
    )
    # rank on the ROUNDED score (ADVICE r13): the displayed 6-dp rounding
    # must also decide rank, or two docs whose cosines differ by only
    # summation-order/libm ulps at the k-boundary could order differently
    # across engines (Spark vs DuckDB oracle vs the GEMM twin).
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("cos", 6)), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cosine_sim"), "rank")
    )


@REG.register(
    "embedding_quantize_int8",
    oracle="""
    WITH scaled AS (
      SELECT vec_id,
             list_aggregate(list_transform(embedding, x -> abs(x)), 'max') AS max_abs
      FROM embeddings)
    SELECT e.vec_id,
           round(CAST(s.max_abs AS DOUBLE), 6) AS scale,
           array_to_string(
             list_transform(e.embedding,
                            x -> CAST(CAST(round(CAST(x AS DOUBLE) * 127.0
                                           / CAST(s.max_abs AS DOUBLE), 0) AS BIGINT)
                                      AS VARCHAR)),
             ',') AS q8
    FROM embeddings e JOIN scaled s ON e.vec_id = s.vec_id
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization per vector (scale = max|x|, q =
    round(127·x/scale)) — 4× storage cut for a 100 TB vector store with
    ~0.3% cosine error at d=64. Pure JVM array math; the oracle recomputes
    identically (both round half-away on doubles). The quantized vector is
    serialized comma-joined so the output schema stays atomic for external
    hashers (see tests/test_registry_schemas.py); a production sink would
    keep the packed array/binary form."""
    emb = load_table(spark, sf_dir, "embeddings")
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    max_abs = F.array_max(F.transform(as_double, lambda x: F.abs(x)))
    return emb.select(
        "vec_id",
        F.round(max_abs, 6).alias("scale"),
        F.concat_ws(
            ",",
            F.transform(
                as_double,
                # zero vector: scale 0 and all-zero codes (ANSI division by
                # zero would otherwise abort the whole job)
                lambda x: F.when(
                    max_abs > 0, F.round(x * 127.0 / max_abs, 0).cast("long")
                )
                .otherwise(F.lit(0))
                .cast("string"),
            ),
        ).alias("q8"),
    )


# ---------------------------------------------------------------------------
# IVF as a STORED partitioned index (the 100 TB deployment shape)
# ---------------------------------------------------------------------------

_IVF_INDEX_MEMO: dict[tuple[str, str], tuple[str, str]] = {}
_IVF_CLUSTERS, _IVF_NPROBE = 16, 4


def build_ivf_index(spark: SparkSession, sf_dir: str) -> tuple[str, str] | None:
    """One-time IVF index build: assign every vector to its KMeans cluster
    and WRITE the assignment as a parquet table partitioned by cluster id,
    plus a tiny centroids table. At 100 TB this is the batch index job;
    queries then read only their probed partitions (directory-level
    pruning — no index structure needed beyond the filesystem layout).
    Memoized per (applicationId, sf_dir) for the driver's repeated
    query calls. Returns
    None when the corpus is empty (nothing to index)."""
    # keyed on (applicationId, sf_dir) like every other per-app artifact
    # memo (VERDICT r14 #6: an sf_dir-only key would silently serve a
    # stale index if one long-lived process ever spanned two applications)
    memo_key = (spark.sparkContext.applicationId, sf_dir)
    if memo_key in _IVF_INDEX_MEMO:
        return _IVF_INDEX_MEMO[memo_key]
    import tempfile

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    emb = load_table(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull()
    ).select("vec_id", _as_double("embedding").alias("e")).where(
        _l2norm(F.col("e")) > 0
    )
    n_probe = emb.limit(_IVF_CLUSTERS + 1).count()  # bounded probe, not a full scan
    if n_probe < 2:  # KMeans needs k>=2; <2 vectors admit no neighbor pairs
        return None
    vecs = emb.select(
        "vec_id",
        "e",
        F.when(F.col("e").isNotNull(), array_to_vector(F.col("e"))).alias("features"),
    ).where(F.col("features").isNotNull())
    # materialize once before the iterative fit (guide §5; round 15 —
    # see knn_cosine_ivf): lineage-only, identical centers, and the
    # index write below re-reads the checkpoint instead of the scan
    vecs = vecs.localCheckpoint(eager=True)
    model = KMeans(
        k=min(_IVF_CLUSTERS, n_probe), seed=42, maxIter=20, featuresCol="features"
    ).fit(vecs)
    base = tempfile.mkdtemp(prefix="ivf_index_")
    index_path = f"{base}/vectors"
    centroids_path = f"{base}/centroids"
    (
        model.transform(vecs)
        .select(
            "vec_id",
            "e",
            _l2norm(F.col("e")).alias("nrm"),
            F.col("prediction").alias("cluster"),
        )
        .write.mode("overwrite")
        .partitionBy("cluster")
        .parquet(index_path)
    )
    spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cluster int, centroid array<double>",
    ).write.mode("overwrite").parquet(centroids_path)
    _IVF_INDEX_MEMO[memo_key] = (index_path, centroids_path)
    return index_path, centroids_path


@REG.register("knn_cosine_ivf_stored")  # rows-only: approximate (seeded, deterministic)
def knn_cosine_ivf_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF probe against the STORED partitioned index: the probed cluster
    ids become a partition filter on the index table, so the scan touches
    only nprobe/n_clusters of the data at the directory level (asserted
    in tests/test_search.py). Same quantizer/seed as `knn_cosine_ivf`,
    whose per-query-fit results it must reproduce exactly.

    The probe-cluster list is collected to the driver — it is model-sized
    (≤ queries × nprobe ints), the same class of state as the centroids."""
    built = build_ivf_index(spark, sf_dir)
    if built is None:  # empty corpus: no index to build -> empty result
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cosine_sim double, rank int"
        )
    index_path, centroids_path = built
    index = spark.read.parquet(index_path)
    centroids = spark.read.parquet(centroids_path)

    q = index.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe"), F.col("nrm").alias("qn")
    )
    qc = (
        q.crossJoin(F.broadcast(centroids))
        .select(
            "query_id", "qe", "qn", "cluster",
            _dot(F.col("qe"), F.col("centroid")).alias("score"),
        )
        .withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.desc("score"), "cluster")
            ),
        )
        .where(F.col("r") <= _IVF_NPROBE)
        .select("query_id", "qe", "qn", "cluster")
    )
    probed = sorted({r["cluster"] for r in qc.select("cluster").distinct().collect()})
    cand = index.where(F.col("cluster").isin(probed)).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("e").alias("ce"),
        F.col("nrm").alias("cn"),
        "cluster",
    )
    scored = (
        qc.join(cand, "cluster")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn"))).alias("cos"),
        )
    )
    # rank on the ROUNDED score (ADVICE r13): the displayed 6-dp rounding
    # must also decide rank, or two docs whose cosines differ by only
    # summation-order/libm ulps at the k-boundary could order differently
    # across engines (Spark vs DuckDB oracle vs the GEMM twin).
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("cos", 6)), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cosine_sim"), "rank")
    )


# ---------------------------------------------------------------------------
# Product quantization (round 4): the memory-compression ANN path
# ---------------------------------------------------------------------------

_PQ_M = 8  # subspaces (d=64 -> 8 dims each)
_PQ_K = 256  # centroids per subspace -> one byte code each; 8 B/vector
_PQ_SAMPLE = 512  # training sample (model-sized, deterministic prefix)
_PQ_RERANK = 100  # ADC shortlist size fed to the exact re-rank stage
_PQ_MEMO: dict = {}


def _probe_grain(codes_df, n_rows: int, rows_per_part: int = 512):
    """Size the MEMOIZED code table's partition grain for the probe side
    (r14 session 3): the ADC scan is a trivial numpy lookup per row, so a
    2 000-row sf0.1 code table spread across 32 encode partitions pays 32
    Python-task setups and emits 32 partial top-RERANK batches into the
    shortlist window — per-task overhead, no compute to amortize. Coalesce
    (narrow, no shuffle — the frame is already checkpointed) to ~512 rows
    per partition, but NEVER above the natural grain: a 100 TB code table
    has n_rows/512 >> partitions and keeps its layout untouched. The
    global shortlist is a total-ordered window (score desc, id asc), so
    batching never changes results."""
    import math

    parts = codes_df.rdd.getNumPartitions()
    target = max(1, math.ceil(n_rows / rows_per_part))
    return codes_df.coalesce(target) if target < parts else codes_df


def _pq_sample_rows(spark, sf_dir: str, emb):
    """The model-sized PQ training/query sample (vec_id < _PQ_SAMPLE over
    the L2-NORMALIZED embedding frame) — collected FRESH per call (round
    15, VERDICT r14 #1: the r14 per-(app, sf_dir) memo made measured
    bench runs of the live pq/ivfpq keys skip a collect their declared
    computation includes). ann_recall_eval shares ONE collect across the
    methods it evaluates within a single call via its `shared` dict."""
    return emb.where(F.col("vec_id") < _PQ_SAMPLE).collect()


def _pq_train_codebooks(sample: "object", seed: int = 42):
    """Per-subspace k-means (numpy, fixed 10 Lloyd iterations, seeded
    farthest-point-ish init) over an (n, d) sample of NORMALIZED vectors.
    Returns (m, k, d_s) codebooks. Deterministic for the driver's reruns."""
    import numpy as np

    x = np.asarray(sample, dtype=np.float64)
    n, d = x.shape
    d_s = d // _PQ_M
    rng = np.random.default_rng(seed)
    books = np.empty((_PQ_M, _PQ_K, d_s))
    for s in range(_PQ_M):
        sub = x[:, s * d_s : (s + 1) * d_s]
        idx = rng.choice(n, size=_PQ_K, replace=n < _PQ_K)
        cents = sub[idx].copy()
        for _ in range(10):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
            for c in range(_PQ_K):
                mask = assign == c
                if mask.any():
                    cents[c] = sub[mask].mean(0)
        books[s] = cents
    return books


def _pq_encode_iter(books, extra_cols=()):
    """mapInPandas closure: encode normalized vectors in column ``e`` to
    per-subspace nearest-centroid codes, passing ``extra_cols`` through
    (vectorized argmin per subspace — no per-row Python)."""

    def encode(batches):
        import numpy as np
        import pandas as pd

        d_s = books.shape[2]
        for pdf in batches:
            vecs = np.stack(pdf["e"].to_numpy())
            codes = np.empty((len(pdf), _PQ_M), dtype=np.int64)
            for s in range(_PQ_M):
                sub = vecs[:, s * d_s : (s + 1) * d_s]
                d2 = ((sub[:, None, :] - books[s][None, :, :]) ** 2).sum(-1)
                codes[:, s] = d2.argmin(1)
            out = {"vec_id": pdf["vec_id"].to_numpy()}
            for c in extra_cols:
                out[c] = pdf[c].to_numpy()
            out["code"] = list(codes)
            yield pd.DataFrame(out)

    return encode


@REG.register("knn_cosine_pq")  # rows-only: approximate (seeded, deterministic)
def knn_cosine_pq(
    spark: SparkSession, sf_dir: str, *, _shared: dict | None = None
) -> DataFrame:
    """Product-quantization ANN: top-k cosine via asymmetric distance
    computation (ADC) over 8-byte codes.

    This is the 100 TB *memory* story the IVF/LSH variants don't cover: a
    64-dim float64 vector is 512 B; its PQ code is 8 B (one byte per
    8-dim subspace, k=256 centroids) — 64× compression, so a 100 TB
    embedding table scans as ~1.6 TB of codes. Cosine over normalized vectors decomposes
    per subspace, so ADC scores are sums of m=8 table lookups: each query
    precomputes an (8×16) inner-product table against the codebooks (tiny,
    broadcast in the closure), and candidates never decompress.

    Pipeline: seeded per-subspace k-means on a deterministic model-sized
    sample (driver numpy — PQ training is sample-based by design), one
    ``mapInPandas`` encode pass (vectorized argmin), one ``mapInPandas``
    ADC scan emitting per-batch partial top-k (the shuffle carries
    batches×Q×k rows, same trick as the GEMM variant), global window
    top-k. Recall@5 vs ``knn_cosine_exact`` is measured and pinned in
    tests/test_search.py::test_ann_recall_pq.
    """
    import numpy as np

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("embedding").isNotNull())
        .select("vec_id", _as_double("embedding").alias("e"))
        .withColumn("nrm", _l2norm(F.col("e")))
        .where(F.col("nrm") > 0)
        .select(
            "vec_id",
            F.transform("e", lambda x: x / F.col("nrm")).alias("e"),
        )
    )
    out_schema = "query_id long, neighbor_id long, cosine_sim double, rank int"
    # Round 15 (VERDICT r14 #1): sample collect, codebook training and
    # corpus encode all run FRESH per call — the live key's declared
    # computation is train + encode + probe; the per-application memos
    # made measured bench runs probe-only. The stored-parquet lifecycle
    # lives in `knn_cosine_pq_stored`; results here are seeded and
    # identical across calls. The checkpoint is intra-call (the code
    # table feeds the ADC scan).
    # `_shared` is ann_recall_eval's PER-CALL scratchpad (see
    # knn_cosine_ivfpq): pq and ivfpq train identical codebooks from the
    # identical deterministic sample, so one collect+train per evaluation
    # call serves both. Standalone calls recompute everything.
    sample_rows = _shared.get("sample_rows") if _shared else None
    if sample_rows is None:
        sample_rows = _pq_sample_rows(spark, sf_dir, emb)
        if _shared is not None and len(sample_rows) >= 2:
            _shared["sample_rows"] = sample_rows
    if len(sample_rows) < 2:
        return spark.createDataFrame([], out_schema)
    books = _shared.get("books") if _shared else None
    if books is None:
        books = _pq_train_codebooks([r["e"] for r in sample_rows])
        if _shared is not None:
            _shared["books"] = books
    codes_df = (
        spread(spark, emb)
        .mapInPandas(
            _pq_encode_iter(books), schema="vec_id long, code array<long>"
        )
        .localCheckpoint(eager=True)
    )
    codes_df = _probe_grain(codes_df, codes_df.count())
    if _shared is not None:
        # the per-vector PQ codes are a pure function of (books, vector)
        # — ivfpq's code column is identical, so the evaluation call can
        # attach its cluster ids to these codes instead of re-encoding
        _shared["pq_codes"] = codes_df

    queries = [
        (int(r["vec_id"]), np.asarray(r["e"], dtype=np.float64))
        for r in sample_rows
        if r["vec_id"] < N_QUERIES
    ]
    if not queries:
        return spark.createDataFrame([], out_schema)
    return _pq_adc_rerank(spark, emb, books, codes_df, queries, out_schema)


def _pq_adc_rerank(spark, emb, books, codes_df, queries, out_schema):
    """Query side of the PQ index: ADC scan over the code table (per-batch
    partial top-RERANK), global shortlist window, exact re-rank. Split out
    so the memoized (`knn_cosine_pq`) and stored-parquet
    (`knn_cosine_pq_stored`) indexes share one probe plan — the shortlist
    is the GLOBAL ADC top-RERANK (deterministic given code-table content,
    independent of how the code table is partitioned), so both paths
    return identical results by construction."""
    import numpy as np

    d_s = books.shape[2]
    # per-query ADC tables: (Q, m, k) inner products query-subvector ·
    # centroid — model-sized, shipped in the closure
    adc = np.stack(
        [
            np.stack(
                [books[s] @ q[s * d_s : (s + 1) * d_s] for s in range(_PQ_M)]
            )
            for _, q in queries
        ]
    )
    qids = np.array([qid for qid, _ in queries])

    def adc_score(batches):
        import pandas as pd  # noqa: F811 — executor-side import

        for pdf in batches:
            codes = np.stack(pdf["code"].to_numpy())  # (n, m)
            vec_ids = pdf["vec_id"].to_numpy()
            # scores[q, n] = sum_s adc[q, s, codes[n, s]]
            scores = np.take_along_axis(
                adc[:, None, :, :], codes[None, :, :, None], axis=3
            )[..., 0].sum(-1)
            out = {"query_id": [], "neighbor_id": [], "cosine_sim": []}
            for qi in range(len(qids)):
                mask = vec_ids != qids[qi]
                sc, ids = scores[qi][mask], vec_ids[mask]
                # keep the RERANK depth per batch, not TOP_K: the exact
                # re-rank stage needs the full shortlist to recover from
                # quantization error (emitting only top-k here silently
                # degrades it to pure ADC)
                keep = min(_PQ_RERANK, len(sc))
                if keep == 0:
                    continue
                part = np.argpartition(-sc, keep - 1)[:keep]
                out["query_id"].extend([int(qids[qi])] * keep)
                out["neighbor_id"].extend(int(i) for i in ids[part])
                out["cosine_sim"].extend(float(s) for s in sc[part])
            yield pd.DataFrame(out)

    scored = codes_df.mapInPandas(
        adc_score, schema="query_id long, neighbor_id long, cosine_sim double"
    )
    # ADC shortlist -> EXACT re-rank (the standard PQ pipeline: the
    # compressed scan nominates _PQ_RERANK candidates per query, then the
    # true vectors — candidate-sized, not corpus-sized — break the
    # quantization ties). Both joins are broadcast (shortlist and query
    # set are model-sized).
    w_adc = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    shortlist = (
        scored.withColumn("rnk", F.row_number().over(w_adc))
        .where(F.col("rnk") <= _PQ_RERANK)
        .select("query_id", "neighbor_id")
    )
    qdf = spark.createDataFrame(
        [(int(qid), [float(x) for x in vec]) for qid, vec in queries],
        "query_id long, qe array<double>",
    )
    rescored = (
        emb.join(F.broadcast(shortlist), emb.vec_id == F.col("neighbor_id"))
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            _dot(F.col("e"), F.col("qe")).alias("cos"),  # normalized -> dot = cosine
        )
    )
    # rank on the ROUNDED score (ADVICE r13): the displayed 6-dp rounding
    # must also decide rank, or two docs whose cosines differ by only
    # summation-order/libm ulps at the k-boundary could order differently
    # across engines (Spark vs DuckDB oracle vs the GEMM twin).
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("cos", 6)), F.asc("neighbor_id")
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos", 6).alias("cosine_sim"),
            "rank",
        )
    )


def build_pq_index(spark: SparkSession, sf_dir: str) -> str | None:
    """One-time PQ index build: train the per-subspace codebooks, encode the
    corpus, and WRITE both as parquet — ``<base>/codebooks`` (m×k rows of
    (s, c, centroid), a few MB at any scale) and ``<base>/codes`` (8 B/vector
    code table). At 100 TB this is the batch index job; the code table and
    codebooks are durable artifacts surviving the session, and queries are
    probe-only reads (cf. ``build_ivf_index`` — same lifecycle, this is the
    compressed twin). Memoized per (applicationId, sf_dir). Returns None
    on an empty corpus."""
    import tempfile

    memo_key = (spark.sparkContext.applicationId, sf_dir, "pq-stored-path")
    if memo_key in _PQ_MEMO:
        return _PQ_MEMO[memo_key]
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("embedding").isNotNull())
        .select("vec_id", _as_double("embedding").alias("e"))
        .withColumn("nrm", _l2norm(F.col("e")))
        .where(F.col("nrm") > 0)
        .select("vec_id", F.transform("e", lambda x: x / F.col("nrm")).alias("e"))
    )
    sample_rows = emb.where(F.col("vec_id") < _PQ_SAMPLE).collect()  # model-sized
    if len(sample_rows) < 2:
        return None
    books = _pq_train_codebooks([r["e"] for r in sample_rows])
    base = tempfile.mkdtemp(prefix="pq_index_")
    spark.createDataFrame(
        [
            (s, c, [float(x) for x in books[s][c]])
            for s in range(books.shape[0])
            for c in range(books.shape[1])
        ],
        "s int, c int, centroid array<double>",
    ).write.mode("overwrite").parquet(f"{base}/codebooks")
    (
        spread(spark, emb)
        .mapInPandas(_pq_encode_iter(books), schema="vec_id long, code array<long>")
        .write.mode("overwrite")
        .parquet(f"{base}/codes")
    )
    _PQ_MEMO[memo_key] = base
    return base


@REG.register("knn_cosine_pq_stored")  # rows-only: approximate (seeded, deterministic)
def knn_cosine_pq_stored(
    spark: SparkSession, sf_dir: str, *, n_queries: int = N_QUERIES
) -> DataFrame:
    """PQ ANN against the STORED parquet index: codebooks and the 8-byte
    code table are read back from disk (no retraining, no re-encode), then
    the shared `_pq_adc_rerank` probe runs — so results must reproduce
    `knn_cosine_pq` exactly (asserted in tests/test_search.py). This is the
    durable-artifact shape of the PQ story at 100 TB: the index outlives
    the session; a query session reads ~1.6 TB of codes instead of 100 TB
    of vectors, plus a few MB of codebooks.

    Round 6: the LOADED driver-side artifacts (codebook array, query
    sample) are cached per (session, index path), so repeated probes skip
    the codebook parquet re-read + rebuild — only the code-table scan
    (the by-design artifact read) repeats. Amortization at n_queries
    10/100/400 is measured in COVERAGE.md next to the memoized twin's."""
    import numpy as np

    out_schema = "query_id long, neighbor_id long, cosine_sim double, rank int"
    base = build_pq_index(spark, sf_dir)
    if base is None:
        return spark.createDataFrame([], out_schema)
    app = spark.sparkContext.applicationId
    art_key = (app, base, "pq-stored-art")
    if art_key in _PQ_MEMO:
        books = _PQ_MEMO[art_key]
    else:
        book_rows = spark.read.parquet(f"{base}/codebooks").collect()  # m×k rows
        m = max(r["s"] for r in book_rows) + 1
        k = max(r["c"] for r in book_rows) + 1
        d_s = len(book_rows[0]["centroid"])
        books = np.empty((m, k, d_s))
        for r in book_rows:
            books[r["s"], r["c"]] = r["centroid"]
        _PQ_MEMO[art_key] = books
    codes_df = spark.read.parquet(f"{base}/codes")
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("embedding").isNotNull())
        .select("vec_id", _as_double("embedding").alias("e"))
        .withColumn("nrm", _l2norm(F.col("e")))
        .where(F.col("nrm") > 0)
        .select("vec_id", F.transform("e", lambda x: x / F.col("nrm")).alias("e"))
    )
    if n_queries > _PQ_SAMPLE:
        # the memoized sample covers vec_id < _PQ_SAMPLE only — honor a
        # larger query set with a fresh collect rather than silently
        # truncating it to the cached bound (round-7 ADVICE fix)
        sample_rows = emb.where(F.col("vec_id") < n_queries).collect()
    else:
        sample_rows = _pq_sample_rows(spark, sf_dir, emb)
    queries = [
        (int(r["vec_id"]), np.asarray(r["e"], dtype=np.float64))
        for r in sample_rows
        if r["vec_id"] < n_queries
    ]
    if not queries:
        return spark.createDataFrame([], out_schema)
    return _pq_adc_rerank(spark, emb, books, codes_df, queries, out_schema)


@REG.register("knn_cosine_ivfpq")  # rows-only: approximate (seeded, deterministic)
def knn_cosine_ivfpq(
    spark: SparkSession,
    sf_dir: str,
    *,
    n_clusters: int = 16,
    nprobe: int = 8,
    n_queries: int = N_QUERIES,
    _shared: dict | None = None,
) -> DataFrame:
    """IVF+PQ combined — the FAISS-style architecture an actual 100 TB
    vector store runs: a coarse KMeans quantizer prunes the search to
    ``nprobe`` of ``n_clusters`` partitions (I/O: read 1/2 of the index
    at the defaults), the probed partitions scan 8-byte PQ codes instead
    of 512-byte vectors (memory/bandwidth: 64× less), ADC nominates a
    shortlist, and an exact re-rank of the candidate-sized shortlist
    restores ranking quality.

    Composition of the two indexed paths already in this module:
    ``knn_cosine_ivf``'s coarse assignment + ``knn_cosine_pq``'s
    codebooks/ADC/re-rank. Recall@5 vs exact is measured and pinned in
    tests/test_search.py::test_ann_recall_ivfpq."""
    import numpy as np

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    out_schema = "query_id long, neighbor_id long, cosine_sim double, rank int"
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("embedding").isNotNull())
        .select("vec_id", _as_double("embedding").alias("e"))
        .withColumn("nrm", _l2norm(F.col("e")))
        .where(F.col("nrm") > 0)
        .select("vec_id", F.transform("e", lambda x: x / F.col("nrm")).alias("e"))
    )
    # Round 15 (VERDICT r14 #1): codebook training, the coarse fit and
    # the corpus encode all run FRESH per call — train + encode + probe
    # is this live key's declared computation; the r14 per-application
    # index memo made measured bench runs probe-only. The stored-parquet
    # lifecycle lives in `knn_cosine_ivfpq_stored`.
    #
    # ONE corpus pass per call: the normalized+vectorized frame is
    # materialized before the iterative fit (guide §5 caching rule —
    # KMeans' ~20 iteration jobs otherwise re-evaluate the whole
    # normalization lineage per job; measured 14.7 -> 3.1 s at local[32]
    # with identical centers). The n_seen probe, the PQ sample and the
    # encode pass all read this checkpoint too, so the normalization is
    # evaluated exactly once. The rerank join keeps the parquet-based
    # `emb` (returned-plan shape unchanged).
    vecs = (
        emb.select(
            "vec_id",
            "e",
            F.when(F.col("e").isNotNull(), array_to_vector(F.col("e"))).alias(
                "features"
            ),
        )
        .where(F.col("features").isNotNull())
        .localCheckpoint(eager=True)
    )
    n_seen = vecs.limit(n_clusters + 1).count()
    if n_seen < 2:
        return spark.createDataFrame([], out_schema)

    # --- PQ codebooks on a model-sized sample ---
    # `_shared` is ann_recall_eval's PER-CALL scratchpad: the pq and
    # ivfpq methods it evaluates train codebooks from the identical
    # (seeded, deterministic) sample, so one collect+train inside a
    # single evaluation call serves both. Registered standalone calls
    # pass nothing and recompute everything.
    sample_rows = _shared.get("sample_rows") if _shared else None
    if sample_rows is None:
        sample_rows = (
            vecs.where(F.col("vec_id") < _PQ_SAMPLE).select("vec_id", "e").collect()
        )
        if _shared is not None:
            _shared["sample_rows"] = sample_rows
    if len(sample_rows) < 2:
        return spark.createDataFrame([], out_schema)
    # codebook TRAINING stays bounded at the model-sized _PQ_SAMPLE; the
    # QUERY set honors n_queries even past that bound (round-7 fix — the
    # training sample doubling as the query pool silently truncated it)
    query_rows = (
        sample_rows
        if n_queries <= _PQ_SAMPLE
        else emb.where(F.col("vec_id") < n_queries).collect()
    )
    books = _shared.get("books") if _shared else None
    if books is None:
        books = _pq_train_codebooks([r["e"] for r in sample_rows])
        if _shared is not None:
            _shared["books"] = books

    # --- coarse quantizer (IVF stage) ---
    # unlike the raw-vector IVF, the fit input here is NORMALIZED, so a
    # tiny corpus can collapse to fewer DISTINCT points than k and crash
    # KMeans init — cap k by the sample's distinct count, and skip KMeans
    # entirely (everything is one cluster) when that count is < 2, since
    # Spark's KMeans rejects k=1
    n_distinct = len({tuple(r["e"]) for r in sample_rows})
    if n_distinct < 2:
        assigned = vecs.select("vec_id", "e", F.lit(0).alias("cluster"))
        centroids = np.asarray([sample_rows[0]["e"]], dtype=np.float64)
    else:
        km = KMeans(
            k=min(n_clusters, n_seen, n_distinct),
            seed=42,
            maxIter=20,
            featuresCol="features",
        )
        model = km.fit(vecs)
        assigned = model.transform(vecs).select(
            "vec_id", "e", F.col("prediction").alias("cluster")
        )
        centroids = np.array(model.clusterCenters())
    # the assigned+encoded code table IS the index for this call: cut
    # lineage so the probe below scans a materialized frame (the
    # stored-parquet shape at scale — cf. knn_cosine_ivf_stored)
    pq_codes = _shared.get("pq_codes") if _shared else None
    if pq_codes is not None and "books" in _shared:
        # evaluation-call reuse: the per-vector code column is a pure
        # function of (books, vector), so with the SAME shared books the
        # pq method's code table is bit-identical to what the encode
        # below would produce — attach this call's cluster ids by id
        # join instead of re-running the Python encode. The shortlist
        # window is total-ordered, so code-table partitioning cannot
        # affect results.
        codes_df = (
            pq_codes.join(
                F.broadcast(assigned.select("vec_id", "cluster")), "vec_id"
            )
            .select("vec_id", "cluster", "code")
            .localCheckpoint(eager=True)
        )
    else:
        codes_df = (
            spread(spark, assigned)
            .mapInPandas(
                _pq_encode_iter(books, extra_cols=("cluster",)),
                schema="vec_id long, cluster int, code array<long>",
            )
            .localCheckpoint(eager=True)
        )
    # _probe_grain deliberately NOT applied here (measured 2.3-3.9 s at
    # 32 partitions vs 5.4-6.2 coalesced, same session alternating): the
    # IVFPQ ADC closure gathers a per-row (n, m, k) score table, so its
    # probe is memory-bandwidth-bound and wants the parallelism the
    # PQ closure (broadcast-indexed, no gather) does not need.
    return _ivfpq_probe(
        spark, emb, books, centroids, codes_df, query_rows, nprobe, out_schema,
        n_queries=n_queries,
    )


def _ivfpq_probe(
    spark, emb, books, centroids, codes_df, sample_rows, nprobe, out_schema,
    n_queries=N_QUERIES,
):
    """Query side of the IVF+PQ index: probe selection, ADC over probed
    codes, exact re-rank. Split out so the built index memoizes."""
    import numpy as np

    d_s = books.shape[2]
    queries = [
        (int(r["vec_id"]), np.asarray(r["e"], dtype=np.float64))
        for r in sample_rows
        if r["vec_id"] < n_queries
    ]
    if not queries:
        return spark.createDataFrame([], out_schema)
    # per-query probe set: nearest nprobe centroids (driver-side — the
    # centroid table is model-sized)
    cluster_to_qrows: dict[int, list[int]] = {}
    for i, (_qid, qv) in enumerate(queries):
        order = np.argsort(-(centroids @ qv))
        for c in order[:nprobe]:
            cluster_to_qrows.setdefault(int(c), []).append(i)

    adc = np.stack(
        [
            np.stack([books[s] @ q[s * d_s : (s + 1) * d_s] for s in range(_PQ_M)])
            for _, q in queries
        ]
    )
    qids = np.array([qid for qid, _ in queries])

    def adc_score(batches):
        import pandas as pd  # noqa: F811 — executor-side import

        for pdf in batches:
            if not len(pdf):
                continue
            clusters = pdf["cluster"].to_numpy()
            codes = np.stack(pdf["code"].to_numpy())
            vec_ids = pdf["vec_id"].to_numpy()
            out = {"query_id": [], "neighbor_id": [], "cosine_sim": []}
            for c in np.unique(clusters):
                qrows = cluster_to_qrows.get(int(c))
                if not qrows:
                    continue
                cmask = clusters == c
                ccodes, cids = codes[cmask], vec_ids[cmask]  # (n_c, m), (n_c,)
                # score this cluster's codes against every query probing
                # it in one gather: tbl (nq, m, k) indexed by ccodes ->
                # (nq, n_c, m), summed over subspaces -> (nq, n_c)
                tbl = adc[qrows]
                gathered = np.take_along_axis(
                    tbl[:, None, :, :], ccodes[None, :, :, None], axis=3
                )[..., 0]
                scores = gathered.sum(-1)
                for ii, qi in enumerate(qrows):
                    qid = int(qids[qi])
                    mask = cids != qid
                    sc, ids = scores[ii][mask], cids[mask]
                    keep = min(_PQ_RERANK, len(sc))
                    if keep == 0:
                        continue
                    part = np.argpartition(-sc, keep - 1)[:keep]
                    out["query_id"].extend([qid] * keep)
                    out["neighbor_id"].extend(int(i) for i in ids[part])
                    out["cosine_sim"].extend(float(s) for s in sc[part])
            yield pd.DataFrame(out)

    # IVF pruning as a pushable predicate: only probed clusters are
    # scanned (directory-level partition pruning on the stored code
    # table, a cheap filter on the in-memory one). The per-(query,
    # cluster) pairing then happens INSIDE the closure (r14: replaces
    # the former broadcast probe join, which expanded every code row
    # once per probing query — ~16x the Arrow traffic at the defaults —
    # before an identical gather; results are bit-equal because the
    # same (query, code) pairs are scored with the same table lookups
    # and the shortlist window's (score, neighbor_id) order is total).
    # Trade documented (ADVICE r14): the closure emits up to _PQ_RERANK
    # rows per (query, CLUSTER, batch) — up to nprobe× more shortlist
    # exchange rows than the r13 per-(query, batch) cut. Model-sized
    # either way (nprobe × RERANK × |queries| rows max) and the window
    # prunes to _PQ_RERANK; an in-closure per-query merge across
    # clusters would re-add per-batch state for rows that cost less to
    # ship than to merge at this fan-in.
    probed = codes_df.where(F.col("cluster").isin(sorted(cluster_to_qrows)))
    scored = probed.mapInPandas(
        adc_score, schema="query_id long, neighbor_id long, cosine_sim double"
    )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    shortlist = (
        scored.withColumn("rnk", F.row_number().over(w_adc))
        .where(F.col("rnk") <= _PQ_RERANK)
        .select("query_id", "neighbor_id")
    )
    qdf = spark.createDataFrame(
        [(int(qid), [float(x) for x in vec]) for qid, vec in queries],
        "query_id long, qe array<double>",
    )
    rescored = (
        emb.join(F.broadcast(shortlist), emb.vec_id == F.col("neighbor_id"))
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            _dot(F.col("e"), F.col("qe")).alias("cos"),
        )
    )
    # rank on the ROUNDED score (ADVICE r13): the displayed 6-dp rounding
    # must also decide rank, or two docs whose cosines differ by only
    # summation-order/libm ulps at the k-boundary could order differently
    # across engines (Spark vs DuckDB oracle vs the GEMM twin).
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("cos", 6)), F.asc("neighbor_id")
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos", 6).alias("cosine_sim"),
            "rank",
        )
    )


def build_ivfpq_index(
    spark: SparkSession, sf_dir: str, *, n_clusters: int = 16
) -> str | None:
    """One-time IVF+PQ index build, written to parquet: ``<base>/centroids``
    (coarse quantizer), ``<base>/codebooks`` (PQ per-subspace centroids),
    and ``<base>/codes`` — the 8-byte code table PARTITIONED BY cluster, so
    a probe reads only nprobe/n_clusters of the index at the directory
    level. This is the full FAISS-style durable artifact at 100 TB: the
    batch index job runs once; query sessions read a few MB of
    centroids/codebooks plus the probed partitions of a ~64×-compressed
    code table. Memoized per (sf_dir, n_clusters). None on empty corpus."""
    import tempfile

    import numpy as np

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    memo_key = (spark.sparkContext.applicationId, sf_dir, "ivfpq-stored-path", n_clusters)
    if memo_key in _PQ_MEMO:
        return _PQ_MEMO[memo_key]
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("embedding").isNotNull())
        .select("vec_id", _as_double("embedding").alias("e"))
        .withColumn("nrm", _l2norm(F.col("e")))
        .where(F.col("nrm") > 0)
        .select("vec_id", F.transform("e", lambda x: x / F.col("nrm")).alias("e"))
    )
    sample_rows = emb.where(F.col("vec_id") < _PQ_SAMPLE).collect()
    if len(sample_rows) < 2:
        return None
    books = _pq_train_codebooks([r["e"] for r in sample_rows])
    vecs = emb.select(
        "vec_id",
        "e",
        F.when(F.col("e").isNotNull(), array_to_vector(F.col("e"))).alias("features"),
    ).where(F.col("features").isNotNull())
    # materialize once before the iterative fit (guide §5; round 15 —
    # see knn_cosine_ivfpq): lineage-only, identical centers; the encode
    # + index write re-read the checkpoint instead of the normalization
    vecs = vecs.localCheckpoint(eager=True)
    n_distinct = len({tuple(r["e"]) for r in sample_rows})
    if n_distinct < 2:
        assigned = vecs.select("vec_id", "e", F.lit(0).alias("cluster"))
        centroids = np.asarray([sample_rows[0]["e"]], dtype=np.float64)
    else:
        km = KMeans(
            k=min(n_clusters, len(sample_rows), n_distinct),
            seed=42,
            maxIter=20,
            featuresCol="features",
        )
        model = km.fit(vecs)
        assigned = model.transform(vecs).select(
            "vec_id", "e", F.col("prediction").alias("cluster")
        )
        centroids = np.array(model.clusterCenters())
    base = tempfile.mkdtemp(prefix="ivfpq_index_")
    spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cluster int, centroid array<double>",
    ).write.mode("overwrite").parquet(f"{base}/centroids")
    spark.createDataFrame(
        [
            (s, c, [float(x) for x in books[s][c]])
            for s in range(books.shape[0])
            for c in range(books.shape[1])
        ],
        "s int, c int, centroid array<double>",
    ).write.mode("overwrite").parquet(f"{base}/codebooks")
    (
        spread(spark, assigned)
        .mapInPandas(
            _pq_encode_iter(books, extra_cols=("cluster",)),
            schema="vec_id long, cluster int, code array<long>",
        )
        .write.mode("overwrite")
        .partitionBy("cluster")
        .parquet(f"{base}/codes")
    )
    _PQ_MEMO[memo_key] = base
    return base


@REG.register("knn_cosine_ivfpq_stored")  # rows-only: approximate (seeded, deterministic)
def knn_cosine_ivfpq_stored(
    spark: SparkSession,
    sf_dir: str,
    *,
    n_clusters: int = 16,
    nprobe: int = 8,
    n_queries: int = N_QUERIES,
) -> DataFrame:
    """IVF+PQ against the STORED parquet index: centroids, codebooks and
    the cluster-partitioned code table are read back from disk; the union
    of the queries' probe clusters becomes a partition filter on the code
    table (directory-level pruning, asserted in tests/test_search.py like
    the stored-IVF twin), then the shared `_ivfpq_probe` runs — so results
    must reproduce `knn_cosine_ivfpq` exactly (same seeds, same KMeans
    input, same probe plan; equality-asserted). Completes the durable
    index story: both ANN families (IVF, PQ) and their composition now
    have a stored-artifact twin that survives the session."""
    import numpy as np

    out_schema = "query_id long, neighbor_id long, cosine_sim double, rank int"
    base = build_ivfpq_index(spark, sf_dir, n_clusters=n_clusters)
    if base is None:
        return spark.createDataFrame([], out_schema)
    app = spark.sparkContext.applicationId
    art_key = (app, base, "ivfpq-stored-art")
    if art_key in _PQ_MEMO:
        centroids, books = _PQ_MEMO[art_key]
    else:
        cent_rows = spark.read.parquet(f"{base}/centroids").collect()
        centroids = np.empty((len(cent_rows), len(cent_rows[0]["centroid"])))
        for r in cent_rows:
            centroids[r["cluster"]] = r["centroid"]
        book_rows = spark.read.parquet(f"{base}/codebooks").collect()
        m = max(r["s"] for r in book_rows) + 1
        k = max(r["c"] for r in book_rows) + 1
        d_s = len(book_rows[0]["centroid"])
        books = np.empty((m, k, d_s))
        for r in book_rows:
            books[r["s"], r["c"]] = r["centroid"]
        _PQ_MEMO[art_key] = (centroids, books)
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("embedding").isNotNull())
        .select("vec_id", _as_double("embedding").alias("e"))
        .withColumn("nrm", _l2norm(F.col("e")))
        .where(F.col("nrm") > 0)
        .select("vec_id", F.transform("e", lambda x: x / F.col("nrm")).alias("e"))
    )
    sample_key = (app, sf_dir, "pq-stored-sample")
    if n_queries > _PQ_SAMPLE:
        # memoized sample is bounded at _PQ_SAMPLE — honor a larger query
        # set with a fresh collect, never silently truncate (round-7 fix)
        sample_rows = emb.where(F.col("vec_id") < n_queries).collect()
    elif sample_key in _PQ_MEMO:
        sample_rows = _PQ_MEMO[sample_key]
    else:
        sample_rows = emb.where(F.col("vec_id") < _PQ_SAMPLE).collect()
        _PQ_MEMO[sample_key] = sample_rows
    queries = [
        np.asarray(r["e"], dtype=np.float64)
        for r in sample_rows
        if r["vec_id"] < n_queries
    ]
    if not queries:
        return spark.createDataFrame([], out_schema)
    # union of probe clusters -> partition filter (directory pruning); the
    # per-query probe assignment happens again inside _ivfpq_probe with the
    # identical centroid ranking
    probed = sorted(
        {
            int(c)
            for qv in queries
            for c in np.argsort(-(centroids @ qv))[:nprobe]
        }
    )
    codes_df = spark.read.parquet(f"{base}/codes").where(
        F.col("cluster").isin(probed)
    )
    return _ivfpq_probe(
        spark, emb, books, centroids, codes_df, sample_rows, nprobe, out_schema,
        n_queries=n_queries,
    )


def build_lsh_index(
    spark: SparkSession, sf_dir: str, *, num_hash_tables: int = 4
) -> str | None:
    """One-time LSH index build (round 5 — completes the stored-index
    matrix: LSH, IVF, PQ, IVF+PQ all have durable parquet twins): fit the
    seeded random-projection model once, hash every normalized vector,
    and WRITE the bucket assignment as parquet partitioned by
    (hash-table, bucket) plus the normalized vectors alongside — queries
    then read only their own buckets at the directory level. The bucket
    assignment is ID-ONLY (vec_id per (t, bucket)); the normalized
    vectors live once in ``{base}/vectors`` — candidate generation then
    shuffles 16-byte id pairs instead of pairs of embedding arrays, and
    the index is ~(1 + tables·id/vec) of the corpus instead of ~tables×
    (round 14; the old layout made the stored variant SLOWER than the
    live join it exists to amortize). Memoized per (sf_dir, tables).
    Returns None on an empty corpus."""
    import tempfile

    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector, vector_to_array

    memo_key = (spark.sparkContext.applicationId, sf_dir, "lsh-stored-path", num_hash_tables)
    if memo_key in _PQ_MEMO:
        return _PQ_MEMO[memo_key]
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("embedding").isNotNull())
        .select("vec_id", _as_double("embedding").alias("e"))
        .where(_l2norm(F.col("e")) > 0)
    )
    if emb.isEmpty():
        return None
    normed = emb.select(
        "vec_id",
        F.transform("e", lambda x: x / _l2norm(F.col("e"))).alias("ne"),
    ).withColumn(
        "features",
        F.when(F.col("ne").isNotNull(), array_to_vector(F.col("ne"))),
    ).where(F.col("features").isNotNull()).localCheckpoint(eager=True)
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=0.5,
        numHashTables=num_hash_tables,
        seed=42,
    )
    model = lsh.fit(normed)
    hashed = model.transform(normed).select(
        "vec_id",
        F.posexplode("hashes").alias("t", "hv"),
    ).select(
        "vec_id",
        "t",
        vector_to_array("hv").getItem(0).cast("long").alias("bucket"),
    )
    base = tempfile.mkdtemp(prefix="lsh_index_")
    hashed.write.mode("overwrite").partitionBy("t", "bucket").parquet(
        f"{base}/buckets"
    )
    normed.select("vec_id", "ne").write.mode("overwrite").parquet(
        f"{base}/vectors"
    )
    _PQ_MEMO[memo_key] = base
    return base


@REG.register("knn_cosine_lsh_stored")  # rows-only: approximate (seeded, deterministic)
def knn_cosine_lsh_stored(
    spark: SparkSession,
    sf_dir: str,
    *,
    euclid_threshold: float = 1.0,
    num_hash_tables: int = 4,
) -> DataFrame:
    """LSH neighbor pairs against the STORED bucket index: candidates are
    pairs sharing any (hash-table, bucket) partition of the stored
    assignment — the identical candidate rule `approxSimilarityJoin` uses
    (same model seed, same bucket length) — then the exact euclidean
    post-filter on the stored normalized vectors. Results must reproduce
    `knn_cosine_lsh` (asserted in tests/test_search.py; cosine values are
    equal to 6 decimals, the operator's output precision). At 100 TB the
    bucket join is partition-pruned parquet reads, and the index build is
    a once-per-corpus batch job like its IVF/PQ siblings. Candidate
    generation self-joins the ID-ONLY bucket assignment and dedups the
    id pairs BEFORE the vectors are attached (round 14): the pair-dedup
    shuffle carries 16-byte rows, and the exact verify reads the stored
    normalized vectors through two id joins on the already-distributed
    pair set (AQE broadcasts the vector side while it is small)."""
    base = build_lsh_index(spark, sf_dir, num_hash_tables=num_hash_tables)
    out_schema = "id_a long, id_b long, cosine_sim double"
    if base is None:
        return spark.createDataFrame([], out_schema)
    idx = spark.read.parquet(f"{base}/buckets")
    vecs = spark.read.parquet(f"{base}/vectors")
    cand = (
        idx.select("t", "bucket", F.col("vec_id").alias("id_a"))
        .join(idx.select("t", "bucket", F.col("vec_id").alias("id_b")), ["t", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    pairs = (
        cand.join(vecs.select(F.col("vec_id").alias("id_a"), F.col("ne").alias("na")), "id_a")
        .join(vecs.select(F.col("vec_id").alias("id_b"), F.col("ne").alias("nb")), "id_b")
    )
    d2 = F.aggregate(
        F.zip_with(F.col("na"), F.col("nb"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    euclid = F.sqrt(d2)
    return (
        pairs.withColumn("euclid", euclid)
        .where(F.col("euclid") <= F.lit(euclid_threshold))
        .select(
            "id_a",
            "id_b",
            F.round(1 - F.col("euclid") * F.col("euclid") / 2, 6).alias("cosine_sim"),
        )
    )


_KM_K = 8

_KMEANS_ASSIGN_ORACLE = f"""
WITH ex AS (
  SELECT vec_id,
         CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings WHERE embedding IS NOT NULL),
cent AS (SELECT vec_id AS c_id, v, i FROM ex WHERE vec_id < {_KM_K}),
dist AS (
  SELECT e.vec_id, c.c_id, SUM((e.v - c.v) * (e.v - c.v)) AS d2
  FROM ex e JOIN cent c ON e.i = c.i
  GROUP BY e.vec_id, c.c_id)
SELECT vec_id, CAST(c_id AS BIGINT) AS cluster, round(d2, 6) AS dist2
FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                   ORDER BY d2, c_id) AS rn
      FROM dist)
WHERE rn = 1
"""


@REG.register("kmeans_assign_exact", oracle=_KMEANS_ASSIGN_ORACLE)
def kmeans_assign_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exact Lloyd ASSIGNMENT step (round 6) — the deterministic,
    oracle-able core of k-means: with the first k={_KM_K} vectors as
    initial centroids, assign every vector to its nearest centroid by
    squared euclidean distance (smallest-centroid-id tiebreak).

    This is the relational shape every Lloyd iteration repeats at scale:
    broadcast the k centroid rows, one JVM `zip_with`/`aggregate`
    distance projection over the corpus (no Python), a per-vector argmin
    — the only shuffle is the |vectors|-keyed rank, and the UPDATE step
    is just `groupBy(cluster).agg(avg per dimension)` on this output.
    The full seeded trainer is `kmeans_cluster_embeddings` (rows-only;
    iterative). The reference clusters with LDA; k-means is the obvious
    sibling its users would reach for (SURVEY §2.9 north-star scope)."""
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("embedding").isNotNull())
        .select("vec_id", _as_double("embedding").alias("e"))
    )
    cent = emb.where(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").alias("c_id"), F.col("e").alias("c")
    )
    d2 = F.aggregate(
        F.zip_with("e", "c", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id", "c_id", d2.alias("d2")
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("d2"), F.asc("c_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "vec_id",
            F.col("c_id").cast("long").alias("cluster"),
            F.round("d2", 6).alias("dist2"),
        )
    )


@REG.register("kmeans_cluster_embeddings")  # rows-only: iterative, seeded init
def kmeans_cluster_embeddings(
    spark: SparkSession, sf_dir: str, k: int = _KM_K, max_iter: int = 20
) -> DataFrame:
    """Full seeded k-means over the embeddings table (Spark ML, k-means||
    init, seed=42): per-cluster sizes + within-cluster SSE — the
    clustering summary a corpus-exploration pipeline reports. Rows-only
    by nature (iterative, init-seeded); determinism, non-degenerate
    clusters, and SSE-beats-single-cluster are pinned in
    tests/test_search.py. Scale: Spark ML's KMeans is the standard
    distributed Lloyd — broadcast centroids, map-side partial sums,
    k×dim-sized driver traffic per iteration."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    out_schema = "cluster int, n_vecs long, sse double"
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("embedding").isNotNull())
        .select("vec_id", _as_double("embedding").alias("e"))
    )
    if emb.limit(k).count() < k:
        return spark.createDataFrame([], out_schema)
    feat = emb.select("vec_id", "e", array_to_vector("e").alias("features"))
    # materialize ONCE before the iterative fit (guide §5; round 15):
    # the ~max_iter iteration jobs otherwise re-evaluate the scan +
    # array_to_vector lineage per job. Lineage-only — partitioning (and
    # therefore the seeded k-means|| init) is unchanged, and the SSE
    # summary below reuses the same materialized frame.
    feat = feat.localCheckpoint(eager=True)
    model = KMeans(k=k, maxIter=max_iter, seed=42).fit(feat)
    pred = model.transform(feat).select(
        "vec_id", F.col("prediction").alias("cluster"), "e"
    )
    cent = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cluster int, c array<double>",
    )
    joined = pred.join(F.broadcast(cent), "cluster").select(
        "cluster",
        F.aggregate(
            F.zip_with("e", "c", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("d2"),
    )
    return joined.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_vecs"), F.round(F.sum("d2"), 6).alias("sse")
    )


@REG.register("embedding_pca_variance")  # rows-only: eigendecomposition (sign/float)
def embedding_pca_variance(
    spark: SparkSession, sf_dir: str, k: int = 8
) -> DataFrame:
    """PCA over the embeddings table (round 6) — the standard
    dimensionality-reduction stage before ANN indexing (project 64 → k
    dims, then IVF/PQ the projections): fit Spark ML PCA and emit the
    per-component explained-variance summary. Rows-only by nature
    (eigendecomposition: component signs and last-ulp floats are
    implementation-defined); determinism within a session, monotone
    non-increasing variance ordering, orthonormal components, and
    reconstruction-beats-truncation are pinned in tests/test_search.py.

    Scale: Spark ML PCA is one distributed Gramian accumulation
    (map-side d×d partial outer products, d=64 here → a 32 KB matrix per
    partition) + a driver-side eigendecomposition of the d×d Gramian —
    the corpus is scanned once and nothing data-sized shuffles; the
    projection afterward is a broadcast matrix multiply, embarrassingly
    parallel."""
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector

    out_schema = "component int, explained_variance double"
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("embedding").isNotNull())
        .select("vec_id", _as_double("embedding").alias("e"))
    )
    if emb.limit(k).count() < k:
        return spark.createDataFrame([], out_schema)
    feat = emb.select(array_to_vector("e").alias("features"))
    model = PCA(k=k, inputCol="features", outputCol="p").fit(feat)
    ev = [float(x) for x in model.explainedVariance]
    return spark.createDataFrame(
        [(i, round(v, 6)) for i, v in enumerate(ev)], out_schema
    )


def pca_project(spark: SparkSession, sf_dir: str, k: int = 8) -> DataFrame:
    """(vec_id, proj array<double>[k]) — the projection companion of
    `embedding_pca_variance`, for feeding reduced vectors into the ANN
    builders. Broadcast matrix multiply; no shuffle."""
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector, vector_to_array

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("embedding").isNotNull())
        .select("vec_id", _as_double("embedding").alias("e"))
    )
    feat = emb.select("vec_id", array_to_vector("e").alias("features"))
    model = PCA(k=k, inputCol="features", outputCol="p").fit(feat)
    return model.transform(feat).select(
        "vec_id", vector_to_array("p").alias("proj")
    )


_SEM_TAU = 0.3  # cosine threshold placed INSIDE the synthetic corpus's
# observed similarity range (max within-label cosine is 0.475; real
# corpora have true near-dups at 0.9+, and tau is a parameter)

_SEMDEDUP_ORACLE = f"""
WITH ex AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings WHERE embedding IS NOT NULL),
cent AS (SELECT vec_id AS c_id, v, i FROM ex WHERE vec_id < {_KM_K}),
dist AS (
  SELECT e.vec_id, c.c_id, SUM((e.v - c.v) * (e.v - c.v)) AS d2
  FROM ex e JOIN cent c ON e.i = c.i GROUP BY e.vec_id, c.c_id),
assign AS (
  SELECT vec_id, c_id AS cluster FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, c_id) rn
    FROM dist) WHERE rn = 1),
norms AS (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM ex GROUP BY vec_id),
dots AS (
  SELECT aa.vec_id AS ia, ab.vec_id AS ib, SUM(ea.v * eb.v) AS dot
  FROM assign aa
  JOIN assign ab ON aa.cluster = ab.cluster AND aa.vec_id < ab.vec_id
  JOIN ex ea ON ea.vec_id = aa.vec_id
  JOIN ex eb ON eb.vec_id = ab.vec_id AND ea.i = eb.i
  GROUP BY aa.vec_id, ab.vec_id),
dropped AS (
  SELECT DISTINCT d.ib AS vec_id FROM dots d
  JOIN norms na ON na.vec_id = d.ia AND na.nrm > 0
  JOIN norms nb ON nb.vec_id = d.ib AND nb.nrm > 0
  WHERE d.dot / (na.nrm * nb.nrm) >= {_SEM_TAU})
SELECT a.vec_id, CAST(a.cluster AS BIGINT) AS cluster
FROM assign a LEFT JOIN dropped x ON a.vec_id = x.vec_id
WHERE x.vec_id IS NULL
"""


@REG.register("dedup_semantic_kmeans", oracle=_SEMDEDUP_ORACLE)
def dedup_semantic_kmeans(
    spark: SparkSession, sf_dir: str, *, k: int = _KM_K, tau: float = _SEM_TAU
) -> DataFrame:
    """SemDeDup-shape semantic deduplication (round 7, Abbas et al. 2023
    form): cluster the embeddings, then WITHIN each cluster drop every
    vector that has a smaller-id neighbor at cosine >= tau — keeping the
    min-id representative of each semantic neighborhood. The registered
    form uses the deterministic one-step assignment
    (`kmeans_assign_exact`'s first-k centroids + argmin, smallest-id
    tiebreak) so the WHOLE pipeline — clustering included — has an exact
    SQL oracle; the production form swaps in the seeded full trainer
    (`kmeans_cluster_embeddings`).

    Scale: this is exactly why SemDeDup clusters first — the exact
    cosine join runs only INSIDE clusters, so with k grown proportionally
    to n (SemDeDup uses ~0.1-1% of n) the per-cluster pair space stays
    bounded and the total work is n x (cluster size), never n^2. The
    plan: broadcast k centroid rows -> JVM argmin assignment (one
    |vectors|-keyed rank shuffle) -> cluster-keyed self-join (one
    shuffle, both sides co-partitioned on cluster) -> distinct dropped
    ids -> anti-join. tau sits inside the synthetic corpus's observed
    similarity range (no true near-dups exist in it); the rule
    ("any smaller-id neighbor") matches `incremental_dedup_minhash`'s
    greedy min-id family."""
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("embedding").isNotNull())
        .select("vec_id", _as_double("embedding").alias("e"))
    )
    cent = emb.where(F.col("vec_id") < k).select(
        F.col("vec_id").alias("c_id"), F.col("e").alias("c")
    )
    d2 = F.aggregate(
        F.zip_with("e", "c", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id", "e", "c_id", d2.alias("d2")
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("d2"), F.asc("c_id"))
    assigned = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "vec_id", "e", F.col("c_id").cast("long").alias("cluster"),
            _l2norm(F.col("e")).alias("nrm"),
        )
    )
    a = assigned.where(F.col("nrm") > 0).select(
        F.col("vec_id").alias("ia"), F.col("cluster").alias("ca"),
        F.col("e").alias("ea"), F.col("nrm").alias("na"),
    )
    b = assigned.where(F.col("nrm") > 0).select(
        F.col("vec_id").alias("ib"), F.col("cluster").alias("cb"),
        F.col("e").alias("eb"), F.col("nrm").alias("nb"),
    )
    dropped = (
        a.join(b, (F.col("ca") == F.col("cb")) & (F.col("ia") < F.col("ib")))
        .where(
            _dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
            >= tau
        )
        .select(F.col("ib").alias("vec_id"))
        .distinct()
    )
    return assigned.join(dropped, "vec_id", "left_anti").select(
        "vec_id", "cluster"
    )


# ---------------------------------------------------------------------------
# Clustering quality (round 7b): exact squared-Euclidean silhouette
# ---------------------------------------------------------------------------

_SILHOUETTE_ORACLE = f"""
WITH ex AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings WHERE embedding IS NOT NULL),
cent AS (SELECT vec_id AS c_id, v, i FROM ex WHERE vec_id < {_KM_K}),
dist AS (
  SELECT e.vec_id, c.c_id, SUM((e.v - c.v) * (e.v - c.v)) AS d2
  FROM ex e JOIN cent c ON e.i = c.i GROUP BY e.vec_id, c.c_id),
assign AS (
  SELECT vec_id, c_id AS cluster FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, c_id) rn
    FROM dist) WHERE rn = 1),
sq AS (SELECT vec_id, SUM(v * v) AS sq FROM ex GROUP BY vec_id),
csize AS (SELECT cluster, COUNT(*) AS cn FROM assign GROUP BY cluster),
csq AS (SELECT a.cluster, SUM(s.sq) AS ssq
        FROM assign a JOIN sq s USING (vec_id) GROUP BY a.cluster),
csum AS (SELECT a.cluster, e.i, SUM(e.v) AS s
         FROM assign a JOIN ex e USING (vec_id) GROUP BY a.cluster, e.i),
xdot AS (SELECT e.vec_id, c.cluster, SUM(e.v * c.s) AS xd
         FROM ex e JOIN csum c ON e.i = c.i GROUP BY e.vec_id, c.cluster),
pc AS (
  SELECT x.vec_id, a.cluster AS own, x.cluster AS tc, cs.cn,
         cs.cn * s.sq - 2 * x.xd + cq.ssq AS tot
  FROM xdot x
  JOIN assign a ON a.vec_id = x.vec_id
  JOIN csize cs ON cs.cluster = x.cluster
  JOIN csq cq ON cq.cluster = x.cluster
  JOIN sq s ON s.vec_id = x.vec_id),
ab AS (
  SELECT vec_id, own,
         MAX(CASE WHEN tc = own AND cn > 1 THEN tot / (cn - 1) END) AS a_i,
         MIN(CASE WHEN tc <> own THEN tot / cn END) AS b_i
  FROM pc GROUP BY vec_id, own),
sil AS (
  SELECT own, CASE
      WHEN a_i IS NULL OR b_i IS NULL THEN 0.0
      WHEN a_i < b_i THEN (b_i - a_i) / b_i
      WHEN a_i > b_i THEN (b_i - a_i) / a_i
      ELSE 0.0 END AS s
  FROM ab)
SELECT CAST(own AS BIGINT) AS cluster, CAST(COUNT(*) AS BIGINT) AS n_points,
       round(AVG(s), 6) AS mean_silhouette
FROM sil GROUP BY own
"""


@REG.register("kmeans_silhouette", oracle=_SILHOUETTE_ORACLE)
def kmeans_silhouette(
    spark: SparkSession, sf_dir: str, *, k: int = _KM_K
) -> DataFrame:
    """Per-cluster mean silhouette under SQUARED Euclidean distance —
    the same metric Spark ML's ClusteringEvaluator computes, and for the
    same reason: squared distance admits the sufficient-statistics
    identity  sum_{y in C} d2(x, y) = |C|*||x||^2 - 2*x.sum(C) +
    sum_{y in C} ||y||^2,  so a(i)/b(i) come from ONE pass over the
    points against k broadcast cluster aggregates (count, component
    sums, sum of squared norms). Cost is O(n*k*dim) with no pairwise
    join — the plain-Euclidean silhouette is n^2 and does not scale;
    this one does, at 100 TB like anywhere else.

    Clustering is the deterministic one-step assignment shared with
    `dedup_semantic_kmeans`/`kmeans_assign_exact` (first-k centroids,
    argmin, smallest-id tiebreak), which keeps the WHOLE metric —
    assignment included — exactly SQL-oracled. Singleton clusters score
    0 by the standard convention (a(i) undefined), as does the
    degenerate one-cluster corpus (b(i) undefined)."""
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("embedding").isNotNull())
        .select("vec_id", _as_double("embedding").alias("e"))
    )
    cent = emb.where(F.col("vec_id") < k).select(
        F.col("vec_id").alias("c_id"), F.col("e").alias("c")
    )
    d2 = F.aggregate(
        F.zip_with("e", "c", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("d2"), F.asc("c_id"))
    assigned = (
        emb.crossJoin(F.broadcast(cent))
        .select("vec_id", "e", "c_id", d2.alias("d2"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "e", F.col("c_id").alias("cluster"))
    )
    pts = assigned.withColumn("sq", _dot(F.col("e"), F.col("e")))
    # per-cluster sufficient statistics: k rows of (cn, ssq, csum[dim]);
    # the component-sum shuffle carries one row per (cluster, dim), the
    # packed-array reassembly is the documented collect_list(struct) form
    csum = (
        pts.select("cluster", F.posexplode("e").alias("i", "v"))
        .groupBy("cluster", "i")
        .agg(F.sum("v").alias("s"))
        .groupBy("cluster")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "s"))), lambda st: st["s"]
            ).alias("csum")
        )
    )
    cstats = (
        pts.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("cn"), F.sum("sq").alias("ssq"))
        .join(csum, "cluster")
        .select(F.col("cluster").alias("tc"), "cn", "ssq", "csum")
    )
    tot = F.col("cn") * F.col("sq") - 2 * _dot(F.col("e"), F.col("csum")) + F.col("ssq")
    pc = (
        pts.select("vec_id", F.col("cluster").alias("own"), "e", "sq")
        .crossJoin(F.broadcast(cstats))
        .select("vec_id", "own", "tc", "cn", tot.alias("tot"))
    )
    ab = pc.groupBy("vec_id", "own").agg(
        F.max(
            F.when((F.col("tc") == F.col("own")) & (F.col("cn") > 1),
                   F.col("tot") / (F.col("cn") - 1))
        ).alias("a_i"),
        F.min(
            F.when(F.col("tc") != F.col("own"), F.col("tot") / F.col("cn"))
        ).alias("b_i"),
    )
    s = (
        F.when(F.col("a_i").isNull() | F.col("b_i").isNull(), F.lit(0.0))
        .when(F.col("a_i") < F.col("b_i"),
              (F.col("b_i") - F.col("a_i")) / F.col("b_i"))
        .when(F.col("a_i") > F.col("b_i"),
              (F.col("b_i") - F.col("a_i")) / F.col("a_i"))
        .otherwise(F.lit(0.0))
    )
    return (
        ab.select(F.col("own").cast("long").alias("cluster"), s.alias("s"))
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.round(F.avg("s"), 6).alias("mean_silhouette"),
        )
    )


@REG.register("ann_recall_eval")  # rows-only: evaluates seeded approximate methods
def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality report as a first-class operator: recall@TOP_K of every
    top-k-shaped ANN variant against `knn_cosine_exact`, per method —
    the evaluation a platform runs BEFORE switching retrieval from brute
    force to an index, here queryable instead of buried in a test suite
    (tests/test_search.py pins the floors; this emits the numbers).
    `knn_cosine_gemm` is exact-by-construction and rides along as the
    control row (recall 1.0 or the harness itself is broken).

    Shape: every method's result is a (query_id, neighbor_id) set of at
    most N_QUERIES×TOP_K rows — the joins and aggregates below run on
    KB-sized frames regardless of corpus scale; the real cost is the
    methods' own index builds, which run FRESH inside every call exactly
    as in their registered keys (round 15: no per-session memos).
    Output: (method, macro_recall, min_recall, n_queries), macro = mean
    per-query recall, min = worst query."""
    # PER-CALL scratchpad: pq and ivfpq train codebooks from the
    # identical deterministic sample, so one collect+train inside this
    # evaluation call serves both (results identical — the sample and
    # the seeded trainer are the same; this is intra-call reuse, shared
    # by nothing outside this invocation).
    shared: dict = {}
    methods = [
        ("gemm", knn_cosine_gemm),
        ("ivf", knn_cosine_ivf),
        ("pq", lambda s, d: knn_cosine_pq(s, d, _shared=shared)),
        ("ivfpq", lambda s, d: knn_cosine_ivfpq(s, d, _shared=shared)),
    ]
    from ..ckpt import ckpt_tracked, drop_ckpt

    # the exact frame is referenced 8x in the returned plan (4 hits
    # joins + 4 per-query spines) and Spark has no cross-branch subplan
    # reuse for it — localCheckpoint pins ~N_QUERIES*TOP_K rows and cuts
    # 8 brute-force scans to 1 (measured 9.2 s -> see bench). Tracked
    # (round-12 advice): all five intermediate checkpoints are released
    # below once the final 4-row report is itself materialized, so
    # repeated invocations in a long-lived session pin nothing.
    exact, exact_ids = ckpt_tracked(
        knn_cosine_exact(spark, sf_dir).select("query_id", "neighbor_id")
    )
    per_q_exact = exact.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_exact")
    )
    outs = []
    dead_ids: set = set(exact_ids)
    for name, fn in methods:
        # each method frame is <= N_QUERIES*TOP_K rows but its plan is a
        # full index probe — checkpoint so the returned union executes
        # against 4 tiny pinned frames instead of re-probing every index
        approx, ids = ckpt_tracked(
            fn(spark, sf_dir).select(
                "query_id", "neighbor_id", F.lit(name).alias("method")
            )
        )
        dead_ids |= ids
        hits = (
            approx.join(exact, ["query_id", "neighbor_id"])
            .groupBy("method", "query_id")
            .agg(F.count(F.lit(1)).alias("n_hit"))
        )
        per_q = (
            per_q_exact.join(
                hits, "query_id", "left"
            )  # queries an index missed entirely count as recall 0
            .select(
                F.lit(name).alias("method"),
                "query_id",
                (
                    F.coalesce("n_hit", F.lit(0)).cast("double") / F.col("n_exact")
                ).alias("r"),
            )
        )
        outs.append(
            per_q.groupBy("method").agg(
                F.round(F.avg("r"), 6).alias("macro_recall"),
                F.round(F.min("r"), 6).alias("min_recall"),
                F.count(F.lit(1)).cast("long").alias("n_queries"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    # Materialize the 4-row report itself, then release every
    # intermediate checkpoint — the returned frame no longer references
    # them, so the call leaves only these 4 rows pinned.
    final = res.orderBy("method").localCheckpoint(eager=True)
    drop_ckpt(final, dead_ids)
    return final
