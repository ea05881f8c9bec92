"""Collection-type operator batteries: arrays, maps, structs, regex
extraction, and an iterative transitive-dedup (connected components).

Array/map outputs are explicitly sorted in BOTH engines — the harness
compares arrays element-wise, and Spark's ``array_union`` /
DuckDB's ``list_distinct`` order elements differently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .._registry import Registry
from ..catalog import load_table

REG = Registry()


@REG.register(
    "array_functions",
    oracle="""
    WITH t AS (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS toks FROM documents)
    SELECT doc_id,
           list_contains(toks, 'the') AS contains_the,
           array_to_string(list_sort(list_distinct(list_concat(toks, ['zzz']))), ' ')
             AS union_sorted,
           CAST(len(flatten([toks, ['x','y']])) AS INTEGER) AS flat_len
    FROM t
    """,
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array battery: contains / union / flatten — all JVM array codegen.
    Space-joined atomic output for external hashers (see
    tests/test_registry_schemas.py)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), r"\s+")
    return docs.select(
        "doc_id",
        F.array_contains(toks, "the").alias("contains_the"),
        F.concat_ws(
            " ", F.sort_array(F.array_union(toks, F.array(F.lit("zzz"))))
        ).alias("union_sorted"),
        F.size(F.flatten(F.array(toks, F.array(F.lit("x"), F.lit("y"))))).alias("flat_len"),
    )


@REG.register(
    "map_functions",
    oracle="""
    WITH m AS (SELECT doc_id, map(['lang','source'], [lang, source]) AS meta FROM documents)
    SELECT doc_id,
           array_to_string(list_sort(map_keys(meta)), ',') AS keys_sorted,
           meta['lang'][1] AS lang_val
    FROM m
    """,
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map battery: construction, key listing, element access. (DuckDB map
    access returns a 1-element list, hence the ``[1]`` unwrap in the
    oracle.) Comma-joined atomic key list for external hashers."""
    docs = load_table(spark, sf_dir, "documents")
    meta = F.map_from_arrays(
        F.array(F.lit("lang"), F.lit("source")), F.array(F.col("lang"), F.col("source"))
    )
    return docs.select(
        "doc_id",
        F.concat_ws(",", F.sort_array(F.map_keys(meta))).alias("keys_sorted"),
        F.element_at(meta, F.lit("lang")).alias("lang_val"),
    )


@REG.register(
    "regexp_extract_groups",
    oracle="""
    SELECT event_id,
           CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT) AS k_re
    FROM events
    """,
)
def regexp_extract_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture-group extraction from the raw JSON string (regex path, vs the
    json_extract operator's JSON path)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        # regexp_extract yields '' on no-match, which ANSI cast aborts on —
        # nullif makes missing keys NULL like the SQL oracle's regexp path
        F.nullif(F.regexp_extract("props", r'"k":\s*(\d+)', 1), F.lit(""))
        .cast("long")
        .alias("k_re"),
    )


@REG.register(
    "dedup_transitive",
    oracle="""
    WITH RECURSIVE
    all_docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM documents),
    lead_edges AS (
      SELECT doc_id AS src,
             LEAD(doc_id) OVER (PARTITION BY text ORDER BY doc_id) AS dst
      FROM all_docs),
    e AS (SELECT src, dst FROM lead_edges WHERE dst IS NOT NULL),
    undirected AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
    reach(doc_id, r) AS (
      SELECT doc_id, doc_id AS r FROM all_docs
      UNION
      SELECT u.src AS doc_id, reach.r
      FROM undirected u JOIN reach ON u.dst = reach.doc_id)
    SELECT doc_id, CAST(MIN(r) AS BIGINT) AS component_id
    FROM reach GROUP BY doc_id
    """,
)
def dedup_transitive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the exact-duplicate graph: transitive
    closure of near-dup pairs via iterative min-label propagation — the
    final stage of real web-corpus dedup (A~B, B~C ⇒ {A,B,C} one cluster,
    one survivor).

    Implementation: label ← min(label, neighbors' labels) to fixpoint,
    checked by a scalar converged-count per iteration (the only driver
    value; data never leaves the cluster). At 100 TB: checkpoint every few
    iterations to truncate lineage, and pre-shrink with the hash-dedup
    pass so the graph holds only near-dup candidates.

    Oracled via a DuckDB recursive CTE: sha256 buckets are exactly the
    text-equality groups, so the oracle builds the same chain edges with
    LEAD over text partitions and takes min-reachable-id per node —
    single-statement transitive closure the iterative Spark plan must
    reproduce bit-for-bit.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    copy = docs.select((F.col("doc_id") + F.lit(1_000_000)).alias("doc_id"), "text")
    all_docs = docs.unionByName(copy)
    hashed = all_docs.select("doc_id", F.sha2("text", 256).alias("h"))

    # edges: consecutive ids within each hash bucket (chain, forces >1 hop)
    from pyspark.sql import Window

    w = Window.partitionBy("h").orderBy("doc_id")
    edges = (
        hashed.withColumn("nxt", F.lead("doc_id").over(w))
        .where(F.col("nxt").isNotNull())
        .select(F.col("doc_id").alias("src"), F.col("nxt").alias("dst"))
        .cache()
    )
    labels = hashed.select("doc_id", F.col("doc_id").alias("label")).cache()

    for _ in range(10):
        # propagate min label across edges in both directions
        msgs = (
            edges.join(labels, edges.src == labels.doc_id)
            .select(F.col("dst").alias("doc_id"), "label")
            .unionByName(
                edges.join(labels, edges.dst == labels.doc_id).select(
                    F.col("src").alias("doc_id"), "label"
                )
            )
        )
        # localCheckpoint truncates the per-iteration lineage (otherwise
        # each pass re-plans the whole history — the RDD-era EM-LDA problem
        # the reference solved with checkpointInterval, C3)
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("doc_id")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break

    return labels.select("doc_id", F.col("label").alias("component_id"))


@REG.register(
    "generate_sequence",
    oracle="""
    SELECT user_id,
           unnest(generate_series(CAST(date_trunc('day', min_ts) AS TIMESTAMP),
                                  CAST(date_trunc('day', max_ts) AS TIMESTAMP),
                                  INTERVAL 1 DAY)) AS active_day
    FROM (SELECT user_id, MIN(ts) AS min_ts, MAX(ts) AS max_ts
          FROM events GROUP BY user_id)
    """,
)
def generate_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence generation: densify each user's [first, last] activity span
    into one row per day (the calendar-scaffold pattern for gap analysis).
    `sequence` + `explode` — generation is distributed, no driver ranges."""
    from ..session import ensure_utc

    ensure_utc(spark)
    ev = load_table(spark, sf_dir, "events")
    spans = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("d0"),
        F.date_trunc("day", F.max("ts")).alias("d1"),
    )
    return spans.select(
        "user_id",
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("active_day"),
    )


@REG.register(
    "try_cast_handling",
    oracle="""
    SELECT event_id,
           TRY_CAST(event_type AS BIGINT) AS bad_cast,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS good_cast
    FROM events
    """,
)
def try_cast_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """try_cast: malformed input -> NULL instead of ANSI error (the
    ingest-hardening cast for dirty 100 TB data)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.col("event_type").try_cast("bigint").alias("bad_cast"),
        F.get_json_object("props", "$.k").try_cast("bigint").alias("good_cast"),
    )


@REG.register(
    "conditional_agg",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchases,
           CAST(COUNT(*) FILTER (WHERE value > 50) AS BIGINT) AS n_high_value,
           SUM(CASE WHEN event_type = 'error' THEN value ELSE 0 END) AS error_value
    FROM events
    GROUP BY user_id
    """,
)
def conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (FILTER / CASE inside agg) — one pass over
    the data for N conditions instead of N self-joins."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count_if(F.col("event_type") == "purchase").alias("n_purchases"),
        F.count_if(F.col("value") > 50).alias("n_high_value"),
        F.sum(
            F.when(F.col("event_type") == "error", F.col("value")).otherwise(F.lit(0.0))
        ).alias("error_value"),
    )


@REG.register(
    "explode_outer_preserve",
    oracle="""
    SELECT d.doc_id, u.rare_token
    FROM (SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text), '\\s+'),
                             x -> x IN ('zorb', 'the')) AS l
          FROM documents) d
    LEFT JOIN LATERAL (SELECT unnest(d.l) AS rare_token) u ON TRUE
    """,
)
def explode_outer_preserve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer: rows whose array is empty survive with NULL (plain
    explode would drop them — the provenance-preserving variant for
    enrichment pipelines)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), r"\s+")
    rare = F.filter(toks, lambda x: x.isin(["zorb", "the"]))
    return docs.select(
        "doc_id", F.explode_outer(rare).alias("rare_token")
    )


_CLOSURE_SQL = """
    WITH RECURSIVE
    all_docs AS (
      SELECT doc_id, text FROM {documents}
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM {documents}),
    lead_edges AS (
      SELECT doc_id AS dst,
             LAG(doc_id) OVER (PARTITION BY text ORDER BY doc_id) AS src
      FROM all_docs),
    e AS (SELECT src, dst FROM lead_edges WHERE src IS NOT NULL),
    walk(doc_id, anc) AS (
      SELECT doc_id, doc_id AS anc FROM all_docs
      UNION ALL
      SELECT w.doc_id, e.src AS anc
      FROM walk w JOIN e ON e.dst = w.anc)
    SELECT doc_id, CAST(MIN(anc) AS BIGINT) AS component_id
    FROM walk GROUP BY doc_id
"""


@REG.register(
    "recursive_cte_closure",
    oracle=_CLOSURE_SQL.format(documents="documents"),
)
def recursive_cte_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure via a RECURSIVE CTE executed BY SPARK (4.0+
    native recursion) — the declarative twin of dedup_transitive's
    iterative min-label loop, over the same synthetic duplicate-chain
    graph. The walk follows each node's unique predecessor edge (LAG
    within the text-equality bucket), which is acyclic by construction
    (src < dst), so UNION ALL recursion terminates without needing
    UNION-dedup; the component id is the min ancestor reached. Spark and
    DuckDB run literally the same SQL text. At 100 TB the per-level
    semantics are the same iterated join the loop version plans — the
    CTE form just moves loop control into the engine (bounded by
    spark.sql.cteRecursionLevelLimit — pinned explicitly below so the
    at-scale failure mode is a deliberate, documented limit: a duplicate
    chain longer than the limit fails fast rather than silently
    truncating; corpora with >1000-deep exact-duplicate chains should
    use dedup_transitive's iterative loop instead)."""
    spark.conf.set("spark.sql.cteRecursionLevelLimit", "1000")
    from ..sqlview import sql_over

    docs = load_table(spark, sf_dir, "documents")
    return sql_over(spark, _CLOSURE_SQL, documents=docs)
