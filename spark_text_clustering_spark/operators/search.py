"""Full-text search over the vectorized corpus: query string → TF-IDF
vector through the SAME fitted pipeline → top-k documents by sparse
cosine — the interactive "query side" of the text engine (the reference
only batch-scores; search is the north-star extension of its vector
space).

Scale design: the query vector is one row — broadcast; the corpus scan is
embarrassingly parallel over the pre-vectorized table (at 100 TB the
tfidf column is precomputed and stored, not re-derived per query); top-k
is a rank-filtered window (per-partition heap prune). Sparse dot product
via ``arrays_zip``-free index intersection in a pandas UDF would add a
Python hop — instead we exploit ml's SparseVector dot on the JVM? No
public JVM dot exists for DataFrames, so the dot is computed on dense
arrays bounded by vocab size; for big vocabularies switch to the
posexplode formulation (explode (term_id, weight) pairs, join on term_id,
sum products — pure Catalyst; implemented below as the default because it
scales with nnz, not vocab size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .._registry import Registry
from ..catalog import load_table
from ..ml.vectorize import EmptyCorpusError, vectorize

REG = Registry()


def _sparse_entries(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, term_id, weight) rows from a VectorUDT column — the relational
    form of a sparse matrix (scales with nonzeros)."""
    from pyspark.ml.functions import vector_to_array

    arr = vector_to_array(F.col(vec_col))
    return (
        df.select(id_col, F.posexplode(arr).alias("term_id", "weight"))
        .where(F.col("weight") != 0.0)
    )


def search_tfidf(
    corpus_entries: DataFrame,
    query_entries: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Top-k documents per query by sparse cosine over (id, term_id,
    weight) tables. Join on term_id → partial products → per-pair sum →
    normalize → rank. One shuffle on term_id, one on (query, doc)."""
    doc_norms = corpus_entries.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("weight") * F.col("weight"))).alias("dn")
    )
    q_norms = query_entries.groupBy("query_id").agg(
        F.sqrt(F.sum(F.col("weight") * F.col("weight"))).alias("qn")
    )
    q = query_entries.select("query_id", "term_id", F.col("weight").alias("qw"))
    d = corpus_entries.select("doc_id", "term_id", F.col("weight").alias("dw"))
    dots = (
        d.join(F.broadcast(q), "term_id")
        .groupBy("query_id", "doc_id")
        .agg(F.sum(F.col("qw") * F.col("dw")).alias("dot"))
    )
    scored = (
        dots.join(F.broadcast(q_norms), "query_id")
        .join(doc_norms, "doc_id")
        .select(
            "query_id",
            "doc_id",
            (F.col("dot") / (F.col("qn") * F.col("dn"))).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", F.round("score", 6).alias("score"), "rank")
    )


def search_corpus(
    spark: SparkSession, sf_dir: str, queries: list[str], k: int = 10
) -> DataFrame:
    """End-to-end: vectorize the corpus once, push each query string
    through the SAME fitted pipeline (identical vocab/idf — the consistency
    the reference enforces via its global-vocabulary remap, LDALoader.scala:
    97-105, here guaranteed by construction), then rank."""
    docs = load_table(spark, sf_dir, "documents")
    try:
        vectorized, model = vectorize(docs, vocab_size=10_000, min_doc_freq=2)
    except EmptyCorpusError:  # empty-in -> empty-out
        return spark.createDataFrame(
            [], "query_id long, doc_id long, score double, rank int"
        )
    corpus_entries = _sparse_entries(vectorized.select("doc_id", "tfidf"), "doc_id", "tfidf")

    qdf = spark.createDataFrame(
        [(i, q) for i, q in enumerate(queries)], "query_id long, text string"
    )
    from ..ml.vectorize import apply_idf_floor, clean_documents
    import numpy as np

    cleaned = clean_documents(qdf)
    transformed = model.transform(cleaned)
    floored = apply_idf_floor(transformed, np.asarray(model.stages[3].idf.toArray()))
    query_entries = _sparse_entries(
        floored.select(F.col("query_id").alias("doc_id"), "tfidf"), "doc_id", "tfidf"
    ).select(F.col("doc_id").alias("query_id"), "term_id", "weight")
    return search_tfidf(corpus_entries, query_entries, k=k)


@REG.register("search_tfidf_topk")  # rows-only: depends on the fitted model state
def search_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable search demo: three fixed query strings against the
    corpus, top-5 each (deterministic: fixed vocab tiebreak + rank
    tiebreak)."""
    return search_corpus(
        spark,
        sf_dir,
        ["table scan join", "stream window batch", "vector hash group"],
        k=5,
    )
