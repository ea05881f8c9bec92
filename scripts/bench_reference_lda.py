"""Apples-to-apples LDA baseline (round 7, VERDICT r6 directive #3).

BASELINE.md's only published reference numbers are EM-LDA seconds/iter on
the reference's OWN corpora (51 EN books, 29 MB → 0.792 s/iter; GE books
→ see BASELINE.md). The per-round bench measures s/iter on the synthetic
sf0.1 documents table, which is a same-order but not same-corpus
comparison. This script runs THIS engine's full training path
(app.run_training preprocessing chain → train_lda) on the reference's own
books directory with the reference's hyperparameters (k=5, maxIter=50,
EM, α/β optimizer defaults) and prints a directly comparable s/iter.

Reads the reference corpus READ-ONLY. Run on a quiet machine:

    python scripts/bench_reference_lda.py [corpus_dir]

Timing protocol mirrors bench.py's LDA section: fresh SparkContext
(context residue inflates tight EM iterations ~1.7x), preprocessing
materialized OUTSIDE the timed window, data-driven partition count.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window
from pyspark.sql import functions as F

from spark_text_clustering_spark.ml.lda import train_lda
from spark_text_clustering_spark.ml.vectorize import vectorize
from spark_text_clustering_spark.session import get_session
from spark_text_clustering_spark.sources.text_corpus import read_text_corpus

DEFAULT_CORPUS = "/root/reference/TextClustering/src/main/resources/books/English"


REFERENCE_S_PER_ITER = {"English": 0.792, "German": 2.103}  # BASELINE.md


def main() -> None:
    import tempfile

    corpus_path = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_CORPUS
    # Second arg: optimizer ("em" default, or "online"). The reference
    # supports both (LDAClustering.scala:41-44); BASELINE.md publishes
    # s/iter only for EM, so the online row is this engine's own number
    # on the same corpus/protocol — comparable across rounds, and
    # apples-to-apples with the EM row above it.
    optimizer = sys.argv[2] if len(sys.argv) > 2 else "em"
    lang = corpus_path.rstrip("/").rsplit("/", 1)[-1]
    ref_iter = REFERENCE_S_PER_ITER.get(lang, 0.792) if optimizer == "em" else None
    spark = get_session("bench-reference-lda", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    # EM LDA's GraphX lineage grows per iteration; without a checkpoint
    # dir the checkpointInterval=10 setting is inert and later iterations
    # slow down ~3x (measured: 1.11 s/iter over 10 iters vs 3.09 s/iter
    # over 50 on this corpus). The reference supports the same knob
    # (LDAClustering.scala:54-57) — run the comparison with it active.
    spark.sparkContext.setCheckpointDir(tempfile.mkdtemp(prefix="lda_ckpt_"))

    books = read_text_corpus(spark, corpus_path)
    docs = books.withColumn(
        "doc_id", F.row_number().over(Window.orderBy("path")).cast("long") - 1
    ).select("doc_id", "text")
    t_prep0 = time.perf_counter()
    from spark_text_clustering_spark.functions.textnorm import STOPWORDS_BY_LANG

    stop = list(STOPWORDS_BY_LANG.get("GE" if lang == "German" else "EN"))
    vec, _ = vectorize(docs, vocab_size=2_900_000, stopwords=stop, min_doc_freq=2)
    n_docs = vec.count()
    # partition-count sweep on this corpus (quiet machine, 10-iter runs):
    # 1->1.44, 4->1.48, 8->1.30, 16->1.11, 32->1.28 s/iter — 16 is the
    # sweet spot for 51 heavy docs on local[32] (books are ~0.5 MB rows;
    # past ~3 docs/partition, per-iteration scheduling overhead wins).
    # Round 14: the bytes-based rule from app._lda_partition_count (wired
    # into run_training per VERDICT r13 #5) reproduces it — use the
    # SHARED helper so this measurement reflects the production path.
    # Override with SPARK_GRAFT_LDA_PARTS for sweeps.
    import os as _os

    from spark_text_clustering_spark.app import _lda_partition_count

    parts = int(
        _os.environ.get("SPARK_GRAFT_LDA_PARTS", 0)
    ) or _lda_partition_count(spark, docs) or 1
    corpus = vec.select("doc_id", "tfidf").repartition(parts).cache()
    corpus.count()  # materialize preprocessing outside the timed window
    prep_sec = time.perf_counter() - t_prep0

    t0 = time.perf_counter()
    train_lda(corpus, k=5, max_iter=50, optimizer=optimizer, seed=42, corpus_size=n_docs)
    total = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "corpus": corpus_path,
                "optimizer": optimizer,
                "n_docs": n_docs,
                "prep_sec": round(prep_sec, 3),
                "lda_train_50iter_sec": round(total, 3),
                "lda_sec_per_iter": round(total / 50, 4),
                "reference_sec_per_iter": ref_iter,
                "ratio_vs_reference": (
                    round(total / 50 / ref_iter, 3) if ref_iter else None
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
