"""spark_text_clustering_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference
``borisfoko/Spark-Text-Clustering`` (an RDD/mllib Scala batch app, see
/root/repo/SURVEY.md), re-expressed Spark-first:

* DataFrame / Spark SQL everywhere — Catalyst plans, whole-stage codegen,
  AQE; RDDs nowhere.
* The reference's hand-rolled pipeline stages (regex clean, tokenize,
  stopword filter, stem, count-vectorize, TF-IDF, LDA) become
  ``pyspark.ml`` Pipeline stages plus a handful of pandas UDFs.
* The reference's driver-side lookup loops become broadcast hash joins.
* Beyond reference parity: the relational operator surface (joins, windows,
  rollup/cube, set ops, JSON/date functions), LLM-data-pipeline operators
  (dedup exact/MinHash/SimHash, embedding k-NN, text analysis), multimodal
  column plumbing, and Structured Streaming on event data.

Every public operator is registered in ``registry.QUERIES`` with a DuckDB
oracle in ``registry.ORACLES`` where ANSI-SQL-expressible.
"""

__version__ = "0.1.0"

from .session import get_session  # noqa: F401
from .catalog import load_table, SCHEMAS  # noqa: F401
