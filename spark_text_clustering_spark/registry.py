"""Single merged query/oracle registry consumed by /root/repo/__spark_entry__.py.

Every operator class from SURVEY §2 (and the §2.9 gap list + north-star
LLM-pipeline ops) registers here. Keys without an oracle are genuinely
non-ANSI-SQL-expressible (UDF hashes, approximate/seeded ML) and get the
driver's rows-only check — SURVEY documents which.
"""

from __future__ import annotations

from ._registry import Registry
from .functions.textnorm import STOPWORDS, stopwords_sql_list
from .operators import (
    analytics,
    join_planner,
    collections as collections_ops,
    dedup,
    graph,
    grouped,
    lm,
    multimodal,
    relational,
    relational_ext,
    relational_more,
    search,
    similarity,
    sketches,
    skew,
    text,
    textprep,
    tpch_more,
    tpch_rest,
    traindata,
    unigram,
)
from .ml import queries as ml_queries
from .plans.flagship import TOP_K, flagship_top_terms_per_lang
from .streaming import heavy_hitters as streaming_hh
from .streaming import drift_monitor as streaming_drift
from .streaming import ewma_serving as streaming_ewma
from .streaming import ingest_dedup as streaming_ingest
from .streaming import model_serving as streaming_serving
from .streaming import windows as streaming_windows

ROOT = Registry()

_stop = stopwords_sql_list()
_FLAGSHIP_ORACLE = f"""
WITH tok AS (
  SELECT lang, unnest(regexp_split_to_array(lower(text), '\\s+')) AS token
  FROM documents),
filtered AS (
  SELECT lang, token FROM tok
  WHERE len(token) >= 1 AND NOT list_contains({_stop}, token)),
cnt AS (
  SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM filtered GROUP BY lang, token)
SELECT lang, token, cnt, CAST(rank AS INTEGER) AS rank
FROM (SELECT lang, token, cnt,
             row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, token) AS rank
      FROM cnt)
WHERE rank <= {TOP_K}
"""

ROOT.register("flagship_top_terms", oracle=_FLAGSHIP_ORACLE)(flagship_top_terms_per_lang)

# German flagship (round 12): the reference's second language run —
# lang='de' + its actual stopWords_GE.txt list (shipped as package data,
# case-folded; see resources/README.md). Oracle inlines the full list.
from .functions.textnorm import reference_stopwords, stopwords_sql_list_for
from .plans.flagship import flagship_top_terms_german

_stop_de = stopwords_sql_list_for(
    tuple(dict.fromkeys(w.lower() for w in reference_stopwords("GE")))
)
_FLAGSHIP_DE_ORACLE = f"""
WITH tok AS (
  SELECT lang, unnest(regexp_split_to_array(lower(text), '\\s+')) AS token
  FROM documents WHERE lang = 'de'),
filtered AS (
  SELECT lang, token FROM tok
  WHERE len(token) >= 1 AND NOT list_contains({_stop_de}, token)),
cnt AS (
  SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM filtered GROUP BY lang, token)
SELECT lang, token, cnt, CAST(rank AS INTEGER) AS rank
FROM (SELECT lang, token, cnt,
             row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, token) AS rank
      FROM cnt)
WHERE rank <= {TOP_K}
"""

ROOT.register("flagship_top_terms_de", oracle=_FLAGSHIP_DE_ORACLE)(
    flagship_top_terms_german
)

ROOT.merge(
    analytics.REG,
    join_planner.REG,
    relational.REG,
    relational_ext.REG,
    relational_more.REG,
    collections_ops.REG,
    search.REG,
    text.REG,
    dedup.REG,
    graph.REG,
    similarity.REG,
    skew.REG,
    sketches.REG,
    lm.REG,
    grouped.REG,
    multimodal.REG,
    textprep.REG,
    unigram.REG,
    tpch_more.REG,
    tpch_rest.REG,
    traindata.REG,
    ml_queries.REG,
    streaming_windows.REG,
    streaming_hh.REG,
    streaming_drift.REG,
    streaming_ewma.REG,
    streaming_ingest.REG,
    streaming_serving.REG,
)



def _flagship_sql(spark, sf_dir):
    """Pure-SQL form of the flagship (the spark.sql surface end-to-end):
    same plan as the DataFrame form — Catalyst compiles both identically."""
    from .catalog import load_table
    from .sqlview import sql_over

    docs = load_table(spark, sf_dir, "documents")
    stop = ", ".join(f"'{w}'" for w in STOPWORDS)
    return sql_over(spark, f"""
        WITH tok AS (
          SELECT lang, explode(split(lower(text), '\\\\s+')) AS token
          FROM {{documents}}),
        cnt AS (
          SELECT lang, token, COUNT(*) AS cnt FROM tok
          WHERE length(token) >= 1 AND token NOT IN ({stop})
          GROUP BY lang, token)
        SELECT lang, token, cnt, rank FROM (
          SELECT lang, token, cnt,
                 row_number() OVER (PARTITION BY lang
                                    ORDER BY cnt DESC, token) AS rank
          FROM cnt)
        WHERE rank <= 10
    """, documents=docs)


ROOT.register("flagship_top_terms_sql", oracle=_FLAGSHIP_ORACLE)(_flagship_sql)

QUERIES = ROOT.queries
ORACLES = ROOT.oracles
