"""Text-normalization constants shared by Spark operators and SQL oracles.

* ``CLEAN_PATTERN`` re-expresses the reference's punctuation-strip character
  class (``LDAUtil.filterSpecialCharacters``, LDAClustering.scala:283-284).
  The reference's class contains literal spaces (making space-stripping
  implicit) and a redundant ``--`` range; we keep the same character set,
  drop the accidental space members, and escape properly. Divergence
  documented in SURVEY §2.2 P2.
* ``STOPWORDS`` plays the role of the reference's
  ``stopWords_EN.txt`` comma-joined list (LDAClustering.scala:125-129) —
  a compact standard-English function-word list (public knowledge), kept
  small so the DuckDB oracle can inline it as a SQL array literal.

Both constants have a Spark form and a SQL-literal form so the engine query
and its oracle are guaranteed to agree.
"""

from __future__ import annotations

# Reference char class members (LDAClustering.scala:284), space members
# removed, regex-escaped. Java regex and RE2 (DuckDB) agree on this class.
CLEAN_PATTERN = r"""[»«!@#$%^&*()_+\-−,”"’';:.`?]"""
# Same pattern with single quotes doubled for embedding in a SQL string.
CLEAN_PATTERN_SQL = CLEAN_PATTERN.replace("'", "''")

STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "on", "for", "with", "as", "at", "by", "be", "this", "that", "are",
    "was", "from", "but", "not", "have",
)


def stopwords_sql_list() -> str:
    """Render STOPWORDS as a SQL array literal: ['the', 'a', ...]."""
    inner = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"[{inner}]"
