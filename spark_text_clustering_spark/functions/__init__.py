"""Scalar/array helper functions shared across operators."""

from .textnorm import CLEAN_PATTERN, CLEAN_PATTERN_SQL, STOPWORDS, stopwords_sql_list  # noqa: F401
