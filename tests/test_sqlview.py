"""sql_over hardening (round 13, ADVICE r12 low): literal braces in SQL
must survive substitution, and per-call view names must be unique so
concurrent plan construction cannot clobber catalog entries."""

from spark_text_clustering_spark.sqlview import sql_over


def test_literal_braces_pass_through(spark):
    """A regexp quantifier like {2,3} in the SQL text must not be treated
    as a substitution token (the old str.format raised on it)."""
    df = spark.createDataFrame(
        [("aab",), ("aaab",), ("ab",)], ["s"]
    )
    out = sql_over(
        spark,
        r"SELECT s FROM {t} WHERE regexp_like(s, '^a{2,3}b$') ORDER BY s",
        t=df,
    )
    assert [r["s"] for r in out.collect()] == ["aaab", "aab"]


def test_no_catalog_residue_and_unique_names(spark):
    """Each call registers fresh _stc_<name>_<k> views and drops them;
    two plans built from the same frame keyword coexist."""
    before = {v.name for v in spark.catalog.listTables()}
    df1 = spark.createDataFrame([(1,)], ["x"])
    df2 = spark.createDataFrame([(2,)], ["x"])
    a = sql_over(spark, "SELECT x FROM {t}", t=df1)
    b = sql_over(spark, "SELECT x FROM {t}", t=df2)
    # both analyzed plans stay valid after their views were dropped
    assert a.collect()[0]["x"] == 1
    assert b.collect()[0]["x"] == 2
    after = {v.name for v in spark.catalog.listTables()}
    assert not {n for n in after - before if n.startswith("_stc_")}


def test_sql_args_still_bind(spark):
    df = spark.createDataFrame([(1,), (5,)], ["x"])
    out = sql_over(
        spark,
        "SELECT x FROM {t} WHERE x > :lo",
        sql_args={"lo": 2},
        t=df,
    )
    assert [r["x"] for r in out.collect()] == [5]


def test_concurrent_plan_construction(spark):
    """Two threads building plans from the same frame keyword must not
    clobber each other's catalog entries (the per-call counter claim)."""
    import threading

    results, errors = {}, []

    def build(i):
        try:
            df = spark.createDataFrame([(i,)], ["x"])
            out = sql_over(spark, "SELECT x + 0 AS x FROM {t}", t=df)
            results[i] = out.collect()[0]["x"]
        except Exception as e:  # pragma: no cover - failure detail
            errors.append((i, repr(e)))

    threads = [threading.Thread(target=build, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert results == {i: i for i in range(8)}
