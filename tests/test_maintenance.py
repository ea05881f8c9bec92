"""Storage maintenance: compaction must preserve data and hit the target
file count; Z-ordered writes must produce parquet footers that actually
admit file-level skipping on BOTH clustered dimensions."""

import os

from pyspark.sql import functions as F

from spark_text_clustering_spark.catalog import load_table
from spark_text_clustering_spark.operators.maintenance import (
    compact_small_files,
    write_zordered,
    zorder_file_stats,
)

from .conftest import SF_SMALL


def _parquet_files(path):
    out = []
    for root, _dirs, files in os.walk(path):
        out += [os.path.join(root, f) for f in files if f.endswith(".parquet")]
    return out


def test_compact_small_files_preserves_data(spark, tmp_path):
    src = str(tmp_path / "frag")
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    docs.repartition(37).write.parquet(src)  # fragmented: 37 small files
    assert len(_parquet_files(src)) == 37
    before = sorted(r["doc_id"] for r in spark.read.parquet(src).collect())

    _, n_files = compact_small_files(spark, src, target_file_bytes=1 << 40)
    assert n_files == 1
    assert len(_parquet_files(src)) == 1
    after = sorted(r["doc_id"] for r in spark.read.parquet(src).collect())
    assert after == before
    # staging/old dirs cleaned up
    assert not os.path.exists(src + ".compact_staging")
    assert not os.path.exists(src + ".compact_old")


def test_compact_respects_target_size(spark, tmp_path):
    src = str(tmp_path / "frag2")
    load_table(spark, SF_SMALL, "documents").repartition(16).write.parquet(src)
    total = sum(os.path.getsize(f) for f in _parquet_files(src))
    target = max(1, total // 4)
    _, n_files = compact_small_files(spark, src, target_file_bytes=target)
    assert 4 <= n_files <= 5  # ceil(total/target): rounding headroom
    assert len(_parquet_files(src)) == n_files


def test_compact_preserves_evolved_schema(spark, tmp_path):
    """Compacting a directory whose files were written under EVOLVING
    schemas (a later writer added a column) must keep the union of
    columns with nulls back-filled — a naive spark.read.parquet picks one
    footer's schema and silently drops the new column."""
    src = str(tmp_path / "evolved")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, text string"
    ).write.parquet(src)
    spark.createDataFrame(
        [(3, "c", "en")], "doc_id long, text string, lang string"
    ).write.mode("append").parquet(src)

    compact_small_files(spark, src, target_file_bytes=1 << 40)
    out = spark.read.parquet(src)
    assert set(out.columns) == {"doc_id", "text", "lang"}
    rows = {r["doc_id"]: (r["text"], r["lang"]) for r in out.collect()}
    assert rows == {1: ("a", None), 2: ("b", None), 3: ("c", "en")}


def test_write_zordered_files_admit_skipping(spark, tmp_path):
    """After a Z-ordered write, per-file zkey [min,max] spans must be
    (a) non-overlapping across files (range partitioning) and (b) narrow
    enough that a conjunctive x+y range predicate skips most files —
    the property a single-column sort cannot give both dimensions."""
    from spark_text_clustering_spark.operators.traindata import _spread16

    ev = load_table(spark, SF_SMALL, "events").where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    x = F.col("user_id").bitwiseAND(F.lit(0xFFFF)).cast("long")
    y = F.floor(F.unix_timestamp("ts") / 60).cast("long").bitwiseAND(F.lit(0xFFFF))
    zkey = _spread16(x).bitwiseOR(F.shiftleft(_spread16(y), 1))

    dst = str(tmp_path / "zordered")
    write_zordered(ev.select("event_id", "user_id", "ts"), dst, zkey, n_files=8)

    spans = zorder_file_stats(dst)
    assert len(spans) == 8
    ordered = sorted(spans)
    for (lo_a, hi_a), (lo_b, _hi_b) in zip(ordered, ordered[1:]):
        assert hi_a <= lo_b  # contiguous, non-overlapping file ranges

    # skipping evidence: each file's span covers a fraction of the global
    # zkey range, so a point-ish z-range predicate prunes most files
    glo = min(lo for lo, _ in spans)
    ghi = max(hi for _, hi in spans)
    probe_lo = glo + (ghi - glo) // 2
    probe_hi = probe_lo + (ghi - glo) // 16
    overlapping = [
        (lo, hi) for lo, hi in spans if not (hi < probe_lo or lo > probe_hi)
    ]
    assert len(overlapping) <= 3  # >= 5 of 8 files skipped

    # and the data survives intact
    assert spark.read.parquet(dst).count() == ev.count()


def test_hilbert_vs_morton_locality(spark):
    """Round 5: the Hilbert key's locality claim, MEASURED. On a uniform
    20k-point sample of the shared 2^15 grid, sort by each shipped key
    expression, cut into 64 equal files, take per-file (x, y) bounding
    boxes, and count files intersecting random square query boxes — the
    exact file-skipping model min/max parquet footer stats give. Hilbert's
    unit-step walk yields tighter boxes than Morton's power-of-two jumps:
    measured avg files read per box (64 files, 200 boxes/side):
    side=1024: 3.10 vs 2.05 (0.66x), side=2048: 3.96 vs 2.73 (0.69x),
    side=4096: 6.33 vs 4.64 (0.73x). Pinned at <= 0.85x for every side."""
    import numpy as np
    import pandas as pd

    from spark_text_clustering_spark.operators.traindata import (
        _HILBERT_SPARK,
        _spread16,
    )

    rng = np.random.default_rng(42)
    n = 20_000
    pdf = pd.DataFrame(
        {"x": rng.integers(0, 32768, n), "y": rng.integers(0, 32768, n)}
    )
    keyed = spark.createDataFrame(pdf).select(
        "x",
        "y",
        _spread16(F.col("x"))
        .bitwiseOR(F.shiftleft(_spread16(F.col("y")), 1))
        .alias("zkey"),
        F.expr(_HILBERT_SPARK).alias("hkey"),
    )
    rows = keyed.collect()
    x = np.array([r["x"] for r in rows])
    y = np.array([r["y"] for r in rows])
    zk = np.array([r["zkey"] for r in rows])
    hk = np.array([r["hkey"] for r in rows])

    n_files = 64
    per = n // n_files

    def avg_files_read(keys, box_side, seed=7, n_boxes=200):
        order = np.argsort(keys, kind="stable")
        fx, fy = x[order], y[order]
        bx0 = np.array([fx[i * per : (i + 1) * per].min() for i in range(n_files)])
        bx1 = np.array([fx[i * per : (i + 1) * per].max() for i in range(n_files)])
        by0 = np.array([fy[i * per : (i + 1) * per].min() for i in range(n_files)])
        by1 = np.array([fy[i * per : (i + 1) * per].max() for i in range(n_files)])
        boxes = np.random.default_rng(seed)
        lox = boxes.integers(0, 32768 - box_side, n_boxes)
        loy = boxes.integers(0, 32768 - box_side, n_boxes)
        reads = 0
        for lx, ly in zip(lox, loy):
            hit = ~(
                (bx1 < lx) | (bx0 > lx + box_side) | (by1 < ly) | (by0 > ly + box_side)
            )
            reads += hit.sum()
        return reads / n_boxes

    for side in (1024, 2048, 4096):
        morton = avg_files_read(zk, side)
        hilbert = avg_files_read(hk, side)
        assert hilbert <= 0.85 * morton, (
            f"side={side}: hilbert {hilbert:.2f} vs morton {morton:.2f} — "
            "locality advantage collapsed"
        )
