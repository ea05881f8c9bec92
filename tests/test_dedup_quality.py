"""Quality floors for the APPROXIMATE dedup family (round 4): their green
status must bound result quality, not just determinism — same contract the
ANN paths got in tests/test_search.py.

- MinHashLSH banding: measured pair-recall vs EXACT 3-gram-shingle Jaccard
  ground truth (computed in-process over all pairs — sf0.01 is 500 docs).
- SimHash 4x16 banding: pigeonhole guarantees any pair within Hamming
  distance 3 shares an untouched band, so the operator must equal the
  brute-force enumeration EXACTLY, not approximately.
"""

import numpy as np
import pandas as pd

from spark_text_clustering_spark.catalog import load_table
from spark_text_clustering_spark.operators.dedup import (
    _simhash_series,
    dedup_minhash,
    dedup_simhash,
)

from .conftest import SF_ORACLE


def _shingle_set(text: str) -> set:
    toks = (text or "").lower().split()
    if len(toks) < 3:
        return set()
    return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}


def test_minhash_recall_vs_exact_jaccard(spark):
    """Pair-recall of the MinHash banding join vs exact Jaccard >= 0.4
    pairs (the operator's approxSimilarityJoin threshold is distance 0.6).
    Measured 1.000 at sf0.01 (25/25 true pairs) — pinned at 0.9; the
    HashingTF 2^18 binarization can in principle cost a pair to a bucket
    collision, hence not pinned at exact."""
    rows = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text").collect()
    sets = {r["doc_id"]: _shingle_set(r["text"]) for r in rows}
    ids = sorted(i for i, s in sets.items() if s)
    true_pairs = set()
    for i, id_a in enumerate(ids):
        sa = sets[id_a]
        for id_b in ids[i + 1 :]:
            sb = sets[id_b]
            inter = len(sa & sb)
            if inter and inter / (len(sa) + len(sb) - inter) >= 0.4:
                true_pairs.add((id_a, id_b))
    assert len(true_pairs) >= 10, "ground truth too small — test is vacuous"

    found = {(r["id_a"], r["id_b"]) for r in dedup_minhash(spark, SF_ORACLE).collect()}
    recall = len(found & true_pairs) / len(true_pairs)
    assert recall >= 0.9, f"minhash recall {recall:.3f}"


def test_simhash_banding_equals_bruteforce(spark):
    """4 bands x 16 bits with a Hamming<=3 verify is EXACT by pigeonhole
    (3 bit flips cannot touch all 4 bands) — the banded operator must
    return precisely the brute-force Hamming<=3 pair set."""
    rows = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text").collect()
    sigs = _simhash_series(
        pd.Series([(r["text"] or "").lower().split() for r in rows])
    )
    by_id = dict(zip([r["doc_id"] for r in rows], [int(s) for s in sigs]))
    ids = sorted(by_id)
    vals = np.array([by_id[i] for i in ids], dtype=np.int64).astype(np.uint64)
    true_pairs = set()
    for i in range(len(ids)):
        xor = vals[i] ^ vals[i + 1 :]
        ham = np.array([bin(int(v)).count("1") for v in xor])
        for off in np.nonzero(ham <= 3)[0]:
            true_pairs.add((ids[i], ids[i + 1 + off]))
    assert true_pairs, "no close signatures — test is vacuous"

    found = {(r["id_a"], r["id_b"]) for r in dedup_simhash(spark, SF_ORACLE).collect()}
    assert found == true_pairs


def test_duplicate_spans_exact_boundaries(spark, tmp_path):
    """dedup_duplicate_spans semantics pinned on a crafted corpus: two docs
    share one 45-char passage at known offsets; the detector must report
    exactly the maximal shared window span in each doc (every 30-gram of
    the shared passage, merged into one island), and a doc with no
    cross-doc 30-gram must report nothing."""
    import os

    from spark_text_clustering_spark.catalog import SCHEMAS
    from spark_text_clustering_spark.operators.dedup import (
        _SPAN_L,
        dedup_duplicate_spans,
    )

    assert _SPAN_L == 30
    shared = "the quick brown fox jumps over the lazy dog x"  # 45 chars
    assert len(shared) == 45
    pre_a, pre_b = "A" * 10, "B" * 25
    doc_a = pre_a + shared + "C" * 12
    doc_b = pre_b + shared + "D" * 7
    doc_c = "E" * 80  # repeated within itself only -> not cross-doc... but
    # 30-grams of 'E'*80 appear in doc_c ONLY -> distinct-doc count 1 -> none
    rows = [
        (1, doc_a, "en", "t", len(doc_a)),
        (2, doc_b, "en", "t", len(doc_b)),
        (3, doc_c, "en", "t", len(doc_c)),
    ]
    d = str(tmp_path / "span_sf")
    os.makedirs(d)
    spark.createDataFrame(rows, SCHEMAS["documents"]).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "documents.parquet"))

    got = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["span_len"])
        for r in dedup_duplicate_spans(spark, d).collect()
    }
    # shared passage occupies [len(pre)+1, len(pre)+45] (1-based inclusive);
    # its 30-gram start positions are len(pre)+1 .. len(pre)+16, so the
    # merged island is exactly the passage
    assert got[1] == (11, 55, 45)
    assert got[2] == (26, 70, 45)
    assert 3 not in got


def test_duplicate_spans_strided_equals_full(spark, tmp_path):
    """Round-6 scale mode: the strided+Bloom pipeline must emit EXACTLY
    the full-scan operator's spans (the alignment-safety construction in
    dup_spans_strided_frames guarantees recall; the exact re-scan
    guarantees precision), on both the crafted corpus (misaligned shared
    passage: prefixes of different length mod stride) and the real
    sf0.01 corpus — and its discovery join must shuffle a strict
    fraction of the gram rows the full scan aggregates."""
    import os

    from spark_text_clustering_spark.catalog import SCHEMAS
    from spark_text_clustering_spark.operators.dedup import (
        _span_grams,
        dedup_duplicate_spans,
        dedup_duplicate_spans_strided,
        dup_spans_strided_frames,
    )
    from .conftest import SF_ORACLE

    def spans(df):
        return {
            (r["doc_id"], r["span_start"], r["span_end"], r["span_len"])
            for r in df.collect()
        }

    # crafted corpus with stride-misaligned duplicates (prefix lengths 10,
    # 25: 10 % 4 != 25 % 4) plus a single-window (30-char) shared gram —
    # the minimal island a naive position-stride would miss
    shared = "the quick brown fox jumps over the lazy dog x"  # 45 chars
    tiny = "0123456789abcdefghijklmnopqrs"  # 29 chars -> pad to exactly 30
    tiny += "!"
    assert len(tiny) == 30
    rows = [
        (1, "A" * 10 + shared + "C" * 12, "en", "t", 67),
        (2, "B" * 25 + shared + "D" * 7, "en", "t", 77),
        (3, "E" * 33 + tiny + "F" * 3, "en", "t", 66),
        (4, "G" * 7 + tiny, "en", "t", 37),
        (5, "H" * 40, "en", "t", 40),
    ]
    d = str(tmp_path / "span_strided_sf")
    os.makedirs(d)
    spark.createDataFrame(rows, SCHEMAS["documents"]).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "documents.parquet"))
    full_crafted = spans(dedup_duplicate_spans(spark, d))
    assert (4, 8, 37, 30) in full_crafted  # the single-window island exists
    for stride in (2, 4, 7):
        assert spans(dedup_duplicate_spans_strided(spark, d, stride)) == full_crafted

    # real corpus equality at the oracle SF
    assert spans(dedup_duplicate_spans_strided(spark, SF_ORACLE)) == spans(
        dedup_duplicate_spans(spark, SF_ORACLE)
    )

    # shuffle accounting: the full operator's duplicate aggregate shuffles
    # every gram row; the strided discovery join shuffles the strided
    # seeds plus only the Bloom-surviving full-side seeds
    frames = dup_spans_strided_frames(spark, SF_ORACLE)
    n_full = _span_grams(spark, SF_ORACLE).count()
    n_strided = frames["strided"].count()
    n_pref = frames["prefiltered"].count()
    n_rescan = frames["rescan"].count()
    assert n_strided <= n_full // 3  # ~1/stride of the seed rows
    assert n_strided + n_pref + n_rescan < n_full, (
        f"strided mode shuffled {n_strided}+{n_pref}+{n_rescan} rows vs "
        f"full scan's {n_full}"
    )


def test_minhash_fast_recall_vs_exact_jaccard(spark, tmp_path):
    """The all-JVM banding twin must catch every pair whose EXACT 3-gram
    Jaccard is >= 0.55 (comfortably above threshold 0.4: with k=64 the
    estimator sigma at j=0.55 is ~0.06, and 16x4 banding recall at
    j>=0.55 is >= 0.996) and never emit a pair whose exact Jaccard is
    < 0.2 (estimator noise bound)."""
    import os

    import numpy as np

    from spark_text_clustering_spark.catalog import SCHEMAS
    from spark_text_clustering_spark.operators.dedup import dedup_minhash_fast

    rng = np.random.default_rng(21)
    vocab = [f"w{i}" for i in range(400)]
    rows = []
    for i in range(25):
        rows.append((i, " ".join(vocab[j] for j in rng.integers(0, 400, 40))))
    for j in range(10):  # near-dup: one word changed
        words = rows[j][1].split()
        words[8 + j] = "qq"
        rows.append((100 + j, " ".join(words)))
    d = str(tmp_path / "mh_fast_sf")
    os.makedirs(d)
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows], SCHEMAS["documents"]
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))

    got = {
        (r["id_a"], r["id_b"])
        for r in dedup_minhash_fast(spark, d).collect()
    }

    def sh(text):
        w = text.lower().split()
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    sets = {i: sh(t) for i, t in rows}
    for i in sets:
        for j in sets:
            if i < j:
                jac = len(sets[i] & sets[j]) / len(sets[i] | sets[j])
                if jac >= 0.55:
                    assert (i, j) in got, f"missed pair ({i},{j}) j={jac:.2f}"
                if (i, j) in got:
                    assert jac >= 0.2, f"false pair ({i},{j}) j={jac:.2f}"


def test_duplicate_spans_segmented_equals_unsegmented(spark):
    """Round-6 petabyte mode: hash-space-segmented Bloom prefilters (mh %
    S slices, each with a 1/S bitset) must emit exactly the single-bitset
    strided mode's spans, which equal the full scan's — and each
    segment's prefilter must still pass only its own slice (the union of
    prefiltered rows stays a strict fraction of the full gram table)."""
    from spark_text_clustering_spark.operators.dedup import (
        _span_grams,
        dedup_duplicate_spans,
        dedup_duplicate_spans_segmented,
        dup_spans_strided_frames,
    )

    from .conftest import SF_ORACLE

    def spans(df):
        return {
            (r["doc_id"], r["span_start"], r["span_end"], r["span_len"])
            for r in df.collect()
        }

    full = spans(dedup_duplicate_spans(spark, SF_ORACLE))
    assert spans(dedup_duplicate_spans_segmented(spark, SF_ORACLE)) == full
    # a different segment count must not change anything either
    assert (
        spans(
            dedup_duplicate_spans_segmented(spark, SF_ORACLE, n_bloom_segments=5)
        )
        == full
    )

    frames = dup_spans_strided_frames(spark, SF_ORACLE, n_bloom_segments=3)
    n_full = _span_grams(spark, SF_ORACLE).count()
    n_pref = frames["prefiltered"].count()
    n_strided = frames["strided"].count()
    assert n_strided + n_pref < n_full
