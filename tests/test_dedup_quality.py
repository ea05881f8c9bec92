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
