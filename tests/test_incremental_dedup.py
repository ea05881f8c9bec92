"""Incremental dedup against a persistent fingerprint store: batch 2 must
drop everything already ingested in batch 1, and re-running is idempotent."""

from pyspark.sql import functions as F

from spark_text_clustering_spark.catalog import load_table
from spark_text_clustering_spark.operators.dedup import incremental_dedup

from .conftest import SF_SMALL


def test_incremental_dedup_two_batches(spark, tmp_path):
    store = str(tmp_path / "fp_store")
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    n_distinct = docs.select("text").distinct().count()

    batch1 = docs.where(F.col("doc_id") < 250)
    b1_distinct = batch1.select("text").distinct().count()
    out1 = incremental_dedup(spark, batch1, store)
    assert out1.count() == b1_distinct

    # batch 2 = rest of corpus PLUS a full replay of batch 1 (late dupes)
    batch2 = docs.where(F.col("doc_id") >= 250).unionByName(
        batch1.select((F.col("doc_id") + 5_000_000).alias("doc_id"), "text")
    )
    out2 = incremental_dedup(spark, batch2, store)
    # survivors across both batches = corpus-distinct texts
    assert out1.count() + out2.count() == n_distinct

    # idempotence: replaying batch 2 as a NEW batch adds nothing
    out3 = incremental_dedup(spark, batch2, store)
    assert out3.count() == 0


def test_incremental_dedup_retry_idempotent(spark, tmp_path):
    """A batch retried with the SAME batch_id (crash after commit, failed
    downstream consumer, speculative re-run) must return the same
    survivors and leave exactly one fingerprint per hash in the store —
    the double-append failure mode of a plain append store."""
    store = str(tmp_path / "fp_store_retry")
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    batch1 = docs.where(F.col("doc_id") < 250)

    out1 = incremental_dedup(spark, batch1, store, batch_id="ingest-001")
    n1 = out1.count()
    assert n1 > 0

    # retry of the SAME batch: returns the same survivors (its own partial
    # fingerprints are invisible to the anti-join), not zero
    out_retry = incremental_dedup(spark, batch1, store, batch_id="ingest-001")
    assert out_retry.count() == n1
    assert {r["h"] for r in out_retry.collect()} == {r["h"] for r in out1.collect()}

    # store holds exactly ONE fingerprint per hash — no double append
    store_df = spark.read.parquet(store)
    assert store_df.count() == n1
    assert store_df.select("h").distinct().count() == n1

    # a later batch replaying the same docs under a new id dedups to zero
    out2 = incremental_dedup(spark, batch1, store, batch_id="ingest-002")
    assert out2.count() == 0

    # the lazy returned frame stays correct when consumed AFTER the commit
    # (the old append store returned [] here: the write made the batch's
    # own fingerprints part of its history)
    assert out_retry.count() == n1


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _word_doc(rng, vocab, n=40):
    return " ".join(vocab[i] for i in rng.integers(0, len(vocab), n))


def test_incremental_minhash_two_batches_and_retry(spark, tmp_path):
    """Near-dedup twin (round 5): batch 2 drops documents whose estimated
    Jaccard vs batch-1 SIGNATURES crosses the threshold — historical text
    is never reread — and a retried batch_id is idempotent."""
    import numpy as np

    from spark_text_clustering_spark.operators.dedup import (
        incremental_dedup_minhash,
    )

    store = str(tmp_path / "mh_store")
    rng = np.random.default_rng(42)
    vocab = [f"w{i}" for i in range(500)]
    base = {i: _word_doc(rng, vocab) for i in range(6)}

    def perturb(text, k=1, seed=0):
        words = text.split()
        r = np.random.default_rng(seed)
        for pos in r.integers(5, len(words) - 5, k):
            words[pos] = "zz" + words[pos]
        return " ".join(words)

    # batch 1: docs 0..5 plus doc 100 = near-dup of doc 0 (intra-batch)
    b1 = _mk_docs(
        spark,
        [(i, t) for i, t in base.items()] + [(100, perturb(base[0], seed=1))],
    )
    out1 = {r["doc_id"] for r in incremental_dedup_minhash(spark, b1, store).collect()}
    assert out1 == set(range(6))  # 100 dropped against smaller-id 0

    # batch 2: near-dups of history (docs 1, 3) + two genuinely new docs
    b2 = _mk_docs(
        spark,
        [
            (201, perturb(base[1], seed=2)),
            (203, perturb(base[3], seed=3)),
            (210, _word_doc(rng, vocab)),
            (211, _word_doc(rng, vocab)),
        ],
    )
    out2 = {
        r["doc_id"]
        for r in incremental_dedup_minhash(spark, b2, store, batch_id="r2").collect()
    }
    assert out2 == {210, 211}

    # retry with the SAME batch_id: identical survivors, no store double-count
    out2b = {
        r["doc_id"]
        for r in incremental_dedup_minhash(spark, b2, store, batch_id="r2").collect()
    }
    assert out2b == out2
    sig_store = spark.read.parquet(f"{store}/signatures")
    assert sig_store.count() == sig_store.select("doc_id").distinct().count()
    # and the store holds exactly the survivors of both batches
    assert {r["doc_id"] for r in sig_store.collect()} == out1 | out2


def test_incremental_minhash_matches_exact_jaccard(spark, tmp_path):
    """Quality: on a corpus with engineered near-dups, the docs dropped by
    the signature pipeline must cover every pair whose EXACT 3-gram
    shingle Jaccard is >= 0.7 (comfortably above the 0.6 threshold, so
    banding recall ~0.99 and estimator noise can't straddle the cut), and
    must never drop a doc whose best exact Jaccard is < 0.5."""
    import numpy as np

    from spark_text_clustering_spark.operators.dedup import (
        incremental_dedup_minhash,
    )

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(500)]
    rows = []
    for i in range(20):
        rows.append((i, _word_doc(rng, vocab)))
    for j in range(8):  # near-dup of doc j: replace one word
        words = rows[j][1].split()
        words[10 + j] = "qq"
        rows.append((100 + j, " ".join(words)))
    docs = _mk_docs(spark, rows)
    store = str(tmp_path / "mh_q_store")
    survivors = {
        r["doc_id"] for r in incremental_dedup_minhash(spark, docs, store).collect()
    }
    dropped = {i for i, _ in rows} - survivors

    def sh(text):
        w = text.lower().split()
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    sets = {i: sh(t) for i, t in rows}
    exact_hi = set()
    best = {i: 0.0 for i, _ in rows}
    for i in sets:
        for j in sets:
            if i < j:
                jac = len(sets[i] & sets[j]) / len(sets[i] | sets[j])
                best[j] = max(best[j], jac)
                if jac >= 0.7:
                    exact_hi.add(j)  # larger id of the pair must be dropped
    assert exact_hi <= dropped, f"missed near-dups: {exact_hi - dropped}"
    for d in dropped:
        assert best[d] >= 0.5, f"false drop: doc {d} best exact jaccard {best[d]:.2f}"


def test_incremental_minhash_keeps_unshingleable_docs(spark, tmp_path):
    """Round-6 ADVICE fix: documents with < 3 whitespace tokens (or null
    text) carry no 3-gram shingle, hence no signature. They cannot be
    near-dups under the shingle definition, so they must SURVIVE — the
    r5 code silently dropped them from both output and store."""
    import numpy as np

    from spark_text_clustering_spark.operators.dedup import (
        incremental_dedup_minhash,
    )

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(200)]
    rows = [(1, _word_doc(rng, vocab)), (2, _word_doc(rng, vocab))]
    short = [(50, "two tokens"), (51, "one"), (52, ""), (53, None)]
    docs = _mk_docs(spark, rows + short)
    store = str(tmp_path / "mh_short_store")

    out1 = {
        r["doc_id"]
        for r in incremental_dedup_minhash(spark, docs, store, batch_id="b1").collect()
    }
    assert out1 == {1, 2, 50, 51, 52, 53}

    # unsigned docs commit into the batch partition with sig = NULL
    # (round-15 fused commit): they are durable survivors, but only
    # SIGNED rows carry signatures and band rows — nothing can match them
    sig_store = spark.read.parquet(f"{store}/signatures")
    signed = sig_store.where(sig_store["sig"].isNotNull())
    assert {r["doc_id"] for r in signed.collect()} == {1, 2}
    unsigned = sig_store.where(sig_store["sig"].isNull())
    assert {r["doc_id"] for r in unsigned.collect()} == {50, 51, 52, 53}
    band_store = spark.read.parquet(f"{store}/bands")
    assert {r["doc_id"] for r in band_store.collect()} <= {1, 2}

    # retry idempotence holds with unsigned docs in the batch
    out1b = {
        r["doc_id"]
        for r in incremental_dedup_minhash(spark, docs, store, batch_id="b1").collect()
    }
    assert out1b == out1

    # a later batch re-sending a short doc still keeps it (no signature
    # history to match), while a real near-dup of doc 1 is dropped
    b2 = _mk_docs(spark, [(60, "two tokens"), (61, rows[0][1] + " tail")])
    out2 = {
        r["doc_id"]
        for r in incremental_dedup_minhash(spark, b2, store, batch_id="b2").collect()
    }
    assert out2 == {60}
