"""Lemmatizer/stemmer fidelity golden vs the reference's committed EN
vocabulary (VERDICT r2 item 8; reference P3+P7 —
LDAClustering.scala:116-137, 293-309).

The reference ships the *output* of its CoreNLP-lemma → OpenNLP-Porter
normalization chain as comma-separated vocabulary files
(``resources/models/vocabularies/LdaModel_EN_*``). Two goldens pin our
chain (RuleLemmatizer → functions/porter.porter_stem) against it:

1. A curated surface-form map: each entry's normalized output must equal
   the exact committed vocabulary term (these include the step-1c/step-5
   Porter cases — ``veri``, ``befor``, ``awai``, ``onc`` — that round 2's
   lite stemmer missed).
2. A corpus-level fixpoint property: Porter outputs are (almost all)
   Porter fixpoints, so ≥94% of the committed vocabulary must stem to
   itself under our implementation. The residual ~5% are stems whose
   letter patterns re-trigger a rule plus capitalized proper nouns —
   the documented divergence list, now quantified.
"""

from __future__ import annotations

import os

import pytest

from spark_text_clustering_spark.functions.lemmatize import RuleLemmatizer
from spark_text_clustering_spark.functions.porter import porter_stem
from spark_text_clustering_spark.functions.textnorm import reference_stopwords

_VOCAB = (
    "/root/reference/TextClustering/src/main/resources/models/vocabularies/"
    "LdaModel_EN_1602586875372"
)

# surface form -> exact term committed in the reference's EN vocabulary
GOLDEN_PAIRS = {
    "come": "come", "know": "know", "make": "make", "upon": "upon",
    "very": "veri", "take": "take", "time": "time", "think": "think",
    "well": "well", "look": "look", "down": "down", "hand": "hand",
    "before": "befor", "little": "littl", "over": "over", "give": "give",
    "find": "find", "good": "good", "tell": "tell", "such": "such",
    "much": "much", "here": "here", "never": "never", "hear": "hear",
    "back": "back", "first": "first", "long": "long", "leave": "leav",
    "thing": "thing", "even": "even", "again": "again", "great": "great",
    "feel": "feel", "seem": "seem", "face": "face", "night": "night",
    "away": "awai", "through": "through", "place": "place", "head": "head",
    "stand": "stand", "himself": "himself", "last": "last", "turn": "turn",
    "still": "still", "shall": "shall", "room": "room", "nothing": "noth",
    "without": "without", "life": "life", "house": "hous", "though": "though",
    "once": "onc", "speak": "speak", "word": "word", "those": "those",
    "keep": "keep", "appear": "appear", "work": "work", "door": "door",
    "open": "open", "side": "side", "call": "call", "mind": "mind",
    "under": "under", "friend": "friend", "young": "young", "pass": "pass",
    "three": "three", "many": "mani", "answer": "answer", "right": "right",
    "same": "same", "bring": "bring", "mean": "mean", "want": "want",
    "soon": "soon", "moment": "moment", "return": "return", "light": "light",
    "begin": "begin", "fall": "fall", "quite": "quit", "another": "anoth",
    "hour": "hour", "follow": "follow", "water": "water", "hold": "hold",
    "point": "point", "half": "half", "woman": "woman", "part": "part",
    "round": "round", "love": "love", "matter": "matter", "myself": "myself",
    "foot": "foot", "enough": "enough", "morning": "morn", "name": "name",
    "live": "live", "sure": "sure", "heart": "heart",
    "something": "someth", "year": "year",
    # irregular verb forms: lemmatized to the base verb first (CoreNLP
    # behavior), then stemmed — all base forms appear in the vocab
    "knew": "know", "thought": "think", "brought": "bring",
    "stood": "stand", "spoke": "speak", "heard": "hear", "fell": "fall",
    "held": "hold", "began": "begin", "gave": "give", "took": "take",
    "came": "come", "found": "find", "felt": "feel", "kept": "keep",
}


def _normalize(surface: str) -> str:
    lem = RuleLemmatizer()
    lemma = lem.lemma(surface) or surface
    return porter_stem(lemma)


def test_golden_pairs_match_reference_vocab():
    bad = {
        s: (got, want)
        for s, want in GOLDEN_PAIRS.items()
        if (got := _normalize(s)) != want
    }
    assert not bad, f"{len(bad)} divergences: {bad}"


@pytest.mark.skipif(not os.path.exists(_VOCAB), reason="reference vocab absent")
def test_reference_vocab_mostly_porter_fixpoints():
    terms = open(_VOCAB).read().strip().split(",")
    assert len(terms) > 30_000
    fixed = sum(1 for t in terms if porter_stem(t.lower()) == t.lower())
    rate = fixed / len(terms)
    assert rate >= 0.94, f"fixpoint rate {rate:.3f}"


_VOCAB_GE = (
    "/root/reference/TextClustering/src/main/resources/models/vocabularies/"
    "LdaModel_GE_1591070442475"
)


@pytest.mark.skipif(not os.path.exists(_VOCAB_GE), reason="reference GE vocab absent")
def test_reference_ge_vocab_fixpoint_rate():
    """The reference's GE chain leaves German words largely unstemmed
    (OpenNLP Porter is EN-targeted); our stemmer must be equally
    non-destructive on that vocabulary — ≥97% fixpoints."""
    terms = open(_VOCAB_GE).read().strip().split(",")
    assert len(terms) > 100_000
    fixed = sum(1 for t in terms if porter_stem(t.lower()) == t.lower())
    assert fixed / len(terms) >= 0.97


_BOOKS_EN = "/root/reference/TextClustering/src/main/resources/books/English"
_STOPWORDS_EN = (
    "/root/reference/TextClustering/src/main/resources/stopWords_EN.txt"
)


@pytest.mark.skipif(
    not (os.path.isdir(_BOOKS_EN) and os.path.exists(_VOCAB)),
    reason="reference books/vocab absent",
)
def test_full_chain_agreement_vs_reference_vocab():
    """End-to-end P2→P3→P5→P6→P7 chain over 5 reference books, measured
    against the committed EN vocabulary (the *output* of the reference's
    CoreNLP-lemma → SimpleTokenizer → stopword → OpenNLP-Porter chain over
    the same corpus).

    Measured (round 4): occurrence-weighted agreement 0.9886, distinct
    0.9661. Round 5 (Porter-1b-style silent-e/undouble repair in the
    'ed'/'ing' rules, 'eed' handling, next irregular tier, contraction
    fragments): 0.9964 / 0.9893 — pinned at 0.995 / 0.985. The run uses
    the reference's OWN
    stopWords_EN.txt (the S2 side input a real user would supply) and
    CLEAN_PATTERN_EXTENDED (left curly quotes etc., which the reference's
    CoreNLP tokenizer separates rather than strips). Case-folded compare:
    the reference keeps case ('Holm'), our chain lowercases.

    The residual ~0.4% of occurrences is now dominated by CASE artifacts
    (the reference stems with original case, so OpenNLP-Porter treats the
    uppercase initial as a consonant and keeps 'Alice' intact where our
    lowercased chain yields 'alic'), dialect contractions
    ('lemme'/'gimme'), currency tokens, and 'er'-vs-'ere' verbs
    ('interfered') that no caseless rule can disambiguate."""
    import re

    from spark_text_clustering_spark.functions.textnorm import (
        CLEAN_PATTERN_EXTENDED,
    )

    vocab = {t.lower() for t in open(_VOCAB).read().strip().split(",")}
    stop = set(reference_stopwords("EN"))
    clean_re = re.compile(CLEAN_PATTERN_EXTENDED)
    lem = RuleLemmatizer()

    tot = hit = 0
    dist: dict[str, bool] = {}
    for book in sorted(os.listdir(_BOOKS_EN))[:5]:
        text = open(
            os.path.join(_BOOKS_EN, book), encoding="utf-8", errors="replace"
        ).read()
        toks = clean_re.sub(" ", text.lower()).split()  # P2 + P5
        lemmas = [m for m in (lem.lemma(t) for t in toks) if m]  # P3 (>3 gate)
        kept = [t for t in lemmas if t not in stop]  # P6
        for s in (porter_stem(t) for t in kept):  # P7
            tot += 1
            in_vocab = s in vocab
            hit += in_vocab
            dist.setdefault(s, in_vocab)

    occurrence_agreement = hit / tot
    distinct_agreement = sum(dist.values()) / len(dist)
    assert occurrence_agreement >= 0.995, f"occurrence {occurrence_agreement:.4f}"
    assert distinct_agreement >= 0.985, f"distinct {distinct_agreement:.4f}"


_BOOKS_GE = "/root/reference/TextClustering/src/main/resources/books/German"
_STOPWORDS_GE = (
    "/root/reference/TextClustering/src/main/resources/stopWords_GE.txt"
)


@pytest.mark.skipif(
    not (os.path.isdir(_BOOKS_GE) and os.path.exists(_VOCAB_GE)),
    reason="reference GE books/vocab absent",
)
def test_full_chain_agreement_vs_reference_vocab_german():
    """Same full-chain measurement for the GERMAN corpus (the reference's
    second supported language): 5 books + stopWords_GE.txt vs the
    committed GE vocabulary. Measured 0.999 occurrence / 0.997 distinct —
    higher than EN because the EN-targeted lemmatizer/stemmer rules fire
    rarely on German morphology, matching the reference's own chain
    (CoreNLP English Morphology + OpenNLP Porter are near-identity on
    German too: its GE vocab is ≥97% Porter fixpoints). Pinned at
    0.995/0.99."""
    import re

    from spark_text_clustering_spark.functions.textnorm import (
        CLEAN_PATTERN_EXTENDED,
    )

    vocab = {t.lower() for t in open(_VOCAB_GE).read().strip().split(",")}
    stop = set(w.lower() for w in reference_stopwords("GE"))
    clean_re = re.compile(CLEAN_PATTERN_EXTENDED)
    lem = RuleLemmatizer()

    tot = hit = 0
    dist: dict[str, bool] = {}
    for book in sorted(os.listdir(_BOOKS_GE))[:5]:
        text = open(
            os.path.join(_BOOKS_GE, book), encoding="utf-8", errors="replace"
        ).read()
        toks = clean_re.sub(" ", text.lower()).split()
        lemmas = [m for m in (lem.lemma(t) for t in toks) if m]
        kept = [t for t in lemmas if t not in stop]
        for s in (porter_stem(t) for t in kept):
            tot += 1
            in_vocab = s in vocab
            hit += in_vocab
            dist.setdefault(s, in_vocab)

    assert hit / tot >= 0.995, f"occurrence {hit / tot:.4f}"
    assert sum(dist.values()) / len(dist) >= 0.99


def test_porter_classic_vectors():
    vecs = {
        "caresses": "caress", "ponies": "poni", "cats": "cat",
        "agreed": "agre", "plastered": "plaster", "motoring": "motor",
        "conflated": "conflat", "hopping": "hop", "happy": "happi",
        "sky": "sky", "relational": "relat", "vietnamization": "vietnam",
        "decisiveness": "decis", "triplicate": "triplic",
        "electriciti": "electr", "adjustment": "adjust",
        "adoption": "adopt", "activate": "activ", "controll": "control",
        "roll": "roll", "cease": "ceas", "probate": "probat", "rate": "rate",
    }
    bad = {w: (porter_stem(w), want) for w, want in vecs.items() if porter_stem(w) != want}
    assert not bad, bad


def _proper_noun_types(texts):
    """Python twin of operators/text.truecase_proper_nouns' statistic, over
    raw book text: a type is proper iff predominantly capitalized in
    non-sentence-initial positions (>=2 such occurrences, majority cap)."""
    import re
    from collections import Counter

    from spark_text_clustering_spark.functions.textnorm import (
        CLEAN_PATTERN_EXTENDED,
    )

    clean_re = re.compile(CLEAN_PATTERN_EXTENDED)
    cap_mid, tot_mid = Counter(), Counter()
    for text in texts:
        prev_end = True
        for t in re.findall(r"\S+", text):
            core = clean_re.sub(" ", t).strip()
            first = core.split()[0] if core.split() else ""
            if first and not prev_end:
                key = first.lower()
                tot_mid[key] += 1
                if first[0].isupper():
                    cap_mid[key] += 1
            prev_end = t.rstrip('"”’)')[-1:] in ".!?"
    return {w for w in tot_mid if tot_mid[w] >= 2 and 2 * cap_mid[w] > tot_mid[w]}


@pytest.mark.skipif(
    not (os.path.isdir(_BOOKS_EN) and os.path.exists(_VOCAB)),
    reason="reference books/vocab absent",
)
def test_truecased_chain_agreement_vs_reference_vocab():
    """Round 5: the CASE-AWARE chain — corpus-statistics truecasing
    (proper-noun types stay cased and skip the lemma rules, everything
    else lowercases) feeding the same P3→P7 tail — measured against the
    reference's CASED vocabulary. The reference's CoreNLP chain keeps
    'Alice'/'Holm' cased via POS tags; the truecasing statistic recovers
    that class, lifting occurrence agreement from 0.9964 (lowercased
    chain) to 0.9990. Pinned at 0.998. Residue: dialect contractions
    ('lemme'), currency/ordinal tokens, 'er'-vs-'ere' verbs."""
    import re

    from spark_text_clustering_spark.functions.textnorm import (
        CLEAN_PATTERN_EXTENDED,
    )

    vocab_cased = set(open(_VOCAB).read().strip().split(","))
    vocab_lower = {t.lower() for t in vocab_cased}
    stop = set(reference_stopwords("EN"))
    clean_re = re.compile(CLEAN_PATTERN_EXTENDED)
    lem = RuleLemmatizer()

    texts = [
        open(os.path.join(_BOOKS_EN, b), encoding="utf-8", errors="replace").read()
        for b in sorted(os.listdir(_BOOKS_EN))[:5]
    ]
    proper = _proper_noun_types(texts)
    assert "alice" in proper and "the" not in proper  # the statistic works

    tot = hit = 0
    for text in texts:
        for t in clean_re.sub(" ", text).split():  # NO pre-lowercase
            lw = t.lower()
            if lw in proper and t[:1].isupper():
                lemma = t if len(t) > 3 else ""  # proper noun: cased, no rules
            else:
                lemma = lem.lemma(lw)
            if not lemma or lemma.lower() in stop:
                continue
            s = porter_stem(lemma)
            tot += 1
            hit += s in vocab_cased or s.lower() in vocab_lower
    agreement = hit / tot
    assert agreement >= 0.998, f"truecased occurrence agreement {agreement:.4f}"


@pytest.mark.skipif(not os.path.isdir(_BOOKS_EN), reason="reference books absent")
def test_truecase_operator_on_real_text(spark, tmp_path):
    """The Spark truecase_proper_nouns operator, run over real book text
    loaded into a documents table, must nominate the books' protagonists
    and never the sentence-start-only common words."""
    import os as _os

    from spark_text_clustering_spark.catalog import SCHEMAS
    from spark_text_clustering_spark.operators.text import truecase_proper_nouns

    book = sorted(_os.listdir(_BOOKS_EN))[0]
    text = open(
        _os.path.join(_BOOKS_EN, book), encoding="utf-8", errors="replace"
    ).read()
    # chunk the book into docs (the operator is per-corpus, not per-doc)
    chunks = [text[i : i + 5000] for i in range(0, min(len(text), 200_000), 5000)]
    rows = [(i, c, "en", "book", len(c)) for i, c in enumerate(chunks)]
    d = str(tmp_path / "tc_sf")
    _os.makedirs(d)
    spark.createDataFrame(rows, SCHEMAS["documents"]).write.mode(
        "overwrite"
    ).parquet(_os.path.join(d, "documents.parquet"))

    proper = {r["word"] for r in truecase_proper_nouns(spark, d).collect()}
    # the first EN book is "Adventures of Captain Horn": the protagonist's
    # NAME is nominated (65/65 capitalized mid-sentence), while 'captain'
    # is correctly rejected — lowercase "the captain" dominates its
    # mid-sentence occurrences (58/348) — and sentence-start-only common
    # words never appear
    assert "horn" in proper and "edna" in proper
    assert "captain" not in proper
    assert not {"the", "and", "of"} & proper


@pytest.mark.skipif(not os.path.isdir(_BOOKS_EN), reason="reference books absent")
def test_truecase_oracle_parity_on_real_text(spark, tmp_path):
    """The driver's testdata documents are all-lowercase, so its oracle
    check can't exercise the truecasing regexes; this pins the Spark
    operator against its OWN DuckDB oracle on real capitalized book text
    (full row/schema/value-hash compare — the same contract the driver
    uses)."""
    import os as _os

    import duckdb

    from spark_text_clustering_spark.catalog import SCHEMAS
    from spark_text_clustering_spark.operators.text import (
        _TRUECASE_ORACLE,
        truecase_proper_nouns,
    )
    from .oracle_harness import compare

    book = sorted(_os.listdir(_BOOKS_EN))[0]
    text = open(
        _os.path.join(_BOOKS_EN, book), encoding="utf-8", errors="replace"
    ).read()
    chunks = [text[i : i + 5000] for i in range(0, min(len(text), 200_000), 5000)]
    rows = [(i, c, "en", "book", len(c)) for i, c in enumerate(chunks)]
    d = str(tmp_path / "tc_oracle_sf")
    _os.makedirs(d)
    spark.createDataFrame(rows, SCHEMAS["documents"]).write.mode(
        "overwrite"
    ).parquet(_os.path.join(d, "documents.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'"
    )
    ok, msg = compare(truecase_proper_nouns(spark, d), con.sql(_TRUECASE_ORACLE))
    assert ok, msg


def test_shipped_stopword_resources_match_reference():
    """The package's shipped stopword data (resources/stopwords_{en,de}.txt,
    the default side input for `stopword_filter_reference` and the German
    flagship) must stay byte-identical to the reference's own files, and
    the pure-Python loader must agree with the S2 comma-split semantics."""
    from spark_text_clustering_spark.functions.textnorm import (
        parse_stopword_text,
        stopword_resource_path,
    )

    for lang, ref_path in (("EN", _STOPWORDS_EN), ("GE", _STOPWORDS_GE)):
        shipped = stopword_resource_path(lang)
        if os.path.exists(ref_path):
            assert open(shipped, "rb").read() == open(ref_path, "rb").read(), lang
        words = parse_stopword_text(open(shipped, encoding="utf-8").read())
        assert len(words) > 100 and all("," not in w and w == w.strip() for w in words)
        assert tuple(words) == reference_stopwords(lang)


def test_read_stopwords_source_matches_pure_python(spark):
    """The registered S2 Spark source (read_stopwords) over the shipped
    resource returns exactly what the oracle-side pure-Python loader
    returns — the engine/oracle agreement the round-12 keys rely on."""
    from spark_text_clustering_spark.functions.textnorm import (
        stopword_resource_path,
    )
    from spark_text_clustering_spark.sources.text_corpus import read_stopwords

    for lang in ("EN", "GE"):
        got = read_stopwords(spark, stopword_resource_path(lang))
        assert tuple(got) == reference_stopwords(lang), lang
