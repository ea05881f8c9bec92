"""Rule-based English lemmatizer — the P3 stand-in (reference uses
CoreNLP ``Morphology.lemma`` per partition, LDAClustering.scala:116-121,
293-309; no dependency-free Python twin exists in this container, so a
deterministic rule-based lemmatizer stands in — divergence documented per
SURVEY §7 M2).

Deliberately NOT replicated: the reference's ``(words zip tags).toMap``
within-sentence dedup/scramble (LDAClustering.scala:298) — a latent bug —
and its "drop lemmas of length ≤ 3" rule is kept (that one is semantic).

The class is built once per Arrow batch iterator (``mapInPandas``), the
heavy-object-per-partition pattern the reference uses for Morphology.
"""

from __future__ import annotations

_IRREGULAR = {
    "ran": "run", "running": "run", "runs": "run",
    "was": "be", "were": "be", "is": "be", "are": "be", "been": "be",
    "has": "have", "had": "have", "having": "have",
    "did": "do", "does": "do", "done": "do", "doing": "do",
    "went": "go", "gone": "go", "goes": "go", "going": "go",
    "said": "say", "says": "say",
    "made": "make", "makes": "make", "making": "make",
    "better": "good", "best": "good",
    "mice": "mouse", "men": "man", "women": "woman", "children": "child",
    "feet": "foot", "teeth": "tooth", "geese": "goose",
    # round 3: common irregular verb forms (CoreNLP Morphology handles all
    # of these; each absent entry was a documented divergence)
    "knew": "know", "known": "know", "saw": "see", "seen": "see",
    "took": "take", "taken": "take", "came": "come", "got": "get",
    "gotten": "get", "gave": "give", "given": "give", "told": "tell",
    "found": "find", "thought": "think", "felt": "feel", "kept": "keep",
    "stood": "stand", "heard": "hear", "meant": "mean", "met": "meet",
    "paid": "pay", "sat": "sit", "spoke": "speak", "spoken": "speak",
    "brought": "bring", "bought": "buy", "caught": "catch",
    "taught": "teach", "fought": "fight", "sought": "seek",
    "sold": "sell", "held": "hold", "wrote": "write", "written": "write",
    "drove": "drive", "driven": "drive", "rode": "ride", "rose": "rise",
    "risen": "rise", "chose": "choose", "chosen": "choose",
    "broke": "break", "broken": "break", "woke": "wake", "woken": "wake",
    "threw": "throw", "thrown": "throw", "grew": "grow", "grown": "grow",
    "flew": "fly", "flown": "fly", "drew": "draw", "drawn": "draw",
    "ate": "eat", "eaten": "eat", "fell": "fall", "fallen": "fall",
    "swam": "swim", "began": "begin", "begun": "begin", "sang": "sing",
    "sung": "sing", "drank": "drink", "drunk": "drink", "wore": "wear",
    "worn": "wear", "spent": "spend", "sent": "send", "built": "build",
    "lost": "lose", "led": "lead", "became": "become",
    "understood": "understand", "left": "leave", "won": "win",
    "shook": "shake", "shaken": "shake", "spread": "spread",
    "lay": "lie", "lain": "lie", "laid": "lay",
}

_VOWELS = set("aeiou")


class RuleLemmatizer:
    """Initialized once per batch (stands in for CoreNLP Morphology)."""

    def __init__(self) -> None:
        self.exceptions = dict(_IRREGULAR)

    def lemma(self, word: str) -> str:
        w = word.lower()
        if w in self.exceptions:
            out = self.exceptions[w]
        elif w.endswith("ies") and len(w) > 4:
            out = w[:-3] + "y"
        elif w.endswith("sses") or w.endswith("shes") or w.endswith("ches"):
            out = w[:-2]
        elif w.endswith("s") and not w.endswith(("ss", "us", "is")) and len(w) > 3:
            out = w[:-1]
        elif w.endswith("ing") and len(w) > 5:
            stem = w[:-3]
            # doubled final consonant: "sitting" -> "sit"
            if len(stem) >= 2 and stem[-1] == stem[-2] and stem[-1] not in _VOWELS:
                stem = stem[:-1]
            elif stem and stem[-1] not in _VOWELS and len(stem) >= 2 and stem[-2] in _VOWELS:
                # CVC pattern often drops silent e: "making" handled by dict;
                # keep stem as-is otherwise
                pass
            out = stem
        elif w.endswith("ed") and len(w) > 4:
            stem = w[:-2]
            if len(stem) >= 2 and stem[-1] == stem[-2] and stem[-1] not in _VOWELS:
                stem = stem[:-1]
            out = stem
        else:
            out = w
        # reference keeps only lemmas longer than 3 chars (shorter -> "")
        return out if len(out) > 3 else ""
