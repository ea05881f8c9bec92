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
    # round 5: next tier of irregular pasts/participles, measured as the
    # top remaining divergence class vs the reference's EN vocabulary
    "sprang": "spring", "sprung": "spring", "forgot": "forget",
    "forgotten": "forget", "stole": "steal", "stolen": "steal",
    "sank": "sink", "sunk": "sink", "slid": "slide", "crept": "creep",
    "swore": "swear", "sworn": "swear", "awoke": "awake",
    "awoken": "awake", "shown": "show", "blew": "blow", "blown": "blow",
    "bore": "bear", "borne": "bear", "tore": "tear", "torn": "tear",
    "swung": "swing", "clung": "cling", "stuck": "stick",
    "struck": "strike", "hung": "hang", "dug": "dig", "slept": "sleep",
    "swept": "sweep", "wept": "weep", "dealt": "deal", "bent": "bend",
    "lent": "lend", "shot": "shoot", "lit": "light", "hid": "hide",
    "hidden": "hide", "bit": "bite", "bitten": "bite", "froze": "freeze",
    "frozen": "freeze", "shrank": "shrink", "shrunk": "shrink",
    "strode": "stride", "rang": "ring", "rung": "ring", "leapt": "leap",
    "knelt": "kneel", "fled": "flee", "sped": "speed", "bled": "bleed",
    "bred": "breed", "burnt": "burn", "learnt": "learn",
    "dreamt": "dream", "spat": "spit", "stung": "sting",
    # contraction fragments: the cleaner splits "wasn't" at the
    # apostrophe, leaving "wasn"; CoreNLP's tokenizer instead yields
    # "was" + "n't", so map each fragment to the lemma CoreNLP gives the
    # verb part (the "be"/short results are then dropped by the >3 rule,
    # exactly like the reference's chain drops them)
    "wasn": "be", "isn": "be", "aren": "be", "weren": "be", "ain": "be",
    "hasn": "have", "hadn": "have", "haven": "have", "doesn": "do",
    "didn": "do", "shouldn": "should", "wouldn": "would",
    "couldn": "could", "mustn": "must", "needn": "need",
    "shan": "shall", "oughtn": "ought", "dasn": "dare",
    "mightn": "might", "undertook": "undertake", "arose": "arise",
    "arisen": "arise",
}

# 'eed' words whose base form IS the 'eed' spelling (succeed, not succee)
_EED_BASE = {
    "succeed", "exceed", "proceed", "indeed", "breed", "speed", "bleed",
    "creed", "greed", "steed",
}

_VOWELS = set("aeiou")


def _has_vowel(s: str) -> bool:
    return any(c in _VOWELS for c in s)


def _post_strip(stem: str) -> str:
    """Porter-1b-style repair after removing 'ed'/'ing' — what CoreNLP's
    Morpha effectively does for regular verbs: restore the silent 'e' for
    at/bl/iz stems and short CVC stems ('shov' → 'shove', 'smok' →
    'smoke'), undouble a doubled final consonant EXCEPT l/s/z ('sitt' →
    'sit' but 'call'/'dress'/'buzz' stay). Over-restored 'e' on at-stems
    is provably removed again by the downstream Porter stage, so the
    full chain converges to the reference's vocabulary."""
    from .porter import _cvc, _measure

    if stem.endswith(("at", "bl", "iz")):
        return stem + "e"
    if (
        len(stem) >= 2
        and stem[-1] == stem[-2]
        and stem[-1] not in _VOWELS
        and stem[-1] not in "lsz"
    ):
        return stem[:-1]
    if stem.endswith("s") and not stem.endswith("ss"):
        # verbs ending in bare 's' are essentially always 'se' words
        # (cease, raise, collapse); for true 's' stems like 'focus' the
        # downstream Porter drops the extra 'e' again (m>1), so the chain
        # converges either way
        return stem + "e"
    if _measure(stem) == 1 and _cvc(stem):
        return stem + "e"
    return stem


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
        elif w.endswith("eed") and len(w) > 4:
            # past forms drop only the 'd' ("agreed" -> "agree"); base-form
            # 'eed' verbs keep it ("succeed")
            out = w if w in _EED_BASE else w[:-1]
        elif w.endswith("ing") and len(w) > 5 and _has_vowel(w[:-3]):
            out = _post_strip(w[:-3])
        elif w.endswith("ed") and len(w) > 4 and _has_vowel(w[:-2]):
            out = _post_strip(w[:-2])
        else:
            out = w
        # reference keeps only lemmas longer than 3 chars (shorter -> "")
        return out if len(out) > 3 else ""
