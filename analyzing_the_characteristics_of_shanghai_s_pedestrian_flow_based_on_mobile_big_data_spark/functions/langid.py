"""Heuristic language identification — stopword-profile scoring.

Pure Catalyst: score each candidate language by the fraction of tokens
hitting its stopword profile; predict the argmax with a deterministic
lexicographic tie-break. At 100 TB this is a single narrow projection —
no shuffle, no python.

(The synthetic testdata's `lang` labels all share one vocabulary, so
the demo prediction collapses to the tie-break — the operator is the
capability; see tests for separable fixtures.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "of", "to", "and", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "ich"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "que", "pour", "dans"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "que", "por", "para"],
}


def lang_scores(toks: Column) -> dict[str, Column]:
    """Per-language stopword-hit fraction."""
    n = F.size(toks)
    out = {}
    for lang, words in LANG_PROFILES.items():
        hits = F.size(F.filter(toks, lambda t: t.isin(*words)))
        out[lang] = F.when(n > 0, hits / n).otherwise(F.lit(0.0))
    return out


def predict_lang(toks: Column) -> Column:
    """argmax over profiles; ties (incl. all-zero) break to the
    lexicographically smallest language code."""
    scores = lang_scores(toks)
    pred = None
    for lang in sorted(LANG_PROFILES):  # lexicographic scan ⇒ ties keep first
        s = scores[lang]
        if pred is None:
            pred, best = F.lit(lang), s
        else:
            cond = s > best
            pred = F.when(cond, F.lit(lang)).otherwise(pred)
            best = F.when(cond, s).otherwise(best)
    return pred
