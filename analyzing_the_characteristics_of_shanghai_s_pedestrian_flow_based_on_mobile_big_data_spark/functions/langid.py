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


def _packed_hits(toks: Column) -> Column:
    """All four languages' stopword-hit counts in ONE fold: each token
    does a single map lookup whose value adds 1 into that language's
    32-bit lane, two lanes per long, accumulated in a struct of two
    longs (a token shared by two profiles adds into both lanes). One
    interpreted-lambda pass instead of |languages| filter scans with
    10-way isin per token — measured 4× on the curation pipeline;
    counts (and thus scores and argmax) are bit-identical to the
    per-language formulation. 32-bit lanes cannot carry: a Spark array
    holds < 2^31 elements, so no per-language count can reach 2^32
    (the 16-bit-lane formulation overflowed at 65,536 hits — a ~300k
    token document)."""
    lanes = {lang: i for i, lang in enumerate(sorted(LANG_PROFILES))}
    n_words = (len(LANG_PROFILES) + 1) // 2
    adds: list[dict[str, int]] = [{} for _ in range(n_words)]
    for lang, words in LANG_PROFILES.items():
        word_i, shift = divmod(lanes[lang], 2)
        for w in words:
            adds[word_i][w] = adds[word_i].get(w, 0) + (1 << (32 * shift))
    pairs: list[Column] = []
    for w in sorted(set().union(*adds)):
        pairs += [
            F.lit(w),
            F.array(*[F.lit(a.get(w, 0)).cast("long") for a in adds]),
        ]
    m = F.create_map(*pairs)
    zero = F.struct(
        *[F.lit(0).cast("long").alias(f"p{i}") for i in range(n_words)]
    )

    def _step(acc: Column, t: Column) -> Column:
        v = F.element_at(m, t)
        return F.struct(
            *[
                (
                    acc[f"p{i}"]
                    + F.coalesce(
                        F.element_at(v, i + 1), F.lit(0).cast("long")
                    )
                ).alias(f"p{i}")
                for i in range(n_words)
            ]
        )

    return F.aggregate(toks, zero, _step)


def _lane(packed: Column, lane_idx: int) -> Column:
    """Extract one language's 32-bit count from the packed struct."""
    word_i, shift = divmod(lane_idx, 2)
    return F.shiftright(packed[f"p{word_i}"], 32 * shift).bitwiseAND(
        F.lit(0xFFFFFFFF)
    )


def lang_scores(toks: Column) -> dict[str, Column]:
    """Per-language stopword-hit fraction (token multiplicity counts)."""
    n = F.size(toks)
    packed = _packed_hits(toks)
    lanes = {lang: i for i, lang in enumerate(sorted(LANG_PROFILES))}
    out = {}
    for lang in LANG_PROFILES:
        hits = _lane(packed, lanes[lang])
        out[lang] = F.when(n > 0, hits / n).otherwise(F.lit(0.0))
    return out


def predict_lang(toks: Column) -> Column:
    """argmax over profiles; ties (incl. all-zero) break to the
    lexicographically smallest language code.

    Argmaxes the RAW lane counts (same denominator ⇒ same argmax as
    the fractions), and binds the packed counter once via a
    single-element transform lambda so the fold is evaluated exactly
    once per row, not once per language."""
    langs = sorted(LANG_PROFILES)  # lexicographic scan ⇒ ties keep first

    def _argmax(p: Column) -> Column:
        pred, best = F.lit(langs[0]), _lane(p, 0)
        for i, lang in enumerate(langs[1:], start=1):
            h = _lane(p, i)
            cond = h > best
            pred = F.when(cond, F.lit(lang)).otherwise(pred)
            best = F.when(cond, h).otherwise(best)
        return pred

    return F.element_at(F.transform(F.array(_packed_hits(toks)), _argmax), 1)


# Char-ngram classifier (round 14, VERDICT r13 #6) -----------------------
#
# The stopword lanes above discriminate 4 languages; production
# pipelines need ~20+. This is the native scale-up: per-language
# profiles of DISTINCTIVE CHARACTER TRIGRAMS (the Cavnar-Trenkle
# n-gram idea at fixed width), scored by EXACT substring counting:
# each language's score is Σ over its profile trigrams of the
# replace()-length-diff occurrence mass — plain string-function
# arithmetic, so the ENTIRE 20-language prediction is HOF-free
# whole-stage codegen: one narrow map-side projection, no join, no
# shuffle, no Python, integer values the DuckDB twin reproduces
# exactly with the same replace() arithmetic.
#
# Implementation notes (two rejected designs, both measured):
# - hashed bucket→lane-array tables (8192 buckets × 10 packed-lane
#   arrays) drowned in PLAN costs before execution started —
#   F.lit(list) expands to an 8192-child array(...) call that
#   ResolveLambdaVariables re-copies at every lambda level of every
#   analyzer pass (minutes of analysis), and even the true-Literal
#   ndarray path pays ~1.4 s of py4j transfer PER ARRAY at plan build;
# - per-trigram filter scans over a delimiter-joined profile string
#   ran ~1 µs of interpreted-lambda eval per (trigram × language) —
#   10M evals, 10.4 s at sf0.1 — where the replace() form is 20 codegen
#   string scans per language per doc.
#
# Profiles are hand-curated public linguistic knowledge (common
# function-word and morphology trigrams; boundary spaces matter:
# "ão " ends Portuguese words, "sch" is German/Dutch). Shared
# trigrams count for every language that lists them — the argmax
# resolves. All profile strings are lowercase; score lowercased text.

CHAR_PROFILES: dict[str, list[str]] = {
    "en": [" th", "the", "he ", "ing", "ng ", " of", "of ", "and",
           "nd ", " is", "is ", "ed ", "ion", " wi", "ith", " ha",
           "ave", " yo", "you", "ere"],
    "de": ["der", "die", "und", "ich", "sch", "ein", "cht", "ung",
           "gen", "ver", "ber", " zu", "eit", "den", "ten", "nen",
           "hen", " wi", "ier", "auf"],
    "fr": [" le", "le ", "les", " de", "de ", "des", "ent", "que",
           "ue ", "ons", "ait", "eur", "oir", "ais", " un", "une",
           "dan", "ans", "our", "est"],
    "es": ["el ", " la", "la ", "los", "ión", "ón ", "que", "ado",
           " de", "de ", "os ", "as ", "ien", "nte", "con", "ara",
           "por", "una", " es", "sta"],
    "pt": ["ção", "ão ", " de", "de ", "os ", "da ", "do ", "um ",
           "em ", "res", "nho", "ara", "uma", "com", "est", "men",
           "eir", "ais", "ões", "não"],
    "it": ["il ", " di", "di ", "che", "to ", " la", "la ", "zio",
           "one", "gli", "ett", "lla", "del", "ndo", "per", "ere",
           "ion", "ita", "ano", "non"],
    "nl": ["de ", "het", "een", "ijk", "sch", "van", "aar", "oor",
           "ij ", "en ", "ver", "gen", "cht", "wor", "dat", "iet",
           "nie", "ing", "eli", "aan"],
    "sv": ["och", "att", "det", "är ", "för", "ing", "en ", "ska",
           "som", "ill", "ull", "den", "ar ", "lig", "nde", "kan",
           "int", "ans", "man", "har"],
    "da": ["og ", "det", "der", "ikk", "ede", "af ", "den", "til",
           "med", "for", "kke", "ger", "nge", "nde", "han", "var",
           "gså", "hed", "øje", "hav"],
    "no": ["og ", "det", "ikk", "en ", "ere", "kke", "til", "som",
           "med", "for", "ter", "ble", "har", "rge", "ing", "jeg",
           "vær", "nor", "års", "sla"],
    "fi": ["en ", "in ", "ssa", "ssä", "lla", "llä", "sta", "ään",
           "nen", "kin", "itt", "ist", "ais", "tta", "ttä", "aan",
           "een", "ksi", "uks", "yks"],
    "hu": ["egy", "nek", "ben", "tek", "ság", "ész", "gya", "meg",
           "hog", "ogy", "nak", "ele", "ett", "sze", "val", "tás",
           "ató", "köz", "fel", "áll"],
    "pl": ["nie", "prz", "rze", "ych", "ego", "owa", "ski", "cza",
           "szc", "ści", "ość", "wie", "dzi", "ała", "pod", "jes",
           "est", "ać ", "ię ", "się"],
    "cs": ["pře", "ení", "ost", "ách", "ova", "ick", "sou", "pro",
           "kte", "erý", "byl", "ník", "ské", "ých", "ají", "tví",
           "stv", "nos", "čes", "řed"],
    "ro": ["ul ", "are", "și ", "în ", "lor", "ați", "eșt", "ate",
           "ică", "ilo", "pre", "con", "tat", "rea", "ntr", "est",
           "ună", "fos", "ost", "tre"],
    "tr": ["lar", "ler", "bir", "da ", "de ", "yor", "mak", "tır",
           "ını", "arı", "eri", "nda", "nde", "ile", "lık", "ır ",
           "an ", "en ", "iyo", "dır"],
    "id": ["ang", "yan", "kan", "ber", "men", "nya", "ada", "ter",
           "per", "an ", "ah ", "ini", "itu", "dan", "ara", "eng",
           "ata", "unt", "ntu", "lah"],
    "vi": ["ng ", "nh ", "ông", "ười", "iệt", "ược", "của", "và ",
           "ột ", "một", "các", "ành", "đượ", "ợc ", "ại ", "ệt ",
           "ay ", "ân ", "ữn ", "việ"],
    "sw": ["wa ", "ya ", "kwa", "ni ", "ana", "ili", "amb", "cha",
           "ake", "ish", "kat", "ika", "za ", "la ", "na ", "tu ",
           "wat", "atu", "uwa", "tak"],
    "ca": ["el ", " la", "la ", "amb", "que", "ent", "del", "aci",
           "tat", "els", "és ", "les", "ció", "ts ", "per", "en ",
           "est", "ant", "aqu", "com"],
}

def char_trigrams(text: Column) -> Column:
    """Array of character trigram STRINGS over the lowercased text —
    empty below 3 chars. Body-safe construction (chars split once,
    zip_with over shifted slices — never substring(text, i) in a HOF
    body, the charlm O(len²) trap). Diagnostic/test helper; the
    classifier itself never materializes trigram arrays (see
    :func:`lang_score_ngram`)."""
    chars = F.split(F.lower(text), "")
    n = F.size(chars)
    length = n - 2
    c1 = F.slice(chars, 1, length)
    c2 = F.slice(chars, 2, length)
    c3 = F.slice(chars, 3, length)
    t12 = F.zip_with(c1, c2, lambda a, b: F.concat(a, b))
    return F.when(
        n >= 3, F.zip_with(t12, c3, lambda a, b: F.concat(a, b))
    ).otherwise(F.array().cast("array<string>"))


def lang_score_ngram(s: Column, lang: str) -> Column:
    """One language's profile score over a LOWERCASED text column:
    Σ over profile trigrams of (length(s) − length(replace(s, tri))) —
    i.e. 3 × the total NON-OVERLAPPING occurrence count. Pure
    string-function arithmetic, no HOF anywhere: the whole score sits
    inside whole-stage codegen (the per-trigram filter formulation
    paid ~1 µs of interpreted-lambda eval per (trigram × language) —
    10M evals at sf0.1 — where this is 20 replace() scans of a short
    string per language per doc; measured 10.4 s → sub-second).
    NON-OVERLAPPING occurrence counting is the DEFINING semantics of
    this score, not an approximation of a sliding-window count: for
    bordered trigrams like "ere"/"ana" (which several profiles do
    contain — "ere" in en, "ana" in sw) the two counts differ on
    inputs like "erere", and this operator is specified as the
    replace() arithmetic (ADVICE r14: the earlier docstring wrongly
    claimed such trigrams were absent). The DuckDB twin is the same
    replace() arithmetic, so values are integer-exact either way."""
    return profile_score(s, CHAR_PROFILES[lang])


def profile_score(s: Column, trigrams: list[str]) -> Column:
    """Occurrence mass of one trigram profile over a lowercased text
    column — the engine under :func:`lang_score_ngram`, factored out
    so the Cyrillic/Arabic profile families (round 15) share the exact
    same arithmetic (and thus the same DuckDB twin shape)."""
    terms = [
        F.length(s) - F.length(F.replace(s, F.lit(t), F.lit("")))
        for t in sorted(set(trigrams))
    ]
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    return total


def profile_argmax(s: Column, profiles: dict[str, list[str]]) -> Column:
    """argmax language over a profile family; ties (incl. all-zero)
    break to the lexicographically smallest code via one array_min
    over (−score, lang) structs — HOF-free codegen (the
    predict_lang_ngram mechanism, generalized)."""
    cands = F.array(
        *[
            F.struct(
                (-profile_score(s, profiles[lang])).cast("long").alias("nh"),
                F.lit(lang).alias("l"),
            )
            for lang in sorted(profiles)
        ]
    )
    return F.array_min(cands).getField("l")


def lang_scores_ngram(s: Column) -> dict[str, Column]:
    """Per-language occurrence-mass fraction (score / text length) over
    a lowercased text column — the diagnostic companion of
    :func:`predict_lang_ngram` (same argmax, normalized)."""
    n = F.length(s)
    return {
        lang: F.when(n > 0, lang_score_ngram(s, lang) / n).otherwise(
            F.lit(0.0)
        )
        for lang in CHAR_PROFILES
    }


def predict_lang_ngram(text: Column) -> Column:
    """argmax language over the 20 char-trigram profiles; ties (incl.
    empty/NULL documents, which score 0 everywhere) break to the
    lexicographically smallest code via one array_min over
    (−score, lang) structs — each language's score appears exactly
    once, and the entire prediction is HOF-free codegen. Relies on
    codegen subexpression elimination for the shared lowered text
    (each replace() references the same lower(coalesce(text, ''))
    subtree)."""
    s = F.lower(F.coalesce(text, F.lit("")))
    return profile_argmax(s, CHAR_PROFILES)


# Multi-script language ID (round 15, VERDICT r14 #1) --------------------
#
# All 20 CHAR_PROFILES above are Latin-script, so before this section a
# CJK/Cyrillic/Arabic/Devanagari document — most of the non-English
# web — scored ~0 on every profile and argmax-tied to "ca". The
# replace()-mass mechanism is script-agnostic; what was missing is a
# ROUTER and non-Latin profiles:
#
# 1. Count characters per Unicode script block with
#    length(s) − length(regexp_replace(s, '[block]', '')) — one
#    compiled-regex scan per script, still whole-stage codegen, and
#    bit-exact in DuckDB (both engines count code points and both
#    regex dialects accept \x{....} classes over the BMP — probed
#    this round on Thai combining marks, Devanagari matras, Hangul
#    syllables before adoption).
# 2. Route: if the best non-Latin script count exceeds the [a-z]
#    count, the script decides — single-language scripts map directly
#    (hangul→ko, devanagari→hi, thai→th, greek→el, hebrew→he, any
#    kana→ja, kana-free han→zh); multi-language scripts fall to a
#    trigram-profile argmax within the family (Cyrillic ru/uk/bg,
#    Arabic-script ar/fa — Persian is separable for free because its
#    ی U+06CC / ک U+06A9 / گ U+06AF differ from Arabic's ي U+064A /
#    ك U+0643 at the codepoint level). Otherwise the 20-language
#    Latin path above decides.
#
# BMP ranges only (no supplementary planes): Java regex works over
# UTF-16 and a surrogate-pair range inside a class would diverge from
# RE2's codepoint semantics; CJK Extension B+ is the only casualty and
# real zh/ja text is overwhelmingly in the unified block + Ext A.

SCRIPT_CLASSES: dict[str, str] = {
    "arabic": "[\\x{0600}-\\x{06FF}]",
    "cyrillic": "[\\x{0400}-\\x{04FF}]",
    "devanagari": "[\\x{0900}-\\x{097F}]",
    "greek": "[\\x{0370}-\\x{03FF}]",
    "han": "[\\x{3400}-\\x{4DBF}\\x{4E00}-\\x{9FFF}]",
    "hangul": "[\\x{AC00}-\\x{D7AF}]",
    "hebrew": "[\\x{0590}-\\x{05FF}]",
    "kana": "[\\x{3040}-\\x{30FF}]",
    "latin": "[a-z]",
    "thai": "[\\x{0E00}-\\x{0E7F}]",
}

# Hand-curated public linguistic knowledge, like CHAR_PROFILES: common
# function-word / morphology trigrams, boundary spaces meaningful.
# Within-family discrimination leans on alphabet differences — "ы"/"э"
# are Russian-only, "і"/"ї"/"є" Ukrainian-only, "ъ" productive only in
# Bulgarian; Persian ی/ک/گ vs Arabic ي/ك (distinct codepoints).
CYRILLIC_PROFILES: dict[str, list[str]] = {
    "ru": ["ого", "его", "ени", "ост", "ств", "что", "ать", "тся",
           "ние", "это", "ый ", "ых ", "ет ", "при", "ной", "ами",
           "ему", "ает", "ько", "ишь"],
    "uk": ["ння", "ськ", "від", "ть ", "ій ", "ої ", "ів ", "що ",
           "аїн", "ють", "ися", "ної", "ні ", "ати", "ує ", "єть",
           "ься", "іст", "ідн", "ків"],
    "bg": ["ът ", "ите", "ата", "ото", "да ", "се ", "ва ", "ски",
           "ият", "ърх", "ъде", "ъщо", "ува", "ено", "ани", "та ",
           "то ", "ето", "ред", "ало"],
}

ARABIC_PROFILES: dict[str, list[str]] = {
    "ar": [" ال", "الم", "الت", "الع", "ين ", "ان ", "ات ", "من ",
           " في", "في ", "لى ", "ها ", "ون ", "ية ", "ما ", "لا ",
           "عن ", "الق", "ذلك", "هذا"],
    "fa": ["می ", " می", "که ", " که", "ای ", "ها ", "است", "در ",
           " در", "ده ", "ند ", "ود ", "ان ", "ران", "گی ", "پیش",
           "چه ", "خود", "شود", "ید "],
}

#: every language the combined classifier can emit
ALL_LANGS: list[str] = sorted(
    set(CHAR_PROFILES)
    | set(CYRILLIC_PROFILES)
    | set(ARABIC_PROFILES)
    | {"ja", "zh", "ko", "hi", "th", "el", "he"}
)


def script_count(s: Column, script: str) -> Column:
    """Code-point count of one script block over a lowercased text
    column: length(s) − length(regexp_replace(s, class, '')). One
    compiled-regex scan, codegen; DuckDB twin is the same arithmetic
    with the 'g' flag (probed bit-equal on combining-mark scripts)."""
    return F.length(s) - F.length(
        F.regexp_replace(s, SCRIPT_CLASSES[script], "")
    )


def predict_lang_script(text: Column) -> Column:
    """Combined multi-script argmax language over 32 languages.

    Routing: the dominant NON-LATIN script (argmax count, lexicographic
    script-name tie-break via array_min) decides iff its count strictly
    exceeds the [a-z] count; otherwise (including empty/NULL text) the
    20-language Latin trigram path decides — so a Latin document
    quoting a stray Cyrillic word still routes Latin. Kana-dominant
    text is ja; han-dominant text with ANY kana present is also ja
    (Japanese prose always carries kana; Chinese never does), han
    without kana is zh. Everything is scalar CASE over codegen
    string arithmetic: no HOF in the hot path beyond the two bounded
    array_min argmaxes, no join, no shuffle, no Python.

    GENERATED-CODE SIZE (measured this round): the naive single
    expression duplicates the 9-regex script argmax across all CASE
    branches (CaseWhen branches get no subexpression elimination) and
    blows janino's 64 KB per-method limit — Spark then silently falls
    back to interpreted eval. This function binds every heavy subtree
    exactly once via a transform-over-1-element-array lambda (the
    predict_lang packed-counter idiom at :func:`predict_lang`);
    multi-column callers (lang_id_script) should instead stage
    :func:`script_profile_cols` into their own projection and assemble
    with :func:`assemble_script_pred`, which also lets the Latin
    argmax column be shared with a pred_latin_only output."""
    s = F.lower(F.coalesce(text, F.lit("")))
    cols = script_profile_cols(text)
    inner = F.struct(
        cols["sb"].alias("sb"),
        cols["cyr"].alias("cyr"),
        cols["arb"].alias("arb"),
        profile_argmax(s, CHAR_PROFILES).alias("lat"),
    )
    return F.element_at(
        F.transform(
            F.array(inner),
            lambda x: assemble_script_pred(
                x.getField("sb"),
                x.getField("cyr"),
                x.getField("arb"),
                x.getField("lat"),
            ),
        ),
        1,
    )


def script_profile_cols(text: Column) -> dict[str, Column]:
    """The stageable intermediates of the multi-script classifier:

    - ``sb``: struct(nh, scr, kana, latin) — negated count and name of
      the dominant non-Latin script (array_min tie-break), plus the
      kana and [a-z] counts the routing CASE needs;
    - ``cyr`` / ``arb``: the within-family trigram argmaxes.

    Callers put these in their OWN projection and feed
    :func:`assemble_script_pred` from the resulting columns — ``sb``
    is referenced many times downstream, so CollapseProject keeps the
    projection split and the 9-regex argmax is evaluated (and
    codegen'd) once instead of once per CASE branch."""
    s = F.lower(F.coalesce(text, F.lit("")))
    nonlatin = sorted(k for k in SCRIPT_CLASSES if k != "latin")
    counts = {k: script_count(s, k) for k in SCRIPT_CLASSES}
    best = F.array_min(
        F.array(
            *[
                F.struct(
                    (-counts[k]).cast("long").alias("nh"),
                    F.lit(k).alias("scr"),
                )
                for k in nonlatin
            ]
        )
    )
    sb = F.struct(
        best.getField("nh").alias("nh"),
        best.getField("scr").alias("scr"),
        counts["kana"].cast("long").alias("kana"),
        counts["latin"].cast("long").alias("latin"),
    )
    return {
        "sb": sb,
        "cyr": profile_argmax(s, CYRILLIC_PROFILES),
        "arb": profile_argmax(s, ARABIC_PROFILES),
    }


def assemble_script_pred(
    sb: Column, cyr: Column, arb: Column, latin_fallback: Column
) -> Column:
    """Routing CASE over the staged intermediates of
    :func:`script_profile_cols` — all inputs are (fields of) plain
    columns, so this expression is tiny and codegen-safe anywhere."""
    scr = sb.getField("scr")
    script_pred = (
        F.when(scr == "kana", F.lit("ja"))
        .when(
            scr == "han",
            F.when(sb.getField("kana") > 0, F.lit("ja")).otherwise(
                F.lit("zh")
            ),
        )
        .when(scr == "hangul", F.lit("ko"))
        .when(scr == "devanagari", F.lit("hi"))
        .when(scr == "thai", F.lit("th"))
        .when(scr == "greek", F.lit("el"))
        .when(scr == "hebrew", F.lit("he"))
        .when(scr == "cyrillic", cyr)
        .otherwise(arb)
    )
    return F.when(
        -sb.getField("nh") > sb.getField("latin"), script_pred
    ).otherwise(latin_fallback)


# Construction-memoized canonical builders (round 15) --------------------
#
# Building the classifier Columns is itself expensive: the 20-profile
# Latin argmax alone is ~4,000 py4j round-trips (~5 s measured warm),
# re-paid by every query construction — which the bench does on every
# timed pass. The trees are pure functions of literals and a column
# NAME, so the canonical by-name forms are built once per JVM and
# shared (functions/exprmemo.py — gateway-guarded, expressions only,
# never data). Callers with a differently-named or computed input
# column keep using the uncached builders above.


def predict_lang_ngram_cached(name: str = "text") -> Column:
    """:func:`predict_lang_ngram` over ``F.col(name)``, built once per
    JVM."""
    from .exprmemo import memoized_expr

    return memoized_expr(
        ("langid", "pred_ngram", name),
        lambda: predict_lang_ngram(F.col(name)),
    )


def script_profile_cols_cached(name: str = "text") -> dict[str, Column]:
    """:func:`script_profile_cols` over ``F.col(name)``, built once per
    JVM (the dict and its Columns are immutable — share freely)."""
    from .exprmemo import memoized_expr

    return memoized_expr(
        ("langid", "script_cols", name),
        lambda: script_profile_cols(F.col(name)),
    )


def predict_lang_tokens_cached(name: str = "text") -> Column:
    """:func:`predict_lang` over ``tokens(F.col(name))`` — the legacy
    stopword path's canonical form, built once per JVM."""
    from .exprmemo import memoized_expr

    def _build() -> Column:
        from .text import tokens

        return predict_lang(tokens(F.col(name)))

    return memoized_expr(("langid", "pred_stopword", name), _build)
