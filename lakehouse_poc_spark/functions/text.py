"""Text-analysis expressions: tokenization, shingling, quality scoring,
language-ID heuristic, fingerprinting.

All pure JVM column expressions (no Python UDFs) — at 100 TB these run
inside whole-stage codegen on the scan, shuffling nothing. Each has an
exactly-equivalent ANSI-SQL form used by the oracle (see
plans/textops.py) — which is why the implementations stick to
portable primitives (split/regexp/length/md5, left-fold aggregates).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Marker words per language for the n-gram-style language-ID heuristic.
# Counting uses the replace-length trick so Spark and SQL engines agree
# exactly (regex engines differ; plain substring replace does not).
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "es": [" el ", " los ", " de "],
    "fr": [" le ", " les ", " des "],
    "zh": [" zh ", " zhong ", " wen "],
}

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (the portable baseline tokenizer)."""
    return F.split(F.col(col) if isinstance(col, str) else col, r"\s+")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("bigint")


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as space-joined strings (dedup unit for
    MinHash / Jaccard). Empty when the doc has fewer than ``n`` words.

    Built as a zip_with fold over n shifted slices of the token array.
    Shape matters: higher-order-function lambdas are interpreted
    (CodegenFallback), so an outer expression referenced INSIDE a
    lambda is re-evaluated per array element — an element_at(tokens,…)
    formulation re-tokenizes the whole document for every shingle
    (O(words²) per doc). Here the token array appears only as lambda
    *children*, each evaluated once per row.
    """
    return shingles_from_tokens(tokens(col), n)


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Shingles over a CALLER-SUPPLIED token array — use when the
    token sequence must be pre-filtered (e.g. empty edge tokens from
    whitespace-edged text) so gram positions and token positions
    index the same sequence."""
    sz = F.size(toks)
    shingles = F.slice(toks, 1, sz)
    for j in range(1, n):
        # zip pads the shorter (shifted) side with null; concat_ws
        # skips nulls, so tail entries hold partial shingles — sliced
        # off below.
        shingles = F.zip_with(
            shingles,
            F.slice(toks, j + 1, sz),
            lambda acc, x: F.concat_ws(" ", acc, x),
        )
    return F.slice(shingles, 1, F.greatest(sz - (n - 1), F.lit(0)))


def substring_count(col: Column | str, needle: str) -> Column:
    """Occurrences of ``needle`` via the replace-length trick —
    deterministic and identical across engines."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        (F.length(c) - F.length(F.replace(c, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("bigint")


def punct_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(F.regexp_replace(c, r"[^.,!?;:]", "")).cast("bigint")


def stopword_count(col: Column | str) -> Column:
    return F.size(
        F.filter(tokens(col), lambda x: x.isin(*STOPWORDS))
    ).cast("bigint")


def avg_word_len(col: Column | str) -> Column:
    """Mean token length via a left-fold (exact integer sum → double)."""
    toks = tokens(col)
    total = F.aggregate(
        F.transform(toks, lambda x: F.length(x).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return total.cast("double") / F.size(toks)


def quality_score(col: Column | str) -> Column:
    """Deterministic quality heuristic in [0, ~1]: rewards length (log
    saturation via thresholds), penalizes punctuation density, rewards
    stopword presence (fluency proxy). Arithmetic only — portable."""
    c = F.col(col) if isinstance(col, str) else col
    n_tok = token_count(c).cast("double")
    length_term = F.least(n_tok / F.lit(200.0), F.lit(1.0))
    punct_ratio = punct_count(c).cast("double") / F.greatest(F.length(c), F.lit(1)).cast("double")
    stop_ratio = stopword_count(c).cast("double") / F.greatest(n_tok, F.lit(1.0))
    return (
        F.lit(0.5) * length_term
        + F.lit(0.3) * F.least(stop_ratio * 3, F.lit(1.0))
        + F.lit(0.2) * (F.lit(1.0) - F.least(punct_ratio * 10, F.lit(1.0)))
    )


def lang_scores(col: Column | str) -> dict[str, Column]:
    c = F.col(col) if isinstance(col, str) else col
    padded = F.concat(F.lit(" "), c, F.lit(" "))
    out: dict[str, Column] = {}
    for lang, markers in LANG_MARKERS.items():
        s = substring_count(padded, markers[0])
        for m in markers[1:]:
            s = s + substring_count(padded, m)
        out[lang] = s
    return out


def lang_id(col: Column | str) -> Column:
    """Argmax over marker-word counts as a CASE cascade: a language wins
    when its score is >= every later language's score — ties go to the
    earlier language in LANG_MARKERS order. Mirrors the SQL CASE chain
    in the oracle exactly."""
    scores = lang_scores(col)
    order = list(LANG_MARKERS)
    expr: Column = F.lit(order[-1])
    # build from the back: fr >= zh → fr; else zh ... up to en.
    for i in range(len(order) - 2, -1, -1):
        lang = order[i]
        cond = None
        for other in order[i + 1 :]:
            c = scores[lang] >= scores[other]
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


# BPE-ish pretokenizer: letter runs, digit runs, single punctuation —
# the class-based pattern behaves identically in Java regex and RE2.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_count(col: Column | str) -> Column:
    """Token count under a BPE-style pretokenization (the usual
    letters/digits/punctuation split that byte-pair vocabularies are
    trained over) — a closer LLM-cost proxy than whitespace tokens."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_RE), F.lit(0))).cast("bigint")


def char_codes(col: Column | str) -> Column:
    """Per-character code points as array<long> (ASCII range in the
    fixtures). split('') is the transform's CHILD, so it evaluates once
    per row — see word_shingles on why that placement matters."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(F.split(c, ""), lambda ch: F.ascii(ch).cast("long"))


def rolling_hash(col: Column | str, base: int = 131, mod: int = (1 << 31) - 1) -> Column:
    """Polynomial (Rabin-Karp) rolling hash over the characters:
    ``h := (h*base + code) mod m``. Intermediates stay < 2^39 — no
    overflow. A left-fold, so any engine folding the same sequence
    produces the identical value (DuckDB's list_reduce seeds with the
    first element; that equals this fold's first step since
    ``(0*base + c1) mod m = c1``)."""
    return F.aggregate(
        char_codes(col),
        F.lit(0).cast("long"),
        lambda acc, c: F.pmod(acc * base + c, F.lit(mod)),
    )


def fingerprint_md5(col: Column | str) -> Column:
    """Content fingerprint: md5 of whitespace-normalized lowercase text.
    Portable across engines (identical hex)."""
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    return F.md5(normalized.cast("binary"))
