"""Text analysis operators: token/character statistics, quality
scoring, n-gram-heuristic language ID, document fingerprinting.

All pure `pyspark.sql.functions` expressions — one narrow projection,
no shuffle, no Python in the hot path; at 100 TB these run at parquet
scan speed. Every function is deterministic and definable in ANSI SQL,
so each has an exact DuckDB oracle.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

# tiny per-language stopword seeds for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "pour", "que", "dans"],
    "es": ["el", "la", "los", "y", "es", "no", "una", "para", "que", "con"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "不", "这", "他"],
}


def _marker_pattern(words: list[str]) -> str:
    return r"\b(" + "|".join(words) + r")\b"


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Character/word/token statistics. `n_tokens_bpe_ish` counts
    maximal alnum runs plus isolated punctuation — a cheap proxy for a
    BPE pre-tokenizer's word-split pass."""
    t = F.col(text_col)
    return df.withColumns({
        "n_chars_calc": F.length(t),
        "n_words": F.size(F.split(F.trim(t), r"\s+")),
        "n_alpha": F.regexp_count(t, F.lit(r"[A-Za-z]")),
        "n_digit": F.regexp_count(t, F.lit(r"[0-9]")),
        "n_punct": F.regexp_count(t, F.lit(r"[.,;:!?]")),
        "n_tokens_bpe_ish": F.regexp_count(t, F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]")),
    })


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document quality in [0,1]: length band + alpha ratio +
    stopword presence − punctuation excess (the usual pretraining-corpus
    filters: length/punct/stopword ratios)."""
    t = F.col(text_col)
    n = F.length(t).cast("double")
    alpha_ratio = F.regexp_count(t, F.lit(r"[A-Za-z]")).cast("double") / F.greatest(n, F.lit(1.0))
    punct_ratio = F.regexp_count(t, F.lit(r"[.,;:!?]")).cast("double") / F.greatest(n, F.lit(1.0))
    stop_hits = F.regexp_count(F.lower(t), F.lit(_marker_pattern(LANG_MARKERS["en"]))).cast("double")
    words = F.size(F.split(F.trim(t), r"\s+")).cast("double")
    stop_ratio = stop_hits / F.greatest(words, F.lit(1.0))
    length_term = F.least(n / F.lit(500.0), F.lit(1.0))
    score = (F.lit(0.25) * length_term
             + F.lit(0.35) * F.least(alpha_ratio * F.lit(1.25), F.lit(1.0))
             + F.lit(0.25) * F.least(stop_ratio * F.lit(4.0), F.lit(1.0))
             + F.lit(0.15) * (F.lit(1.0) - F.least(punct_ratio * F.lit(5.0), F.lit(1.0))))
    return df.withColumn("quality", F.round(score, 6))


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-marker language ID: count per-language marker hits and
    take the argmax (ties → lexicographically first language, 'und' if
    nothing matches). One projection; no shuffle."""
    t = F.lower(F.col(text_col))
    langs = sorted(LANG_MARKERS)
    hits = {lang: F.regexp_count(t, F.lit(_marker_pattern(LANG_MARKERS[lang])))
            for lang in langs}
    # explicit priority CASE chain (first language in sorted order wins
    # ties) — trivially replicated as ANSI SQL for the oracle
    expr = F.lit("und")
    for lang in reversed(langs):
        cond = (hits[lang] > 0)
        for other in langs:
            if other != lang and (other < lang):
                cond = cond & (hits[lang] > hits[other])
            elif other != lang:
                cond = cond & (hits[lang] >= hits[other])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return df.withColumn("lang_pred", expr)


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Normalization-invariant document fingerprint: md5 over the
    lowercased text with all non-alphanumerics squeezed out. Identical
    semantics in any engine with md5 → exact oracle."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9]+", "")
    return df.withColumn("fingerprint", F.md5(norm))


def repetition_stats(df: DataFrame, text_col: str = "text",
                     top_ngrams: tuple = (2, 3, 4)) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021, "Scaling
    Language Models", §A1.1 repetition filters) as one narrow JVM-side
    projection — per-document array higher-order functions, zero
    shuffle, no Python in the row path:

    - ``dup_line_frac``      fraction of (trimmed, non-empty) lines that
                             repeat an earlier line
    - ``dup_line_char_frac`` fraction of line characters carried by those
                             repeat occurrences
    - ``dup_para_frac``  /   same two over blank-line-separated
      ``dup_para_char_frac`` paragraphs
    - ``top{n}gram_char_frac`` characters covered by the single most
                             frequent word n-gram, per requested n

    A document tripping several of these is boilerplate/spam with high
    probability; Gopher drops docs with dup_line_frac > 0.30,
    dup_para_frac > 0.30, top2gram > 0.20, top3gram > 0.18,
    top4gram > 0.16 — apply with a plain ``filter`` downstream.
    """
    t = F.col(text_col)

    def seg_metrics(arr, frac_name, char_name):
        # full-whitespace trim (F.trim strips ASCII space only, so CRLF
        # docs would treat 'abc\r' and 'abc' as distinct lines)
        arr = F.filter(
            F.transform(arr,
                        lambda s: F.regexp_replace(s, r"^\s+|\s+$", "")),
            lambda s: s != "")
        n = F.size(arr)
        nd = F.size(F.array_distinct(arr))
        chars = F.aggregate(arr, F.lit(0).cast("long"),
                            lambda acc, s: acc + F.length(s))
        dchars = F.aggregate(F.array_distinct(arr), F.lit(0).cast("long"),
                             lambda acc, s: acc + F.length(s))
        frac = F.when(n > 0, (n - nd).cast("double") / n).otherwise(0.0)
        cfrac = F.when(chars > 0, (chars - dchars).cast("double") / chars) \
                 .otherwise(0.0)
        return {frac_name: F.round(frac, 6), char_name: F.round(cfrac, 6)}

    cols = {}
    cols.update(seg_metrics(F.split(t, r"\n"),
                            "dup_line_frac", "dup_line_char_frac"))
    cols.update(seg_metrics(F.split(t, r"\n\s*\n"),
                            "dup_para_frac", "dup_para_char_frac"))

    # word n-grams: lowercase, strip non-alnum, whitespace-split
    words = F.filter(
        F.split(F.regexp_replace(F.lower(t), r"[^a-z0-9\s]+", " "), r"\s+"),
        lambda w: w != "")
    total_chars = F.aggregate(words, F.lit(0).cast("long"),
                              lambda acc, w: acc + F.length(w))
    for n in top_ngrams:
        grams = F.transform(
            F.sequence(F.lit(0), F.size(words) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(words, (i + k + 1).cast("int"))
                       for k in range(n)]))
        grams = F.when(F.size(words) >= n, grams) \
                 .otherwise(F.array().cast("array<string>"))
        # most frequent n-gram via one sorted single pass:
        # (prev, run, best_run, best_gram) accumulator over array_sort
        acc0 = F.struct(F.lit("").alias("prev"),
                        F.lit(0).cast("long").alias("run"),
                        F.lit(0).cast("long").alias("best"),
                        F.lit("").alias("bestg"))

        def step(acc, g):
            run = F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long"))
            better = run > acc["best"]
            return F.struct(
                g.alias("prev"), run.alias("run"),
                F.when(better, run).otherwise(acc["best"]).alias("best"),
                F.when(better, g).otherwise(acc["bestg"]).alias("bestg"))

        top = F.aggregate(F.array_sort(grams), acc0, step)
        # chars covered by the top n-gram = freq × chars-in-gram
        # (without the joining spaces, matching the word-char basis).
        # Occurrences overlap ('ha ha ha' has two 'ha ha' bigrams over
        # three words), so clamp to keep the documented [0,1] range.
        gram_chars = F.length(F.regexp_replace(top["bestg"], " ", ""))
        frac = F.when(total_chars > 0,
                      (top["best"] * gram_chars).cast("double") / total_chars) \
                .otherwise(0.0)
        cols[f"top{n}gram_char_frac"] = F.round(F.least(frac, F.lit(1.0)), 6)
    return df.withColumns(cols)


def normalize_text(df: DataFrame, text_col: str = "text",
                   out_col: str = "norm_text",
                   lowercase: bool = True) -> DataFrame:
    """Training-corpus text normalization, entirely JVM-side (one
    projection, zero shuffle, no Python in the row path): strip HTML
    tags, unescape the common entities, drop control characters,
    collapse whitespace runs, trim, and optionally lowercase. The
    passes are plain regex/literal replaces so any engine reproduces
    the output byte-for-byte (the gate hashes it against DuckDB)."""
    c = F.col(text_col)
    c = F.regexp_replace(c, r"<[^>]+>", " ")
    # && entities: &amp; is decoded LAST so "&amp;lt;" → "&lt;" (one
    # level of decoding, not recursive)
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&")):
        c = F.regexp_replace(c, re.escape(ent), ch)
    c = F.regexp_replace(c, r"[\x00-\x1f\x7f]", " ")
    c = F.trim(F.regexp_replace(c, r"\s+", " "))
    if lowercase:
        c = F.lower(c)
    return df.withColumn(out_col, c)


# PII patterns chosen for cross-dialect determinism (Java regex and
# RE2 agree on character classes, greedy quantifiers, \b and (?:) —
# no backreferences/lookaround). Applied in LIST ORDER: earlier
# replacements must not create or destroy later matches, so the more
# specific pattern comes first (email before ip, ssn before phone).
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("ip", r"\b(?:\d{1,3}\.){3}\d{1,3}\b"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"),
]


def redact_pii(df: DataFrame, text_col: str = "text",
               patterns: list[tuple[str, str]] | None = None) -> DataFrame:
    """Mask PII spans with `[CATEGORY]` tokens and count replacements.

    Adds `redacted` (the masked text) and one `n_<category>` count per
    pattern, counted on the text as it stood when that category was
    applied (so a span never double-counts across categories). Pure
    JVM `regexp_replace`/`regexp_count` — one narrow projection, no
    shuffle, no Python; runs at scan speed at any scale, and every
    pattern is RE2-compatible so results are engine-portable.

    `patterns` replaces the default `PII_PATTERNS` list; order is
    semantic (see module comment).
    """
    pats = PII_PATTERNS if patterns is None else patterns
    out = df
    cur = F.col(text_col)
    for cat, pat in pats:
        out = out.withColumn(f"n_{cat}", F.regexp_count(cur, F.lit(pat)))
        cur = F.regexp_replace(cur, pat, f"[{cat.upper()}]")
    return out.withColumn("redacted", cur)
