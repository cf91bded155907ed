"""Text-analysis operators for training-data pipelines: token stats,
quality scoring, language ID, document fingerprinting.

All hot paths are JVM built-ins (split/regexp/aggregate/transform);
language-ID keeps its per-language scores as columns so the decision is
a deterministic ``greatest``-chain, reproducible in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# tiny per-language marker lexicons (public common stopwords)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "une", "dans", "que", "pour"],
    "es": ["el", "la", "de", "que", "y", "los", "en", "un", "por", "con"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2", "you3", "wo3", "ta1", "zhe4", "bu4"],
}

EN_STOPWORDS = LANG_MARKERS["en"]


# GPT-2-style pretokenizer, lookahead-free so the SAME pattern runs in
# Spark (java.util.regex) and DuckDB (RE2): contraction suffixes, then
# space-prefixed letter runs, digit runs, punctuation runs, whitespace.
BPE_TOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def token_stats(docs: DataFrame) -> DataFrame:
    """Whitespace token count, BPE-ish pretoken count (GPT-2-style
    regex — the standard LLM-data proxy for tokenizer cost), char count,
    mean token length."""
    toks = F.split(F.trim(F.col("text")), "\\s+")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_TOKEN_RE), 0)).alias(
            "n_bpe_tokens"
        ),
        F.length("text").alias("n_chars_actual"),
        (
            F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
            / F.greatest(F.size(toks), F.lit(1))
        ).cast("double").alias("mean_token_len"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic quality features + a composite score, all column math.

    Features follow the public C4/Gopher-style text-quality rules:
    alphabetic ratio, digit ratio, stopword ratio, mean word length.
    """
    toks = F.split(F.trim(F.col("text")), "\\s+")
    n_tok = F.greatest(F.size(toks), F.lit(1))
    alpha_ratio = (
        F.length(F.regexp_replace("text", "[^a-zA-Z]", "")) / F.greatest(F.length("text"), F.lit(1))
    )
    digit_ratio = (
        F.length(F.regexp_replace("text", "[^0-9]", "")) / F.greatest(F.length("text"), F.lit(1))
    )
    stop_arr = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    stop_ratio = (
        F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, F.lower(t)))) / n_tok
    )
    mean_wl = F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)) / n_tok
    score = (
        F.lit(0.4) * alpha_ratio
        + F.lit(0.3) * stop_ratio
        + F.lit(0.3) * (F.lit(1.0) - F.least(F.abs(mean_wl - 5.0) / 5.0, F.lit(1.0)))
        - F.lit(0.5) * digit_ratio
    )
    return docs.select(
        "doc_id",
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(digit_ratio, 6).alias("digit_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(mean_wl.cast("double"), 6).alias("mean_word_len"),
        F.round(score, 6).alias("quality"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-word language scores + argmax prediction (deterministic).

    Per language: fraction of tokens that are that language's marker
    words.  Prediction = language with the highest score, ties broken
    by language code order — expressible in ANSI SQL for the oracle.
    """
    toks = F.split(F.lower(F.trim(F.col("text"))), "\\s+")
    n_tok = F.greatest(F.size(toks), F.lit(1))
    cols = [F.col("doc_id")]
    score_cols = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        arr = F.array(*[F.lit(w) for w in markers])
        sc = (F.size(F.filter(toks, lambda t: F.array_contains(arr, t))) / n_tok).cast(
            "double"
        )
        cols.append(F.round(sc, 6).alias(f"score_{lang}"))
        score_cols.append((lang, f"score_{lang}"))
    out = docs.select(*cols)
    # argmax with deterministic tie-break on language order
    pred = F.lit(None).cast("string")
    best = F.lit(-1.0)
    for lang, c in score_cols:
        cond = F.col(c) > best
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
        best = F.when(cond, F.col(c)).otherwise(best)
    return out.withColumn("pred_lang", pred)


def doc_fingerprint(docs: DataFrame, k: int = 16) -> DataFrame:
    """Winnowing-style fingerprint: min/max md5 over char k-grams.

    (Schleimer, Wilkerson & Aiken 2003 local fingerprinting, reduced to
    the min-hash selection — deterministic and SQL-reproducible.)
    """
    idx = F.sequence(F.lit(1), F.greatest(F.length("text") - (k - 1), F.lit(1)))
    grams = F.transform(idx, lambda i: F.md5(F.col("text").substr(i, F.lit(k))))
    return docs.select(
        "doc_id",
        F.array_min(grams).alias("fp_min"),
        F.array_max(grams).alias("fp_max"),
    )
