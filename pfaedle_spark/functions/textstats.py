"""Text-analysis functions for training-data pipelines.

Per-document: whitespace + BPE-ish token counts, quality ratios and a
linear quality score, an n-gram/stopword language-ID heuristic, and a
rolling-hash document fingerprint.

All pure built-in column expressions — one narrow projection per doc,
no shuffle at all except the fingerprint's internal nothing (it's also
per-row). Scale: embarrassingly parallel scan; predicate/column
pruning reach the parquet scan untouched.

Float parity note: only +,-,*,/ of exact integers (counts, lengths) —
no transcendentals — so the DuckDB oracle matches bit-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import P31, _h31_sql, h31

# BPE-ish pre-tokenizer: letter runs | digit runs | single non-space symbol
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
PUNCT_RE = r"[^\w\s]"

STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "on", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "auf"],
    "fr": ["le", "la", "les", "et", "est", "de", "dans", "pour"],
    "es": ["el", "la", "los", "y", "es", "de", "en", "para"],
}
LANGS = sorted(STOPWORDS)  # deterministic argmax tie-break order


def _tok_col():
    return F.split(F.col("text"), " ")


def text_stats(docs: DataFrame) -> DataFrame:
    """Counting + ratio features per document."""
    toks = _tok_col()
    n_tok = F.size(toks)
    n_chars_c = F.length("text")
    n_bpe = F.regexp_count(F.col("text"), F.lit(BPE_RE))
    n_punct = F.regexp_count(F.col("text"), F.lit(PUNCT_RE))
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS["en"])))
    avg_tok_len = (n_chars_c - (n_tok - 1)) / n_tok  # chars minus separators
    stop_ratio = n_stop / n_tok
    punct_ratio = n_punct / n_chars_c
    # linear quality score in [0, ~2]: length credit + stopword credit
    # - punctuation penalty (rational arithmetic only).
    quality = (
        F.least(n_tok, F.lit(100)) / F.lit(100.0) + stop_ratio * 2 - punct_ratio * 5
    )
    return docs.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        n_bpe.cast("long").alias("n_bpe_tokens"),
        n_chars_c.cast("long").alias("n_chars"),
        avg_tok_len.alias("avg_token_len"),
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        quality.alias("quality_score"),
    )


def text_stats_sql() -> str:
    sw = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    return f"""
WITH t AS (SELECT doc_id, text, STRING_SPLIT(text, ' ') AS toks FROM documents)
SELECT doc_id,
       LEN(toks)::BIGINT AS n_tokens,
       LEN(REGEXP_EXTRACT_ALL(text, '{BPE_RE}'))::BIGINT AS n_bpe_tokens,
       LENGTH(text)::BIGINT AS n_chars,
       CAST(LENGTH(text) - (LEN(toks) - 1) AS DOUBLE) / LEN(toks) AS avg_token_len,
       CAST(LEN(LIST_FILTER(toks, x -> x IN ({sw}))) AS DOUBLE) / LEN(toks) AS stopword_ratio,
       CAST(LEN(REGEXP_EXTRACT_ALL(text, '[^\\w\\s]')) AS DOUBLE) / LENGTH(text) AS punct_ratio,
       CAST(LEAST(LEN(toks), 100) AS DOUBLE) / 100
         + CAST(LEN(LIST_FILTER(toks, x -> x IN ({sw}))) AS DOUBLE) / LEN(toks) * 2
         - CAST(LEN(REGEXP_EXTRACT_ALL(text, '[^\\w\\s]')) AS DOUBLE) / LENGTH(text) * 5
         AS quality_score
FROM t
"""


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-hit language ID: argmax language by per-language stopword
    token count; ties broken alphabetically; zero hits -> 'und'."""
    toks = _tok_col()

    def _hits(ws: list[str]):
        return F.size(F.filter(toks, lambda t: t.isin(*ws)))

    hits = {lang: _hits(ws) for lang, ws in STOPWORDS.items()}
    best = F.greatest(*[hits[lang] for lang in LANGS])
    guess = F.when(best == 0, F.lit("und"))
    for lang in LANGS:  # first (alphabetical) language achieving the max
        guess = guess.when(hits[lang] == best, F.lit(lang))
    return docs.select(
        "doc_id",
        *[hits[lang].cast("long").alias(f"hits_{lang}") for lang in LANGS],
        guess.alias("lang_guess"),
        F.col("lang").alias("lang_true"),
    )


def lang_id_sql() -> str:
    def hits(lang: str) -> str:
        sw = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
        return f"LEN(LIST_FILTER(toks, x -> x IN ({sw})))"

    greatest = "GREATEST(" + ", ".join(hits(lang) for lang in LANGS) + ")"
    cases = "\n         ".join(
        f"WHEN {hits(lang)} = {greatest} THEN '{lang}'" for lang in LANGS
    )
    cols = ",\n       ".join(f"{hits(lang)}::BIGINT AS hits_{lang}" for lang in LANGS)
    return f"""
WITH t AS (SELECT doc_id, lang, STRING_SPLIT(text, ' ') AS toks FROM documents)
SELECT doc_id,
       {cols},
       CASE WHEN {greatest} = 0 THEN 'und'
         {cases}
       END AS lang_guess,
       lang AS lang_true
FROM t
"""


FP_K = 8
FP_BASE = 257  # polynomial base; h*B + c stays < 2^63 with h < P31


def fingerprints(docs: DataFrame) -> DataFrame:
    """Document fingerprints: md5 of the normalized text (one md5 per
    DOC) plus a winnowing-style min 8-gram polynomial hash.

    The per-gram hash is 8 integer multiply-adds over the char-code
    array — replacing the earlier md5-per-gram (~2k md5/doc), which was
    the single slowest bench query (BENCH_r01: 30 s; linear but 8x the
    median). Same cross-engine-stable property: integer-only math."""
    # materialize norm/codes as REAL columns before the gram transform:
    # Spark does not CSE an expression referenced from inside sibling
    # array lambdas, so an inline `codes` would be recomputed for every
    # element_at — O(n^2) per doc (the round-1 MinHash lesson).
    staged = docs.select(
        "doc_id",
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")).alias("_norm"),
    ).withColumn(
        "_codes", F.transform(F.split(F.col("_norm"), ""), lambda c: F.ascii(c).cast("long"))
    )

    def gram_hash(i):
        h = F.lit(0).cast("long")
        for j in range(FP_K):
            c = F.element_at(F.col("_codes"), (i + j).cast("int"))
            h = (h * FP_BASE + c) % P31
        return h

    # short-doc guard: out-of-bounds element_at throws under ANSI mode;
    # an empty position list yields NULL (as does the oracle's NULL-gram)
    norm_len = F.length(F.col("_norm"))
    positions = F.when(
        norm_len >= FP_K, F.sequence(F.lit(1), norm_len - (FP_K - 1))
    ).otherwise(F.expr("CAST(array() AS array<int>)"))
    return staged.select(
        "doc_id",
        F.md5(F.col("_norm")).alias("fp_md5"),
        F.array_min(F.transform(positions, gram_hash)).alias("fp_min_gram"),
    )


def fingerprints_sql() -> str:
    h = "0"
    for j in range(FP_K):
        h = f"(({h}) * {FP_BASE} + codes[i + {j}]) % {P31}"
    return f"""
WITH t AS (
  SELECT doc_id,
         TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g')) AS norm
  FROM documents
),
c AS (
  SELECT doc_id, norm,
         LIST_TRANSFORM(STRING_SPLIT(norm, ''), ch -> CAST(ASCII(ch) AS BIGINT)) AS codes
  FROM t
)
SELECT doc_id,
       MD5(norm) AS fp_md5,
       LIST_MIN(LIST_TRANSFORM(RANGE(1, GREATEST(LENGTH(norm) - {FP_K - 1}, 1) + 1),
                               i -> {h})) AS fp_min_gram
FROM c
"""
