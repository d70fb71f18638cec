"""Text analysis operators for training-data pipelines.

Pure Catalyst expressions over the documents table:
- token_stats: token count (whitespace + regex), char/word lengths,
  distinct-token ratio.
- quality_score: deterministic combination of length, mean word
  length, stopword ratio, distinct ratio — the usual cheap pre-filter
  signals for corpus curation.
- langid: stopword-profile n-way vote (argmax of per-language marker
  hits; 'und' when nothing matches). A tiny deterministic heuristic —
  the point is the Spark shape (broadcast profile table → explode →
  group-vote), not linguistic accuracy.
- fingerprints: document content hash (md5 of normalized text) + a
  winnowing-style robust fingerprint = min md5 over word 5-grams
  (stable under small edits away from the minimum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to"],
    "es": ["el", "la", "de", "los", "que"],
    "fr": ["le", "la", "les", "des", "une"],
    "de": ["der", "die", "das", "und", "ein"],
    "zh": ["de", "shi", "le", "zai", "he"],
}


def _tokens(text_col: str = "text"):
    return F.split(F.trim(F.col(text_col)), " ")


# simplified BPE pre-tokenizer classes (letter runs / digit runs /
# single non-alnum), ASCII-portable between Java regex and DuckDB RE2 —
# the shape of GPT-2's pre-split without its lookahead/unicode classes
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    toks = _tokens(text_col)
    return docs.select(
        F.col(id_col).alias("id"),
        F.length(text_col).cast("bigint").alias("n_chars"),
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct"),
        (F.length(F.regexp_replace(F.col(text_col), r"[^ ]", "")) + 1)
        .cast("bigint").alias("n_ws_tokens"),
        F.expr(f"regexp_count({text_col}, '{BPE_TOKEN_RE}')")
        .cast("bigint").alias("n_bpe_tokens"),
    )


def _quality_parts(text_col: str):
    """(n_tokens, distinct_ratio, stop_ratio, score) column expressions
    — shared by quality_score and corpus_keep so the composed filter is
    the same arithmetic, not a re-derivation."""
    toks = _tokens(text_col)
    en_stop = F.array(*[F.lit(s) for s in STOPWORDS["en"]])
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(en_stop, t)))
    distinct_ratio = F.size(F.array_distinct(toks)) / n_tok
    stop_ratio = n_stop / n_tok
    score = (
        0.4 * F.least(F.lit(1.0), n_tok / F.lit(100.0))
        + 0.3 * distinct_ratio
        + 0.3 * F.least(F.lit(1.0), stop_ratio * 5)
    )
    return n_tok, distinct_ratio, stop_ratio, score


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """score = 0.4·min(1, n_tokens/100) + 0.3·distinct_ratio +
    0.3·min(1, stop_ratio·5), emitted as the EXACT integer numerator
    over denominator 1000·n_tokens:

        quality_num = 4·min(100, n)·n + 300·n_distinct + 300·min(n, 5·n_stop)

    (quality = quality_num / (1000·n_tokens)). round(rational, 6)
    doubles are the gap_report failure class — a small-integer ratio
    can land exactly on a half-boundary of the 1e-6 grid, where
    Spark's BigDecimal HALF_UP and another engine's binary round
    disagree — so the operator emits only integers; the ratios are
    one division away for the consumer."""
    toks = _tokens(text_col)
    en_stop = F.array(*[F.lit(s) for s in STOPWORDS["en"]])
    n = F.size(toks).cast("bigint")
    d = F.size(F.array_distinct(toks)).cast("bigint")
    s = F.size(
        F.filter(toks, lambda t: F.array_contains(en_stop, t))
    ).cast("bigint")
    q_num = (4 * F.least(F.lit(100), n) * n + 300 * d
             + 300 * F.least(n, 5 * s))
    return docs.select(
        F.col(id_col).alias("id"),
        n.alias("n_tokens"),
        d.alias("n_distinct"),
        s.alias("n_stop"),
        q_num.cast("bigint").alias("quality_num"),
    )


def _langid_best(text_col: str):
    """array_max over (hits, lang) structs — the argmax stopword vote as
    one column expression (struct compare: hits first, then lang)."""
    pairs = []
    for lang in sorted(STOPWORDS):
        lst = ", ".join(f"'{s}'" for s in STOPWORDS[lang])
        pairs.append(F.struct(
            F.expr(
                f"size(filter(split(trim({text_col}), ' '), x -> x IN ({lst})))"
            ).alias("hits"),
            F.lit(lang).alias("lang"),
        ))
    return F.array_max(F.array(*pairs))


def langid(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """argmax stopword-profile vote; deterministic tie-break by lang
    code; 'und' when zero hits."""
    best = _langid_best(text_col)
    return docs.select(
        F.col(id_col).alias("id"),
        F.when(best["hits"] > 0, best["lang"]).otherwise("und").alias("lang_pred"),
        best["hits"].cast("bigint").alias("lang_hits"),
    )


def corpus_keep(docs: DataFrame, q_threshold: float = 0.5,
                lang: str = "en", id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """End-to-end training-corpus keep/drop verdict — the pipeline
    composition: exact-dedup survivorship AND quality >= threshold AND
    language match, in ONE pass. The quality and language columns are
    the SAME expressions the standalone operators emit (shared
    builders), and dedup survivorship is a min-over-md5(text) window,
    so the whole filter costs a single exchange on the text hash — not
    the three id-keyed join shuffles that composing the three operator
    OUTPUTS would pay. The threshold compares the UNROUNDED score
    (identical IEEE op sequence both engines → bit-exact boolean); the
    published score is the quality_score integer numerator, never a
    round(rational, 6) double (the gap_report class).
    """
    from pyspark.sql import Window

    _, _, _, score = _quality_parts(text_col)
    toks = _tokens(text_col)
    en_stop = F.array(*[F.lit(s) for s in STOPWORDS["en"]])
    n = F.size(toks).cast("bigint")
    d = F.size(F.array_distinct(toks)).cast("bigint")
    ns = F.size(
        F.filter(toks, lambda t: F.array_contains(en_stop, t))
    ).cast("bigint")
    q_num = (4 * F.least(F.lit(100), n) * n + 300 * d
             + 300 * F.least(n, 5 * ns))
    best = _langid_best(text_col)
    lang_pred = F.when(best["hits"] > 0, best["lang"]).otherwise("und")
    w = Window.partitionBy(F.md5(F.col(text_col)))
    dedup_ok = F.col(id_col) == F.min(id_col).over(w)
    keep = dedup_ok & (score >= q_threshold) & (lang_pred == lang)
    return docs.select(
        F.col(id_col).alias("id"),
        n.alias("n_tokens"),
        q_num.cast("bigint").alias("quality_num"),
        lang_pred.alias("lang_pred"),
        dedup_ok.alias("dedup_ok"),
        keep.alias("keep"),
    )


def winnow_fingerprints(docs: DataFrame, k: int = 5, window: int = 4,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Full winnowing (Schleimer et al., SIGMOD'03): hash every word
    k-gram, slide a window of `window` consecutive gram hashes, keep
    each window's minimum, emit the distinct selected fingerprints —
    one (id, fp) row each. Guarantees any shared run of ≥ k+window-1
    tokens between two documents shares at least one fingerprint.

    The paper's rolling Karp-Rabin hash is an O(1)-update trick, not a
    semantic requirement; md5 per gram gives the same selection with
    Catalyst-only expressions (the per-doc arrays are bounded by doc
    length, and everything below the explode is whole-stage codegen)."""
    toks = _tokens(text_col)
    grams_h = F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (k - 1)),
            lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, k))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bound = docs.select(F.col(id_col).alias("id"), grams_h.alias("gh"))
    fps = F.when(
        F.size(F.col("gh")) >= window,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size("gh") - (window - 1)),
                lambda j: F.array_min(F.slice(F.col("gh"), j, window)),
            )
        ),
    ).otherwise(
        # shorter than one window: the global min is the lone print
        F.array(F.array_min("gh"))
    )
    return (
        bound.where(F.size("gh") > 0)
        .select("id", F.explode(fps).alias("fp"))
    )


def fingerprints(docs: DataFrame, n: int = 5, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    toks = _tokens(text_col)
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, n))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select(
        F.col(id_col).alias("id"),
        F.md5(F.trim(F.col(text_col))).alias("content_md5"),
        F.array_min(grams).alias("winnow_fp"),
    )
