"""Text analysis over the ``documents`` table: stats, quality scoring,
language-ID heuristic, token counting, document fingerprinting.

Each operator is a pure-SQL definition usable verbatim (or with a tiny
dialect tweak) by both Spark SQL and the DuckDB oracle.  Token counting
uses space-counting (length-difference) instead of regex splits to avoid
engine-specific empty-token semantics; fingerprints are polynomial
rolling hashes mod 2^31-1 computed with higher-order lambdas
(Spark ``aggregate``/``transform`` = DuckDB ``list_reduce``/
``list_transform``) — JVM/native on both sides, no Python UDFs.
"""

from __future__ import annotations

P31 = 2147483647  # 2^31 - 1, Mersenne prime for all rolling hashes


def doc_stats_sql(dialect: str) -> str:
    """Per-doc stats: chars, tokens (spaces+1), avg token length x1000
    (integer to stay FP-exact)."""
    return """
    SELECT
      doc_id,
      CAST(length(text) AS BIGINT) AS chars,
      CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS tokens,
      CAST(FLOOR((length(replace(text, ' ', '')) * 1000.0)
           / (length(text) - length(replace(text, ' ', '')) + 1)) AS BIGINT)
        AS avg_token_len_x1000,
      lang, source
    FROM documents
    """


def _count_occurrences(needle: str) -> str:
    n = len(needle)
    return (
        f"CAST((length(text) - length(replace(text, '{needle}', ''))) / {n} AS BIGINT)"
    )


_LANG_MARKERS = {
    "en": " the ",
    "de": " der ",
    "fr": " le ",
    "es": " el ",
    "zh": " shi ",
}


def lang_id_sql(dialect: str) -> str:
    """Marker-word n-gram heuristic: score per language = marker
    occurrence count; predict argmax (ties broken by fixed language
    order), 'unk' when all scores are 0."""
    scores = {k: _count_occurrences(v) for k, v in _LANG_MARKERS.items()}
    score_cols = ",\n      ".join(f"{v} AS s_{k}" for k, v in scores.items())
    langs = list(_LANG_MARKERS)
    best = "GREATEST(" + ", ".join(f"s_{k}" for k in langs) + ")"
    pred = "CASE WHEN " + best + " = 0 THEN 'unk' "
    for k in langs:
        pred += f"WHEN s_{k} = {best} THEN '{k}' "
    pred += "END"
    return f"""
    SELECT doc_id, lang, predicted, CAST((lang = predicted) AS INT) AS correct
    FROM (
      SELECT doc_id, lang, {pred} AS predicted
      FROM (SELECT doc_id, lang, text, {score_cols} FROM documents)
    )
    """


def fingerprint_sql(dialect: str, prefix_chars: int = 64) -> str:
    """Rolling polynomial hash (base 31 mod 2^31-1) over the first N chars
    — a deterministic document fingerprint (content-defined identity)."""
    if dialect == "spark":
        fold = (
            f"aggregate(sequence(1, least(length(text), {prefix_chars})), 0L, "
            f"(acc, i) -> (acc * 31 + ascii(substr(text, i, 1))) % {P31})"
        )
    else:
        fold = (
            f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
            f"list_transform(range(1, least(length(text), {prefix_chars}) + 1), "
            f"i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))), "
            f"(acc, c) -> (acc * 31 + c) % {P31})"
        )
    return f"SELECT doc_id, {fold} AS fingerprint FROM documents"


def quality_sql(dialect: str) -> str:
    """Quality scoring: integer 0-100 from token count, mean token length,
    and repetition (distinct-token ratio) — the classic pretraining-data
    heuristics, in exact integer arithmetic."""
    if dialect == "spark":
        distinct_tokens = "size(array_distinct(split(text, ' ')))"
    else:
        distinct_tokens = "len(list_distinct(string_split(text, ' ')))"
    return f"""
    SELECT doc_id, chars, tokens, distinct_tokens,
      CAST(LEAST(100, GREATEST(0,
          (CASE WHEN tokens >= 20 AND tokens <= 2000 THEN 40 ELSE 10 END)
        + (CASE WHEN avg_len_x100 >= 250 AND avg_len_x100 <= 900 THEN 30 ELSE 5 END)
        + CAST(FLOOR((distinct_tokens * 30.0) / tokens) AS BIGINT))) AS BIGINT)
        AS quality
    FROM (
      SELECT doc_id,
        CAST(length(text) AS BIGINT) AS chars,
        CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS tokens,
        CAST(FLOOR((length(replace(text, ' ', '')) * 100.0)
             / (length(text) - length(replace(text, ' ', '')) + 1)) AS BIGINT)
          AS avg_len_x100,
        CAST({distinct_tokens} AS BIGINT) AS distinct_tokens
      FROM documents
    )
    """


def token_hist_sql(dialect: str) -> str:
    """Corpus token histogram (explode + count) — classic shuffle-heavy
    aggregation; partial aggregation map-side keeps it scalable."""
    if dialect == "spark":
        gen = "SELECT explode(split(text, ' ')) AS token FROM documents"
    else:
        gen = "SELECT unnest(string_split(text, ' ')) AS token FROM documents"
    return f"""
    SELECT token, COUNT(*) AS freq
    FROM ({gen})
    WHERE token <> ''
    GROUP BY token
    HAVING COUNT(*) >= 5
    """


def bpe_tokens_sql(dialect: str) -> str:
    """BPE-ish subword token count per document: greedy regex chunks —
    letter runs split into <=4-char pieces (a word of 10 letters = 3
    subwords, like a byte-pair vocabulary would), digits and punctuation
    one token each.  The whitespace tokenizer lives in doc_stats_sql;
    this is the second tokenizer of a pretraining-data pipeline (budget
    estimation / length filtering by model tokens, not words)."""
    pat = "[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9 ]"
    if dialect == "spark":
        cnt = f"regexp_count(text, '{pat}')"
    else:
        cnt = f"len(regexp_extract_all(text, '{pat}'))"
    return f"""
    SELECT doc_id,
           CAST({cnt} AS BIGINT) AS bpe_tokens,
           CAST(length(text) AS BIGINT) AS chars
    FROM documents
    """
