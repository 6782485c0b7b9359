"""Text-analysis operators for training-data pipelines.

Beyond the reference's surface (north-star extension): language-ID
heuristic, quality scoring, token counting, document fingerprinting.
All pure Column expressions — JVM-side, whole-stage-codegen'd, no UDFs —
so they run at scan speed on 100 TB.

Portability contract: every function here has an equivalent DuckDB SQL
formulation (see plans/dataops.py oracles); tokenization is regex
whitespace-split, hashes are md5 hex (identical across engines).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

TOKEN_RE = r"\s+"

# whitespace-split tokens; data-independent, matches string_split_regex in DuckDB
def tokens(col: Column | str) -> Column:
    """Whitespace tokens WITHOUT boundary empties: split('\\s+') yields
    '' for empty text and at leading/trailing whitespace ('' -> [''],
    '  a' -> ['', 'a']), which over-counts every token budget, inflates
    stopword/length denominators, and makes '' a distinct 'token'. The
    DuckDB oracle tokenizer (plans.dataops.TOK_SQL) filters identically
    — the two must stay in lockstep."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_remove(F.split(c, TOKEN_RE), "")


def token_count(col: Column | str) -> Column:
    """Whitespace token count (the BPE-ish proxy for doc length budgeting)."""
    return F.size(tokens(col)).cast("long")


def char_count(col: Column | str) -> Column:
    return F.length(col).cast("long")


# minimal function-word list present in the fixtures' vocabulary; the
# quality heuristic is stopword density (real pipelines plug in a fuller list)
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def stopword_count(col: Column | str) -> Column:
    toks = tokens(col)
    arr = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).cast("long")


def stopword_ratio(col: Column | str) -> Column:
    return stopword_count(col).cast("double") / token_count(col).cast("double")


def mean_token_len(col: Column | str) -> Column:
    """Average token length — a cheap gibberish / boilerplate signal."""
    toks = tokens(col)
    total = F.aggregate(F.transform(toks, F.length), F.lit(0), lambda acc, x: acc + x)
    return total.cast("double") / F.size(toks).cast("double")


def quality_score(col: Column | str) -> Column:
    """Composite quality heuristic in [0,1]: penalize very short docs and
    abnormal stopword density. Deterministic arithmetic only."""
    n = token_count(col).cast("double")
    length_term = F.least(n / F.lit(32.0), F.lit(1.0))
    stop = stopword_ratio(col)
    stop_term = F.lit(1.0) - F.abs(stop - F.lit(0.12))
    return F.greatest(F.lit(0.0), F.least(F.lit(1.0), (length_term + stop_term) / F.lit(2.0)))


def lang_guess(col: Column | str) -> Column:
    """N-gram-free language heuristic: function-word hit rate.

    With a realistic per-language stopword table this is the classic
    stopword-profile classifier; the fixture corpus is synthetic
    English-ish for every lang label, so the heuristic's output is a
    deterministic function of the text (what the oracle checks), not a
    recovery of the metadata label.
    """
    ratio = stopword_ratio(col)
    return (
        F.when(ratio >= F.lit(0.08), F.lit("en"))
        .when(ratio >= F.lit(0.04), F.lit("en_low"))
        .otherwise(F.lit("unknown"))
    )


# Character-n-gram language profiles: the classic n-gram langid heuristic
# with tiny built-in profiles (top function-word fragments per language).
# Score = fraction of profile grams appearing as substrings; argmax wins.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the ", " and ", " of ", "ing ", " is ", " a "),
    "de": (" der ", " die ", " und ", "sch", " ein ", " ist "),
    "fr": (" le ", " les ", " des ", " est ", " une ", " et "),
    "es": (" el ", " los ", " una ", " es ", " que ", " y "),
    "zh": ("的", "是", "了", "在", "我", "不"),
}


def ngram_lang_scores(col: Column | str):
    """One score column per language: fraction of profile grams present."""
    c = F.concat(F.lit(" "), F.lower(F.col(col) if isinstance(col, str) else col), F.lit(" "))
    out = {}
    for lang, grams in LANG_PROFILES.items():
        hits = sum(F.when(c.contains(g), 1).otherwise(0) for g in grams)
        out[lang] = (hits / F.lit(len(grams))).cast("double")
    return out


def ngram_lang_pred(col: Column | str) -> Column:
    """argmax over profile scores; ties broken by language-name order;
    all-zero -> 'unknown'. Flat greatest()+first-match form — a nested
    strictly-greater CASE chain doubles the expression tree per language
    (measured 2.5 s of plan time alone)."""
    scores = ngram_lang_scores(col)
    langs = sorted(scores)
    max_s = F.greatest(*[scores[lang] for lang in langs])
    pred = F.coalesce(
        *[F.when(scores[lang] == max_s, F.lit(lang)) for lang in langs]
    )
    return F.when(max_s > 0, pred).otherwise(F.lit("unknown"))


# GPT-2-style pretokenizer shape: word pieces, numbers, punctuation runs —
# the cheap token-count proxy for LLM budget estimation when the real BPE
# vocab isn't at hand. Portable: same regex class syntax in DuckDB.
BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def bpe_ish_tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(BPE_ISH_RE), 0)


def bpe_ish_token_count(col: Column | str) -> Column:
    return F.size(bpe_ish_tokens(col)).cast("long")


def winnow_fingerprints(df, text_col: str, k: int = 8, window: int = 4):
    """Winnowing (MOSS) document fingerprints: hash every k-gram of the
    normalized text, keep the minimum hash of each sliding window of
    ``window`` consecutive k-grams, dedupe. Robust local fingerprints —
    two documents sharing any sufficiently long run share fingerprints.
    Hash = md5 prefix (portable to the DuckDB oracle); all array algebra,
    no UDF.

    DataFrame-level on purpose: the normalized text and the gram array
    are each materialized behind a projection before the next stage's
    lambda touches them — referencing those expressions inside the
    lambdas would re-evaluate them per element (quadratic; the
    shingles() lesson). Adds column ``fps`` (sorted distinct array).
    """
    c = F.col("_winnow_norm")
    n = F.length(c)
    grams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.substring(F.md5(F.substr(c, i, F.lit(k))), 1, 8),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = F.col("_winnow_grams")
    mins = F.when(
        F.size(g) >= window,
        F.transform(
            F.sequence(F.lit(0), F.size(g) - window),
            lambda i: F.array_min(F.slice(g, i + 1, window)),
        ),
    ).otherwise(g)
    return (
        df.withColumn("_winnow_norm", normalize_text(text_col))
        .withColumn("_winnow_grams", grams)
        .withColumn("fps", F.array_sort(F.array_distinct(mins)))
        .drop("_winnow_norm", "_winnow_grams")
    )


def gopher_stats(
    df,
    text_col: str,
    id_col: str,
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    min_distinct_ratio: float = 0.3,
    max_top_ratio: float = 0.2,
    max_symbol_ratio: float = 0.1,
):
    """Gopher-style repetition/quality gates per document.

    The filters the Gopher/MassiveText pipeline applies before training:
    token-count bounds, type-token ratio (distinct/total — low means
    boilerplate repetition), top-token dominance (one token's share of
    the doc), and symbol-to-char ratio. One explode + two aggregations —
    a single tokenization pass, shuffled on (doc, token) then doc, so it
    scales as a plain wordcount; no per-row Python, no HOF-over-distinct
    quadratics.

    Adds: n_tokens, distinct_tokens, top_token_cnt, distinct_ratio,
    top_ratio, symbol_chars, symbol_ratio, gopher_pass. Ratios are
    divisions of identically-derived integers — deterministic IEEE,
    portable to the DuckDB oracle.
    """
    toks = df.select(F.col(id_col).alias("_gid"), F.explode(tokens(text_col)).alias("_t"))
    per_tok = toks.groupBy("_gid", "_t").agg(F.count(F.lit(1)).alias("_cnt"))
    agg = per_tok.groupBy("_gid").agg(
        F.sum("_cnt").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).alias("distinct_tokens"),
        F.max("_cnt").cast("long").alias("top_token_cnt"),
    )
    # LEFT join + zero-fill: a NULL/empty/whitespace-only text produces no
    # token rows, and an inner join would silently DROP the document from
    # the output — a quality gate must FAIL such docs (n_tokens=0 <
    # min_tokens), not lose them
    out = df.join(agg, F.col(id_col) == F.col("_gid"), "left").drop("_gid")
    zero = F.lit(0).cast("long")
    out = out.withColumns(
        {
            "n_tokens": F.coalesce(F.col("n_tokens"), zero),
            "distinct_tokens": F.coalesce(F.col("distinct_tokens"), zero),
            "top_token_cnt": F.coalesce(F.col("top_token_cnt"), zero),
        }
    )
    # ratios guarded for n_tokens=0 / char_count=0: under ANSI mode a bare
    # 0/0 raises DIVIDE_BY_ZERO; NULL ratios are fine because the
    # n_tokens bound is already false, and false AND null = false
    nt = F.col("n_tokens").cast("double")
    distinct_ratio = F.when(
        F.col("n_tokens") > 0, F.col("distinct_tokens").cast("double") / nt
    )
    top_ratio = F.when(
        F.col("n_tokens") > 0, F.col("top_token_cnt").cast("double") / nt
    )
    symbol_chars = F.length(
        F.regexp_replace(F.col(text_col), r"[A-Za-z0-9\s]", "")
    ).cast("long")
    out = (
        out.withColumn("distinct_ratio", distinct_ratio)
        .withColumn("top_ratio", top_ratio)
        .withColumn("symbol_chars", symbol_chars)
        .withColumn(
            "symbol_ratio",
            F.when(
                char_count(text_col) > 0,
                F.col("symbol_chars").cast("double")
                / char_count(text_col).cast("double"),
            ),
        )
    )
    return out.withColumn(
        "gopher_pass",
        F.col("n_tokens").between(min_tokens, max_tokens)
        & (F.col("distinct_ratio") >= min_distinct_ratio)
        & (F.col("top_ratio") <= max_top_ratio)
        & (F.col("symbol_ratio") <= max_symbol_ratio),
    )


# ipv4 before phone: replacement applies in dict order, so address-shaped
# strings are consumed by their own pattern first. The phone pattern is
# structured (optional country code, 3-3-4 grouping with separators), NOT a
# loose digit-run: '2024-01-02', 'order id 123456789', and '10.0.42.7' must
# survive a scrub — an overmatching phone regex silently destroys non-PII
# content and corrupts the audit counts.
#
# email/ipv4 are SHARED with operators.pii (one definition — two tables
# drifting would make scrub and audit disagree on what PII is). The phone
# patterns differ ON PURPOSE: pii.py's strict \d{3}-\d{3}-\d{4} is the
# auditable oracle-portable class (q113); this scrub variant also catches
# country codes / parens / spaces, trading oracle portability for recall.
from synch_spark.operators.pii import PII_PATTERNS as _PII_TABLE

_PII_BY_KIND = {k: rx for k, rx, _ in _PII_TABLE}
PII_PATTERNS = {
    "email": _PII_BY_KIND["email"],
    "ipv4": _PII_BY_KIND["ipv4"],
    "phone": r"(?:\+\d{1,3}[\s.-]?)?\(?\d{3}\)?[\s.-]?\d{3}[\s.-]\d{4}\b",
}


def redact_patterns(
    df,
    text_col: str,
    out_col: str | None = None,
    patterns: dict[str, str] | None = None,
    token: str = "[REDACTED]",
):
    """PII / pattern redaction — the scrubbing pass a training corpus gets
    before anything else sees it. Adds one ``n_<name>`` match-count
    column per pattern (regexp_count, for audit metrics/sampling) and a
    redacted text column with every match replaced by ``token``.
    All JVM-side regex (regexp_count/regexp_replace inside
    WholeStageCodegen): scan-shaped, no shuffle, no Python in the loop —
    the only acceptable cost profile for a pass that must touch every
    byte of a 100 TB corpus. Replacement applies in dict order; the
    ``n_<name>`` counts are each computed on the ORIGINAL text, so a
    span matched by two patterns is counted by both (the audit answers
    "what would this pattern alone flag", not "who won the replace").
    Default set: emails, IPv4 addresses, structured phone numbers
    (separator required in the final group — a bare 10-digit run is
    more likely an id than a phone, and precision beats recall when
    the failure mode is destroying non-PII training text)."""
    pats = patterns or PII_PATTERNS
    c = F.col(text_col)
    out = df
    for name, p in pats.items():
        out = out.withColumn(f"n_{name}", F.regexp_count(c, F.lit(p)).cast("long"))
    red = c
    for p in pats.values():
        red = F.regexp_replace(red, p, token)
    return out.withColumn(out_col or f"{text_col}_redacted", red)


def normalize_text(col: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse non-alnum."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " "))


def fingerprint(col: Column | str) -> Column:
    """Content fingerprint: md5 of the normalized text (stable across
    whitespace/punctuation variants — the exact-dedup key).

    Non-Latin fallback: the [a-z0-9] normalization strips CJK/Cyrillic/
    Arabic text ENTIRELY, so every such document would normalize to ''
    and share md5('') — an exact-dedup keyed on the fingerprint would
    collapse the whole non-Latin corpus to one row. When the normalized
    form is empty, hash the RAW text instead: still deterministic,
    still engine-portable (the DuckDB oracle mirrors the CASE), and
    distinct documents stay distinct."""
    c = F.col(col) if isinstance(col, str) else col
    norm = normalize_text(c)
    return F.md5(F.when(norm == "", c).otherwise(norm))
