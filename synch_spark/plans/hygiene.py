"""Corpus-hygiene query surface: PII scrubbing, exact duplicated-span
detection, URL/domain analysis, fixed-k stratified sampling.

North-star extensions beyond the reference (SURVEY §2 scope extension —
long2ice/synch stops at replication; these are the passes a 100 TB
training-data pipeline runs on the replicated corpus). Same dual form
as dataops.py: idiomatic DataFrame program + DuckDB oracle SQL.

The synthetic corpus carries no real PII/URLs, so q113/q115 synthesize
the sensitive spans deterministically in Column algebra on BOTH sides
(the established q109/q111/q112 envelope pattern): the enrichment is
part of the query, the detection/redaction operators under test see
exactly what a real crawl would contain, and the oracle comparison
stays exact.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from synch_spark.operators import pii
from synch_spark.operators.text import tokens
from synch_spark.plans.dataops import TOK_SQL, _docs

# --- q113: PII detection + redaction ------------------------------------

_EMAIL_RE = pii.pattern("email")
_PHONE_RE = pii.pattern("phone")
_IPV4_RE = pii.pattern("ipv4")


def _enriched_text():
    """text + deterministic synthetic PII (same construction in Q113_SQL)."""
    did = F.col("doc_id")
    email = F.concat(
        F.lit(" contact u"), did.cast("string"), F.lit("@example.com"))
    phone = F.concat(
        F.lit(" call 555-"), (did % 900 + 100).cast("string"),
        F.lit("-"), (did % 9000 + 1000).cast("string"))
    ip = F.concat(
        F.lit(" from 10.0."), (did % 256).cast("string"),
        F.lit("."), (did % 250).cast("string"))
    return F.concat(
        F.col("text"),
        F.when(did % 5 == 0, email).otherwise(F.lit("")),
        F.when(did % 7 == 0, phone).otherwise(F.lit("")),
        F.when(did % 11 == 0, ip).otherwise(F.lit("")),
    )


def q113_pii_redaction(spark, sf_dir):
    """PII scrub report: per source, how many emails/phones/IPv4s the
    corpus carries, how many documents are affected, and how many
    characters redaction removes. The operators (operators/pii.py) are
    pure Column regexps — JVM codegen, zero shuffle; the only shuffle
    here is the final tiny per-source aggregate. At 100 TB this is a
    read-bandwidth-bound map pass, exactly how a production scrub runs."""
    docs = _docs(spark, sf_dir)
    base = docs.select("doc_id", "source", _enriched_text().alias("_t"))
    t = F.col("_t")
    per = base.select(
        "source",
        pii.pii_count(t, "email").alias("_e"),
        pii.pii_count(t, "phone").alias("_p"),
        pii.pii_count(t, "ipv4").alias("_i"),
        (F.length(t) - F.length(pii.redact(t))).cast("long").alias("_d"),
    )
    any_pii = (F.col("_e") + F.col("_p") + F.col("_i") > 0).cast("long")
    return (
        per.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_e").cast("long").alias("n_emails"),
            F.sum("_p").cast("long").alias("n_phones"),
            F.sum("_i").cast("long").alias("n_ipv4"),
            F.sum(any_pii).cast("long").alias("n_docs_with_pii"),
            F.sum("_d").cast("long").alias("chars_redacted"),
        )
        .orderBy("source")
    )


_ENRICH_SQL = (
    "text"
    " || CASE WHEN doc_id % 5 = 0 THEN ' contact u' || CAST(doc_id AS VARCHAR)"
    " || '@example.com' ELSE '' END"
    " || CASE WHEN doc_id % 7 = 0 THEN ' call 555-'"
    " || CAST(doc_id % 900 + 100 AS VARCHAR) || '-'"
    " || CAST(doc_id % 9000 + 1000 AS VARCHAR) ELSE '' END"
    " || CASE WHEN doc_id % 11 = 0 THEN ' from 10.0.'"
    " || CAST(doc_id % 256 AS VARCHAR) || '.'"
    " || CAST(doc_id % 250 AS VARCHAR) ELSE '' END"
)

Q113_SQL = f"""
WITH e AS (SELECT source, {_ENRICH_SQL} AS t FROM documents),
c AS (
  SELECT source,
         len(regexp_extract_all(t, '{_EMAIL_RE}')) AS ne,
         len(regexp_extract_all(t, '{_PHONE_RE}')) AS np,
         len(regexp_extract_all(t, '{_IPV4_RE}')) AS ni,
         length(t) - length(
           regexp_replace(regexp_replace(regexp_replace(t,
             '{_EMAIL_RE}', '[EMAIL]', 'g'),
             '{_PHONE_RE}', '[PHONE]', 'g'),
             '{_IPV4_RE}', '[IPV4]', 'g')) AS d
  FROM e)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(ne) AS BIGINT) AS n_emails,
       CAST(SUM(np) AS BIGINT) AS n_phones,
       CAST(SUM(ni) AS BIGINT) AS n_ipv4,
       CAST(SUM(CASE WHEN ne + np + ni > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_docs_with_pii,
       CAST(SUM(d) AS BIGINT) AS chars_redacted
FROM c GROUP BY source ORDER BY source
"""


# --- q114: exact duplicated-span detection ------------------------------

SPAN_W = 12  # tokens per sliding window, stride 1


def span_report(docs, span_w: int = SPAN_W):
    """Exact duplicated-span detection (the sliding-window form of
    suffix-array training-data dedup, Lee et al. 2022 'Deduplicating
    Training Data Makes Language Models Better'): every w-token window
    at every alignment is fingerprinted; a window whose fingerprint
    appears in >= 2 distinct documents is a duplicated span. Consecutive
    duplicated windows are merged into runs (the islands trick), so
    max_span_tokens approximates the longest repeated substring.

    Plan at scale: one tokenize pass, windows in-expression (no
    quadratic element_at — F.slice over a materialized token array),
    one shuffle on the uniform md5 fingerprint for the cross-doc count,
    a semi-join back (fp-keyed, no skew by construction), and a
    doc_id-partitioned window for the runs. No global windows, no
    driver-side state; the fp shuffle carries 16-byte digests, never
    text. Expects columns (doc_id, source, text)."""
    base = docs.select("doc_id", "source", tokens("text").alias("_toks"))
    toks = F.col("_toks")
    grams = F.when(
        F.size(toks) >= span_w,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - span_w + 1),
            lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, span_w))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # the fingerprint relation feeds three consumers (per-source window
    # totals, the cross-doc frequency count, and the semi-join back);
    # lazily materialize it once so the tokenize+md5+posexplode pass —
    # the CPU-heavy scan of the raw corpus — runs once, not three
    # times. The stored rows are the narrow proxy (ids, positions,
    # 16-byte digests), never the text.
    win = base.select(
        "doc_id", "source", F.posexplode(grams).alias("pos", "fp")
    ).localCheckpoint(eager=False)
    tot = win.groupBy("source").agg(F.count(F.lit(1)).alias("_totw"))
    # duplicated-window test as a window predicate over the fp
    # partitioning instead of groupBy(fp)+count_distinct+semi-join:
    # "appears in >= 2 distinct documents" is exactly min(doc_id) !=
    # max(doc_id) within the fp group, so one fp-keyed exchange replaces
    # the old aggregate exchange PLUS the join back. A mega-hot
    # boilerplate fp costs WindowExec one large sorted group, which it
    # spills to disk (no per-group in-memory buffer).
    byfp = Window.partitionBy("fp")
    dup = (
        win.withColumn("_mn", F.min("doc_id").over(byfp))
        .withColumn("_mx", F.max("doc_id").over(byfp))
        .filter(F.col("_mn") != F.col("_mx"))
        .drop("_mn", "_mx")
    )
    bypos = Window.partitionBy("doc_id").orderBy("pos")
    runs = (
        dup.withColumn("_grp", F.col("pos") - F.row_number().over(bypos))
        .groupBy("source", "doc_id", "_grp")
        .agg(F.count(F.lit(1)).alias("_run"))
    )
    per_src = runs.groupBy("source").agg(
        F.count_distinct("doc_id").alias("_docs_dup"),
        F.sum("_run").alias("_dupw"),
        F.max("_run").alias("_maxrun"),
    )
    n_docs = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"))
    totw = F.coalesce(F.col("_totw"), F.lit(0))
    dupw = F.coalesce(F.col("_dupw"), F.lit(0))
    return (
        n_docs.join(tot, "source", "left")
        .join(per_src, "source", "left")
        .select(
            "source",
            "n_docs",
            totw.cast("long").alias("total_windows"),
            F.coalesce(F.col("_docs_dup"), F.lit(0)).cast("long")
            .alias("n_docs_with_dup"),
            dupw.cast("long").alias("dup_windows"),
            F.when(totw > 0, dupw.cast("double") / totw.cast("double"))
            .otherwise(F.lit(0.0)).alias("dup_ratio"),
            F.coalesce(F.col("_maxrun") + (span_w - 1), F.lit(0))
            .cast("long").alias("max_span_tokens"),
        )
        .orderBy("source")
    )


def q114_span_dedup(spark, sf_dir):
    """Duplicated-span report over the corpus — see span_report."""
    return span_report(_docs(spark, sf_dir))


Q114_SQL = f"""
WITH t AS (SELECT doc_id, source, {TOK_SQL} AS w FROM documents),
x AS (
  SELECT doc_id, source, st AS pos,
         md5(array_to_string(list_slice(w, st, st + {SPAN_W - 1}), ' ')) AS fp
  FROM t, UNNEST(generate_series(1, len(w) - {SPAN_W - 1})) AS u(st)
  WHERE len(w) >= {SPAN_W}),
tot AS (SELECT source, COUNT(*) AS totw FROM x GROUP BY source),
d AS (SELECT fp FROM x GROUP BY fp HAVING COUNT(DISTINCT doc_id) >= 2),
m AS (SELECT x.* FROM x JOIN d ON x.fp = d.fp),
r AS (SELECT source, doc_id,
             pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      FROM m),
runs AS (SELECT source, doc_id, COUNT(*) AS run_len
         FROM r GROUP BY source, doc_id, grp),
ps AS (SELECT source, COUNT(DISTINCT doc_id) AS docs_dup,
              SUM(run_len) AS dupw, MAX(run_len) AS maxrun
       FROM runs GROUP BY source),
nd AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source)
SELECT nd.source,
       CAST(nd.n_docs AS BIGINT) AS n_docs,
       CAST(COALESCE(tot.totw, 0) AS BIGINT) AS total_windows,
       CAST(COALESCE(ps.docs_dup, 0) AS BIGINT) AS n_docs_with_dup,
       CAST(COALESCE(ps.dupw, 0) AS BIGINT) AS dup_windows,
       CASE WHEN COALESCE(tot.totw, 0) > 0
            THEN CAST(COALESCE(ps.dupw, 0) AS DOUBLE)
                 / CAST(tot.totw AS DOUBLE)
            ELSE 0.0 END AS dup_ratio,
       CAST(COALESCE(ps.maxrun + {SPAN_W - 1}, 0) AS BIGINT)
         AS max_span_tokens
FROM nd LEFT JOIN tot ON nd.source = tot.source
        LEFT JOIN ps ON nd.source = ps.source
ORDER BY nd.source
"""


# --- q125: exact duplicated-span REMOVAL ---------------------------------


def remove_duplicated_spans(docs, span_w: int = SPAN_W,
                            id_col: str = "doc_id",
                            text_col: str = "text"):
    """Duplicated-span EXCISION — the other half of Lee et al. 2022
    (span_report only *detects*; training pipelines *remove*): rewrite
    each document's text with every duplicated w-token run cut out,
    keeping exactly one canonical occurrence corpus-wide.

    Semantics (deterministic, oracle-replicable):
    - fingerprint every w-token window (1-based start pos, stride 1);
    - for each fingerprint occurring >= 2 times corpus-wide, the
      occurrence with the smallest (doc_id, pos) is canonical; every
      other occurrence is a duplicate window;
    - a token is removed iff ANY duplicate window covers it; the doc is
      rebuilt from the surviving tokens joined by ' ' (token-level
      reconstruction — short docs and unaffected docs also pass through
      the same join so output text is whitespace-normalized uniformly).

    Plan at scale (all equi-joins, linear in corpus + duplicate mass):
    one fp-keyed groupBy picks the canonical occurrence via
    min(struct(doc_id, pos)) — partial-agg friendly, no sort window;
    the join back is fp-keyed 1:1 per occurrence (a mega-hot
    boilerplate fp fans out linearly, never quadratically); covered
    token indices explode only duplicate windows (x w); and ONLY
    affected docs (left-semi) pay the token explode + anti-join +
    ordered rebuild — the untouched majority of a 100 TB corpus never
    shuffles its tokens. Returns (doc_id, clean_text, n_tokens,
    n_removed) ordered by doc_id."""
    w = span_w
    # three consumers scan the tokenized corpus (window fingerprints,
    # the affected-doc rebuild, the final assembly join); materialize
    # the tokenize pass once instead of re-running scan+split per
    # consumer — same §8 proxy-materialization shape as span_report
    base = docs.select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("_toks")
    ).localCheckpoint(eager=False)
    toks = F.col("_toks")
    grams = F.when(
        F.size(toks) >= w,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - w + 1),
            lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, w))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    win = base.select(
        "doc_id", F.posexplode(grams).alias("_p0", "fp")
    ).select("doc_id", (F.col("_p0") + 1).alias("pos"), "fp")
    # canonical-occurrence choice as window functions over the fp
    # partitioning instead of groupBy(fp)+join-back: min(struct) and
    # count over the fp group compute on the SAME exchange the old plan
    # paid for the aggregate, and the full fp-keyed join of the window
    # relation disappears. Hot boilerplate fps sort+spill in WindowExec
    # rather than growing a join fan-out.
    byfp = Window.partitionBy("fp")
    dup = (
        win.withColumn("_first", F.min(F.struct("doc_id", "pos")).over(byfp))
        .withColumn("_n", F.count(F.lit(1)).over(byfp))
        .filter((F.col("_n") >= 2)
                & ~((F.col("doc_id") == F.col("_first.doc_id"))
                    & (F.col("pos") == F.col("_first.pos"))))
        .select("doc_id", "pos")
    )
    rm_idx = dup.select(
        "doc_id",
        F.explode(F.sequence(F.col("pos"), F.col("pos") + F.lit(w - 1)))
        .alias("_i"),
    ).distinct()
    rm_n = rm_idx.groupBy("doc_id").agg(F.count(F.lit(1)).alias("_nrm"))
    rebuilt = (
        base.join(rm_n, "doc_id", "left_semi")
        .select("doc_id", F.posexplode("_toks").alias("_i0", "_tok"))
        .withColumn("_i", F.col("_i0") + 1)
        .join(rm_idx, ["doc_id", "_i"], "left_anti")
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_i", "_tok"))),
                    lambda x: x["_tok"],
                ),
            ).alias("_ct")
        )
    )
    return (
        base.join(rm_n, "doc_id", "left")
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("_nrm").isNull(), F.concat_ws(" ", F.col("_toks")))
            .otherwise(F.coalesce(F.col("_ct"), F.lit("")))
            .alias("clean_text"),
            F.size("_toks").cast("long").alias("n_tokens"),
            F.coalesce(F.col("_nrm"), F.lit(0)).cast("long").alias("n_removed"),
        )
        .orderBy("doc_id")
    )


def q125_span_removal(spark, sf_dir):
    """Corpus-wide duplicated-span excision — see remove_duplicated_spans."""
    return remove_duplicated_spans(_docs(spark, sf_dir))


Q125_SQL = f"""
WITH t AS (SELECT doc_id, {TOK_SQL} AS w FROM documents),
x AS (
  SELECT doc_id, st AS pos,
         md5(array_to_string(list_slice(w, st, st + {SPAN_W - 1}), ' ')) AS fp
  FROM t, UNNEST(generate_series(1, len(w) - {SPAN_W - 1})) AS u(st)
  WHERE len(w) >= {SPAN_W}),
d AS (SELECT doc_id, pos FROM (
        SELECT doc_id, pos,
               ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id, pos) AS rn
        FROM x) WHERE rn > 1),
rm AS (SELECT DISTINCT doc_id, u.i AS i
       FROM d, UNNEST(generate_series(pos, pos + {SPAN_W - 1})) AS u(i)),
rmn AS (SELECT doc_id, COUNT(*) AS nrm FROM rm GROUP BY doc_id),
tokpos AS (SELECT t.doc_id, u.i AS i, t.w[u.i] AS tok
           FROM t, UNNEST(generate_series(1, len(t.w))) AS u(i)
           WHERE t.doc_id IN (SELECT doc_id FROM rmn)),
kept AS (SELECT k.doc_id, k.i, k.tok FROM tokpos k
         LEFT JOIN rm ON k.doc_id = rm.doc_id AND k.i = rm.i
         WHERE rm.i IS NULL),
rebuilt AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS ct
            FROM kept GROUP BY doc_id)
SELECT t.doc_id,
       CASE WHEN rmn.doc_id IS NULL THEN array_to_string(t.w, ' ')
            ELSE COALESCE(rebuilt.ct, '') END AS clean_text,
       CAST(len(t.w) AS BIGINT) AS n_tokens,
       CAST(COALESCE(rmn.nrm, 0) AS BIGINT) AS n_removed
FROM t LEFT JOIN rmn ON t.doc_id = rmn.doc_id
       LEFT JOIN rebuilt ON t.doc_id = rebuilt.doc_id
ORDER BY t.doc_id
"""


# --- q115: URL extraction + domain stats --------------------------------

_URL_HOST_RE = r"https?://([A-Za-z0-9.-]+)"


def q115_url_domains(spark, sf_dir):
    """URL/domain analysis (the CommonCrawl-style domain filter pass):
    extract every URL host, aggregate per domain, and flag blocklisted
    domains. Hosts are synthesized deterministically (no real URLs in
    the fixture corpus — see module docstring). Extraction is a Column
    regexp (JVM, no Python); the per-domain aggregate is the only
    shuffle, keyed on domain (bounded cardinality ≪ corpus size). At
    100 TB the blocklist side is a broadcast join against the domain
    aggregate, never against raw documents."""
    docs = _docs(spark, sf_dir)
    did = F.col("doc_id")
    url1 = F.concat(
        F.lit(" see https://site"), (did % 50).cast("string"),
        F.lit(".ex"), (did % 7).cast("string"),
        F.lit(".com/p/"), did.cast("string"))
    url2 = F.concat(
        F.lit(" read http://blog"), (did % 20).cast("string"),
        F.lit(".org/idx"))
    t = F.concat(
        F.col("text"),
        F.when(did % 3 == 0, url1).otherwise(F.lit("")),
        F.when(did % 13 == 0, url2).otherwise(F.lit("")),
    )
    hosts = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(t, F.lit(_URL_HOST_RE), 1)
        ).alias("domain"),
    )
    blocked = F.when(F.col("domain").like("blog%"), 1).otherwise(0)
    return (
        hosts.groupBy("domain")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_urls"),
            F.count_distinct("doc_id").cast("long").alias("n_docs"),
        )
        .select("domain", "n_urls", "n_docs", blocked.cast("long").alias("blocked"))
        .orderBy("domain")
    )


_URL_ENRICH_SQL = (
    "text"
    " || CASE WHEN doc_id % 3 = 0 THEN ' see https://site'"
    " || CAST(doc_id % 50 AS VARCHAR) || '.ex' || CAST(doc_id % 7 AS VARCHAR)"
    " || '.com/p/' || CAST(doc_id AS VARCHAR) ELSE '' END"
    " || CASE WHEN doc_id % 13 = 0 THEN ' read http://blog'"
    " || CAST(doc_id % 20 AS VARCHAR) || '.org/idx' ELSE '' END"
)

Q115_SQL = f"""
WITH e AS (SELECT doc_id, {_URL_ENRICH_SQL} AS t FROM documents),
h AS (
  SELECT doc_id, UNNEST(regexp_extract_all(t, '{_URL_HOST_RE}', 1)) AS domain
  FROM e)
SELECT domain,
       CAST(COUNT(*) AS BIGINT) AS n_urls,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(CASE WHEN domain LIKE 'blog%' THEN 1 ELSE 0 END AS BIGINT)
         AS blocked
FROM h GROUP BY domain ORDER BY domain
"""


# --- q116: fixed-k per-stratum sample -----------------------------------

SAMPLE_K = 8


def q116_per_stratum_sample(spark, sf_dir):
    """Deterministic fixed-k sample per (source, lang) stratum — the
    reservoir-sampling complement to q110's rate-based gate: exactly
    min(k, |stratum|) rows per stratum, chosen by the seedless md5
    permutation (engine-portable, re-run-stable, no RNG state). The
    window is keyed on the stratum so the shuffle is balanced by
    stratum sizes; for a degenerate giant stratum the same plan takes
    AQE's skew split, and because only rank <= k survives, a local
    top-k pre-aggregation per map partition is a drop-in upgrade — the
    ordering key is data-independent so partial top-k commutes."""
    docs = _docs(spark, sf_dir)
    h = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("source", "lang").orderBy(h, "doc_id")
    return (
        docs.select(
            "source", "lang", "doc_id",
            F.row_number().over(w).alias("sample_rank"))
        .filter(F.col("sample_rank") <= SAMPLE_K)
        .withColumn("sample_rank", F.col("sample_rank").cast("long"))
        .orderBy("source", "lang", "sample_rank")
    )


Q116_SQL = f"""
WITH r AS (
  SELECT source, lang, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY source, lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS sample_rank
  FROM documents)
SELECT source, lang, doc_id, CAST(sample_rank AS BIGINT) AS sample_rank
FROM r WHERE sample_rank <= {SAMPLE_K}
ORDER BY source, lang, sample_rank
"""


HYGIENE_QUERIES = {
    "q113_pii_redaction": (q113_pii_redaction, Q113_SQL),
    "q114_span_dedup": (q114_span_dedup, Q114_SQL),
    "q115_url_domains": (q115_url_domains, Q115_SQL),
    "q116_per_stratum_sample": (q116_per_stratum_sample, Q116_SQL),
    "q125_span_removal": (q125_span_removal, Q125_SQL),
}
