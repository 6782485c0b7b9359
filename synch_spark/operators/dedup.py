"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Training-data-pipeline extensions (north star), all designed scale-first:

- exact dedup is a hash-groupBy: one shuffle on the 16-byte digest, not
  the document text; map-side combine applies.
- n-gram Jaccard uses an inverted-index join (explode shingles, equi-join
  on shingle) — never a cross join; candidate generation cost is
  sum_t(n_t_probe * n_t) per shingle, the standard similarity-join plan.
- MinHash+LSH: shingle -> k min-hashes -> band buckets -> bucket
  equi-join. Hash function is min(md5(seed || ':' || shingle)) over the
  *string* ordering — deliberately portable (identical in DuckDB for the
  oracle) while keeping the uniformity MinHash needs.
- SimHash: 16-bit signature from per-token md5 prefixes, bit-majority
  aggregated with sums — one groupBy, no UDF.

Everything is Column algebra (codegen); no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from synch_spark.operators.text import fingerprint, tokens


# --- exact --------------------------------------------------------------
def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the lowest-id representative per exact (normalized) content.

    groupBy on the md5 digest: the shuffle key is 32 hex chars regardless
    of document size — at 100 TB the shuffle moves ~rows*48B, not text.
    Key = text.fingerprint (with its raw-text fallback for documents the
    [a-z0-9] normalization strips entirely — without it every non-Latin
    doc would share md5('') and the corpus would collapse to one row).
    """
    key = fingerprint(text_col).alias("_k")
    reps = df.select(key, F.col(id_col)).groupBy("_k").agg(F.min(id_col).alias(id_col))
    return df.join(reps, id_col, "left_semi")


def duplicate_stats(df: DataFrame, text_col: str) -> DataFrame:
    # countDistinct skips NULLs, but NULL-text docs are still one
    # content group — without the sentinel a corpus of 5 null docs
    # reported n_docs=5, n_unique=0 (five duplicates of nothing)
    return df.select(fingerprint(text_col).alias("_k")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(
            F.coalesce(F.col("_k"), F.lit("__null__"))).alias("n_unique"),
    )


def _check_band_config(num_hashes: int, bands: int) -> None:
    """Shared LSH banding validation: bands > num_hashes makes
    rows_per_band 0 (bare ZeroDivisionError three lines later),
    bands < 1 divides by zero immediately — say what the constraint is."""
    if not (1 <= bands <= num_hashes):
        raise ValueError(
            f"bands must satisfy 1 <= bands <= num_hashes "
            f"(got bands={bands}, num_hashes={num_hashes})"
        )


# --- shingling ----------------------------------------------------------
def shingles(df: DataFrame, text_col: str, id_col: str, n: int = 3,
             distinct: bool = True) -> DataFrame:
    """(id, shingle) pairs: word n-grams per document — distinct by
    default (set semantics for Jaccard/df counting). Pass
    distinct=False on min-fold consumers (MinHash): min over the
    multiset equals min over the set, and skipping the dedup removes a
    full shuffle of raw n-gram TEXT — the most expensive shuffle in the
    LSH chain, since everything downstream of the fold moves only
    16-byte digests."""
    # materialize the token array behind a projection boundary so the
    # split() runs once per row — referencing the tokens *expression*
    # inside the transform lambda re-evaluates it per element_at call,
    # which is quadratic in document length
    base = df.select(F.col(id_col).alias("id"), tokens(text_col).alias("_toks"))
    toks = F.col("_toks")
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(n)]),
        ),
    ).otherwise(F.array().cast("array<string>"))
    out = base.select("id", F.explode(grams).alias("shingle"))
    return out.distinct() if distinct else out


# --- n-gram Jaccard similarity join ------------------------------------
def jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.6,
    n: int = 1,
    probe_filter=None,
    max_df: int | str | None = "auto",
) -> DataFrame:
    """Similarity join: pairs (a, b), a<b, with Jaccard(token-set) >= t.

    Inverted-index plan: explode distinct n-grams, self-equi-join on the
    gram, count intersections, derive union from per-doc set sizes.
    ``probe_filter`` (Column predicate on the left id) bounds the
    candidate set for top-down exploration at scale. Note the sampling
    semantics: with a probe filter, only pairs whose SMALLER id passes
    the filter are emitted (the a<b canonicalization happens after the
    filter) — a probe-centric neighborhood needs the symmetric call.
    ``max_df`` drops grams more frequent than the cap before the join
    (hot-gram skew guard; see _gram_overlap). Default "auto" derives
    the cap from corpus size (max(1000, 0.001·n_docs)) so a ubiquitous
    boilerplate gram can never turn the self-join quadratic; None
    disables the guard (exact over the full gram vocabulary).
    """
    sizes, inter = _gram_overlap(
        df, text_col, id_col, n, probe_filter, symmetric=True, max_df=max_df
    )
    out = (
        inter.join(sizes.withColumnRenamed("id", "a").withColumnRenamed("sz", "sza"), "a")
        .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("sz", "szb"), "b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sza") + F.col("szb") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )
    return out


# "auto" max_df cap:
#   least(max(_AUTO_MAX_DF_FLOOR, _AUTO_MAX_DF_FRAC * n_docs),
#         _AUTO_MAX_DF_CEIL).
# The floor keeps the guard inert on small/medium corpora (exactness
# preserved when no gram exceeds it); the fraction bounds the worst join
# key at corpus scale; the CEILING bounds it absolutely — a fractional
# cap scales linearly with the corpus, so at 10^10 docs frac*n = 10^7
# ids in ONE collect_list aggregation buffer (~80 MB of longs in a
# single task) and cap^2 = 10^14 generated pairs for one stop-gram.
# 10^5 caps the worst posting buffer at ~800 KB and the worst gram at
# 10^10 pairs spread across the explode (still large, but partitioned;
# grams that common are stopwords and carry no similarity signal
# anyway). Module-level so tests can tighten the floor/ceiling.
_AUTO_MAX_DF_FLOOR = 1000
_AUTO_MAX_DF_FRAC = 0.001
_AUTO_MAX_DF_CEIL = 100_000


def _gram_overlap(df, text_col, id_col, n, probe_filter, symmetric,
                  max_df: int | str | None = None):
    """Shared inverted-index candidate plan for the gram-set relations:
    (sizes, inter) where sizes = |distinct n-grams| per doc and inter =
    per-(a, b) intersection counts — unordered pairs a < b when
    ``symmetric`` (Jaccard), all ordered pairs a != b otherwise
    (asymmetric containment).
    The shuffle is on the gram, never all-pairs; ``probe_filter`` bounds
    the probe (a) side.

    ``max_df`` is the hot-gram skew guard: a single stop-gram present in
    10^6 docs turns the gram space into a 10^12-pair key — one task OOMs
    and the stage never finishes. With ``max_df`` set, grams whose
    document frequency exceeds it are dropped from the gram space BEFORE
    pair generation (both the index and the per-doc set sizes, i.e.
    similarity is computed over the filtered gram vocabulary — standard
    stopword semantics), bounding the worst gram to max_df^2 pairs.
    Exactness is preserved whenever no gram actually exceeds the cap.

    ``max_df="auto"`` derives the cap from the corpus itself —
    ``least(max(_AUTO_MAX_DF_FLOOR, _AUTO_MAX_DF_FRAC * n_docs),
    _AUTO_MAX_DF_CEIL)`` — computed
    IN-PLAN (the doc count joins the gram-frequency aggregate as a
    broadcast scalar), so no eager driver action and the same lazy
    DataFrame contract. None disables the guard entirely.

    Plan shape (bounded case): POSTING LISTS, not a self-join. The gram
    relation — the widest data in the pipeline — is computed ONCE and
    crosses exactly two exchanges (the shingle distinct and the
    gram-keyed window/list build, which share one partitioning): the
    per-gram document frequency is a window count over the same
    gram-keyed exchange that builds the posting lists, so the old
    count-then-semi-join prefilter (which recomputed the shingle
    pipeline and shuffled it twice more) disappears. A whole-corpus
    gram costs the window a large sorted group, which WindowExec spills
    to disk — unlike a collect_list aggregation buffer, which is the
    OOM the cap exists to prevent; the capped filter runs BEFORE the
    list build so no posting buffer ever exceeds max_df ids. Pairs
    explode from each capped list in-row (two-level Generate keeps
    per-row memory O(cap), never the flattened cap^2), and sizes derive
    from the compact lists. The finished posting lists are
    lazily localCheckpoint-ed: both downstream consumers (intersection
    counts and the two size-join sides) read the materialized capped
    lists — bounded, far narrower than the raw grams — instead of each
    re-running the gram sort/window/aggregate. max_df=None keeps the
    self-join form: an unbounded posting list would concentrate a
    whole-corpus gram into one aggregation buffer."""
    sh = shingles(df, text_col, id_col, n)
    pair_pred = ((lambda a, b: a < b) if symmetric
                 else (lambda a, b: a != b))
    if max_df is None:
        sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
        left = sh.withColumnRenamed("id", "a")
        if probe_filter is not None:
            left = left.filter(probe_filter(F.col("a")))
        right = sh.withColumnRenamed("id", "b")
        inter = (
            left.join(right, "shingle")
            .filter(pair_pred(F.col("a"), F.col("b")))
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
        return sizes, inter
    by_gram = Window.partitionBy("shingle")
    cnt = sh.withColumn("_df", F.count(F.lit(1)).over(by_gram))
    if max_df == "auto":
        n_docs = df.select(F.count(F.lit(1)).alias("_ndocs"))
        cap = F.least(
            F.greatest(
                F.lit(int(_AUTO_MAX_DF_FLOOR)),
                (F.col("_ndocs")
                 * F.lit(float(_AUTO_MAX_DF_FRAC))).cast("long"),
            ),
            F.lit(int(_AUTO_MAX_DF_CEIL)),
        )
        shf = (cnt.crossJoin(F.broadcast(n_docs))
               .filter(F.col("_df") <= cap)
               .select("id", "shingle"))
    else:
        shf = cnt.filter(F.col("_df") <= max_df).select("id", "shingle")
    # one list per surviving gram; sorted so slice-by-position generates
    # each unordered pair exactly once in the symmetric case
    posts = shf.groupBy("shingle").agg(
        F.array_sort(F.collect_list("id")).alias("ids"))
    posts = posts.localCheckpoint(eager=False)
    sizes = (posts.select(F.explode("ids").alias("id"))
             .groupBy("id").agg(F.count(F.lit(1)).alias("sz")))
    lvl1 = posts.select(F.posexplode("ids").alias("_i", "a"), F.col("ids"))
    if probe_filter is not None:
        # BEFORE the inner explode: only the probe side's neighborhoods
        # pay pair generation (the old plan's filtered-left-side parity)
        lvl1 = lvl1.filter(probe_filter(F.col("a")))
    if symmetric:
        inner = F.slice(F.col("ids"), F.col("_i") + 2, F.size("ids"))
        pairs = lvl1.select("a", F.explode(inner).alias("b"))
    else:
        pairs = (lvl1.select("a", F.explode("ids").alias("b"))
                 .filter(F.col("a") != F.col("b")))
    inter = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("inter"))
    return sizes, inter


def containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.5,
    n: int = 1,
    probe_filter=None,
    max_df: int | str | None = "auto",
) -> DataFrame:
    """ASYMMETRIC near-dup relation: ordered pairs (a, b), a != b, with
    containment C(a in b) = |A∩B| / |A| >= threshold over distinct
    token n-gram sets.

    Jaccard misses subset duplication — a short document quoted whole
    inside a long one scores low Jaccard (union is large) but
    containment 1.0. Training-data pipelines use this for quote /
    excerpt / boilerplate-inclusion detection where symmetric
    similarity under-fires. Same inverted-index plan as jaccard_pairs
    (explode distinct grams, self-equi-join, count intersections) —
    the shuffle is on the gram, never all-pairs — with the left doc's
    set size as the normalizer. ``probe_filter`` bounds the left side
    (the "is this doc contained elsewhere?" probe) at scale. ``max_df``
    defaults to the corpus-derived "auto" cap — see jaccard_pairs.
    """
    sizes, inter = _gram_overlap(
        df, text_col, id_col, n, probe_filter, symmetric=False, max_df=max_df
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "a").withColumnRenamed("sz", "sza"), "a")
        .withColumn(
            "containment", F.col("inter").cast("double") / F.col("sza").cast("double")
        )
        .filter(F.col("containment") >= threshold)
        .select("a", "b", "containment")
    )


# --- MinHash + LSH ------------------------------------------------------
def minhash_signatures(
    sh: DataFrame, num_hashes: int = 8
) -> DataFrame:
    """(id, seed, h): h = min over shingles of md5(seed ':' shingle).

    min() over the hex-string ordering is a valid MinHash family (md5 is
    uniform; prefixing the seed yields k independent permutations) and is
    bit-identical in any engine with md5 — the portability trick that
    lets DuckDB oracle-check a sketch algorithm.
    """
    seeds = F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("seed")
    return (
        sh.select("id", "shingle", seeds)
        .withColumn("hv", F.md5(F.concat_ws(":", F.col("seed"), F.col("shingle"))))
        .groupBy("id", "seed")
        .agg(F.min("hv").alias("h"))
    )


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket_size: int = 1024,
    observation=None,
) -> DataFrame:
    """Near-dup candidates: docs sharing any LSH band bucket (a<b, distinct).

    rows_per_band = num_hashes // bands; bucket key is the concatenation
    of the band's min-hashes in seed order. Only bucket-mates join —
    the shuffle is on (band, bucket), never all-pairs.

    ``max_bucket_size`` caps the quadratic pair expansion: pair
    generation is in-expression combinations over collect_list(id), so a
    degenerate bucket (empty docs, shared boilerplate) with m members
    materializes one m-element row and m^2/2 pairs — at corpus scale a
    single such bucket OOMs its task. Buckets larger than the cap are
    dropped entirely (their members collide on SOME band with near-
    everything — such candidates are noise, and true near-dups of any
    member still surface through its other, selective bands). The
    default (1024, i.e. <= ~0.5M pairs and ~a few hundred KB per bucket
    row) is far above anything a healthy corpus produces, so oracle
    results are unchanged; tighten it for boilerplate-heavy corpora.
    Pass a ``pyspark.sql.Observation`` to get the number of dropped
    buckets measured during the SAME job (no second pass):
    ``obs.get["dropped_buckets"]`` after an action.
    """
    _check_band_config(num_hashes, bands)
    rows_per_band = num_hashes // bands
    sh = shingles(df, text_col, id_col, shingle_n, distinct=False)
    # WIDE signature aggregation: all num_hashes mins in ONE groupBy(id)
    # — the md5s are computed inline per shingle row (no 8x seed
    # explode), partial min combines map-side, and the (id, seed) and
    # (id, band) shuffles of the narrow form collapse into a single id
    # shuffle. Same md5-min family, bit-identical buckets (the narrow
    # per-(id, seed) form lives on in minhash_signatures for the
    # persisted dedup index / oracle parity).
    sig = sh.groupBy("id").agg(
        *[
            F.min(
                F.md5(F.concat_ws(":", F.lit(s), F.col("shingle")))
            ).alias(f"_h{s}")
            for s in range(num_hashes)
        ]
    )
    # ceil-div band count: when num_hashes % bands != 0 the narrow form
    # (band = seed // rows_per_band) emits a remainder band from the
    # leftover seeds — reproduce it exactly or those collisions vanish
    n_bands = -(-num_hashes // rows_per_band)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "|",
                    *[F.col(f"_h{s}")
                      for s in range(b * rows_per_band,
                                     min((b + 1) * rows_per_band, num_hashes))],
                ).alias("bucket"),
            )
            for b in range(n_bands)
        ]
    )
    buckets = sig.select(
        "id", F.explode(band_structs).alias("bb")
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    return pairs_from_buckets(buckets, max_bucket_size, observation)


def pairs_from_buckets(
    buckets: DataFrame,
    max_bucket_size: int = 1024,
    observation=None,
) -> DataFrame:
    """Candidate pairs (a<b, distinct) from (id, band, bucket) rows —
    the pair-expansion half of lsh_candidate_pairs, shared with the
    persisted index path (DedupIndex's bucket table has exactly this
    shape, so incremental ingest and one-shot batch derive pairs
    through the SAME code). See lsh_candidate_pairs for the
    max_bucket_size / observation semantics."""
    # pair generation as ONE pass: group bucket members, emit combinations
    # in-expression (no self-join -> the whole shingle/minhash pipeline
    # executes once, and the shuffle key is (band, bucket))
    members = buckets.groupBy("band", "bucket").agg(
        F.array_sort(F.collect_list("id")).alias("ids")
    )
    if observation is not None:
        # NOTE: when the query's final result is EMPTY, AQE can
        # eliminate the CollectMetrics node entirely and
        # observation.get throws — retrieve through
        # observed_dropped_buckets(), which maps that case to 0.
        members = members.observe(
            observation,
            F.coalesce(
                F.sum(F.when(F.size("ids") > max_bucket_size, 1).otherwise(0)),
                F.lit(0),
            ).alias("dropped_buckets"),  # 0, not NULL, on an empty corpus
        )
    members = members.filter(
        (F.size("ids") > 1) & (F.size("ids") <= max_bucket_size)
    )
    pairs = members.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ids"),
                    lambda x, i: F.transform(
                        F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                        lambda y: F.struct(x.alias("a"), y.alias("b")),
                    ),
                )
            )
        ).alias("p")
    )
    return pairs.select(F.col("p.a").alias("a"), F.col("p.b").alias("b")).distinct()



def observed_dropped_buckets(observation) -> int:
    """The dropped_buckets metric from an lsh_candidate_pairs
    Observation, as an int. Returns 0 when Spark never recorded the
    metric — with an empty final result AQE eliminates the
    CollectMetrics node and Observation.get raises; in that case either
    nothing was dropped, or the whole plan (including any dropped
    bucket) collapsed to empty, where 0 is the useful reading for a
    monitoring counter."""
    try:
        return int(observation.get.get("dropped_buckets") or 0)
    except Exception:  # noqa: BLE001 — metrics node eliminated
        return 0

# --- duplicate clustering (connected components) ------------------------
def cluster_duplicates(
    pairs: DataFrame, max_iters: int = 20, local_threshold: int = 2_000_000,
    local_bytes: int = 64 << 20,
) -> DataFrame:
    """Connected components over near-dup pairs -> (id, cluster_id).

    cluster_id = min id reachable through the pair graph; dedup keeps one
    representative per cluster.

    Size-adaptive: the candidate-pair graph is orders of magnitude
    smaller than the corpus (LSH already reduced 100 TB of text to
    near-dup *pairs*), so when the materialized edge list fits the
    driver (<= ``local_threshold`` edges) a union-find finishes it in
    one pass — O(E α(E)) locally beats O(diameter) rounds of tiny
    distributed jobs. Above the threshold, iterative min-label
    propagation: each round every node adopts the smallest label among
    itself and its neighbors; converges in O(diameter) rounds (near-dup
    clusters are tiny, so a handful). Each iteration is one join + one
    aggregate on a (node, label) frame, and `localCheckpoint` truncates
    the lineage so plans don't grow with iterations.

    The local gate is BOTH edge-count and byte-aware: ``local_threshold``
    edges of 8-byte longs is fine, but the same count of wide string ids
    is hundreds of MB of driver heap, so the measured id payload must
    also fit ``local_bytes`` (raw characters; Python object overhead
    multiplies it a few x). One aggregate decides — same single job the
    count-only gate already paid.
    """
    edges = (
        pairs.select(F.col("a").alias("x"), F.col("b").alias("y"))
        .unionByName(pairs.select(F.col("b").alias("x"), F.col("a").alias("y")))
        .distinct()
        # materialize once: the pair-generation pipeline upstream (e.g.
        # MinHash LSH) must not re-execute on every iteration's join.
        # Lazy: the gate aggregate right below is always the first
        # consumer, so materialization rides that job instead of paying
        # a dedicated one
        .localCheckpoint(eager=False)
    )
    stats = edges.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(
            F.length(F.col("x").cast("string"))
            + F.length(F.col("y").cast("string"))
        ).alias("_b"),
    ).first()
    if stats["_n"] <= local_threshold and (stats["_b"] or 0) <= local_bytes:
        return _cluster_local(edges)
    labels = (
        edges.select(F.col("x").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )
    def propagate(lab):
        neighbor_min = (
            edges.join(lab, edges.y == lab.id)
            .groupBy("x")
            .agg(F.min("label").alias("nmin"))
        )
        return (
            lab.join(neighbor_min, lab.id == neighbor_min.x, "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias(
                    "label"
                ),
            )
            .localCheckpoint(eager=True)
        )

    # two propagation steps per convergence check: the check is a driver
    # round-trip (a full join + count), and label propagation is monotone,
    # so checking at stride 2 halves the job count without overshooting
    for _ in range(max(1, max_iters // 2)):
        stepped = propagate(propagate(labels))
        changed = (
            stepped.alias("u")
            .join(labels.alias("l"), "id")
            .filter(F.col("u.label") != F.col("l.label"))
            .limit(1)
            .count()
        )
        labels = stepped
        if changed == 0:
            break
    else:
        # a component whose diameter exceeds the propagation budget
        # would SILENTLY split one near-dup cluster into several —
        # keep-best would retain multiple copies and leakage_safe_split
        # would let the cluster straddle train/val. Loud beats wrong.
        raise RuntimeError(
            f"cluster_duplicates did not converge within max_iters="
            f"{max_iters} label-propagation rounds (a component's "
            "diameter exceeds the budget); raise max_iters")
    return labels.select(F.col("id"), F.col("label").alias("cluster_id"))


def _cluster_local(edges: DataFrame) -> DataFrame:
    """Driver-side union-find over a materialized (x, y) edge frame.
    Exact same contract as the distributed loop: every node labeled with
    the min id of its component."""
    from pyspark.sql import types as T

    id_type = edges.schema["x"].dataType
    schema = T.StructType(
        [T.StructField("id", id_type), T.StructField("cluster_id", id_type)]
    )
    spark = edges.sparkSession
    parent: dict = {}

    def find(n):
        parent.setdefault(n, n)
        while parent[n] != n:
            parent[n] = parent[parent[n]]
            n = parent[n]
        return n

    # one collect job, not toLocalIterator: the local path is only
    # entered under cluster_duplicates' edge-count AND byte gate, so the
    # materialized list is bounded by construction — while
    # toLocalIterator fetches partition-by-partition as one sequential
    # Spark job EACH (32 driver round-trips of scheduling latency for a
    # frame the gate already proved driver-sized)
    for r in edges.collect():
        ra, rb = find(r[0]), find(r[1])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    rows = [(n, find(n)) for n in list(parent)]
    return spark.createDataFrame(rows, schema)


def dedup_by_clusters(df: DataFrame, pairs: DataFrame, id_col: str) -> DataFrame:
    """Drop all but the min-id representative of every near-dup cluster."""
    clusters = cluster_duplicates(pairs)
    losers = clusters.filter(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


def exact_span_contamination(
    df: DataFrame,
    probes: DataFrame,
    id_col: str,
    text_col: str,
    probe_id_col: str,
    probe_col: str,
    anchor_n: int = 3,
) -> DataFrame:
    """(doc, probe) pairs where the document's token sequence contains
    the probe's FULL token sequence — exact-match decontamination (the
    GPT-3-style hygiene pass: remove training docs that contain an eval
    example verbatim), as opposed to the any-shared-n-gram heuristic
    (``q68``-style), which over-flags on one colliding gram.

    Plan shape: never a contains() cross-join (O(corpus x probes) at
    100 TB). The probe's first ``anchor_n`` tokens form an ANCHOR gram;
    the corpus' distinct anchor_n-gram inverted index equi-joins against
    the (small, broadcastable) anchor set to produce candidates, and
    only candidates run the boundary-guarded substring confirm on
    normalized text. The anchor filter is lossless: a doc containing
    the probe's token sequence necessarily contains its first
    ``anchor_n`` tokens as one consecutive gram. Probes shorter than
    ``anchor_n`` tokens are dropped (they cannot anchor; eval spans
    are longer in practice)."""
    from synch_spark.operators.text import tokens

    ptoks = tokens(probe_col)
    probe_tbl = probes.filter(F.size(ptoks) >= anchor_n).select(
        F.col(probe_id_col).alias("_pid"),
        F.concat_ws(" ", ptoks).alias("_pnorm"),
        F.concat_ws(" ", F.slice(ptoks, 1, anchor_n)).alias("_anchor"),
    )
    index = shingles(df, text_col, id_col, n=anchor_n)  # (id, shingle)
    cands = index.join(
        F.broadcast(probe_tbl), index.shingle == probe_tbl._anchor
    ).select("id", "_pid", "_pnorm")
    norm = df.select(
        F.col(id_col).alias("id"),
        F.concat_ws(" ", tokens(text_col)).alias("_norm"),
    )
    return (
        cands.join(norm, "id")
        .filter(
            F.contains(
                F.concat(F.lit(" "), F.col("_norm"), F.lit(" ")),
                F.concat(F.lit(" "), F.col("_pnorm"), F.lit(" ")),
            )
        )
        .select(F.col("id").alias(id_col), F.col("_pid").alias(probe_id_col))
    )


def keep_best_representative(
    df: DataFrame, pairs: DataFrame, id_col: str, score_col: str
) -> DataFrame:
    """Quality-aware near-dup collapse: connected components over the
    candidate pairs, then keep exactly ONE row per cluster — the highest
    ``score_col`` (ties: lowest id) — annotated with ``cluster_id`` and
    ``cluster_size``. Rows outside every pair survive as their own
    singleton cluster.

    This is the keep-best half of the standard web-corpus recipe
    (RefinedWeb/FineWeb): when near-dups collapse, DROP the low-quality
    copies and keep the best one — ``dedup_by_clusters`` keeps an
    arbitrary (min-id) copy instead, which throws away quality signal.

    Scale shape: ``cluster_duplicates`` is O(pairs), orders of magnitude
    smaller than the corpus; the label join's right side holds only docs
    that appear in a pair (broadcastable in practice); ranking windows
    partition by cluster_id — no global sort, no single-partition
    window."""
    from pyspark.sql import Window as W

    labels = cluster_duplicates(pairs).withColumnRenamed("id", id_col)
    labeled = df.join(labels, id_col, "left").withColumn(
        "cluster_id", F.coalesce(F.col("cluster_id"), F.col(id_col))
    )
    by_cluster = W.partitionBy("cluster_id")
    return (
        labeled
        .withColumn("cluster_size",
                    F.count(F.lit(1)).over(by_cluster).cast("long"))
        .withColumn("_rn", F.row_number().over(
            by_cluster.orderBy(F.col(score_col).desc(), F.col(id_col))))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# --- SimHash ------------------------------------------------------------
def simhash16(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """16-bit SimHash per document from distinct-token md5 prefixes.

    Token weight vector: for bit j, sum(+1 if bit set else -1) over
    tokens; signature bit j = (sum >= 0). The 4-hex-char prefix of
    md5(token) supplies the 16 bits via arithmetic only (strpos on a hex
    alphabet), keeping the whole operator portable SQL.
    """
    tok = (
        df.select(F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("t"))
        .filter(F.col("t") != "")
        .distinct()
        .withColumn("hx", F.substring(F.md5("t"), 1, 4))
    )
    # hex prefix -> 16-bit int (conv is JVM-side; the DuckDB oracle uses
    # strpos-on-alphabet arithmetic — same value)
    tok = tok.withColumn("v", F.conv("hx", 16, 10).cast("long"))
    agg = [
        F.sum(
            F.when((F.floor(F.col("v") / (2**j)) % 2) == 1, 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(16)
    ]
    sums = tok.groupBy("id").agg(*agg)
    sig = None
    for j in range(16):
        bit = F.when(F.col(f"b{j}") >= 0, F.lit(2**j)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return sums.select("id", sig.cast("long").alias("simhash"))


def simhash_near_pairs(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= max_hamming.

    Blocking: split the 16-bit signature into FOUR 4-bit nibbles — by
    pigeonhole, any pair within hamming<=3 agrees exactly on at least one
    nibble (3 differing bits can spoil at most 3 of 4 blocks). Equi-join
    per (block index, nibble value), then exact popcount filter. Two
    8-bit halves would only guarantee recall for hamming<=1.
    """
    sig = simhash16(df, text_col, id_col)
    blocks = sig.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("blk"),
                        (F.floor(F.col("simhash") / (16**j)) % 16).cast("int").alias("val"),
                    )
                    for j in range(4)
                ]
            )
        ).alias("b"),
    ).select("id", "simhash", F.col("b.blk").alias("blk"), F.col("b.val").alias("val"))
    a = blocks.select(F.col("id").alias("a"), F.col("simhash").alias("sa"), "blk", "val")
    b = blocks.select(F.col("id").alias("b"), F.col("simhash").alias("sb"), "blk", "val")
    cand = (
        a.join(b, ["blk", "val"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "sa", "sb")
        .distinct()
    )
    xor = F.expr("int(sa) ^ int(sb)")
    ham = sum(F.floor(xor / (2**j)) % 2 for j in range(16))
    return cand.withColumn("hamming", ham.cast("int")).filter(
        F.col("hamming") <= max_hamming
    ).select("a", "b", "hamming")


# --- content-hash train/val split + cluster-aware repair ----------------
def content_split(
    key,
    train_frac_sixteenths: int = 12,
):
    """The canonical split assignment: first md5 nibble of ``key`` (a
    Column), train when < ``train_frac_sixteenths`` (12 = 75%). ONE
    definition shared by the per-doc split (q65), the leakage audit
    (q96), and the cluster-aware repair below — de-synchronizing the
    audit from the split it audits must be impossible."""
    d = F.conv(F.substring(F.md5(key), 1, 1), 16, 10).cast("long")
    return F.when(d < train_frac_sixteenths, F.lit("train")).otherwise(
        F.lit("val")
    )


def leakage_safe_split(
    df: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    train_frac_sixteenths: int = 12,
) -> DataFrame:
    """Assign train/val BY DUPLICATE CLUSTER, not by document: every
    member of a near-dup cluster hashes through ONE shared text — the
    member text with the smallest md5 (a CONTENT-level representative)
    — so no cluster, and therefore no near-dup pair the clustering
    knows about, can straddle the split. This is the repair for the
    leakage a per-document content-hash split exhibits on near
    duplicates (different bytes, same content; measured by the
    q96_split_leakage audit).

    ``clusters`` is cluster_duplicates() output: (id, cluster_id) for
    documents that HAVE near-dup partners. Singletons (absent there)
    hash their OWN text — bit-identical to the plain content-hash
    split, so repairing leakage never reshuffles untouched documents.

    Why a content-level key rather than the min-ID member's text: the
    key exists as long as ANY member's text is in ``df`` (an id-keyed
    representative silently degraded every member to per-doc hashing
    when the representative row was absent), and an exact duplicate of
    the min-md5 member that the cluster map missed still co-locates
    (identical text, identical key). RESIDUAL LEAK, by construction:
    with an incomplete cluster map (e.g. sampled pairs), an unmapped
    exact/near duplicate of a NON-minimal member hashes its own text
    while the member hashes the cluster key — such a pair can still
    straddle the split. Complete maps (exact dups always LSH-collide)
    don't exhibit it.

    Plan shape: the cluster-key build is one join of the (tiny relative
    to the corpus) cluster map against the corpus plus a per-cluster
    min; then one left join back and a map-side hash; the joins
    broadcast while the cluster map is small and degrade to
    key-partitioned joins at scale.
    """
    member_texts = clusters.select(
        F.col("id").alias(id_col), F.col("cluster_id")
    ).join(df.select(id_col, text_col), id_col)
    ckeys = (
        member_texts.groupBy("cluster_id")
        .agg(
            F.min(
                F.struct(
                    F.md5(F.col(text_col)).alias("h"), F.col(text_col).alias("t")
                )
            ).alias("_m")
        )
        .select("cluster_id", F.col("_m.t").alias("_rep_text"))
    )
    cl = clusters.select(F.col("id").alias(id_col), "cluster_id").join(
        ckeys, "cluster_id"
    )
    key = F.coalesce(F.col("_rep_text"), F.col(text_col))
    return (
        df.join(cl.select(id_col, "_rep_text"), id_col, "left")
        .withColumn("split", content_split(key, train_frac_sixteenths))
        .drop("_rep_text")
    )
