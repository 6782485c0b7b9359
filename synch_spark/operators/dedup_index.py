"""Persistent MinHash/LSH dedup index for incremental ingest.

The 100 TB workflow: you don't re-shingle the corpus per batch — you
materialize each document's MinHash signature and LSH band buckets ONCE
into index tables, then every incoming batch (a) checks itself against
the index via a bucket equi-join, (b) optionally refines candidates by
signature agreement (estimated Jaccard) WITHOUT touching any document
text, and (c) appends its own signatures+buckets. Bucket keys are the
shuffle/join key; the bucket table is partitioned by band for pruning.

Layout under ``root``:
- ``buckets/``     (id long, band int, bucket string)  partitioned by band
- ``signatures/``  (id long, seed int, h string)

The signature store is what amortizes the expensive part: shingling +
k×md5 per shingle happens exactly once per document, at ingest; every
later rescoring (candidate refinement, cluster audits) is a join on the
16-bytes-per-row signature table (PERF.md "persisted signature" lever).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from synch_spark.operators.dedup import _check_band_config, shingles
from synch_spark.sources.table import ParquetTable


def build_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, seed, h) MinHash signature rows — the once-per-document
    computation everything else derives from.

    Computed in the WIDE one-shuffle form (all k mins in one
    groupBy(id), md5s inline per shingle row, partial min map-side) and
    unpivoted to the narrow storage rows — bit-identical to the
    per-(id, seed) family in minhash_signatures, without the k× row
    explosion through the shuffle."""
    sh = shingles(df, text_col, id_col, shingle_n, distinct=False)
    wide = sh.groupBy("id").agg(*[
        F.min(
            F.md5(F.concat_ws(":", F.lit(s), F.col("shingle")))
        ).alias(f"_h{s}")
        for s in range(num_hashes)
    ])
    rows = F.array(*[
        F.struct(F.lit(s).cast("int").alias("seed"),
                 F.col(f"_h{s}").alias("h"))
        for s in range(num_hashes)
    ])
    return wide.select("id", F.explode(rows).alias("_p")).select(
        "id", F.col("_p.seed").alias("seed"), F.col("_p.h").alias("h"))


def n_band_ids(num_hashes: int = 8, bands: int = 4) -> int:
    """ACTUAL band-id domain of buckets_of_signatures. band =
    seed // rows_per_band with rows_per_band = num_hashes // bands, so
    the domain is ceil(num_hashes / rows_per_band) — which EXCEEDS
    ``bands`` whenever bands does not divide num_hashes (10 hashes / 4
    bands -> ids 0..4). Every consumer that enumerates a doc's bucket
    rows (delete expansion) must use this, not ``bands``, or removed
    docs leave live rows in the trailing band."""
    _check_band_config(num_hashes, bands)
    rows_per_band = num_hashes // bands
    return (num_hashes + rows_per_band - 1) // rows_per_band


def buckets_of_signatures(
    sig: DataFrame, num_hashes: int = 8, bands: int = 4
) -> DataFrame:
    """(id, band, bucket) LSH rows derived from signature rows — pure
    column algebra, no text access."""
    _check_band_config(num_hashes, bands)
    rows_per_band = num_hashes // bands
    return (
        sig.withColumn("band", (F.col("seed") / rows_per_band).cast("int"))
        .groupBy("id", "band")
        .agg(
            F.concat_ws(
                "|",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seed", "h"))), lambda x: x["h"]
                ),
            ).alias("bucket")
        )
    )


def build_buckets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, band, bucket) rows straight from text (one-shot path)."""
    sig = build_signatures(df, text_col, id_col, num_hashes, shingle_n)
    return buckets_of_signatures(sig, num_hashes, bands)


class DedupIndex:
    """LSH index over a document corpus, stored as ParquetTables."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        num_hashes: int = 8,
        bands: int = 4,
        shingle_n: int = 3,
    ):
        _check_band_config(num_hashes, bands)
        self.spark = spark
        self.table = ParquetTable(spark, f"{root}/buckets")
        self.signatures = ParquetTable(spark, f"{root}/signatures")
        self.num_hashes = num_hashes
        self.bands = bands
        self.shingle_n = shingle_n
        # pre-signature-store indexes kept bucket rows directly under
        # ``root``; silently ignoring one would re-admit every indexed
        # duplicate (check() sees an empty index). It cannot be migrated
        # in place — the old layout has no signature rows to carry over —
        # so fail loudly and ask for a rebuild.
        if not self.table.exists and ParquetTable(spark, root).exists:
            raise ValueError(
                f"DedupIndex at {root!r} uses the old single-table layout "
                "(bucket versions directly under the root). Rebuild it with "
                ".build(corpus) — the new layout adds a signature store the "
                "old one never wrote, so an in-place migration isn't possible."
            )

    def _sig(self, df: DataFrame, text_col: str, id_col: str) -> DataFrame:
        return build_signatures(
            df, text_col, id_col, self.num_hashes, self.shingle_n
        )

    def _meta_path(self) -> str:
        import os

        return os.path.normpath(
            os.path.join(self.table.root, os.pardir, "_index_meta.json"))

    def _check_meta(self, write: bool = False) -> None:
        """Persist/validate the LSH parameters against the stored
        tables: an index built with num_hashes=16 reopened with the
        default 8 computes bucket keys that NEVER match the stored ones
        — every duplicate silently admitted, deletes expanded over the
        wrong seed/band domains. Loud beats silently-disabled dedup."""
        import json as _json
        import os

        mine = {"num_hashes": self.num_hashes, "bands": self.bands,
                "shingle_n": self.shingle_n}
        path = self._meta_path()
        if os.path.exists(path):
            with open(path) as f:
                stored = _json.load(f)
            if stored != mine:
                raise ValueError(
                    f"DedupIndex parameter mismatch at {path}: stored "
                    f"{stored}, this instance {mine} — reopen with the "
                    "stored parameters or rebuild the index")
        elif write:
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = f"{path}.tmp"
            with open(tmp, "w") as f:
                _json.dump(mine, f)
            os.replace(tmp, path)

    def _write(self, sig: DataFrame, overwrite: bool,
               all_ids: DataFrame | None = None) -> None:
        """Persist a batch's signatures and the buckets derived from them.
        ``sig`` is cached for the duration so the shingle/md5 pipeline
        runs exactly once per document (the two writes share one
        computation), keeping both tables derivation-consistent.

        ``all_ids`` (the batch's full id set): ids with NO signature
        rows — text shorter than shingle_n, or NULL — get a presence
        MARKER row (seed=-1, h=null) so ingest's at-least-once
        idempotency covers them (they never make bucket rows, so the
        bucket table can't witness them).

        Write order is buckets FIRST: ingest's known-set derives from
        the signature store, so a crash between the two commits makes
        the redelivery re-admit the batch and re-append bucket rows —
        duplicate bucket rows only degrade to duplicate candidate pairs
        (check() distincts them); the signatures-first order would
        instead SKIP the redelivery and leave the docs unbucketed, a
        silent permanent dedup miss."""
        self._check_meta(write=True)
        sig = sig.persist()
        try:
            if all_ids is not None:
                markers = (all_ids.select(F.col("id"))
                           .join(sig.select("id").distinct(), "id",
                                 "left_anti")
                           .select("id",
                                   F.lit(-1).cast("int").alias("seed"),
                                   F.lit(None).cast("string").alias("h")))
                sig_out = sig.unionByName(markers)
            else:
                sig_out = sig
            buckets = buckets_of_signatures(sig, self.num_hashes, self.bands)
            if overwrite:
                self.table.overwrite(buckets, partition_by="band")
                self.signatures.overwrite(sig_out)
            else:
                self.table.append(buckets, partition_by="band")
                self.signatures.append(sig_out)
        finally:
            sig.unpersist()

    def build(self, df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> None:
        """(Re)build the index from a full corpus — buckets partitioned by
        band so per-band joins prune to 1/bands of the index."""
        self._write(self._sig(df, text_col, id_col), overwrite=True,
                    all_ids=df.select(F.col(id_col).alias("id")))

    def add(self, df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> None:
        """Append a new batch's signatures+buckets (call after admitting)."""
        self._write(self._sig(df, text_col, id_col), overwrite=False,
                    all_ids=df.select(F.col(id_col).alias("id")))

    def remove(self, ids: DataFrame, id_col: str = "doc_id") -> None:
        """Un-index documents by id (retractions, takedowns, CDC
        deletes): drop their rows from BOTH stores. A doc's rows are
        enumerable without reading anything — (id × seeds) in the
        signature store, (id × bands) in the bucket store — so the
        deletes expand deterministically and the CDC merge machinery
        rewrites only the files whose stats intersect the ids."""
        feed = ids.select(F.col(id_col),
                          F.lit("delete").alias("_change_type"))
        self.apply_changes(feed, text_col=None, id_col=id_col)

    def apply_changes(self, feed: DataFrame, text_col: str | None = "text",
                      id_col: str = "doc_id") -> None:
        """Apply a table change feed (``ParquetTable.changes`` rows with
        ``_change_type``) to the index: postimages re-shingle and
        replace their (id, seed)/(id, band) rows, deletes drop them.
        One merge commit per store; each apply is an idempotent pk
        merge, so at-least-once replay converges (sync_from relies on
        this — a crash between the two commits or before the cursor
        write just re-applies)."""
        from synch_spark.config import Engine, TableSpec
        from synch_spark.operators.cdc_apply import apply_cdc_batch

        if feed.isEmpty():
            return  # a no-change feed must not trigger a fallback rewrite
        self._check_meta()
        # materialize ONCE: a sync_from feed is a full-outer change-feed
        # diff join, otherwise re-executed for the postimage signatures
        # and both stores' delete sides
        feed = feed.localCheckpoint(eager=True)
        if "_commit_version" in feed.columns:
            # per-commit feeds can carry a delete AND a later re-insert
            # for one id; the synthesized merge events tie on their
            # stamps, so collapse to the LATEST change per id first.
            # WITHIN one commit a delete and an insert can also coexist
            # (key migration): rank the surviving row deterministically
            # — the insert/postimage wins, matching the table's end
            # state, never shuffle order
            from pyspark.sql import Window

            rank = F.when(
                F.col("_change_type").isin("insert", "update_postimage"),
                1).otherwise(0)
            w = Window.partitionBy(id_col).orderBy(
                F.col("_commit_version").desc(), rank.desc())
            feed = (feed.filter(F.col("_change_type") != "update_preimage")
                    .withColumn("_rn", F.row_number().over(w))
                    .filter(F.col("_rn") == 1).drop("_rn", "_commit_version"))
        posts = feed.filter(
            F.col("_change_type").isin("insert", "update_postimage"))
        # REPLACE semantics need delete events for EVERY changed id, not
        # just explicit deletes: a postimage whose new text yields no
        # shingles (shorter than shingle_n, or NULL) produces ZERO new
        # signature/bucket rows, and without the paired deletes its OLD
        # rows would stay live forever — the index would keep matching
        # text that no longer exists. Inserts outrank the paired deletes
        # via action_seq below, so (id, seed) keys with a new row are a
        # replace and keys without one are a removal.
        dels = feed.filter(F.col("_change_type").isin(
            "delete", "insert", "update_postimage")).select(
            F.col(id_col).alias("id")).distinct()
        sig_ins = (self._sig(posts, text_col, id_col)
                   if text_col is not None else None)
        # seed -1 is the presence MARKER row a shingle-less admitted doc
        # carries in the signature store (see _write) — the delete
        # expansion must cover it or a removed short doc stays "known"
        # to ingest forever
        seeds = self.spark.range(-1, self.num_hashes).select(
            F.col("id").cast("int").alias("seed"))
        # the TRUE band-id domain, not self.bands: with a non-divisible
        # config (10 hashes / 4 bands) buckets_of_signatures emits band
        # ids 0..4, and a delete expanded over 0..3 would leave the
        # trailing band's row live — a removed doc would keep
        # suppressing its near-dups forever
        bands = self.spark.range(
            n_band_ids(self.num_hashes, self.bands)
        ).select(F.col("id").cast("int").alias("band"))

        def _events(ins, del_expanded, cols):
            parts = []
            if ins is not None:
                parts.append(ins.select(F.lit("insert").alias("action"), *cols))
            parts.append(del_expanded.select(
                F.lit("delete").alias("action"), *cols))
            # deletes take action_seq 0, inserts 1: last-wins resolves
            # the paired delete+insert per key as a REPLACE — and a
            # caller-built feed carrying both a delete and an insert for
            # one id resolves deterministically instead of by shuffle
            # order
            ev = parts[0]
            for p in parts[1:]:
                ev = ev.unionByName(p)
            return (ev.withColumn("event_unixtime", F.lit(0).cast("long"))
                      .withColumn(
                          "action_seq",
                          F.when(F.col("action") == "insert", 1).otherwise(0))
                      .withColumn("schema", F.lit("_idx"))
                      .withColumn("table", F.lit("dedup")))

        if sig_ins is not None:
            sig_ins = sig_ins.persist()
        try:
            sig_del = dels.crossJoin(F.broadcast(seeds)).withColumn(
                "h", F.lit(None).cast("string"))
            spec_sig = TableSpec(schema="_idx", table="signatures",
                                 pk=("id", "seed"),
                                 engine=Engine.REPLACING_MERGE_TREE)
            apply_cdc_batch(self.signatures,
                            _events(sig_ins, sig_del, ["id", "seed", "h"]),
                            spec_sig, value_columns=["id", "seed", "h"])
            buck_ins = (buckets_of_signatures(sig_ins, self.num_hashes,
                                              self.bands)
                        if sig_ins is not None else None)
            buck_del = dels.crossJoin(F.broadcast(bands)).withColumn(
                "bucket", F.lit(None).cast("string"))
            buck_cols = ["id", "band", "bucket"]
            if buck_ins is not None:
                buck_ins = buck_ins.select(*buck_cols)
            spec_buck = TableSpec(schema="_idx", table="buckets",
                                  pk=("id", "band"),
                                  engine=Engine.REPLACING_MERGE_TREE,
                                  partition_by="band")
            apply_cdc_batch(self.table, _events(buck_ins, buck_del, buck_cols),
                            spec_buck, value_columns=buck_cols)
        finally:
            if sig_ins is not None:
                sig_ins.unpersist()

    def sync_from(self, source_table, pk="doc_id",
                  text_col: str = "text", id_col: str = "doc_id") -> int:
        """Keep the index caught up with a CDC-maintained document table
        by consuming its change feed — O(changed files) per sync,
        cursor checkpointed after the apply (idempotent merges make
        replay safe). Lagging past the source's retention window falls
        back to a full build(). ``pk`` may be a composite-key
        tuple/list (the source table's merge key, threaded into
        ``changes()``); the index stays keyed on ``id_col``, which must
        remain unique per row. A sync that died inside its mutation
        window (the run_guarded_sync pending marker — e.g. between the
        signature and bucket commits, or after them but before the
        cursor write) forces a FULL REBUILD: the netted endpoint feed
        cannot heal half-applied state once the source reverted."""
        import os

        from synch_spark.operators.index_sync import run_guarded_sync

        path = os.path.normpath(
            os.path.join(self.table.root, os.pardir, "_feed_cursor.json"))

        def build():
            self.build(source_table.read(), text_col=text_col,
                       id_col=id_col)

        def apply(last, cur):
            feed = source_table.changes(last, cur, pk=pk)
            self.apply_changes(feed, text_col=text_col, id_col=id_col)

        return run_guarded_sync(
            path, source_table.current_version(), build, apply)

    def estimate_jaccard(self, pairs: DataFrame, extra_sig: DataFrame | None = None) -> DataFrame:
        """(new_id, dup_of, est_jaccard) from signature agreement: the
        fraction of the k minhashes two documents share is an unbiased
        estimate of their shingle-set Jaccard. Reads ONLY the signature
        store (plus ``extra_sig`` rows for ids not yet indexed) — no
        shingling, no text. One shuffle keyed on id."""
        sig = (self.signatures.read().filter(F.col("seed") >= 0)
               if self.signatures.exists else None)
        if extra_sig is not None:
            if sig is None:
                sig = extra_sig
            else:
                # batch signatures WIN over stored ones for overlapping
                # ids: a checked batch may re-submit an indexed id with
                # changed text, and a plain union would keep BOTH h
                # values per (id, seed) — the avg then runs over mixed
                # old/new rows and the estimate drifts nondeterministically
                stored = sig.join(extra_sig.select("id").distinct(),
                                  "id", "left_anti")
                sig = stored.unionByName(extra_sig)
        if sig is None:
            raise ValueError(
                "estimate_jaccard: no signatures available — the index was "
                "never built (signature store is empty) and no extra_sig "
                "rows were passed; call build()/add() first or supply "
                "extra_sig for the ids in `pairs`."
            )
        a = sig.select(F.col("id").alias("new_id"), "seed", F.col("h").alias("_ha"))
        b = sig.select(F.col("id").alias("dup_of"), "seed", F.col("h").alias("_hb"))
        return (
            pairs.join(a, "new_id")
            .join(b, ["dup_of", "seed"])
            .groupBy("new_id", "dup_of")
            .agg(
                F.avg((F.col("_ha") == F.col("_hb")).cast("double")).alias(
                    "est_jaccard"
                )
            )
        )

    def check(
        self,
        df: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        min_est_jaccard: float | None = None,
        max_bucket_size: int = 1024,
    ) -> DataFrame:
        """Near-dup candidates of the incoming batch against the index AND
        within the batch itself: (new_id, dup_of). dup_of < new_id for
        in-batch pairs; index matches return the indexed id. With
        ``min_est_jaccard`` set, LSH candidates are refined by signature
        agreement and the output carries an ``est_jaccard`` column —
        banding gives recall, the rescore restores precision.

        ``max_bucket_size`` caps the quadratic hot-bucket blowup exactly
        like lsh_candidate_pairs: a degenerate bucket (boilerplate,
        empty docs) that accumulated 10^6 members in the persisted index
        would otherwise fan the join out m x 10^6 per batch. Buckets
        above the cap — on the index side or in the batch — are dropped
        from candidate generation (their members collide with
        near-everything; true near-dups still surface via their other,
        selective bands — the lsh_candidate_pairs contract)."""
        self._check_meta()
        # eager checkpoint: the batch signature pipeline (shingle + k*md5)
        # runs once, and every derived plan reads the materialized blocks
        sig = self._sig(df, text_col, id_col).localCheckpoint(eager=True)
        incoming = buckets_of_signatures(sig, self.num_hashes, self.bands)
        hot_batch = (incoming.groupBy("band", "bucket").count()
                     .filter(F.col("count") > max_bucket_size)
                     .select("band", "bucket"))
        incoming = incoming.join(hot_batch, ["band", "bucket"], "left_anti")
        index = self.table.read() if self.table.exists else None
        vs_index = None
        if index is not None:
            # count only the buckets the batch actually touches (semi-
            # join prunes the index scan to relevant (band, bucket)s)
            relevant = index.join(
                incoming.select("band", "bucket").distinct(),
                ["band", "bucket"], "left_semi")
            hot_idx = (relevant.groupBy("band", "bucket").count()
                       .filter(F.col("count") > max_bucket_size)
                       .select("band", "bucket"))
            vs_index = (
                incoming.join(
                    relevant.join(hot_idx, ["band", "bucket"], "left_anti")
                    .withColumnRenamed("id", "dup_of"), ["band", "bucket"]
                )
                .filter(F.col("id") != F.col("dup_of"))
                .select(F.col("id").alias("new_id"), "dup_of")
            )
        a = incoming.select(F.col("id").alias("new_id"), "band", "bucket")
        b = incoming.select(F.col("id").alias("dup_of"), "band", "bucket")
        in_batch = (
            a.join(b, ["band", "bucket"])
            .filter(F.col("dup_of") < F.col("new_id"))
            .select("new_id", "dup_of")
        )
        out = in_batch if vs_index is None else in_batch.unionByName(vs_index)
        out = out.distinct()
        if min_est_jaccard is not None:
            out = self.estimate_jaccard(out, extra_sig=sig).filter(
                F.col("est_jaccard") >= min_est_jaccard
            )
        return out

    def ingest(
        self, df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
    ) -> DataFrame:
        """Filter the batch to docs with NO near-dup (in index or batch,
        keeping the lowest id of each in-batch group) and whose id is not
        already indexed (re-delivery is a no-op, not a re-admit — the
        at-least-once ingest case), then index the survivors. Returns the
        admitted rows."""
        fresh = df
        if self.signatures.exists:
            # the SIGNATURE store is the presence witness: shingle-less
            # docs never make bucket rows, but _write gives every
            # admitted id at least a marker row here — so at-least-once
            # redelivery is a no-op for them too
            known = self.signatures.read().select(
                F.col("id").alias(id_col)).distinct()
            fresh = df.join(known, id_col, "left_anti")
        dups = self.check(fresh, text_col, id_col).select(
            F.col("new_id").alias(id_col)
        ).distinct()
        # materialize BEFORE appending: the admitted plan reads the index
        # tables that add() is about to mutate, and a lazy return would
        # re-execute against the post-write state (read-after-write
        # hazard — partial shuffle reuse can even mix both versions)
        admitted = fresh.join(dups, id_col, "left_anti").localCheckpoint(eager=True)
        self.add(admitted, text_col, id_col)
        return admitted
