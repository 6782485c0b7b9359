"""Persistent MinHash/LSH dedup index for incremental ingest.

The 100 TB workflow: you don't re-shingle the corpus per batch — you
materialize each document's LSH band buckets ONCE into an index table,
then every incoming batch (a) checks itself against the index via a
bucket equi-join and (b) appends its own buckets. Bucket keys are the
shuffle/join key; the index is partitionable by band for pruning.

Index schema: (id long, band int, bucket string).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from synch_spark.operators.dedup import minhash_signatures, shingles
from synch_spark.sources.table import ParquetTable


def build_buckets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, band, bucket) rows for every document — the index payload."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(shingles(df, text_col, id_col, shingle_n), num_hashes)
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


class DedupIndex:
    """LSH index over a document corpus, stored as a ParquetTable."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        num_hashes: int = 8,
        bands: int = 4,
        shingle_n: int = 3,
    ):
        self.spark = spark
        self.table = ParquetTable(spark, root)
        self.num_hashes = num_hashes
        self.bands = bands
        self.shingle_n = shingle_n

    def _buckets(self, df: DataFrame, text_col: str, id_col: str) -> DataFrame:
        return build_buckets(
            df, text_col, id_col, self.num_hashes, self.bands, self.shingle_n
        )

    def build(self, df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> None:
        """(Re)build the index from a full corpus — partitioned by band so
        per-band joins prune to 1/bands of the index."""
        self.table.overwrite(self._buckets(df, text_col, id_col), partition_by="band")

    def add(self, df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> None:
        """Append a new batch's buckets (call after admitting the batch)."""
        self.table.append(self._buckets(df, text_col, id_col), partition_by="band")

    def check(
        self, df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
    ) -> DataFrame:
        """Near-dup candidates of the incoming batch against the index AND
        within the batch itself: (new_id, dup_of). dup_of < new_id for
        in-batch pairs; index matches return the indexed id."""
        incoming = self._buckets(df, text_col, id_col).persist()
        try:
            index = self.table.read() if self.table.exists else None
            vs_index = None
            if index is not None:
                vs_index = (
                    incoming.join(
                        index.withColumnRenamed("id", "dup_of"), ["band", "bucket"]
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
            return out.distinct()
        finally:
            incoming.unpersist()

    def ingest(
        self, df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
    ) -> DataFrame:
        """Filter the batch to docs with NO near-dup (in index or batch,
        keeping the lowest id of each in-batch group) and whose id is not
        already indexed (re-delivery is a no-op, not a re-admit — the
        at-least-once ingest case), then index the survivors. Returns the
        admitted rows."""
        fresh = df
        if self.table.exists:
            known = self.table.read().select(F.col("id").alias(id_col)).distinct()
            fresh = df.join(known, id_col, "left_anti")
        dups = self.check(fresh, text_col, id_col).select(
            F.col("new_id").alias(id_col)
        ).distinct()
        admitted = fresh.join(dups, id_col, "left_anti")
        self.add(admitted, text_col, id_col)
        return admitted
