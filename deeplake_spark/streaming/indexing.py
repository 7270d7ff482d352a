"""Streaming index maintenance — keep persisted side-table indexes
fresh from a live document stream (beyond-reference: the reference
rebuilds/refreshes indexes on batch commits only; a live ingestion
path wants the index to trail the stream by one micro-batch).

Shape: `foreachBatch` + the SAME delta-append path batch commits use
(`InvertedIndex.append_to` — new posting/doclen files next to the old
ones, union-on-read, prior files untouched). Each micro-batch is one
bounded batch index build over just the new rows, so maintenance work
is O(new data) per trigger — identical to the batch incremental-
refresh guarantee, delivered continuously. Exactly-once: the
streaming query's checkpoint makes each micro-batch's append happen
once per epoch id on restart-replay (parquet appends of the same
epoch are idempotent at the query level because Spark re-runs only
uncommitted epochs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def maintain_inverted_index(stream_df: DataFrame, index_path: str,
                            text_col: str = "text",
                            id_col: str = "doc_id",
                            checkpoint_dir: str | None = None):
    """Start a streaming query that appends an inverted-index delta for
    every micro-batch of new documents. Returns the StreamingQuery;
    probe the index between triggers with `InvertedIndex.load` (stats
    rows accumulate one per delta and merge on load).
    """
    from deeplake_spark.operators.indexes import build_inverted_index

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        # isEmpty() probes partitions lazily (stops at the first
        # non-empty one) — cheaper than head(1)'s collect-limit job
        # on every trigger.
        if batch_df.isEmpty():
            return
        idx = build_inverted_index(batch_df, text_col=text_col,
                                   id_col=id_col)
        idx.append_to(index_path)

    writer = stream_df.writeStream.foreachBatch(sink).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
