package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining: documents are laid out in doc_id
  * order into one token stream, and each document is assigned the global
  * offset where it starts plus the context-window bin containing that
  * offset (concat-and-chunk packing — documents may straddle a bin
  * boundary, exactly as a GPT-style loader packs samples; bins are
  * `capacity` tokens wide).
  *
  * Scale shape: a naive global `Window.orderBy(doc_id)` cumsum collapses
  * to ONE partition — unrunnable on 10^10 docs. This runs the classic
  * distributed prefix sum instead: range-partition by doc_id, local
  * cumsum per partition (keyed window), then add per-partition prefix
  * offsets computed from the (numPartitions-sized, driver-collected)
  * partition totals — one pass over the data plus a bounded driver
  * aggregate, the same economics as collecting AQE statistics.
  *
  * Output is independent of the partitioning actually chosen: each doc's
  * offset is the token count of all lower-doc_id docs, whatever partition
  * boundaries the range sampler picked — so a plain window-cumsum SQL
  * oracle reproduces it exactly. */
object Packing {

  /** (doc_id, n_tokens, offset, bin) per document; `tokenCount` is the
    * per-doc token count column (computed from `text` by default). */
  def packOffsets(docs: DataFrame, capacity: Long,
      tokenCount: Column = size(split(col("text"), " ")).cast("long")): DataFrame = {
    require(capacity > 0, "bin capacity must be positive")
    val spark = docs.sparkSession
    val sized = docs.select(col("doc_id"), tokenCount.as("n_tokens"))
      .repartitionByRange(col("doc_id"))
      .select(col("doc_id"), col("n_tokens"), spark_partition_id().as("__pid"))
    // local cumsum within each range partition (keyed window — parallel)
    val w = Window.partitionBy(col("__pid")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = sized.withColumn("__cum", sum(col("n_tokens")).over(w))
    // bounded driver step: one row per partition → prefix offsets. The
    // totals pass and the main pass each execute `local` once (two data
    // passes, no cached state left behind); that is safe because
    // repartitionByRange's boundary sampling is seeded per partition
    // index — re-execution over the same input reproduces the same
    // __pid assignment bit-for-bit
    val totals = local.groupBy(col("__pid"))
      .agg(max(col("__cum")).as("t")) // cumsum max = partition total
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val pids = totals.keys.toSeq.sorted
    val prefix: Map[Int, Long] = pids.zip(
      pids.scanLeft(0L)((acc, p) => acc + totals(p)).init).toMap
    import spark.implicits._
    val offsets = prefix.toSeq.toDF("__pid", "__offset")
    // "tok_offset", not "offset": OFFSET is a SQL reserved word and the
    // column name is part of the cross-engine contract
    local.join(broadcast(offsets), Seq("__pid"))
      .select(col("doc_id"), col("n_tokens"),
        (col("__offset") + col("__cum") - col("n_tokens")).as("tok_offset"))
      .withColumn("bin", floor(col("tok_offset") / capacity).cast("long"))
      .orderBy(col("doc_id"))
  }
}
