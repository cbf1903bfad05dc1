package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse MERGE (upsert + delete), resolved merge-on-read style.
  *
  * A change batch is applied to a base table per key: the
  * highest-version row wins, and a winner flagged deleted is dropped —
  * covering UPDATE (change wins), INSERT (key absent from base), and
  * DELETE (tombstone wins) in one pass. This is the resolution step
  * every ingestion pipeline with mutable keys runs (the engine's CT
  * analog: re-logged certificates superseding earlier rows — the same
  * latest-wins shape as CertStore.compact, generalized to tombstones
  * and explicit versions).
  *
  * Shape at 100 TB: one union (no shuffle) + one keyed window (one
  * shuffle on the merge key) + a codegen'd filter. No join: the base
  * never probes the changes, both sides just co-shuffle — which is the
  * right plan when the change batch is a meaningful fraction of the
  * base. (For tiny change batches a broadcast anti-join + union-append
  * wins; that variant is ScaleJoins territory and deliberately not
  * duplicated here.)
  */
object Merge {

  /** Resolve `base` + `changes` to the post-merge state.
    *
    * Contract: both inputs share the payload schema; `changes`
    * additionally carries `versionCol` (long ≥ 1; base rows are version
    * 0) and `deletedCol` (boolean tombstone). Every payload column must
    * be ORDERABLE (no map types — checked here, because the analysis
    * error Spark would raise names an internal sort, not the contract):
    * the window order is made TOTAL — version desc, tombstone first,
    * then every payload column — so even a contract-violating version
    * tie resolves to the same winner on every engine and partitioning,
    * instead of silently depending on arrival order. */
  def mergeUpsert(base: DataFrame, changes: DataFrame, key: String,
      versionCol: String, deletedCol: String): DataFrame = {
    val payload = base.columns
    base.schema.fields.foreach { f =>
      require(org.apache.spark.sql.catalyst.expressions.RowOrdering
          .isOrderable(f.dataType),
        s"mergeUpsert payload column '${f.name}' has unorderable type " +
          s"${f.dataType.simpleString}: the total-order tie-break sorts every " +
          "payload column (drop or re-encode map-typed columns)")
    }
    // the internal rank column must not silently clobber a payload column
    val rn = {
      var c = "__rn"
      while (payload.contains(c) || c == versionCol || c == deletedCol) c = c + "_"
      c
    }
    val tagged = base
      .withColumn(versionCol, lit(0L))
      .withColumn(deletedCol, lit(false))
      .unionByName(changes.select((payload :+ versionCol :+ deletedCol).map(col).toSeq: _*))
    val w = Window.partitionBy(col(key))
      .orderBy(col(versionCol).desc +: col(deletedCol).desc +:
        payload.filter(_ != key).map(c => col(c).asc).toSeq: _*)
    tagged
      .withColumn(rn, row_number().over(w))
      .filter(col(rn) === 1 && !col(deletedCol))
      .select(payload.map(col).toSeq: _*)
  }
}
