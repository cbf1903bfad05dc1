package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.execution.FileSourceScanExec
import graft.{SparkSpec, Tables}

/** The IVF layout: cell-partitioned store, probes prune to the probed
  * cells' directories, results agree with the in-memory LSH operators. */
class EmbeddingStoreSpec extends SparkSpec {

  private lazy val embs = Tables.embeddings(spark, sf("sf0.001"))

  private def scannedPartitions(df: org.apache.spark.sql.DataFrame): Int = {
    val scan = df.queryExecution.sparkPlan.collect { case f: FileSourceScanExec => f }.head
    scan.relation.location.listFiles(scan.partitionFilters, scan.dataFilters).length
  }

  test("bucket-partitioned store: probe scans one cell, matches lshKnn") {
    val dir = Files.createTempDirectory("embstore").toString
    EmbeddingStore.write(embs, dir, nPlanes = 4)
    val store = EmbeddingStore.read(spark, dir)
    val totalCells = store.select(EmbeddingStore.partitionCol).distinct().count().toInt
    assert(totalCells > 1)
    assert(store.count() == embs.count())

    val probe = EmbeddingStore.knnProbe(spark, dir, queryId = 0L, k = 10, nPlanes = 4)
    assert(scannedPartitions(probe) == 1, "single-cell probe must scan one directory")
    // same candidates, same ordering as the in-memory operator
    val inMem = Similarity.lshKnn(embs, 0L, 10, 4).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cos_sim"))).toSeq
    val fromStore = probe.collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cos_sim"))).toSeq
    assert(fromStore == inMem)

    val multi = EmbeddingStore.knnProbe(spark, dir, 0L, 10, nPlanes = 4, maxFlips = 1)
    val scanned = scannedPartitions(multi)
    assert(scanned > 1 && scanned <= 5, s"1-flip probe scans <= nPlanes+1 cells, got $scanned")
    assert(scanned < totalCells, "multi-probe still prunes")

    // arbitrary-vector probe: querying with vec 0's own embedding finds the
    // same neighbors (plus itself, bucketed identically) in one pruned cell
    val qVec = embs.filter(col("vec_id") === 0L)
      .select(col("embedding").cast("array<double>")).head()
      .getSeq[Double](0).toArray
    val byVec = EmbeddingStore.knnProbeVector(spark, dir, qVec, k = 11, nPlanes = 4)
    assert(scannedPartitions(byVec) == 1)
    val got = byVec.collect().map(_.getAs[Long]("vec_id"))
    assert(got.contains(0L), "the identical stored vector is its own top hit")
    val inMemIds = Similarity.lshKnn(embs, 0L, 10, 4).collect().map(_.getAs[Long]("vec_id"))
    assert(got.filterNot(_ == 0L).take(inMemIds.length).toSeq == inMemIds.toSeq)
  }
}
