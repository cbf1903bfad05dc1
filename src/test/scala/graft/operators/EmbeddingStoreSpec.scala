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

  test("directRead probe: identical output, opens only probed cell dirs") {
    val dir = Files.createTempDirectory("embstore-direct").toString
    EmbeddingStore.write(embs, dir, nPlanes = 4)
    val qVec = embs.filter(col("vec_id") === 0L)
      .select(col("embedding").cast("array<double>")).head()
      .getSeq[Double](0).toArray
    // the serving shape must be row- and value-identical to the
    // discovery shape at every flip count, including flips where some
    // neighbor cells have no directory (skipped driver-side, which is
    // exactly what the partition filter does to them under discovery)
    for (flips <- Seq(0, 1, 2)) {
      val listed = EmbeddingStore.knnProbeVector(spark, dir, qVec,
        k = 11, nPlanes = 4, maxFlips = flips).collect().map(_.toSeq).toSeq
      val direct = EmbeddingStore.knnProbeVector(spark, dir, qVec,
        k = 11, nPlanes = 4, maxFlips = flips, directRead = true)
      assert(direct.collect().map(_.toSeq).toSeq == listed,
        s"directRead diverged at maxFlips=$flips")
      // the scan's file index must hold at most the probed cell count —
      // direct read never discovers the rest of the store
      val scan = direct.queryExecution.sparkPlan
        .collect { case f: FileSourceScanExec => f }.head
      val rootDirs = scan.relation.location.rootPaths.length
      val probedCount = Map(0 -> 1, 1 -> 5, 2 -> 11)(flips) // Σ C(4, ≤f)
      assert(rootDirs <= probedCount,
        s"direct read must root at ≤$probedCount probed cells, got $rootDirs")
    }
    // a query vector landing in a cell with no directory and no existing
    // neighbors: empty result, correct schema, no exception
    val farQ = Array.fill(64)(0.0)
    val empty = EmbeddingStore.knnProbeVector(spark, dir, farQ,
      k = 5, nPlanes = 4, maxFlips = 0, directRead = true)
    val alsoListed = EmbeddingStore.knnProbeVector(spark, dir, farQ,
      k = 5, nPlanes = 4, maxFlips = 0)
    assert(empty.collect().map(_.toSeq).toSeq ==
      alsoListed.collect().map(_.toSeq).toSeq,
      "missing-cell probe must agree between shapes (possibly empty)")
  }

  test("id-sidecar directRead probe: identical to the store-scan shape") {
    val dir = Files.createTempDirectory("embstore-idx").toString
    // sidecar-less store first: directRead must silently degrade to the
    // default shape (correct on any store, faster only with the sidecar)
    EmbeddingStore.write(embs, dir, nPlanes = 4)
    def probe(direct: Boolean, id: Long = 0L) =
      EmbeddingStore.knnProbe(spark, dir, id, k = 10, nPlanes = 4,
        maxFlips = 1, directRead = direct).collect().map(_.toSeq).toSeq
    val want = probe(direct = false)
    assert(probe(direct = true) == want, "no sidecar: directRead must fall back")

    // sidecar-enabled store: identical output through the id index
    EmbeddingStore.write(embs, dir, nPlanes = 4, idIndex = true)
    assert(probe(direct = true) == want,
      "sidecar directRead must match the store-scan probe exactly")
    // ids landing in different idp partitions all resolve
    for (id <- Seq(1L, 63L, 64L, 100L))
      assert(probe(direct = true, id) == probe(direct = false, id),
        s"id $id diverged through the sidecar")
    // a missing id errors through the sidecar too
    intercept[IllegalArgumentException] { probe(direct = true, id = 999999L) }

    // append with idIndex maintains the sidecar: appended ids resolve and
    // probes stay equal to the store-scan shape over the grown store
    val extra = embs.filter(col("vec_id") < 5)
      .withColumn("vec_id", col("vec_id") + 1000000L)
    EmbeddingStore.append(extra, dir, nPlanes = 4, idIndex = true)
    assert(probe(direct = true, 1000001L) == probe(direct = false, 1000001L),
      "appended id must resolve through the appended sidecar")
    assert(probe(direct = true) == probe(direct = false),
      "post-append probes must stay identical between shapes")
    // an append WITHOUT the flag must still maintain an existing sidecar
    // (a stale sidecar would make directRead miss vectors the store holds)
    val extra2 = embs.filter(col("vec_id") < 3)
      .withColumn("vec_id", col("vec_id") + 2000000L)
    EmbeddingStore.append(extra2, dir, nPlanes = 4)
    assert(probe(direct = true, 2000001L) == probe(direct = false, 2000001L),
      "flagless append onto a sidecar store must keep the sidecar current")
    // recluster compacts cell files without touching bucket assignment:
    // the sidecar stays valid and both probe shapes agree afterwards
    EmbeddingStore.recluster(spark, dir, maxFilesPerCell = 1)
    assert(probe(direct = true) == probe(direct = false),
      "post-recluster probes must stay identical between shapes")
    assert(probe(direct = true, 2000001L) == probe(direct = false, 2000001L))
  }

  test("first idIndex append onto a sidecar-less store backfills every id") {
    val dir = Files.createTempDirectory("embstore-backfill").toString
    EmbeddingStore.write(embs, dir, nPlanes = 4) // no sidecar
    val extra = embs.filter(col("vec_id") < 5)
      .withColumn("vec_id", col("vec_id") + 1000000L)
    EmbeddingStore.append(extra, dir, nPlanes = 4, idIndex = true)
    def probe(direct: Boolean, id: Long) =
      EmbeddingStore.knnProbe(spark, dir, id, k = 10, nPlanes = 4,
        maxFlips = 1, directRead = direct).collect().map(_.toSeq).toSeq
    // a sidecar holding only the appended batch would error here on the
    // pre-existing id — the backfill must cover the WHOLE store
    for (id <- Seq(0L, 63L, 1000001L))
      assert(probe(direct = true, id) == probe(direct = false, id),
        s"id $id must resolve through the backfilled sidecar")
  }

  test("append routes to existing cells; recluster compacts without changing probes") {
    import org.apache.hadoop.fs.Path
    val dir = Files.createTempDirectory("embstore-incr").toString
    // reference: the whole corpus written at once
    val full = Files.createTempDirectory("embstore-full").toString
    EmbeddingStore.write(embs, full, nPlanes = 4)
    val want = EmbeddingStore.knnProbe(spark, full, 0L, 10, nPlanes = 4).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cos_sim"))).toSeq

    // incremental: base 60% then four appended slices of 10% each
    EmbeddingStore.write(embs.filter(col("vec_id") % 10 < 6), dir, nPlanes = 4)
    (6 to 9).foreach(m =>
      EmbeddingStore.append(embs.filter(col("vec_id") % 10 === m), dir, nPlanes = 4))
    val store = EmbeddingStore.read(spark, dir)
    assert(store.count() == embs.count())
    // appended vectors landed in the SAME cell the one-shot write chooses
    val cells = store.select(col("vec_id"), col(EmbeddingStore.partitionCol).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fullCells = EmbeddingStore.read(spark, full)
      .select(col("vec_id"), col(EmbeddingStore.partitionCol).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cells == fullCells, "append must route to the one-shot cell assignment")
    val gotIncr = EmbeddingStore.knnProbe(spark, dir, 0L, 10, nPlanes = 4).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cos_sim"))).toSeq
    assert(gotIncr == want, "probe over the incremental store must match the one-shot store")

    // drift: appends fragmented the cells; recluster compacts them in place
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    def cellFiles: Map[String, Int] = fs.listStatus(new Path(dir))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(EmbeddingStore.partitionCol + "="))
      .map(s => s.getPath.getName -> fs.listStatus(s.getPath).count(f =>
        f.isFile && !f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith(".")))
      .toMap
    val before = cellFiles
    assert(before.values.exists(_ > 2), s"appends should fragment cells, got $before")
    val done = EmbeddingStore.recluster(spark, dir, maxFilesPerCell = 2)
    assert(done.cells.nonEmpty, "fragmented cells must be reclustered")
    val after = cellFiles
    assert(done.cells.forall(c => after(s"${EmbeddingStore.partitionCol}=$c") == 1),
      s"reclustered cells must compact to one file: $after")
    assert(before.filter(_._2 <= 2).forall { case (c, n) => after(c) == n },
      "cells within bound must be untouched")
    // identical rows, identical probe, pruning intact
    val probeAfter = EmbeddingStore.knnProbe(spark, dir, 0L, 10, nPlanes = 4)
    assert(scannedPartitions(probeAfter) == 1)
    val gotAfter = probeAfter.collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cos_sim"))).toSeq
    assert(gotAfter == want, "recluster must not change probe results")
    assert(EmbeddingStore.read(spark, dir).count() == embs.count())
    // second recluster is a no-op (cost scales with drift, not store size)
    assert(EmbeddingStore.recluster(spark, dir, maxFilesPerCell = 2).isEmpty)
  }

  test("Overwrite with idIndex=false removes a stale sidecar even under " +
      "dynamic partitionOverwriteMode") {
    val dir = Files.createTempDirectory("embstore-stale-idx").toString
    val idx = new java.io.File(dir, EmbeddingStore.idIndexDir)
    EmbeddingStore.write(embs, dir, nPlanes = 4, idIndex = true)
    assert(idx.isDirectory)
    // dynamic overwrite rewrites only touched cell dirs — the mode under
    // which the old sidecar would have survived an in-place Overwrite
    // (ADVICE r8); the explicit removal must not depend on the conf
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try EmbeddingStore.write(embs, dir, nPlanes = 4)
    finally prev.fold(spark.conf.unset("spark.sql.sources.partitionOverwriteMode"))(
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", _))
    assert(!idx.exists, "stale sidecar must be removed by an idIndex=false overwrite")
    // and the store stays probe-able through the default shape
    assert(EmbeddingStore.knnProbe(spark, dir, 0L, 5, nPlanes = 4,
      directRead = true).count() == 5L)
  }

  test("Ignore-mode write on an existing store is a full no-op: the valid " +
      "sidecar survives and no partial sidecar is written (ADVICE r9)") {
    val dir = Files.createTempDirectory("embstore-ignore-idx").toString
    val idx = new java.io.File(dir, EmbeddingStore.idIndexDir)
    EmbeddingStore.write(embs, dir, nPlanes = 4, idIndex = true)
    val want = EmbeddingStore.knnProbe(spark, dir, 0L, 5, nPlanes = 4,
      directRead = true).collect().map(_.toSeq).toSeq
    // idIndex=false Ignore: the data write no-ops, so the sidecar —
    // still valid for vectors that were never rewritten — must survive
    EmbeddingStore.write(embs.limit(3), dir, nPlanes = 4,
      mode = org.apache.spark.sql.SaveMode.Ignore)
    assert(idx.isDirectory, "Ignore on an existing store must not strip the sidecar")
    assert(EmbeddingStore.knnProbe(spark, dir, 0L, 5, nPlanes = 4,
      directRead = true).collect().map(_.toSeq).toSeq == want)
    // idIndex=true Ignore: the data write no-ops, so the sidecar write
    // must no-op too — a sidecar of just the ignored increment would be
    // PARTIAL (directRead would error on every pre-existing id)
    val before = Option(idx.listFiles()).toSeq.flatten.map(_.getName).sorted
    EmbeddingStore.write(embs.limit(3), dir, nPlanes = 4,
      mode = org.apache.spark.sql.SaveMode.Ignore, idIndex = true)
    assert(Option(idx.listFiles()).toSeq.flatten.map(_.getName).sorted == before,
      "Ignore must not rewrite the sidecar of an ignored data write")
    assert(EmbeddingStore.knnProbe(spark, dir, 0L, 5, nPlanes = 4,
      directRead = true).collect().map(_.toSeq).toSeq == want)
  }

  test("directRead against a store with no cell directories returns the " +
      "documented empty frame instead of throwing") {
    val dir = Files.createTempDirectory("embstore-empty").toString
    // a root with no cell dirs at all (never written / emptied)
    val out = EmbeddingStore.knnProbeVector(spark, dir,
      Array.tabulate(8)(_.toDouble), k = 5, nPlanes = 4, directRead = true)
    assert(out.columns.toSeq ==
      Seq("vec_id", "label", "bucket", "cos_sim"))
    assert(out.count() == 0L)
  }

  test("recluster recovers a cell from a crash between the two swap renames") {
    import org.apache.hadoop.fs.Path
    val dir = Files.createTempDirectory("embstore-crash").toString
    EmbeddingStore.write(embs, dir, nPlanes = 4)
    val want = EmbeddingStore.knnProbe(spark, dir, 0L, 10, nPlanes = 4).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cos_sim"))).toSeq
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val cells = fs.listStatus(new Path(dir))
      .filter(_.getPath.getName.startsWith(EmbeddingStore.partitionCol + "="))
    assert(cells.nonEmpty)
    // simulate the worst crash window: live dir archived, replacement
    // never renamed in — the archive is the only copy of the cell
    val victim = cells.head.getPath
    val archive = new Path(new Path(dir), s".old_${victim.getName}")
    assert(fs.rename(victim, archive))
    assert(!fs.exists(victim))
    // any recluster invocation repairs the store before compacting
    EmbeddingStore.recluster(spark, dir, maxFilesPerCell = 1000)
    assert(fs.exists(victim) && !fs.exists(archive), "archived cell must be restored")
    val after = EmbeddingStore.knnProbe(spark, dir, 0L, 10, nPlanes = 4).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cos_sim"))).toSeq
    assert(after == want, "recovered store must probe identically")
    // the other crash window: swap completed but archive not yet deleted —
    // the leftover archive is dropped, live data untouched
    val done = cells.last.getPath
    fs.mkdirs(new Path(new Path(dir), s".old_${done.getName}"))
    EmbeddingStore.recluster(spark, dir, maxFilesPerCell = 1000)
    assert(fs.exists(done) && !fs.exists(new Path(new Path(dir), s".old_${done.getName}")))
  }

  test("recluster compacts the id sidecar's drifted idp dirs (and recovers them)") {
    import org.apache.hadoop.fs.Path
    import org.apache.spark.sql.functions.lit
    val dir = Files.createTempDirectory("embstore-sidecar-compact").toString
    EmbeddingStore.write(embs, dir, nPlanes = 4, idIndex = true)
    // five appends whose single vector shares one mod-64 residue: the
    // sidecar partition idp=40 gains one file per append (the drift
    // signature — every append onto a sidecar-carrying store maintains
    // the sidecar, so its fragmentation has no natural bound)
    val ids = Seq(1000L, 1064L, 1128L, 1192L, 1256L)
    val vec0 = embs.filter(col("vec_id") === 0L).select(col("embedding")).head().getSeq[Float](0)
    import spark.implicits._
    for (id <- ids)
      EmbeddingStore.append(Seq((id, vec0, 0)).toDF("vec_id", "embedding", "label"),
        dir, nPlanes = 4, idIndex = true)
    val idx = new Path(dir, EmbeddingStore.idIndexDir)
    val fs = idx.getFileSystem(spark.sessionState.newHadoopConf())
    val hot = new Path(idx, "idp=40")
    def files(p: Path): Int = fs.listStatus(p).count(f => f.isFile &&
      !f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith("."))
    assert(files(hot) > 4, s"fixture must fragment idp=40 past the bound, got ${files(hot)}")
    val res = EmbeddingStore.recluster(spark, dir, maxFilesPerCell = 4)
    assert(files(hot) == 1, s"sidecar partition must be compacted to one file, got ${files(hot)}")
    // the sidecar maintenance is in the RETURN VALUE, not just stderr —
    // callers gate on it programmatically (round-13 verdict nit #2)
    assert(res.idParts.contains(40L),
      s"recluster result must report the compacted sidecar partition, got ${res.idParts}")
    assert(res.nonEmpty)
    // every appended id still resolves through the compacted sidecar,
    // identically to the store-scan shape
    for (id <- ids) {
      val direct = EmbeddingStore.knnProbe(spark, dir, id, k = 5, nPlanes = 4,
        directRead = true).collect().map(_.toSeq).toSeq
      val scan = EmbeddingStore.knnProbe(spark, dir, id, k = 5, nPlanes = 4)
        .collect().map(_.toSeq).toSeq
      assert(direct == scan, s"directRead diverged for appended id $id after sidecar compaction")
    }
    // sidecar crash window: archived idp dir with live missing is
    // restored by the same recovery sweep the cells get
    val archive = new Path(idx, ".old_idp=40")
    assert(fs.rename(hot, archive))
    EmbeddingStore.recluster(spark, dir, maxFilesPerCell = 1000)
    assert(fs.exists(hot) && !fs.exists(archive), "archived sidecar partition must be restored")
    val direct = EmbeddingStore.knnProbe(spark, dir, ids.head, k = 5, nPlanes = 4,
      directRead = true).collect().map(_.toSeq).toSeq
    assert(direct.nonEmpty)
  }

  test("cross-table receipts: a planted tear between cells and sidecar " +
      "loud-stops the directRead path (round-15 verdict ask #1)") {
    val dir = Files.createTempDirectory("embstore-receipt").toString
    val metaName = "_META_emv1"
    def metaAt(root: String): Option[String] = {
      val f = new java.io.File(root, metaName)
      if (f.exists()) Some(new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8").trim)
      else None
    }
    def probe(direct: Boolean, id: Long = 0L) =
      EmbeddingStore.knnProbe(spark, dir, id, k = 10, nPlanes = 4,
        maxFlips = 1, directRead = direct).collect().map(_.toSeq).toSeq
    val idxDir = s"$dir/${EmbeddingStore.idIndexDir}"

    // a sidecar write publishes EQUAL receipts on both halves, and they
    // survive appends (folded) and recluster (content-based) unchanged
    EmbeddingStore.write(embs, dir, nPlanes = 4, idIndex = true)
    assert(metaAt(dir).exists(_.startsWith("emv1 ")), "store receipt missing")
    assert(metaAt(dir) == metaAt(idxDir), "halves must publish equal receipts")
    val extra = embs.filter(col("vec_id") < 5)
      .withColumn("vec_id", col("vec_id") + 1000000L)
    EmbeddingStore.append(extra, dir, nPlanes = 4)
    assert(metaAt(dir) == metaAt(idxDir), "append must fold both receipts")
    assert(metaAt(dir) != metaAt(idxDir).map(_ => "emv1 0 0"),
      "folded receipt must describe the grown store")
    EmbeddingStore.recluster(spark, dir, maxFilesPerCell = 1)
    assert(metaAt(dir) == metaAt(idxDir), "recluster must not move receipts")
    val want = probe(direct = false)
    assert(probe(direct = true) == want)

    // PLANTED TEAR — the exact crash window the publish-first protocol
    // leaves detectable: store receipt already advanced (and cells
    // possibly appended), sidecar receipt still old. Emulated by
    // republishing a bumped store receipt. directRead must fail-stop
    // with the actionable message; the cell-scan shape stays correct.
    val good = metaAt(dir).get
    val bumped = { val p = good.split(" "); s"emv1 ${p(1).toLong + 5} ${p(2)}" }
    java.nio.file.Files.write(new java.io.File(dir, metaName).toPath,
      bumped.getBytes("UTF-8"))
    val e1 = intercept[IllegalStateException] { probe(direct = true) }
    assert(e1.getMessage.contains("torn append") &&
      e1.getMessage.contains("idIndex = true"), e1.getMessage)
    assert(probe(direct = false) == want,
      "the cell-scan shape must stay correct on a torn store")
    // a further sidecar-maintaining append must refuse to compound it
    val e2 = intercept[IllegalStateException] {
      EmbeddingStore.append(extra.withColumn("vec_id",
        col("vec_id") + 1000000L), dir, nPlanes = 4)
    }
    assert(e2.getMessage.contains("torn append"), e2.getMessage)

    // ONE-SIDED receipt (crash in the pre-receipt→receipt upgrade, or a
    // manually-deleted half): same loud stop
    java.nio.file.Files.write(new java.io.File(dir, metaName).toPath,
      good.getBytes("UTF-8"))
    assert(probe(direct = true) == want, "restored receipt must re-arm directRead")
    assert(new java.io.File(idxDir, metaName).delete())
    val e3 = intercept[IllegalStateException] { probe(direct = true) }
    assert(e3.getMessage.contains("cells only"), e3.getMessage)

    // LEGACY store (both receipts absent — written before emv1): the
    // probe is tolerated uncheckable, and one loud append migrates the
    // store in place — receipts recomputed from the store at rest, equal
    // on both halves, and the directRead guard re-armed
    assert(new java.io.File(dir, metaName).delete())
    assert(probe(direct = true) == want, "legacy sidecar must stay probe-able")
    val extra2 = embs.filter(col("vec_id") < 3)
      .withColumn("vec_id", col("vec_id") + 3000000L)
    EmbeddingStore.append(extra2, dir, nPlanes = 4)
    assert(metaAt(dir).isDefined && metaAt(dir) == metaAt(idxDir),
      "a sidecar-maintaining append must migrate a legacy store to receipts")
    assert(probe(direct = true, 3000001L) == probe(direct = false, 3000001L))

    // the recomputed receipt equals the protocol's folded one: rebuilding
    // the same rows from scratch in a fresh dir publishes the same value
    // modulo the vec_id set — pin by rebuilding identically
    val dir2 = Files.createTempDirectory("embstore-receipt2").toString
    EmbeddingStore.write(EmbeddingStore.read(spark, dir)
      .select(col("vec_id"), col("embedding"), col("label")),
      dir2, nPlanes = 4, idIndex = true)
    assert(metaAt(dir2) == metaAt(dir),
      "receipt must be a pure content hash: rebuild == folded appends")
  }
}
