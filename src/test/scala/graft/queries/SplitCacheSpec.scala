package graft.queries

import graft.SparkSpec
import java.nio.file.Files

/** Pins the staleness contract of the /tmp replay-split fixtures: they
  * are keyed by a CONTENT stamp of the source parquet (names + sizes +
  * mtimes), so a driver-side testdata regeneration — which has happened
  * mid-round — lands in a fresh split directory instead of silently
  * replaying the old corpus into the stream gates. */
class SplitCacheSpec extends SparkSpec {

  test("sourceStamp changes when the source file is rewritten") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_stamp").toString
    val p = s"$dir/events.parquet"
    Seq((1L, "a")).toDF("id", "v").write.mode("overwrite").parquet(p)
    val s1 = StreamingQueries.sourceStamp(p)
    assert(s1 === StreamingQueries.sourceStamp(p), "stamp is stable unchanged")
    // regenerate with different content AND bump mtimes (a same-second
    // rewrite is exactly the regeneration race the stamp must catch)
    Seq((1L, "a"), (2L, "bb")).toDF("id", "v").write.mode("overwrite").parquet(p)
    new java.io.File(p).listFiles.foreach { f =>
      f.setLastModified(f.lastModified + 2000L); ()
    }
    assert(s1 !== StreamingQueries.sourceStamp(p), "rewrite must change stamp")
  }

  test("buildOnce: concurrent builders race safely, readers never see a partial artifact") {
    val dir = Files.createTempDirectory("graft_once").toString + "/artifact"
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    // a deliberately SLOW two-file build: without staging+rename, a reader
    // listing between the two writes would see half an artifact
    def build(staged: String): Unit = {
      builds.incrementAndGet()
      val d = new java.io.File(staged); d.mkdirs()
      Files.writeString(new java.io.File(d, "part-0").toPath, "alpha")
      Thread.sleep(50)
      Files.writeString(new java.io.File(d, "part-1").toPath, "beta")
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val results = (0 until 4).map { _ =>
      pool.submit(new java.util.concurrent.Callable[String] {
        def call(): String = StreamingQueries.buildOnce(dir)(build)
      })
    }.map(_.get())
    pool.shutdown()
    // every caller gets the same complete artifact: both parts + marker
    results.foreach { p =>
      assert(new java.io.File(p, "part-0").exists, "part-0 missing")
      assert(new java.io.File(p, "part-1").exists, "part-1 missing")
      assert(new java.io.File(p, "_SUCCESS").exists, "_SUCCESS missing")
    }
    // losers discarded their staging copies — no *_staging_* litter
    val litter = new java.io.File(dir).getParentFile.listFiles
      .filter(_.getName.contains("_staging_"))
    assert(litter.isEmpty, s"staging litter: ${litter.mkString(", ")}")
    // build ran at least once; a second sequential call is a no-op read
    val before = builds.get()
    assert(before >= 1)
    StreamingQueries.buildOnce(dir)(build)
    assert(builds.get() == before, "warm call must not rebuild")
  }
}
