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
}
