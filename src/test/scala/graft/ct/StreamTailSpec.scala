package graft.ct

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.SaveMode
import graft.SparkSpec

class StreamTailSpec extends SparkSpec {
  import spark.implicits._

  private def row(i: Int): CertDomain = {
    val ts = Timestamp.valueOf(f"2024-01-15 10:00:${i % 60}%02d")
    CertDomain(ts, s"d$i.example.com", "example.com", f"$i%064d",
      "CN=CA", "CN=d", Seq(s"d$i.example.com"),
      Timestamp.valueOf("2024-01-01 00:00:00"),
      Timestamp.valueOf("2025-01-01 00:00:00"), "log")
  }

  test("change feed delivers appended store batches exactly once (ST4)") {
    val store = Files.createTempDirectory("tail-store").toString
    val ckpt = Files.createTempDirectory("tail-ckpt").toString
    CertStore.write((0 until 3).map(row).toDF(), store, SaveMode.Append)

    val batches = scala.collection.mutable.ArrayBuffer.empty[Set[String]]
    val q = StreamTail.start(StreamTail.readStream(spark, store), ckpt) { (df, _) =>
      val got = df.select("domain").collect().map(_.getString(0)).toSet
      if (got.nonEmpty) batches.synchronized { batches += got }
    }
    q.processAllAvailable()
    assert(batches.flatten.toSet == (0 until 3).map(i => s"d$i.example.com").toSet)

    CertStore.write(Seq(row(7)).toDF(), store, SaveMode.Append)
    q.processAllAvailable()
    q.stop()
    val all = batches.flatten
    assert(all.toSet == Set("d0", "d1", "d2", "d7").map(d => s"$d.example.com"))
    assert(all.size == 4, s"each row delivered exactly once: $all")
  }
}
