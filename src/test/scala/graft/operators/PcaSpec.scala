package graft.operators

import graft.SparkSpec

class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("power iteration: unit norm, aligns with a planted dominant direction") {
    // 40 vectors near +/- e1 (dominant), 10 small orthogonal noise rows;
    // sign flips must not matter for convergence of the direction
    val rows = (0L until 40L).map { i =>
      val s = if (i % 2 == 0) 1.0f else -1.0f
      (i, Seq(s * 10.0f, (i % 5).toFloat * 0.1f, 0.0f))
    } ++ (40L until 50L).map(i => (i, Seq(0.0f, 1.0f, (i % 3).toFloat * 0.2f)))
    val embs = rows.toDF("vec_id", "embedding")
    val v = Pca.topDirection(embs, iters = 2).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).map(_._2)
    val norm = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-12, s"output must be unit length, got $norm")
    assert(math.abs(v(0)) > 0.99, s"dominant axis not recovered: ${v.toSeq}")

    val v2 = Pca.topDirection(embs.repartition(7), iters = 2).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).map(_._2)
    assert(v.toSeq == v2.toSeq, "nano-unit sums must be partitioning-invariant")
  }
}
