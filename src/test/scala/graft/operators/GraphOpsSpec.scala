package graft.operators

import graft.SparkSpec

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  test("pagerank: path-graph centrality, mass conservation, invariance") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("i", "j")
    val pr = GraphOps.pageRank(edges, iters = 2).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr.keySet == Set(1L, 2L, 3L))
    // the middle node of a path is strictly more central; endpoints are
    // symmetric and must come out bitwise identical
    assert(pr(1L) == pr(3L), "symmetric endpoints must rank identically")
    assert(pr(2L) > pr(1L), "path center must outrank endpoints")
    // total mass stays ~1 (nano-unit quantization loses < 1e-6)
    assert(math.abs(pr.values.sum - 1.0) < 1e-6)

    val pr2 = GraphOps.pageRank(edges.repartition(5), iters = 2).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr == pr2, "nano-unit sums must be partitioning-invariant")
  }

  test("pagerank over the corpus near-dup graph ranks hub documents") {
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
    val edges = Dedup.ngramJaccardPairs(docs, k = 3, threshold = 0.5)
      .select($"i", $"j")
    val pr = GraphOps.pageRank(edges, iters = 2).collect()
    assert(pr.nonEmpty, "testdata plants near-dup pairs")
    // every ranked node is an edge endpoint and ranks are positive
    val nodes = edges.as[(Long, Long)].collect().flatMap(t => Seq(t._1, t._2)).toSet
    assert(pr.map(_.getLong(0)).toSet == nodes)
    assert(pr.forall(_.getDouble(1) > 0.0))
  }
}
