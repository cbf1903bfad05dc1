package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over similarity graphs — PageRank as pure dataflow,
  * completing the graph family next to [[Dedup.components]]: where
  * connected components answer "which documents form one duplicate
  * group", PageRank ranks centrality inside the near-dup graph (which
  * document is the canonical/most-connected representative — a keeper
  * policy signal beyond min-id).
  *
  * Shape per iteration: contributions flow along edges via one hash
  * equi-join of the (src, dst) edge list against the distributed rank
  * state, then reduce per destination in a map-side-combinable
  * aggregate — the standard SQL PageRank, no Pregel runtime needed.
  * The only broadcast is the 1-row node count. Undirected input pairs
  * (i, j) are symmetrized, so every subgraph node has degree ≥ 1 and
  * receives mass — no dangling-mass correction term is needed.
  *
  * DETERMINISM: per-edge contributions are integerized as
  * floor(pr/deg · 1e9) nano-units before the per-destination sum (the
  * engine's established portable-reduction discipline), and the update
  * (1−d)/n + d·(Σ/1e9) is a fixed operation tree — so ranks are
  * bit-identical across partitionings and engines. */
object GraphOps {

  /** PageRank over an undirected edge list (i, j), restricted to nodes
    * that appear in at least one edge; `iters` steps from the uniform
    * distribution. Returns (doc_id, pr) ordered by doc_id. */
  def pageRank(edges: DataFrame, iters: Int = 2, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    val sym = edges.select(col("i").as("src"), col("j").as("dst"))
      .union(edges.select(col("j").as("src"), col("i").as("dst")))
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val n = deg.agg(count(lit(1)).as("n"))
    var pr = deg.crossJoin(broadcast(n))
      .select(col("src").as("id"), (lit(1.0) / col("n").cast("double")).as("pr"))
    for (_ <- 1 to iters) {
      val contrib = sym
        .join(pr, col("src") === col("id"))
        .join(deg, Seq("src"))
        .select(col("dst"),
          floor(col("pr") / col("deg").cast("double") * lit(1e9)).cast("long").as("q"))
        .groupBy(col("dst")).agg(sum(col("q")).as("s"))
      pr = contrib.crossJoin(broadcast(n))
        .select(col("dst").as("id"),
          ((lit(1.0) - lit(damping)) / col("n").cast("double") +
            lit(damping) * (col("s").cast("double") / lit(1e9))).as("pr"))
    }
    pr.select(col("id").as("doc_id"), col("pr")).orderBy(col("doc_id"))
  }
}
