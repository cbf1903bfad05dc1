package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class FrequencySpec extends SparkSpec {
  import spark.implicits._

  test("misra-gries: every item above n/k survives a single-pass sketch") {
    // 600 'hot' (> n/4) in a 2000-item stream arranged adversarially
    val stream = (Seq.fill(600)("hot") ++ (0 until 1400).map(i => s"w${i % 700}"))
    val got = Frequency.mgCandidates(stream.iterator, k = 4).toSet
    assert(got.contains("hot"), s"guaranteed heavy item evicted: $got")
    assert(got.size <= 3, "capacity k-1 respected")
  }

  test("misra-gries: random streams x capacities never evict a guaranteed-heavy item") {
    // the MG guarantee the two-pass heavy hitter operators (batch +
    // streaming) rely on: ANY item with count·k > n survives the sketch,
    // whatever the arrival order — swept over random skewed streams,
    // random capacities, and three hostile orders (shuffled, heavy-first
    // so the heavy item's counter faces every later eviction, heavy-last
    // so it must displace an already-full counter table)
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 30) {
      val n = 500 + rnd.nextInt(1500)
      val k = 2 + rnd.nextInt(14)
      val base = Seq.fill(n)(s"w${(math.pow(rnd.nextDouble(), 3) * 60).toInt}")
      val orders = Seq(rnd.shuffle(base), base.sorted, base.sorted.reverse)
      val counts = base.groupBy(identity).map { case (t, o) => t -> o.size }
      for (stream <- orders) {
        val got = Frequency.mgCandidates(stream.iterator, k).toSet
        assert(got.size <= k - 1, s"capacity violated: ${got.size} vs k=$k")
        counts.foreach { case (t, c) =>
          if (c.toLong * k > n)
            assert(got.contains(t),
              s"heavy item $t (count $c, n=$n, k=$k) evicted")
        }
      }
    }
  }

  test("heavy hitters: deterministic exact set, invariant to partitioning") {
    val docs = Seq(
      (0L, ("alpha " * 40 + "beta " * 20 + "rare").trim),
      (1L, ("alpha " * 40 + "gamma " * 10 + "x y z").trim),
      (2L, (0 until 80).map(i => s"t$i").mkString(" "))
    ).toDF("doc_id", "text")
    // n = 194 tokens; k = 8 -> threshold n/8 = 24.25: alpha (80) qualifies,
    // beta (20), gamma (10), singletons don't
    val r1 = Frequency.heavyHitters(docs, k = 8).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(r1 == Seq(("alpha", 80L, 194L)))
    // different physical partitioning -> different MG candidates, same set
    val r2 = Frequency.heavyHitters(docs.repartition(7), k = 8).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(r2 == r1, "declared output must not depend on partitioning")
  }

  test("tf-idf: ubiquitous terms weigh zero, rarer terms weigh more") {
    val docs = Seq(
      (0L, "common common rare"),
      (1L, "common mid"),
      (2L, "common mid")).toDF("doc_id", "text")
    val got = Frequency.tfIdf(docs, vocabSize = 10).collect()
      .map(r => ((r.getLong(0), r.getString(1)), (r.getLong(2), r.getDouble(3)))).toMap
    // 'common' is in all 3 docs: idf = ln(1) = 0 -> weight exactly 0
    assert(got((0L, "common")) == (2L, 0.0))
    // 'rare' (1 of 3 docs) outweighs 'mid' (2 of 3) at equal tf
    assert(got((0L, "rare"))._2 > got((1L, "mid"))._2)
    assert(got((1L, "mid")) == got((2L, "mid")), "idf is corpus-global")
  }

  test("vocab top-k: count-desc with lexicographic tie-break") {
    val docs = Seq((0L, "b b a a c")).toDF("doc_id", "text")
    val got = Frequency.vocabTopK(docs, 2).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 2L), ("b", 2L)), "ties cut lexicographically")
  }

  test("count-min sketch: one-sided guarantee, exact at wide w, partition-stable") {
    val docs = (0L until 40L).map(i => (i, s"w${i % 7} w${i % 3} filler"))
      .toDF("doc_id", "text")
    // tight sketch: estimates may overcount but never undercount
    val tight = Frequency.cmsEstimates(docs, d = 2, w = 4).collect()
    assert(tight.nonEmpty)
    tight.foreach { r =>
      assert(r.getAs[Long]("est") >= r.getAs[Long]("n_true"),
        s"CMS undercounted ${r.getAs[Long]("tok_hash")}")
    }
    // w far above vocab size: no collisions -> estimates exact
    val wide = Frequency.cmsEstimates(docs, d = 4, w = 65536L).collect()
    wide.foreach(r => assert(r.getAs[Long]("est") == r.getAs[Long]("n_true")))
    // counters are sums: the sketch (and estimates) ignore partitioning
    val t13 = Frequency.cmsEstimates(docs.repartition(13), d = 2, w = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(t13 == tight.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq)
  }
}
