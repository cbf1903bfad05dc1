package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import graft.ct.{CertStore, PublicSuffix}
import graft.expressions.{ArrayExprs, KmvSketchAgg}
import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.LongType
import org.apache.spark.unsafe.types.UTF8String

/** Property-based invariants (SURVEY §5.2) for the pure engine functions. */
object PropertySpec extends Properties("graft") {

  private val label = Gen.choose(1, 8).flatMap(n =>
    Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val domain = Gen.choose(1, 5).flatMap(n =>
    Gen.listOfN(n, label).map(_.mkString(".")))

  property("baseDomain idempotent, non-empty suffix of input") = forAll(domain) { d =>
    val b = PublicSuffix.baseDomain(d)
    PublicSuffix.baseDomain(b) == b && d.toLowerCase.endsWith(b) && b.nonEmpty
  }

  property("baseDomain keeps registrable label for known gTLDs") =
    forAll(Gen.choose(1, 4), label) { (n, base) =>
      val d = (List.fill(n)("sub") :+ base :+ "com").mkString(".")
      // the full PSL lists some <label>.com as private-section suffixes
      // (CentralNic: ru.com, br.com, …) — those are correctly NOT
      // registrable at the <label>.com grain, so exclude them here
      if (PublicSuffix.rules.exact.contains(s"$base.com"))
        PublicSuffix.baseDomain(d) == s"sub.$base.com"
      else PublicSuffix.baseDomain(d) == s"$base.com"
    }

  private val unicodeText: Gen[String] = Gen.listOf(Gen.frequency(
    6 -> Gen.alphaNumChar.map(_.toInt),
    2 -> Gen.choose(0x00a0, 0x2fff),          // BMP non-ASCII
    1 -> Gen.choose(0x10000, 0x10fff)         // supplementary (surrogate pairs)
  )).map(_.map(Character.toChars(_).mkString).mkString)

  property("bigramCounts: code-point windows, multiplicity preserved") =
    forAll(unicodeText) { s =>
      val arr = ArrayExprs.bigramCounts(UTF8String.fromString(s))
      val got = (0 until arr.numElements()).map { i =>
        val row = arr.getStruct(i, 2)
        row.getUTF8String(0).toString -> row.getLong(1)
      }.toMap
      // naive definition: sliding 2-code-point windows of the string
      val cps = s.codePoints().toArray
      val naive = cps.sliding(2).filter(_.length == 2)
        .map(w => new String(w, 0, 2)).toSeq
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      got == naive && got.values.sum == math.max(0, cps.length - 1)
    }

  property("polyHash in [0, HashMod), deterministic, matches fold definition") =
    forAll(Gen.asciiPrintableStr) { s =>
      val h = ArrayExprs.polyHash(UTF8String.fromString(s))
      val expected = s.codePoints().toArray.foldLeft(0L)(
        (a, c) => (a * 31 + c) % graft.functions.TextFunctions.HashMod)
      h >= 0 && h < graft.functions.TextFunctions.HashMod && h == expected
    }

  property("humanBytes parses back within 1% for n >= 1KiB") =
    forAll(Gen.choose(1024L, 1L << 50)) { n =>
      val s = CertStore.humanBytes(n)
      val units = Map("B" -> 1d, "KB" -> math.pow(1024, 1), "MB" -> math.pow(1024, 2),
        "GB" -> math.pow(1024, 3), "TB" -> math.pow(1024, 4), "PB" -> math.pow(1024, 5))
      val (num, unit) = s.span(c => c.isDigit || c == '.')
      val back = num.toDouble * units(unit)
      math.abs(back - n) / n.toDouble < 0.01
    }

  property("interval bucket replication emits each overlapping pair exactly once") = {
    // the arithmetic behind ScaleJoins.intervalOverlapJoin: truncating
    // division (SQL div — NOT floor) maps an interval to a contiguous
    // bucket range even over negative starts; every OVERLAPPING pair
    // shares the max(start) bucket and only that one passes the dedup
    // condition — exactly-once emission. (Non-overlapping pairs may
    // still co-bucket; the operator's explicit overlap predicate drops
    // them, so no claim is needed here.)
    def t(x: Long, w: Long): Long = x / w // JVM / == SQL div (toward zero)
    forAll(Gen.choose(-100L, 100L), Gen.choose(0L, 50L),
        Gen.choose(-100L, 100L), Gen.choose(0L, 50L), Gen.choose(1L, 40L)) {
      (s1, l1, s2, l2, w) =>
        val (e1, e2) = (s1 + l1, s2 + l2)
        val overlap = s1 <= e2 && s2 <= e1
        val bks1 = (t(s1, w) to t(e1, w)).toSet
        val bks2 = (t(s2, w) to t(e2, w)).toSet
        val emits = (bks1 & bks2).count(_ == t(math.max(s1, s2), w))
        !overlap || emits == 1
    }
  }

  property("sortedIntersectCount == distinct set intersection size on " +
      "sorted arrays (the array_intersect twin, round 16)") = {
    val longs = Gen.listOf(Gen.choose(-20L, 20L)) // dense range → real overlaps + dups
    forAll(longs, longs) { (a, b) =>
      val sa = a.sorted
      val sb = b.sorted
      val expr = graft.expressions.SortedIntersectCountLong(
        BoundReference(0, org.apache.spark.sql.types.ArrayType(LongType), nullable = true),
        BoundReference(1, org.apache.spark.sql.types.ArrayType(LongType), nullable = true))
      val got = expr.eval(new GenericInternalRow(Array[Any](
        new GenericArrayData(sa.toArray), new GenericArrayData(sb.toArray))))
      got == (a.toSet & b.toSet).size.toLong
    }
  }

  property("mix rate formula never exceeds the budget share; caps when mass fits") = {
    // Sampling.mixToBudget's integer rate: expected kept tokens per
    // stratum (rate·tot/10⁴) never exceed the stratum's budget target,
    // and a stratum whose whole mass fits keeps everything
    forAll(Gen.choose(1L, 1000000L), Gen.choose(0, 10000), Gen.choose(1L, 1000000L)) {
      (budget, wbps, tot) =>
        val target = budget * wbps / 10000L
        val rate = math.min(10000L, target * 10000L / tot)
        val expectedKept = rate * tot / 10000L
        expectedKept <= target + tot / 10000L + 1 && // rounding slack: one hash-grain
          (if (tot <= target) rate == 10000L else true) &&
          rate >= 0L && rate <= 10000L
    }
  }

  property("funnel DP equals exhaustive chain enumeration") = {
    val event = Gen.zip(Gen.choose(0L, 40L), Gen.choose(1, 3))
    forAll(Gen.listOf(event).map(_.take(9)), Gen.choose(1L, 30L)) { (evs, window) =>
      val sorted = evs.sorted
      // brute force: max k with sorted indices j1<...<jk, stage(jm)=m,
      // every chain member within window of the chain's first event
      def chains(k: Int): Boolean =
        sorted.indices.combinations(k).exists { idx =>
          idx.zipWithIndex.forall { case (j, m) => sorted(j)._2 == m + 1 } &&
            idx.forall(j => sorted(j)._1 <= sorted(idx.head)._1 + window)
        }
      val brute = (1 to 3).reverse.find(chains).getOrElse(0)
      graft.operators.Funnel.referenceStage(evs, 3, window) == brute
    }
  }

  property("sequenceCount greedy equals brute-force sequential matching") = {
    val event = Gen.zip(Gen.choose(0L, 40L), Gen.choose(1, 3))
    forAll(Gen.listOf(event).map(_.take(9))) { evs =>
      val stages = evs.sorted.map(_._2).toVector
      // brute force: best chain count over every choice of i<j<k matching
      // stages 1,2,3 with the next match starting strictly after k
      def brute(pos: Int): Int = {
        var best = 0
        for {
          i <- pos until stages.size if stages(i) == 1
          j <- i + 1 until stages.size if stages(j) == 2
          k <- j + 1 until stages.size if stages(k) == 3
        } best = math.max(best, 1 + brute(k + 1))
        best
      }
      graft.operators.Funnel.referenceSeqCount(evs, 3) == brute(0)
    }
  }

  property("kmv sketch buffer API: any split + serde + merge order equals k smallest distinct") = {
    // Drives the REAL TypedImperativeAggregate buffer lifecycle exactly as
    // Spark's partial aggregation does — per-partition update, serialize/
    // deserialize across the (simulated) shuffle, merge on the reduce side
    // — and checks the result against the sketch's defining model: the k
    // smallest DISTINCT values of the whole stream, any fold order.
    // stream_kmv's whole determinism argument (four incremental merges ==
    // one-shot sketch) rests on this algebra; here it's pinned over random
    // splits, duplicate-heavy values, nulls, and hostile merge orders.
    val value: Gen[Option[Long]] = Gen.frequency(
      8 -> Gen.choose(-40L, 40L).map(Some(_)),      // duplicate-heavy band
      2 -> Gen.choose(Long.MinValue, Long.MaxValue).map(Some(_)),
      1 -> Gen.const(None))                          // null inputs ignored
    forAll(Gen.listOf(value), Gen.choose(1, 6), Gen.choose(1, 20)) {
      (vs, nParts, k) =>
        val agg = KmvSketchAgg(BoundReference(0, LongType, nullable = true), k)
        val parts = vs.zipWithIndex.groupBy(_._2 % nParts)
          .toSeq.sortBy(_._1).map(_._2.map(_._1))
        val bufs = parts.map { p =>
          val b = agg.createAggregationBuffer()
          p.foreach(v => agg.update(b,
            new GenericInternalRow(Array[Any](v.map(Long.box).orNull))))
          agg.deserialize(agg.serialize(b)) // the shuffle path
        }
        // reduce in REVERSED partition order — result must not care
        val acc = bufs.reverse.foldLeft(agg.createAggregationBuffer())(
          (a, b) => agg.merge(a, b))
        val got = agg.eval(acc).asInstanceOf[GenericArrayData]
          .toLongArray().toSeq
        got == vs.flatten.distinct.sorted.take(k)
    }
  }

  property("ingest dedup: replaying the same entries never adds rows") = {
    // pure-function view of the dedup grain: (fingerprint, domain) set union
    forAll(Gen.listOf(Gen.zip(Gen.identifier, domain))) { pairs =>
      val once = pairs.toSet
      val twice = (pairs ++ pairs).toSet
      once == twice
    }
  }
}
