package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import graft.ct.{CertStore, PublicSuffix}
import graft.expressions.ArrayExprs
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
      PublicSuffix.baseDomain(d) == s"$base.com"
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

  property("ingest dedup: replaying the same entries never adds rows") = {
    // pure-function view of the dedup grain: (fingerprint, domain) set union
    forAll(Gen.listOf(Gen.zip(Gen.identifier, domain))) { pairs =>
      val once = pairs.toSet
      val twice = (pairs ++ pairs).toSet
      once == twice
    }
  }
}
