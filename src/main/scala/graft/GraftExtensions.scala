package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.{BigramCounts, CountEqualLong, CountInSet, DotDouble, DotLong, L2Dist2Double, LshBands, MaxAbsDouble, MinhashSig, PolyHash, SequenceCountFold, ShingleCombine, Simhash62, WindowFunnelStage}

/** SparkSessionExtensions registration: exposes the engine's native
  * expressions to SQL, so `spark.sql("SELECT poly_hash(text) ...")` works
  * alongside the Column API. Activate with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[PolyHash].getName, name), builder))
    }
}

object GraftExtensions {
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "poly_hash" -> ((args: Seq[Expression]) => PolyHash(args.head)),
    "simhash62" -> ((args: Seq[Expression]) => Simhash62(args.head)),
    "minhash_sig" -> ((args: Seq[Expression]) => MinhashSig(args.head)),
    "dot_double" -> ((args: Seq[Expression]) => DotDouble(args(0), args(1))),
    "dot_long" -> ((args: Seq[Expression]) => DotLong(args(0), args(1))),
    "bigram_counts" -> ((args: Seq[Expression]) => BigramCounts(args.head)),
    // plane/band/window counts must be literals: they shape the generated loop
    "lsh_bands" -> ((args: Seq[Expression]) => LshBands(args(0),
      args(1).eval().asInstanceOf[Number].intValue(),
      args(2).eval().asInstanceOf[Number].intValue())),
    "shingle_combine" -> ((args: Seq[Expression]) => ShingleCombine(args(0),
      args(1).eval().asInstanceOf[Number].intValue(),
      args(2).eval().asInstanceOf[Boolean])),
    "l2_dist2" -> ((args: Seq[Expression]) => L2Dist2Double(args(0), args(1))),
    "count_equal_long" -> ((args: Seq[Expression]) => CountEqualLong(args(0), args(1))),
    "max_abs_double" -> ((args: Seq[Expression]) => MaxAbsDouble(args.head)),
    // the word set must be a foldable array<string> literal — it becomes
    // the kernel's baked-in hash set, exactly like the Column API's Seq
    "count_in_set" -> ((args: Seq[Expression]) => CountInSet(args(0),
      args(1).eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toArray[org.apache.spark.unsafe.types.UTF8String](
          org.apache.spark.sql.types.StringType).toSeq.map(_.toString))),
    "window_funnel_stage" -> ((args: Seq[Expression]) => WindowFunnelStage(args(0),
      args(1).eval().asInstanceOf[Number].intValue(),
      args(2).eval().asInstanceOf[Number].longValue())),
    "sequence_count_fold" -> ((args: Seq[Expression]) => SequenceCountFold(args(0),
      args(1).eval().asInstanceOf[Number].intValue())),
    // aggregate: the analyzer wraps a bare AggregateFunction builder
    // result in an AggregateExpression, same as built-in registry entries
    "kmv_sketch" -> ((args: Seq[Expression]) =>
      graft.expressions.KmvSketchAgg(args(0),
        args(1).eval().asInstanceOf[Number].intValue())))

  /** Register on an already-running session (withExtensions only applies at
    * session construction). Also exposes `base_domain` — the CT pipeline's
    * key scalar (PublicSuffix) — as a SQL UDF: it is a deliberate Scala
    * UDF, not an Expression (PublicSuffix.scala's documented hot-path
    * analysis), so it registers through the UDF registry rather than the
    * expression builders above. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
    spark.udf.register("base_domain", graft.ct.PublicSuffix.baseDomainUdf)
  }
}
