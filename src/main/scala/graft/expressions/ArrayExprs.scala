package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.TextFunctions

/** Native Catalyst expressions for the engine's hash/vector hot paths.
  *
  * Why these exist: Spark's higher-order functions (`transform`/`aggregate`)
  * evaluate their lambda once per array ELEMENT through the interpreter —
  * fine for a projection over 5k rows, ruinous inside an O(n²) pair join or
  * a 30-bit × n-token fold (measured ~µs per element). Each expression here
  * is the same arithmetic as its HOF twin in
  * TextFunctions/VectorFunctions — bit-identical results, same DuckDB
  * oracle — as a tight JVM loop over ArrayData (tier (b) of the
  * custom-operator preference order; the scalar semantics don't warrant a
  * full LogicalPlan/Strategy).
  */

/** Left-fold dot product of two array<double> columns (index order, exact
  * IEEE parity with `aggregate(zip_with(a,b,*),0.0,+)`). Codegen'd: this
  * sits inside pairwise joins evaluating millions of times. */
case class DotDouble(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += $a.getDouble($i) * $b.getDouble($i);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Exact integer dot product of two array<long> columns (index order) —
  * the stage-1 scan kernel for quantized kNN: int8 code products summed in
  * int64, evaluated once per corpus row, where an interpreted HOF would
  * pay per-element lambda dispatch. */
case class DotLong(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += $a.getLong($i) * $b.getLong($i);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Left-fold squared L2 distance of two array<double> columns — exact
  * IEEE parity with `aggregate(zip_with(a, b, (x,y) => (x−y)²), 0.0, +)`.
  * THE k-means inner loop: assignment evaluates it n·k times per Lloyd
  * pass (and every IVF/IVFPQ probe routing reuses assignment), where the
  * HOF twin pays per-element interpreter dispatch and de-codegens the
  * broadcast-join stage. */
case class L2Dist2Double(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  ${ev.value} += $d * $d;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Count of index positions where two array<long> columns agree — the
  * minhash signature-agreement kernel (estimate = agreements / k),
  * identical to `aggregate(zip_with(a, b, (x,y) => if (x==y) 1 else 0),
  * 0, +)` without the per-element dispatch. */
case class CountEqualLong(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.getLong(i) == y.getLong(i)) acc += 1
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) ${ev.value}++;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** windowFunnel DP over a SORTED array<struct<t:long, s:int>> of
  * (event-time µs, 1-based stage): acc[s] = max chain-start among chains
  * reaching stage s+1, final value = deepest stage reached. One long[n]
  * accumulator for the whole user where the HOF fold (aggregate +
  * per-event transform) allocated a fresh n-array per EVENT through the
  * interpreter. Fold semantics identical to Funnel.referenceStage on
  * pre-sorted input. */
case class WindowFunnelStage(child: Expression, n: Int, windowMicros: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    ArrayExprs.windowFunnelStage(v.asInstanceOf[ArrayData], n, windowMicros)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.ArrayExprs.windowFunnelStage($c, $n, ${windowMicros}L)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Greedy sequential-completion count over the same sorted event array —
  * Funnel.referenceSeqCount's fold as a native kernel. */
case class SequenceCountFold(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    ArrayExprs.sequenceCountFold(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.ArrayExprs.sequenceCountFold($c, $n)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Portable polynomial rolling hash of a string: fold over code points,
  * acc = (acc*31 + cp) mod 1e9+7 (TextFunctions.polyHash semantics). */
case class PolyHash(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    ArrayExprs.polyHash(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.ArrayExprs.polyHash($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 62-bit SimHash over an array<long> of token hashes
  * (TextFunctions.simhashFromHashes semantics, one pass, native).
  *
  * The portable polynomial hash carries only ~30 usable bits (mod 1e9+7),
  * so each token hash is remixed into two independent 31-bit hashes —
  * xa = (x·8191 + 127) mod (2³¹−1), xb = (x·8209 + 257) mod (2³¹−1) —
  * whose bits vote for the fingerprint's lower/upper 31 bits. 62 bits keep
  * the value a positive long in both engines, and give pigeonhole bands of
  * 31 bits (maxDist 1) or ~15–16 bits (maxDist 3) — a 30-bit fingerprint's
  * 15-bit halves cap at 32 768 band values, quadratic at web scale. */
case class Simhash62(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    ArrayExprs.simhash62(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.ArrayExprs.simhash62($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** MinHash signature over an array<long> of shingle hashes: for j <
  * MinhashK, min over the array of ((31j+1251)·x + 17j+7397) mod 1e9+7.
  * (min over a multiset equals min over its distinct set, so this matches
  * the array_distinct-based HOF and oracle definitions exactly.) */
case class MinhashSig(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    ArrayExprs.minhashSig(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.ArrayExprs.minhashSig($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** k-window combine over an array<long> of token hashes, one output per
  * sliding window: either the single-fold shingle HASH
  * ((…(th₀·m + th₁)·m + …) mod HashMod with m = 8191) or the 60-bit packed
  * shingle ID (two independent folds, multipliers 8191/8209, packed as
  * h₁·HashMod + h₂). Native because this runs per WINDOW per document in
  * the dedup family's hottest path — the HOF form pays k element_at
  * interpreter dispatches per window. */
case class ShingleCombine(child: Expression, k: Int, packed: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    ArrayExprs.shingleCombine(v.asInstanceOf[ArrayData], k, packed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.ArrayExprs.shingleCombine($c, $k, $packed)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Per-document character-bigram counts of a string: one
  * struct<bg:string, n:long> per DISTINCT bigram of the input, counts
  * preserving in-document multiplicity — the map-side pre-aggregated form
  * of `explode(transform(sequence(1, len-1), i -> substr(i, 2)))` followed
  * by a (doc, bg) count. Native because the HOF form allocates a 2-char
  * string per CHARACTER of the corpus through the interpreter (the
  * engine's slowest declared query in round 4); this emits ≤ |alphabet|²
  * rows per doc from one tight loop, and drops the per-doc groupBy the
  * scoring path needed (LangModel.crossEntropy). Bigrams are code-point
  * windows, matching substr/length semantics exactly. */
case class BigramCounts(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("bg", StringType, nullable = false),
      StructField("n", LongType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(v: Any): Any =
    ArrayExprs.bigramCounts(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.ArrayExprs.bigramCounts($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Multi-band random-hyperplane LSH buckets over an array<double> vector:
  * nBands bucket ids, band b's bit j set iff dot(v, w_{b·nPlanes+j}) > 0.
  * Plane components are a deterministic integer LCG over (plane, dim) —
  * ((g·len + i)·1103515245 + 12345) mod 2039 − 1019 — so the DuckDB oracle
  * reproduces buckets exactly, and distinct (b, j) give genuinely distinct
  * hyperplanes (the earlier mod-13 phase formula had only 13). One pass
  * over nBands·nPlanes·dims multiplies, native: as a HOF this is the
  * per-element interpreter cost the bench flagged on emb_knn_lsh. */
case class LshBands(child: Expression, nPlanes: Int, nBands: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    ArrayExprs.lshBands(v.asInstanceOf[ArrayData], nPlanes, nBands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.ArrayExprs.lshBands($c, $nPlanes, $nBands)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Count of array<string> elements belonging to a fixed string set — the
  * stopword-counting kernel. Quality scoring runs it once per document and
  * language ID once per document PER LANGUAGE; the
  * `size(filter(tokens, isInCollection(...)))` HOF twin pays per-element
  * interpreter dispatch AND (being CodegenFallback) knocks the whole scan
  * stage out of WholeStageCodegen. Bit-identical counts: UTF8String
  * equality is exactly the INSET membership the HOF form tested. */
case class CountInSet(child: Expression, set: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = LongType

  @transient private lazy val lookup: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](math.max(8, set.size * 2))
    set.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && lookup.contains(a.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", lookup, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = $a.numElements();
         |${ev.value} = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && $setRef.contains($a.getUTF8String($i))) {
         |    ${ev.value}++;
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** max(|x|) over an array<double> — the int8 quantization scale kernel
  * (VectorFunctions.quantizeScale), identical to the left fold
  * `aggregate(v, 0.0, (m, x) => greatest(m, abs(x)))` on finite inputs:
  * max is order-free and the fold starts at 0.0. */
case class MaxAbsDouble(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = java.lang.Math.abs(a.getDouble(i))
      if (x > acc) acc = x
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val x = ctx.freshName("x")
      s"""
         |int $n = $a.numElements();
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = java.lang.Math.abs($a.getDouble($i));
         |  if ($x > ${ev.value}) ${ev.value} = $x;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Static helpers invoked from generated code (and reusable from eval). */
/** Count of DISTINCT common elements of two SORTED array<long> columns —
  * the allocation-free twin of `size(array_intersect(a, b))` for the
  * dedup hot re-add. `array_intersect` builds a SQLOpenHashSet per ROW;
  * under candidate-volume rows each carrying two per-doc hot arrays the
  * per-row set churn OOM'd an 8 GB heap at 160 hot shingles/doc
  * (SCALE.md round-16 third wave, stack: OpenHashSet.rehash inside the
  * codegen'd shuffle write). Two pointers with duplicate skipping over
  * pre-sorted inputs: O(|a|+|b|), zero allocation, codegen'd. Inputs
  * MUST be ascending-sorted (the docHot builders wrap collect_list in
  * sort_array — a doc-grain cost, not candidate-grain); duplicates in
  * either input count once, matching array_intersect's distinct
  * semantics. */
case class SortedIntersectCountLong(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < n && j < m) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else {
        c += 1
        while (i < n && x.getLong(i) == xv) i += 1
        while (j < m && y.getLong(j) == xv) j += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |int $i = 0; int $j = 0;
         |${ev.value} = 0L;
         |while ($i < $n && $j < $m) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else {
         |    ${ev.value}++;
         |    while ($i < $n && $a.getLong($i) == $xv) { $i++; }
         |    while ($j < $m && $b.getLong($j) == $xv) { $j++; }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object ArrayExprs {
  def polyHash(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 31L + cp) % TextFunctions.HashMod
      i += Character.charCount(cp)
    }
    acc
  }

  /** windowFunnel fold over sorted (t, s) structs — see WindowFunnelStage. */
  def windowFunnelStage(evs: ArrayData, n: Int, window: Long): Long = {
    val acc = Array.fill(n)(Long.MinValue)
    val m = evs.numElements()
    var i = 0
    while (i < m) {
      val st = evs.getStruct(i, 2)
      val t = st.getLong(0)
      val s = st.getInt(1)
      if (s == 1) { if (t > acc(0)) acc(0) = t }
      else if (s >= 2 && s <= n && acc(s - 2) != Long.MinValue &&
          t <= acc(s - 2) + window) {
        if (acc(s - 2) > acc(s - 1)) acc(s - 1) = acc(s - 2)
      }
      i += 1
    }
    var c = 0L
    var j = 0
    while (j < n) { if (acc(j) != Long.MinValue) c += 1; j += 1 }
    c
  }

  /** Greedy sequential-completion count — see SequenceCountFold. */
  def sequenceCountFold(evs: ArrayData, n: Int): Long = {
    var stg = 0
    var cnt = 0L
    val m = evs.numElements()
    var i = 0
    while (i < m) {
      val s = evs.getStruct(i, 2).getInt(1)
      if (s == stg + 1) { stg += 1; if (stg == n) { cnt += 1; stg = 0 } }
      i += 1
    }
    cnt
  }

  def simhash62(hs: ArrayData): Long = {
    val votes = new Array[Int](62)
    var i = 0
    val n = hs.numElements()
    while (i < n) {
      val x = hs.getLong(i)
      val xa = (x * 8191L + 127L) % 2147483647L
      val xb = (x * 8209L + 257L) % 2147483647L
      var b = 0
      while (b < 31) {
        if (((xa >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        if (((xb >> b) & 1L) == 1L) votes(31 + b) += 1 else votes(31 + b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 62) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def minhashSig(hs: ArrayData): ArrayData = {
    val k = TextFunctions.MinhashK
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    val n = hs.numElements()
    while (i < n) {
      val x = hs.getLong(i)
      var j = 0
      while (j < k) {
        val h = ((31L * j + 1251L) * x + 17L * j + 7397L) % TextFunctions.HashMod
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  def shingleCombine(ths: ArrayData, k: Int, packed: Boolean): ArrayData = {
    val n = ths.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val mod = TextFunctions.HashMod
    val out = new Array[Long](n - k + 1)
    var i = 0
    while (i <= n - k) {
      var h1 = 0L
      var h2 = 0L
      var o = 0
      while (o < k) {
        val th = ths.getLong(i + o)
        h1 = if (o == 0) th else (h1 * 8191L + th) % mod
        if (packed) h2 = if (o == 0) th else (h2 * 8209L + th) % mod
        o += 1
      }
      out(i) = if (packed) h1 * mod + h2 else h1
      i += 1
    }
    new GenericArrayData(out)
  }

  def bigramCounts(s: UTF8String): ArrayData = {
    val str = s.toString
    val counts = new java.util.LinkedHashMap[String, Array[Long]]()
    if (str.nonEmpty) {
      var i = 0                                          // start of bigram
      var j = Character.charCount(str.codePointAt(0))    // start of 2nd code point
      while (j < str.length) {
        val k = j + Character.charCount(str.codePointAt(j)) // end of bigram
        val bg = str.substring(i, k)
        val cell = counts.get(bg)
        if (cell == null) counts.put(bg, Array(1L)) else cell(0) += 1L
        i = j
        j = k
      }
    }
    val out = new Array[Any](counts.size())
    var idx = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out(idx) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](UTF8String.fromString(e.getKey), e.getValue()(0)))
      idx += 1
    }
    new GenericArrayData(out)
  }

  def lshBands(v: ArrayData, nPlanes: Int, nBands: Int): ArrayData = {
    val n = v.numElements()
    val out = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var bucket = 0L
      var j = 0
      while (j < nPlanes) {
        val g = b.toLong * nPlanes + j
        var dot = 0.0
        var i = 0
        while (i < n) {
          val w = ((g * n + i) * 1103515245L + 12345L) % 2039L - 1019L
          dot += v.getDouble(i) * w
          i += 1
        }
        if (dot > 0) bucket |= (1L << j)
        j += 1
      }
      out(b) = bucket
      b += 1
    }
    new GenericArrayData(out)
  }

  // Column-level entry points (Spark 4: Column <-> Expression bridging via
  // the graftbridge shim over the private[sql] ExpressionUtils)
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}
  def dot_double(a: Column, b: Column): Column = column(DotDouble(expression(a), expression(b)))
  def sorted_intersect_count(a: Column, b: Column): Column =
    column(SortedIntersectCountLong(expression(a), expression(b)))
  def dot_long(a: Column, b: Column): Column = column(DotLong(expression(a), expression(b)))
  def poly_hash(c: Column): Column = column(PolyHash(expression(c)))
  def simhash62(c: Column): Column = column(Simhash62(expression(c)))
  def minhash_sig(c: Column): Column = column(MinhashSig(expression(c)))
  def lsh_bands(v: Column, nPlanes: Int, nBands: Int): Column =
    column(LshBands(expression(v), nPlanes, nBands))
  def shingle_combine(c: Column, k: Int, packed: Boolean): Column =
    column(ShingleCombine(expression(c), k, packed))
  def bigram_counts(c: Column): Column = column(BigramCounts(expression(c)))
  def count_in_set(arr: Column, set: Seq[String]): Column =
    column(CountInSet(expression(arr), set))
  def max_abs_double(arr: Column): Column = column(MaxAbsDouble(expression(arr)))
  def l2_dist2(a: Column, b: Column): Column =
    column(L2Dist2Double(expression(a), expression(b)))
  def count_equal_long(a: Column, b: Column): Column =
    column(CountEqualLong(expression(a), expression(b)))
  def window_funnel_stage(evs: Column, n: Int, windowMicros: Long): Column =
    column(WindowFunnelStage(expression(evs), n, windowMicros))
  def sequence_count_fold(evs: Column, n: Int): Column =
    column(SequenceCountFold(expression(evs), n))
}
