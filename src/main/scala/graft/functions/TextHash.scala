package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels + Catalyst expressions for the per-document text-hashing
  * hot paths (SimHash signatures, winnowing fingerprints). As expressions
  * they stay inside whole-stage codegen — no ScalaUDF row boxing on the
  * document scan. Tokenization and hashing are kept byte-identical to the
  * previous UDFs (`trim.split("\\s+")` + [[Hashing.md5Hash60]]), which the
  * x04/x10 DuckDB oracles transcribe.
  */
object TextHash {

  /** SimHash over word occurrence hashes: per-word 60-bit md5 prefix, per-bit
    * occurrence majority. Empty/whitespace-only text yields signature 0, the
    * same value the oracle's COALESCE supplies for token-less docs.
    */
  def simHash(text: UTF8String, bits: Int): Long = {
    val acc = new Array[Int](bits)
    text.toString.trim.split("\\s+").foreach { w =>
      if (w.nonEmpty) {
        val h = Hashing.md5Hash60(w)
        var i = 0
        while (i < bits) { if (((h >>> i) & 1L) == 1L) acc(i) += 1 else acc(i) -= 1; i += 1 }
      }
    }
    var sig = 0L
    var i = 0
    while (i < bits) { if (acc(i) > 0) sig |= (1L << i); i += 1 }
    sig
  }

  /** Repetition statistics in ONE O(n) pass: returns
    * [dup_token_frac, top_bigram_frac] (the Gopher/MassiveText repetition
    * filters). A higher-order-function formulation of the same math runs
    * interpreted per lambda element and re-evaluates the gram array per
    * probe — measured ~1400× slower than this kernel on the bench corpus
    * (380 s vs 0.27 s at sf0.1). The divisions are inexact IEEE ops; the
    * doubles hash-match the oracle because BOTH engines execute the
    * identical operations in the identical order (1.0 - d/n, max/nb) —
    * keep that order when touching either side.
    */
  def repetition(text: UTF8String): ArrayData = {
    val toks = text.toString.trim.split("\\s+").filter(_.nonEmpty)
    val n = toks.length
    val dup =
      if (n > 0) {
        val distinct = new java.util.HashSet[String]()
        toks.foreach(distinct.add)
        1.0 - distinct.size.toDouble / n
      } else 0.0
    val topb =
      if (n >= 2) {
        val counts = new java.util.HashMap[String, Int]()
        var max = 0
        var i = 0
        while (i < n - 1) {
          val c = counts.merge(toks(i) + " " + toks(i + 1), 1, Integer.sum)
          if (c > max) max = c
          i += 1
        }
        max.toDouble / (n - 1)
      } else 0.0
    new GenericArrayData(Array[Any](dup, topb))
  }

  /** Winnowing fingerprints (Schleimer et al., SIGMOD'03): k-gram md5-60
    * hashes in token order, min of each w-window, per-document distinct.
    */
  def fingerprints(text: UTF8String, k: Int, w: Int): ArrayData = {
    val toks = text.toString.trim.split("\\s+").filter(_.nonEmpty)
    val out: Array[Long] =
      if (toks.length < k) Array.empty[Long]
      else {
        val hashes = toks.sliding(k).map(gram => Hashing.md5Hash60(gram.mkString(" "))).toArray
        if (hashes.length <= w) Array(hashes.min)
        else {
          // monotonic-deque window minimum: one amortized comparison per
          // hash instead of re-scanning w elements per window (the
          // sliding(w).map(_.min) form cost O(n·w) on this codegen hot
          // path); emits the same per-window minima in the same order,
          // then first-occurrence distinct — equivalence property-pinned
          val m = hashes.length
          val dq = new Array[Int](m)
          var head = 0
          var tail = 0
          val seen = new java.util.HashSet[java.lang.Long]()
          val res = Array.newBuilder[Long]
          var i = 0
          while (i < m) {
            while (tail > head && hashes(dq(tail - 1)) >= hashes(i)) tail -= 1
            dq(tail) = i
            tail += 1
            if (dq(head) <= i - w) head += 1
            if (i >= w - 1) {
              val v = hashes(dq(head))
              if (seen.add(v)) res += v
            }
            i += 1
          }
          res.result()
        }
      }
    new GenericArrayData(out)
  }
}

/** `graft_simhash(text string, bits int-literal) → long`. */
case class SimHash60(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  private lazy val bits: Int = Lsh.literalInt(right, "bits")
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, IntegerType)
        if Lsh.literalIntOpt(right).exists(b => b > 0 && b <= 60) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_simhash requires (string, literal int bits in 1..60)")
  }

  override protected def nullSafeEval(t: Any, _b: Any): Any =
    TextHash.simHash(t.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = graft.functions.TextHash.simHash($t, $bits);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_fingerprints(text string, k, w) → array<long>`. */
case class WinnowFingerprints(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  private lazy val k: Int = Lsh.literalInt(second, "k")
  private lazy val w: Int = Lsh.literalInt(third, "w")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, IntegerType, IntegerType)
          if Lsh.literalIntOpt(second).exists(_ > 0) &&
            Lsh.literalIntOpt(third).exists(_ > 0) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_fingerprints requires (string, literal k > 0, literal w > 0)")
    }

  override protected def nullSafeEval(t: Any, _k: Any, _w: Any): Any =
    TextHash.fingerprints(t.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, _, _) =>
      s"${ev.value} = graft.functions.TextHash.fingerprints($t, $k, $w);")

  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** `graft_repetition(text string) → array<double>` of
  * [dup_token_frac, top_bigram_frac].
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_repetition requires a string input, got ${other.sql}")
  }

  override protected def nullSafeEval(t: Any): Any =
    TextHash.repetition(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.TextHash.repetition($t);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
