package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Exact byte-pair-encoding tokenizer over a FROZEN public-format model —
  * the real subword counts behind token-budget sharding / sequence packing
  * (`TextAnalysis.bpeishCount` remains the cheap pre-token stand-in; this
  * is the exact path a training pipeline budgets with).
  *
  * Model files (the GPT-2 / Hugging Face publication format):
  *  - `merges.txt` — optional `#version` header, then one "<left> <right>"
  *    pair per line; the LINE ORDER is the merge rank.
  *  - `vocab.json` — {"token": id}; ids need not be dense.
  *
  * Algorithm (Sennrich, Haddow & Birch 2016, "Neural Machine Translation of
  * Rare Words with Subword Units"; the merge loop is step-for-step the
  * reference GPT-2 `encoder.py bpe()`): a pre-token starts as its sequence
  * of single characters; repeatedly the present pair with the LOWEST merge
  * rank is merged at ALL its (left-to-right, non-overlapping) occurrences;
  * encoding stops when no present pair has a rank. Deterministic for a
  * frozen model by construction.
  *
  * Character-level, not GPT-2's byte-level: no byte↔unicode indirection,
  * every char is implicitly in the alphabet, and a SYMBOL absent from
  * vocab.json emits id -1 (still counting 1 token) rather than raising —
  * an unknown-char document must not kill a 100 TB tokenize pass; the
  * trainer emits every observed single char into the vocab, so -1 appears
  * only on text from outside the training distribution.
  *
  * Pre-tokenizer: runs of letters, runs of digits, or single other
  * non-space chars — exactly [[graft.ext.TextAnalysis.bpeishCount]]'s
  * classes, so `bpeish` counts the pre-tokens this tokenizer starts from
  * (an invariant the specs pin). Pre-tokens are context-free: a word
  * always encodes the same way, which is what lets the DuckDB oracle
  * verify corpus-scale counts through a per-word lexicon.
  *
  * Scale shape: only the RESOURCE STRING ships through the plan — the
  * generated class resolves the model executor-side in its init via the
  * JVM-memoized [[Bpe.model]] (one classpath parse per executor per
  * model), so a 50k-merge model never serializes into the task binary the
  * way an `addReferenceObj`'d model would (the round-16 fix: the previous
  * wiring embedded the parsed vocab+ranks maps in the plan's references
  * and shipped them with every task while CLAIMING jar-side resolution).
  * The kernels run inside whole-stage codegen; the per-model word→ids
  * memo (bounded) makes the common case one hash probe per pre-token.
  * Zipf makes the memo's hit rate ≈ 1 on natural text.
  */
final case class BpeModel(vocab: Map[String, Int],
                          ranks: Map[(String, String), Int]) extends Serializable {
  /** word → token ids memo; transient (rebuilt empty per executor), bounded
    * by [[Bpe.CacheCap]] — an adversarial unbounded-vocabulary corpus
    * degrades to cache misses, never to executor OOM.
    */
  @transient lazy val memo = new java.util.concurrent.ConcurrentHashMap[String, Array[Int]]()
}

object Bpe {

  /** Default classpath resource directory holding merges.txt + vocab.json
    * (the committed fixture trained by [[graft.tools.BpeTrain]]).
    */
  val DefaultResource = "graft/bpe"

  private[graft] val CacheCap = 1 << 16

  /** The pre-tokenizer — [[graft.ext.TextAnalysis.bpeishCount]]'s classes.
    * UNICODE code-point classes (round 17): `\p{L}+|\p{N}+` runs, single
    * other non-space chars — the GPT-2 published pre-tokenizer's class
    * shape (sans contractions/space-prefix). The former ASCII classes
    * made every non-ASCII letter its own single-symbol pre-token, so
    * "café" or any non-Latin word could never merge across characters.
    * Java and DuckDB's RE2 agree on \p{L}/\p{N} per code point (astral
    * letters included — verified side by side), so the oracle
    * transcription ([[graft.Queries]] BpePreTokenRe) changes in lockstep.
    */
  private val PreToken = java.util.regex.Pattern.compile("\\p{L}+|\\p{N}+|[^\\p{L}\\p{N}\\s]")

  /** Parse GPT-2-format merges lines: rank = order of appearance; `#`
    * header and blank lines skipped. A malformed line raises with its
    * content — a silently dropped merge would tokenize every affected word
    * differently from the model's publisher.
    */
  def parseMerges(lines: Iterator[String]): Map[(String, String), Int] = {
    val b = Map.newBuilder[(String, String), Int]
    var rank = 0
    lines.foreach { raw =>
      val line = raw.stripLineEnd
      if (line.nonEmpty && !line.startsWith("#")) {
        val sp = line.split(" ", -1)
        require(sp.length == 2 && sp(0).nonEmpty && sp(1).nonEmpty,
          s"Bpe.parseMerges: malformed merges line '$line' — expected '<left> <right>'")
        b += ((sp(0), sp(1)) -> rank)
        rank += 1
      }
    }
    b.result()
  }

  /** Parse vocab.json ({"token": id}) via Jackson — the format Hugging Face
    * publishes; duplicate ids are legal (aliases), duplicate tokens are not
    * — and the parser ENFORCES that (STRICT_DUPLICATE_DETECTION): plain
    * readTree silently last-wins on duplicate keys, so a vocab where two
    * merges produced one surface token would alias the earlier merge's
    * token to the later id without a trace (round-16 review).
    */
  def parseVocab(json: String): Map[String, Int] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    mapper.enable(
      com.fasterxml.jackson.core.JsonParser.Feature.STRICT_DUPLICATE_DETECTION)
    val node = mapper.readTree(json)
    require(node != null && node.isObject, "Bpe.parseVocab: vocab.json is not a JSON object")
    import scala.jdk.CollectionConverters._
    node.fields().asScala.map { e =>
      require(e.getValue.isIntegralNumber,
        s"Bpe.parseVocab: id of token '${e.getKey}' is not integral: ${e.getValue}")
      e.getKey -> e.getValue.asInt()
    }.toMap
  }

  /** Load a model from `resource`/merges.txt + `resource`/vocab.json on the
    * classpath. Executors resolve the same resource from the application
    * jar, so a 50k-merge model never ships per task.
    */
  def fromResource(resource: String): BpeModel = {
    def read(name: String): String = {
      val path = s"$resource/$name"
      val in = Thread.currentThread().getContextClassLoader.getResourceAsStream(path)
      require(in != null, s"Bpe: classpath resource '$path' not found — " +
        "commit the trained model (graft.tools.BpeTrain) or pass its resource dir")
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    }
    BpeModel(parseVocab(read("vocab.json")),
      parseMerges(read("merges.txt").linesIterator))
  }

  private val byResource =
    new java.util.concurrent.ConcurrentHashMap[String, BpeModel]()

  /** JVM-memoized [[fromResource]] — one parse per executor per model. */
  def model(resource: String): BpeModel =
    byResource.computeIfAbsent(resource, fromResource(_))

  /** BPE-encode one pre-token to its subword strings (no memo — the memo
    * lives at the id layer in [[idsOf]]).
    */
  def encodeWord(m: BpeModel, word: String): Array[String] = {
    if (word.isEmpty) return Array.empty
    // split at CODE POINTS: a surrogate pair is one symbol, not two
    // unpaired halves that could never appear in a trained vocab
    var parts: Array[String] = {
      val out = new scala.collection.mutable.ArrayBuffer[String](word.length)
      var i = 0
      while (i < word.length) {
        val cp = word.codePointAt(i)
        val n = Character.charCount(cp)
        out += word.substring(i, i + n)
        i += n
      }
      out.toArray
    }
    var done = parts.length <= 1
    while (!done) {
      // lowest-rank present pair
      var best = Int.MaxValue
      var i = 0
      while (i < parts.length - 1) {
        val r = m.ranks.getOrElse((parts(i), parts(i + 1)), Int.MaxValue)
        if (r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val rank = best
        val out = new scala.collection.mutable.ArrayBuffer[String](parts.length)
        var j = 0
        while (j < parts.length) {
          if (j < parts.length - 1 &&
              m.ranks.getOrElse((parts(j), parts(j + 1)), Int.MaxValue) == rank) {
            out += parts(j) + parts(j + 1)
            j += 2
          } else {
            out += parts(j)
            j += 1
          }
        }
        parts = out.toArray
        done = parts.length <= 1
      }
    }
    parts
  }

  /** Token ids of one pre-token, memoized per model. Unknown symbol ⇒ -1. */
  def idsOf(m: BpeModel, word: String): Array[Int] = {
    var ids = m.memo.get(word)
    if (ids == null) {
      ids = encodeWord(m, word).map(t => m.vocab.getOrElse(t, -1))
      if (m.memo.size < CacheCap) m.memo.put(word, ids)
    }
    ids
  }

  // ---- codegen kernels (static calls referenced from doGenCode) ----

  def tokenCount(m: BpeModel, text: UTF8String): Long = {
    val mt = PreToken.matcher(text.toString)
    var n = 0L
    while (mt.find()) n += idsOf(m, mt.group()).length
    n
  }

  def tokenIds(m: BpeModel, text: UTF8String): ArrayData = {
    val mt = PreToken.matcher(text.toString)
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    while (mt.find()) {
      val ids = idsOf(m, mt.group())
      var i = 0
      while (i < ids.length) { out += ids(i); i += 1 }
    }
    new GenericArrayData(out.toArray)
  }
}

/** Shared shape of the two BPE expressions: (text STRING, resource STRING
  * literal) — the resource names the frozen model, resolved ONCE at plan
  * time and shipped as a codegen reference object (the frozen-model
  * convention), so per-row work is the kernel call alone.
  */
sealed trait BpeExpression extends BinaryExpression {
  def text: Expression
  def resourceExpr: Expression
  override def left: Expression = text
  override def right: Expression = resourceExpr

  override def checkInputDataTypes(): TypeCheckResult =
    (text.dataType, resourceExpr.dataType) match {
      case (StringType, StringType) if resourceExpr.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (StringType, StringType) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName: the model resource must be a literal (got a non-foldable expression)")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string text, string resource literal), got ${l.sql} and ${r.sql}")
    }

  /** The resource name, validated at plan time (foldable per
    * checkInputDataTypes). Only THIS string enters the generated code —
    * the model itself resolves executor-side ([[resolveModel]]).
    */
  @transient protected lazy val resourceName: String = {
    val r = resourceExpr.eval(null)
    require(r != null, s"$prettyName: the model resource literal is NULL")
    r.toString
  }

  /** Interpreted-path model handle: resolves via the JVM-memoized
    * [[Bpe.model]] wherever the (serialized) expression lands, so the
    * interpreted and codegen paths share one executor-side loading story.
    */
  @transient protected lazy val model: BpeModel = Bpe.model(resourceName)

  /** Generated-class model slot: initialized ONCE per generated-class
    * instance from the resource string (`Bpe.model` memoizes per JVM), so
    * per-row code touches a plain field and the plan references carry a
    * short string instead of the vocab+ranks maps.
    */
  protected def resolveModel(ctx: CodegenContext): String = {
    val res = ctx.addReferenceObj("bpeResource", resourceName, "java.lang.String")
    ctx.addMutableState("graft.functions.BpeModel", "bpeModel",
      v => s"$v = graft.functions.Bpe.model($res);", forceInline = true)
  }
}

/** `graft_bpe_count(text, resource)` → BIGINT exact token count. */
case class BpeTokenCount(text: Expression, resourceExpr: Expression)
    extends BpeExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bpe_count"

  override protected def nullSafeEval(t: Any, r: Any): Any =
    Bpe.tokenCount(model, t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = resolveModel(ctx)
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = graft.functions.Bpe.tokenCount($m, $t);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(text = newLeft, resourceExpr = newRight)
}

/** `graft_bpe_ids(text, resource)` → ARRAY<INT> token ids in text order
  * (unknown symbol ⇒ -1, the scaladoc contract above).
  */
case class BpeTokenIds(text: Expression, resourceExpr: Expression)
    extends BpeExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_bpe_ids"

  override protected def nullSafeEval(t: Any, r: Any): Any =
    Bpe.tokenIds(model, t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = resolveModel(ctx)
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = graft.functions.Bpe.tokenIds($m, $t);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(text = newLeft, resourceExpr = newRight)
}
