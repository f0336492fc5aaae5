package graft

import org.apache.spark.sql.functions._

import graft.functions.{Bpe, BpeModel}

/** The exact BPE tokenizer ([[graft.functions.Bpe]]). The ALGORITHM is
  * verified against hand-computed vectors on a hand-written tiny model —
  * independent of [[graft.tools.BpeTrain]], so the committed fixture can
  * never vouch for the code that generated it — and the FIXTURE is pinned
  * by a lockstep check (every lexicon.tsv row must re-derive through the
  * live encoder), which is also what keeps the DuckDB oracle transcription
  * honest.
  */
class BpeSpec extends SparkSpec {

  /** Hand model: merges (a,b) < (ab,c) < (b,c); vocab covers the merge
    * products but deliberately NOT "aa" (unknown-symbol coverage).
    */
  private val m = BpeModel(
    vocab = Map("a" -> 0, "b" -> 1, "c" -> 2, "ab" -> 3, "abc" -> 4, "bc" -> 5),
    ranks = Map(("a", "b") -> 0, ("ab", "c") -> 1, ("b", "c") -> 2))

  test("encodeWord replays the published merge loop: lowest rank first, all occurrences, stop when rankless") {
    // (a,b) fires first even though (b,c) is also present; then (ab,c)
    assert(Bpe.encodeWord(m, "abc").toSeq == Seq("abc"))
    // (b,c) fires only when no lower-rank pair is present
    assert(Bpe.encodeWord(m, "bc").toSeq == Seq("bc"))
    assert(Bpe.encodeWord(m, "cab").toSeq == Seq("c", "ab"))
    // ALL occurrences of the chosen pair merge in one pass
    assert(Bpe.encodeWord(m, "abab").toSeq == Seq("ab", "ab"))
    // merging never resurrects: "aabb" -> a [ab] b, then nothing applies
    assert(Bpe.encodeWord(m, "aabb").toSeq == Seq("a", "ab", "b"))
    // no applicable merge at all
    assert(Bpe.encodeWord(m, "cc").toSeq == Seq("c", "c"))
    assert(Bpe.encodeWord(m, "").isEmpty)
  }

  test("idsOf maps through vocab with -1 for unknown symbols, memoized") {
    assert(Bpe.idsOf(m, "abc").toSeq == Seq(4))
    assert(Bpe.idsOf(m, "cab").toSeq == Seq(2, 3))
    // 'd' is not in vocab: encodes as itself, id -1 (count still 1)
    assert(Bpe.idsOf(m, "d").toSeq == Seq(-1))
    // memo returns the same ids on the second call
    assert(Bpe.idsOf(m, "abc").toSeq == Seq(4))
  }

  test("kernels pre-tokenize with bpeishCount's classes and sum/concat per pre-token") {
    import org.apache.spark.unsafe.types.UTF8String
    // pre-tokens: "abc", "bc", "," (unknown single char), "cab"
    val t = UTF8String.fromString("abc bc, cab")
    assert(Bpe.tokenCount(m, t) == 5L) // 1 + 1 + 1 + 2
    assert(Bpe.tokenIds(m, t).toIntArray().toSeq == Seq(4, 5, -1, 2, 3))
    assert(Bpe.tokenCount(m, UTF8String.fromString("")) == 0L)
    assert(Bpe.tokenIds(m, UTF8String.fromString("  ")).numElements() == 0)
  }

  test("surrogate pairs split at code points, not UTF-16 units") {
    // U+1F600 is one symbol; an unpaired-half split could never match a
    // trained vocab and would double-count
    val w = new String(Character.toChars(0x1F600)) + "a"
    assert(Bpe.encodeWord(m, w).toSeq == Seq(new String(Character.toChars(0x1F600)), "a"))
  }

  test("parseMerges: rank = line order, header/blank skipped, malformed raises") {
    val r = Bpe.parseMerges(Iterator("#version: 0.2", "", "a b", "ab c"))
    assert(r == Map(("a", "b") -> 0, ("ab", "c") -> 1))
    val e = intercept[IllegalArgumentException](
      Bpe.parseMerges(Iterator("a b c")))
    assert(e.getMessage.contains("a b c"))
    val e2 = intercept[IllegalArgumentException](
      Bpe.parseVocab("""["not", "an", "object"]"""))
    assert(e2.getMessage.contains("not a JSON object"))
  }

  test("the committed fixture loads and every lexicon row re-derives through the live encoder") {
    val model = Bpe.model(Bpe.DefaultResource)
    assert(model.ranks.nonEmpty && model.vocab.nonEmpty)
    val in = Thread.currentThread().getContextClassLoader
      .getResourceAsStream("graft/bpe/lexicon.tsv")
    assert(in != null, "lexicon.tsv missing")
    val rows = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    val lex = rows.linesIterator.filter(_.nonEmpty).map(_.split("\t", -1)).toSeq
    assert(lex.nonEmpty)
    lex.foreach { p =>
      val ids = Bpe.idsOf(model, p(0))
      assert(ids.length == p(2).toInt && ids.mkString(",") == p(3),
        s"lexicon drift on '${p(0)}': fixture says (${p(2)}, ${p(3)}), " +
          s"encoder says (${ids.length}, ${ids.mkString(",")}) — retrain " +
          "the fixture (graft.tools.BpeTrain) and regenerate in lockstep")
      // the fixture's own corpus never encodes an unknown symbol
      assert(!ids.contains(-1), s"'${p(0)}' encodes an out-of-vocab symbol")
    }
  }

  test("property: encoding is lossless and bounded under a large generated merge table") {
    // a GPT-2-shaped model (hundreds of merges, multi-char alphabet) built
    // deterministically; for EVERY word: (a) the tokens concatenate back
    // to the word exactly — the merge loop can never lose, duplicate, or
    // reorder a character; (b) 1 <= tokens <= codepoints; (c) encoding is
    // deterministic (memo and non-memo paths agree)
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdefgh"
    def word(len: Int): String = Array.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString
    // grow merges the way training does: each merge's parts are tokens the
    // previous merges can actually produce, so deep merge chains exercise
    val tokens = scala.collection.mutable.ArrayBuffer[String](alphabet.map(_.toString): _*)
    val merges = scala.collection.mutable.LinkedHashMap[(String, String), Int]()
    while (merges.size < 500) {
      val p = (tokens(rnd.nextInt(tokens.length)), tokens(rnd.nextInt(tokens.length)))
      if (!merges.contains(p) && (p._1 + p._2).length <= 12) {
        merges(p) = merges.size
        tokens += (p._1 + p._2)
      }
    }
    val m = BpeModel(tokens.zipWithIndex.toMap, merges.toMap)
    (1 to 500).foreach { i =>
      val w = word(1 + rnd.nextInt(24))
      val enc = Bpe.encodeWord(m, w)
      assert(enc.mkString == w, s"lossy encode of '$w': ${enc.mkString(" ")}")
      assert(enc.length >= 1 && enc.length <= w.length, s"'$w' -> ${enc.length} tokens")
      assert(Bpe.idsOf(m, w).toSeq == enc.map(t => m.vocab.getOrElse(t, -1)).toSeq,
        s"memoized ids diverge for '$w'")
    }
  }

  test("column API: exact count >= pre-token count (bpeish), NULL text reads 0/empty") {
    import graft.ext.TextAnalysis
    val docs = graft.sources.Tables.load(spark, sf(), "documents")
      .select(col("doc_id"), col("text"))
      .union(spark.sql("SELECT -1L AS doc_id, CAST(NULL AS STRING) AS text"))
    val r = docs.select(
      TextAnalysis.bpeTokenCount(col("text")).as("n_bpe"),
      TextAnalysis.bpeishCount(col("text")).cast("long").as("n_pre"),
      TextAnalysis.bpeTokenIds(col("text")).as("ids")).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (nBpe, nPre) = (row.getLong(0), row.getLong(1))
      assert(nBpe >= nPre, s"exact count $nBpe < pre-token count $nPre")
      assert(row.getSeq[Int](2).length == nBpe)
    }
    // the NULL-text row measured 0, not -1/NULL
    val nulls = docs.filter(col("doc_id") === -1L)
      .select(TextAnalysis.bpeTokenCount(col("text"))).head().getLong(0)
    assert(nulls == 0L)
  }

  test("a non-literal model resource is rejected at analysis time") {
    val e = intercept[Exception] {
      spark.range(1).select(call_function("graft_bpe_count",
        lit("abc"), concat(lit("graft"), col("id").cast("string")))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("literal"))
  }

  test("adversarial unicode: combining marks, astral-plane runs, ZWJ sequences (round-16 sweep)") {
    // combining mark U+0301 is its OWN symbol — a model merging (e, ́)
    // must produce the two-code-unit token and leave the base word intact
    val acc = BpeModel(
      vocab = Map("c" -> 0, "a" -> 1, "f" -> 2, "e" -> 3, "é" -> 4),
      ranks = Map(("e", "́") -> 0))
    assert(Bpe.encodeWord(acc, "café").toSeq == Seq("c", "a", "f", "é"))
    assert(Bpe.idsOf(acc, "café").toSeq == Seq(0, 1, 2, 3 + 1))
    // astral-plane run (U+1D54F, a surrogate pair per symbol): merges
    // apply left-to-right non-overlapping over CODE POINTS — three X's
    // merge the first two, never pair a stray low surrogate
    val x = "𝕏"
    val astral = BpeModel(
      vocab = Map(x -> 0, (x + x) -> 1),
      ranks = Map((x, x) -> 0))
    assert(Bpe.encodeWord(astral, x * 3).toSeq == Seq(x + x, x))
    assert(Bpe.idsOf(astral, x * 3).toSeq == Seq(1, 0))
    // a ZWJ emoji sequence is three symbols under an empty model, all
    // unknown ⇒ -1 each, still COUNTED (the unknown-symbol contract)
    val empty = BpeModel(vocab = Map.empty, ranks = Map.empty)
    val zwj = "👩‍💻" // woman + ZWJ + laptop
    assert(Bpe.idsOf(empty, zwj).toSeq == Seq(-1, -1, -1))
    // the kernel's pre-tokenizer is code-point-aware too: two astral
    // symbols are two single-char pre-tokens, not four UTF-16 halves
    assert(Bpe.tokenCount(empty,
      org.apache.spark.unsafe.types.UTF8String.fromString(x + " " + x)) == 2L)
  }

  test("whole-pipeline x66/x69 rows over non-ASCII words match the committed lexicon (round-17 unicode classes)") {
    import spark.implicits._
    // the committed lexicon is the EXPECTATION side — the same artifact
    // the DuckDB oracle joins; parsing it here keeps the assertions
    // independent of the live encoder
    val in = Thread.currentThread().getContextClassLoader
      .getResourceAsStream("graft/bpe/lexicon.tsv")
    assert(in != null, "lexicon.tsv missing")
    val lex = (try new String(in.readAllBytes(), "UTF-8") finally in.close())
      .linesIterator.filter(_.nonEmpty).map(_.split("\t", -1))
      .map(p => p(0) -> ((p(2).toInt, p(3)))).toMap
    // the fixture must actually CARRY non-ASCII words now, and they must
    // merge across characters (the whole point of the class change: under
    // the ASCII pre-tokenizer a non-ASCII word could never appear as one
    // lexicon pre-token at all)
    val nonAscii = lex.keys.filter(_.exists(_ > 127)).toSeq.sorted
    assert(nonAscii.size >= 100, s"only ${nonAscii.size} non-ASCII lexicon words")
    assert(nonAscii.exists(w => w.codePointCount(0, w.length) > 1 &&
      lex(w)._1 < w.codePointCount(0, w.length)),
      "no multi-char non-ASCII word merged below its code-point count")
    def idsOfText(words: Seq[String]): Seq[Int] =
      words.flatMap(w => lex(w)._2.split(",").map(_.toInt))
    val docA = nonAscii.take(8)                   // < 32 tokens: one chunk
    val docB = nonAscii.slice(8, 88)              // well past 2 windows
    val tmp = java.nio.file.Files.createTempDirectory("graft_bpe_nonascii")
    Seq((1L, docA.mkString(" ")), (2L, docB.mkString(" ")),
        (3L, "☃☃☃ ₿"))                            // outside the lexicon: -1s, never a raise
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(tmp.resolve("documents.parquet").toString)
    // x66 end-to-end: per-doc exact count + id csv
    val x66 = SparkEntry.queries("x66_bpe_token_count")(spark, tmp.toString)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(x66(1L) === ((idsOfText(docA).size.toLong, idsOfText(docA).mkString(","))))
    assert(x66(2L) === ((idsOfText(docB).size.toLong, idsOfText(docB).mkString(","))))
    assert(x66(3L) === ((4L, "-1,-1,-1,-1")), s"unknown symbols must count as -1s: ${x66(3L)}")
    // x69 end-to-end: window/stride chunking over the exact id sequence —
    // replicate the kept-starts rule (starts at stride steps; a tail start
    // survives only at 0 or when it still covers new tokens)
    val x69 = SparkEntry.queries("x69_bpe_chunks")(spark, tmp.toString)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getString(4)).toMap
    def expectedChunks(ids: Seq[Int], window: Int = 32, stride: Int = 16) =
      Iterator.from(0, stride).map(_.toLong)
        .takeWhile(s => s < ids.size && (s == 0 || s + window - stride < ids.size))
        .map(s => s -> ids.slice(s.toInt, s.toInt + window).mkString(",")).toMap
    for ((doc, words) <- Seq(1L -> docA, 2L -> docB)) {
      val exp = expectedChunks(idsOfText(words))
      val got = x69.collect { case ((d, s), c) if d == doc => s -> c }
      assert(got === exp, s"doc $doc chunks: got $got expected $exp")
    }
  }

  test("memo under concurrent first-touch: identical results, bounded size (round-16 sweep)") {
    val model = Bpe.fromResource(Bpe.DefaultResource) // fresh memo, un-shared
    val words = (0 until 2000).map(i => s"stream${i % 503}ing")
    val expected = words.distinct.map(w => w -> Bpe.encodeWord(model, w)
      .map(t => model.vocab.getOrElse(t, -1)).toSeq).toMap
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val tasks = (0 until 8).map { t =>
        pool.submit(new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean = words.drop(t * 13).forall(w =>
            Bpe.idsOf(model, w).toSeq == expected(w))
        })
      }
      assert(tasks.forall(_.get()), "a concurrent first-touch returned wrong ids")
    } finally pool.shutdown()
    // racing first-touches may overshoot the guard by at most #threads - 1
    assert(model.memo.size <= graft.functions.Bpe.CacheCap + 8)
  }

  test("parseVocab rejects duplicate token keys instead of silently last-winning (round-16 sweep)") {
    val e = intercept[Exception](Bpe.parseVocab("""{"ab": 1, "ab": 2}"""))
    assert(e.getMessage.toLowerCase.contains("duplicate"), e.getMessage)
    // duplicate IDS stay legal (aliases)
    assert(Bpe.parseVocab("""{"a": 1, "b": 1}""") == Map("a" -> 1, "b" -> 1))
  }
}
