package graft.ext

import org.apache.spark.sql.{DataFrame, expressions}
import org.apache.spark.sql.functions._

/** Token-budget sharding: pack documents into shards of ≈`tokensPerShard`
  * tokens — the layout step before writing training shards (sequence
  * packing happens per shard downstream; this op decides which docs land
  * together and is the unit a 1000-executor writer parallelizes over).
  *
  * Scale shape: a single global running-sum window would serialize the
  * corpus through ONE partition (no partitionBy ⇒ one window partition),
  * so packing is two-level instead: documents hash into `nBuckets`
  * independent buckets (deterministic md5 of (seed, id) — also shuffles
  * related docs apart, the usual pre-training mix), and each bucket packs
  * greedily by running token sum over its own doc_id order. Every bucket
  * is an independent window partition, so the job parallelizes to
  * min(nBuckets, executors) with no global sort and no driver
  * participation; the cost is at most one under-filled shard per bucket.
  * Size `nBuckets` ≈ cluster cores (it bounds BOTH parallelism and the
  * under-fill waste).
  */
object Sharding {

  /** Shard ids are `bucket * 2³² + shard-within-bucket`, so ids are stable
    * under corpus growth within a bucket's packed prefix.
    */
  val ShardsPerBucket: Long = 1L << 32

  /** The configured-token-count gate shared by [[packByTokens]],
    * [[packSequences]], and the CurationPipeline's batch/stream stages: a
    * null count would silently pack as 0, a negative one would shrink
    * every later doc's running offset in its bucket, and a NaN /
    * infinite / fractional floating-point count would silently truncate
    * (or overflow) through the long cast — fail loudly, naming the
    * offending document. The guard compares through a double cast (never
    * throws, any numeric type), so the raise fires BEFORE the otherwise
    * branch's long cast could. ONE definition so the call sites cannot
    * drift apart (the batch ≡ stream equivalence contract includes the
    * error surface).
    */
  private[ext] def tokenCountOrRaise(df: DataFrame, c: String, idCol: String,
                                     context: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.types.{ByteType, DecimalType, IntegerType, LongType, ShortType}
    // scale-0 decimals are integral by TYPE: their exact value survives the
    // long cast below, so they take the exact-emit path like the long
    // family. Any other type (string, float, scaled decimal) is read
    // through the double LENS — exact only up to 2^53, so values above
    // that raise instead of emitting a silently-rounded count (the
    // off-by-one corruption this guard exists to reject).
    val dt = df.schema(c).dataType
    val isIntegral =
      Seq(ByteType, ShortType, IntegerType, LongType).contains(dt) ||
        (dt match { case d: DecimalType => d.scale == 0; case _ => false })
    // try_cast, not cast: a NON-CASTABLE value ("N/A" in a string-typed
    // count column) must reach THIS guard's document-naming raise — a
    // plain cast throws a generic CAST_INVALID_INPUT under ANSI, and under
    // non-ANSI it yields NULL on which every other predicate evaluates
    // NULL, dropping the row into otherwise() as a silent NULL count
    val d = expr(s"try_cast(`${c.replace("`", "``")}` AS DOUBLE)")
    // isnan first: Spark's NaN = NaN is TRUE, so the floor comparison
    // alone would pass NaN through; the bound rejects +Infinity and
    // anything the emit path below cannot represent EXACTLY — the full
    // long range for integral-typed input, but only 2^53 for input read
    // through the double lens (a double-typed count of 2^53 + 1 passes a
    // 9.2e18 bound and then silently rounds through the cast)
    val exactBound = if (isIntegral) 9.2e18 else 9007199254740992.0
    when(col(c).isNull || d.isNull || isnan(d) || d < 0 || d =!= floor(d) || d > exactBound,
      raise_error(concat(
        lit(s"$context: null/negative/non-integral token count in '$c' at $idCol="),
        col(idCol).cast("string"))).cast("long"))
      // emit the EXACT original value for integral input types (the double
      // is only the guard's lens — above 2^53 it rounds, and an off-by-one
      // count is the silent corruption this guard rejects); string/floating
      // inputs cast from the verified double ("9.0" as a string would be a
      // malformed long cast under ANSI)
      .otherwise(if (isIntegral) col(c).cast("long") else d.cast("long"))
  }

  /** Appends (n_tokens, bucket, shard) to every document's row — payload
    * columns pass through for pipeline use. Deterministic: a pure function
    * of (seed, ids, token counts, texts) — reruns and repartitioning
    * cannot move a doc, including under duplicate ids (ties order by
    * token count then text hash). PRECISION of that guarantee: rows
    * identical in (id, count, text) but differing in PAYLOAD columns are
    * mutually interchangeable — the multiset of assigned (shard, offsets)
    * is rerun-stable, but which payload lands on which of those slots may
    * swap between reruns (the tiebreak deliberately orders by the
    * oracle-transcribable triple only; give such twins distinct ids if
    * payload placement must be stable).
    * Packing is by start offset: a doc belongs to the shard its
    * within-bucket cumulative token offset falls in, so every shard spans
    * exactly `tokensPerShard` offset units and can overflow by at most the
    * tail of one straddling document (documents are never split).
    *
    * `tokenCountCol` plugs in a precomputed token count (e.g. real BPE
    * counts from the training tokenizer, typically materialized by a
    * tokenize pass upstream) — shard budgets then measure model tokens
    * instead of the whitespace default. The default stays whitespace so
    * the packing is a pure function of the text (and oracle-checkable
    * without a tokenizer in the loop).
    */
  def packByTokens(df: DataFrame, idCol: String, textCol: String,
                   tokensPerShard: Long, nBuckets: Int = 256,
                   seed: String = "shard",
                   tokenCountCol: Option[String] = None): DataFrame = {
    require(tokensPerShard > 0, s"tokensPerShard must be positive: $tokensPerShard")
    require(nBuckets > 0, s"nBuckets must be positive: $nBuckets")
    tokenCountCol.foreach(c => require(df.columns.contains(c),
      s"packByTokens: token count column '$c' not in input (${df.columns.mkString(", ")})"))
    // only "n_tokens" may legitimately pre-exist, and only when it IS the
    // declared token-count input — a tokenCountCol named after any OTHER
    // reserved column (e.g. "shard") would be silently overwritten by the
    // packing bookkeeping, so it gets no exemption (packSequences' rule)
    Seq("n_tokens", "bucket", "shard", "cum_before").foreach(c => require(
      !df.columns.contains(c) || (c == "n_tokens" && tokenCountCol.contains(c)),
      s"packByTokens writes column '$c' — input already has one; rename or drop it first"))
    val nTokens = tokenCountCol
      .map(tokenCountOrRaise(df, _, idCol, "packByTokens"))
      .getOrElse(size(TextAnalysis.tokens(col(textCol))).cast("long"))
    // ordering ties broken by (n_tokens, md5-60 text hash): with DUPLICATE
    // ids an id-only sort gives tied rows arbitrary relative order per
    // run, so cum_before — hence shard — would differ between reruns.
    // md5-60 (not xxhash64) so the DuckDB oracles can transcribe the SAME
    // tiebreak; text coalesces to '' (NULL would sort differently across
    // engines). Remaining ties are rows identical in (id, count, text),
    // which are interchangeable: any order yields the same assignment.
    val w = expressions.Window.partitionBy("bucket")
      .orderBy(col(idCol), col("n_tokens"),
        graft.functions.Hashing.md5Hash60Col(coalesce(col(textCol), lit(""))))
      .rowsBetween(expressions.Window.unboundedPreceding, -1)
    df.withColumn("n_tokens", nTokens)
      .withColumn("bucket", Sampling.hash60(col(idCol), seed) % nBuckets)
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("shard",
        col("bucket") * ShardsPerBucket + expr(s"cum_before div $tokensPerShard"))
      .drop("cum_before")
  }

  /** Overlapping token-window chunking — the retrieval/RAG prep step that
    * splits each document into fixed-size token windows with a stride
    * (LangChain/LlamaIndex-style "chunk_size / chunk_overlap", overlap =
    * `window - stride`), so each chunk can be embedded and indexed
    * independently while overlap preserves cross-boundary context.
    *
    * Window placement: starts at 0, stride, 2·stride, …; a start is kept
    * while it contributes at least one token beyond the previous chunk's
    * end (`s == 0` or `s + window - stride < n`), which (a) guarantees the
    * final token is always covered, and (b) never emits a chunk fully
    * contained in its predecessor. Documents with zero tokens emit no rows.
    *
    * Scale shape: fully NARROW — the kept starts and their chunk texts are
    * built inside the document's own row (`filter`/`transform` over a
    * `sequence`, the wordNGrams construction) and only the per-chunk
    * structs explode, so the token array is never duplicated per chunk and
    * there is ZERO shuffle at any corpus size; a 1000-executor job chunks
    * each partition independently.
    *
    * Output: (idCol, chunk_id LONG — 0-based per doc in start order,
    * start_token LONG — 0-based, n_chunk_tokens LONG ≤ window,
    * chunk_text STRING — space-joined tokens).
    */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
                    window: Int, stride: Int): DataFrame = {
    require(window > 0, s"window must be positive: $window")
    require(stride > 0 && stride <= window, s"stride must be in [1, window]: $stride")
    // the packByTokens reserved-column stance: an idCol named like an
    // intermediate (e.g. "__n") would be silently REPLACED by the token
    // count — every chunk then carries the count as its document id
    Seq("__t", "__n", "__c", "chunk_id", "start_token", "n_chunk_tokens", "chunk_text")
      .foreach { c =>
        require(idCol != c && textCol != c,
          s"chunkByTokens writes column '$c' — rename the id/text column first")
      }
    val toked = df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__t"))
      .withColumn("__n", size(col("__t")).cast("long"))
      .filter(col("__n") >= 1)
    val keptStarts = filter(
      sequence(lit(0L), col("__n") - 1, lit(stride.toLong)),
      s => (s === 0L) || (s + lit((window - stride).toLong) < col("__n")))
    val chunks = transform(keptStarts, s => struct(
      s.as("start_token"),
      concat_ws(" ", slice(col("__t"), (s + 1).cast("int"), lit(window))).as("chunk_text")))
    toked
      .select(col(idCol), col("__n"), posexplode(chunks).as(Seq("chunk_id", "__c")))
      .select(col(idCol),
        col("chunk_id").cast("long").as("chunk_id"),
        col("__c.start_token").as("start_token"),
        least(lit(window.toLong), col("__n") - col("__c.start_token")).as("n_chunk_tokens"),
        col("__c.chunk_text").as("chunk_text"))
  }

  /** [[chunkByTokens]] over a PRECOMPUTED token-id array — the exact-
    * tokenizer RAG-prep chunker (round 15): boundaries land at MODEL-token
    * positions (what an embedding model's context window actually counts),
    * where [[chunkByTokens]] windows whitespace words. Tokenizer-agnostic:
    * any `array<int>` column works; the committed frozen-BPE ids
    * ([[graft.ext.TextAnalysis.bpeTokenIds]]) are the intended producer.
    *
    * Same window-placement contract as [[chunkByTokens]] (starts at
    * 0, stride, …; kept while contributing past the previous chunk's end —
    * so kept starts are a PREFIX of the grid and `chunk_id = start/stride`;
    * zero-token docs emit nothing), same scale shape (fully NARROW — kept
    * starts and chunk slices build inside the document's own row, only the
    * per-chunk structs explode; ZERO shuffle at any corpus size).
    *
    * Output: (idCol, chunk_id LONG, start_token LONG, n_chunk_tokens LONG
    * ≤ window, chunk_ids STRING — comma-joined token ids, the x66 csv
    * convention so the result is canon-hashable).
    */
  def chunkByTokenIds(df: DataFrame, idCol: String, idsCol: String,
                      window: Int, stride: Int): DataFrame = {
    require(window > 0, s"window must be positive: $window")
    require(stride > 0 && stride <= window, s"stride must be in [1, window]: $stride")
    // the chunkByTokens reserved-column stance
    Seq("__t", "__n", "__c", "chunk_id", "start_token", "n_chunk_tokens", "chunk_ids")
      .foreach { c =>
        require(idCol != c && idsCol != c,
          s"chunkByTokenIds writes column '$c' — rename the id/ids column first")
      }
    val toked = df.select(col(idCol), coalesce(col(idsCol), array().cast("array<int>")).as("__t"))
      // a NULL ELEMENT inside the ids array would silently SHRINK
      // chunk_ids (concat_ws skips NULL) while n_chunk_tokens still counts
      // the slot — inconsistent output from corrupt tokenizer input, so it
      // fails loudly per row naming the document (the IntervalJoin
      // raise_error stance; round-16 sweep)
      .withColumn("__t", when(exists(col("__t"), _.isNull),
          raise_error(concat(
            lit("chunkByTokenIds: NULL token id in document '"),
            col(idCol).cast("string"),
            lit("' - token id arrays must be dense"))).cast("array<int>"))
        .otherwise(col("__t")))
      .withColumn("__n", size(col("__t")).cast("long"))
      .filter(col("__n") >= 1)
    val keptStarts = filter(
      sequence(lit(0L), col("__n") - 1, lit(stride.toLong)),
      s => (s === 0L) || (s + lit((window - stride).toLong) < col("__n")))
    val chunks = transform(keptStarts, s => struct(
      s.as("start_token"),
      concat_ws(",", transform(
        slice(col("__t"), (s + 1).cast("int"), lit(window)),
        _.cast("string"))).as("chunk_ids")))
    toked
      .select(col(idCol), col("__n"), posexplode(chunks).as(Seq("chunk_id", "__c")))
      .select(col(idCol),
        col("chunk_id").cast("long").as("chunk_id"),
        col("__c.start_token").as("start_token"),
        least(lit(window.toLong), col("__n") - col("__c.start_token")).as("n_chunk_tokens"),
        col("__c.chunk_ids").as("chunk_ids"))
  }

  /** Sequence-packing layout — the step AFTER sharding that decides how
    * documents concatenate into fixed-length training sequences (the
    * standard causal-LM data layout: docs packed back-to-back, split at
    * sequence boundaries, no padding between them). Within each bucket,
    * documents concatenate in doc-id order and sequence `s` covers token
    * offsets `[s*seqLen, (s+1)*seqLen)`; a document overlapping several
    * sequences emits one row per overlap with the covered token span.
    *
    * Output per (document, sequence) overlap:
    *  - `n_tokens`, `bucket` — as in [[packByTokens]] (same seed/hash, so
    *    sequence and shard layouts agree on placement);
    *  - `seq` = `bucket * 2³² + seq-within-bucket` — globally unique,
    *    stable under corpus growth within a bucket's packed prefix;
    *  - `tok_start` (inclusive) / `tok_end` (exclusive) — the span of THIS
    *    document's tokens that lands in that sequence; a downstream writer
    *    materializes sequence `s` by concatenating its rows' spans in
    *    doc-id order.
    *
    * Zero-token documents occupy no sequence space and emit no row. Scale
    * shape: the same two-level no-global-sort window as [[packByTokens]]
    * plus a narrow per-row explode of at most `n_tokens/seqLen + 1`
    * sequence rows — no extra shuffle.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    seqLen: Long, nBuckets: Int = 256,
                    seed: String = "shard",
                    tokenCountCol: Option[String] = None): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    require(nBuckets > 0, s"nBuckets must be positive: $nBuckets")
    tokenCountCol.foreach(c => require(df.columns.contains(c),
      s"packSequences: token count column '$c' not in input (${df.columns.mkString(", ")})"))
    // only "n_tokens" may legitimately pre-exist, and only when it IS the
    // declared token-count input — a tokenCountCol named after any OTHER
    // reserved column (e.g. "bucket") would be silently overwritten by the
    // packing bookkeeping, so it gets no exemption
    Seq("n_tokens", "bucket", "seq", "tok_start", "tok_end", "cum_before", "__s").foreach(c =>
      require(!df.columns.contains(c) || (c == "n_tokens" && tokenCountCol.contains(c)),
        s"packSequences writes column '$c' — input already has one; rename or drop it first"))
    val nTokens = tokenCountCol
      .map(tokenCountOrRaise(df, _, idCol, "packSequences"))
      .getOrElse(size(TextAnalysis.tokens(col(textCol))).cast("long"))
    // same duplicate-id tiebreak as packByTokens, so sequence and shard
    // layouts stay mutually consistent AND deterministic under reruns
    val w = expressions.Window.partitionBy("bucket")
      .orderBy(col(idCol), col("n_tokens"),
        graft.functions.Hashing.md5Hash60Col(coalesce(col(textCol), lit(""))))
      .rowsBetween(expressions.Window.unboundedPreceding, -1)
    df.withColumn("n_tokens", nTokens)
      .filter(col("n_tokens") > 0)
      .withColumn("bucket", Sampling.hash60(col(idCol), seed) % nBuckets)
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("__s", explode(sequence(
        expr(s"cum_before div $seqLen"),
        expr(s"(cum_before + n_tokens - 1) div $seqLen"))))
      .withColumn("seq", col("bucket") * ShardsPerBucket + col("__s"))
      .withColumn("tok_start", greatest(col("__s") * seqLen - col("cum_before"), lit(0L)))
      .withColumn("tok_end", least(col("n_tokens"), (col("__s") + 1) * seqLen - col("cum_before")))
      .drop("cum_before", "__s")
  }
}
