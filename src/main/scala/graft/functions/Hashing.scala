package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Cross-engine-reproducible hashing. SimHash and winnowing fingerprints
  * need a word/shingle hash the DuckDB oracle can recompute exactly; md5 is
  * the one digest both engines expose over identical UTF-8 bytes, so the
  * 60-bit value below equals DuckDB's
  * `list_reduce(hex digits of substr(md5(s),1,15), (a,b) -> a*16+b)`.
  */
object Hashing {

  /** splitmix64 finalizer — the shared full-avalanche mix behind
    * [[Bloom]]'s double hashing and [[Lsh.srpSign]]'s plane hashes; ONE
    * definition so the two cannot silently diverge.
    */
  def mix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 30; x *= 0xBF58476D1CE4E5B9L
    x ^= x >>> 27; x *= 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** [[md5Hash60]] as a Column expression — built-in functions only
    * (md5/substring/base-16 conv), so it stays inside whole-stage codegen
    * and the DuckDB oracles can recompute it exactly. THE single source of
    * the cross-engine 60-bit hash contract: every operator-side use
    * (gram hashing, split buckets, shard buckets) must route through here.
    */
  def md5Hash60Col(s: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{conv, md5, substring}
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")
  }

  /** First 15 hex chars of md5(s) as a non-negative 60-bit long (= big-endian
    * value of the first 8 digest bytes, shifted right 4).
    */
  def md5Hash60(s: String): Long = {
    val d = digests.get()
    d.reset()
    val h = d.digest(s.getBytes(StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    v >>> 4
  }
}
