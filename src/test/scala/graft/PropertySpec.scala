package graft

import scala.util.Random

import graft.model.KRecord
import graft.streaming.StatefulOps

/** Property-style tests: the stateful operators against naive sequential
  * reference models over randomized changelogs (SURVEY §5's property-test
  * commitment). Seeded generation keeps every run deterministic; small
  * key/time domains make collisions (same key, same timestamp,
  * tombstone-vs-upsert races) common.
  */
class PropertySpec extends SparkSpec {

  private def randomRecs(rnd: Random, n: Int): Seq[KRecord[Int, String]] =
    Seq.fill(n)(KRecord(
      rnd.nextInt(5),
      if (rnd.nextBoolean()) Some(Seq("a", "b", "c")(rnd.nextInt(3))) else None,
      1L + rnd.nextInt(20)))

  // mem_store.h:64-83 applied sequentially in event-time order; an
  // accepted delete erases the entry (store_.erase, no tombstone kept)
  private def naiveLww(recs: Seq[KRecord[Int, String]]): Map[Int, (Option[String], Long)] = {
    var store = Map.empty[Int, (Option[String], Long)]
    recs.sortBy(_.eventTime).foreach { r =>
      store.get(r.key) match {
        case Some((_, t)) if t > r.eventTime => // stale
        case cur =>
          if (r.value.isDefined) store += r.key -> (r.value, r.eventTime)
          else if (cur.isDefined) store -= r.key
      }
    }
    store
  }

  test("latestByKey property: emissions replay to the sequential mem_store state (20 seeds)") {
    import spark.implicits._
    (1 to 20).foreach { seed =>
      val recs = randomRecs(new Random(seed), 30)
      val out = StatefulOps.latestByKey(spark.createDataset(recs)).collect().toSeq
      // every emission is an accepted change: replaying emissions through the
      // same rules lands on the same final state as replaying the input
      assert(naiveLww(out) == naiveLww(recs), s"seed=$seed in=$recs out=$out")
      // and per key the accepted event times are non-decreasing (no stale
      // update ever gets emitted after a newer one)
      out.groupBy(_.key).values.foreach { es =>
        val ts = es.map(_.eventTime)
        assert(ts.sorted == ts.sortBy(identity), s"seed=$seed")
      }
    }
  }

  test("rateLimiter property: admitted set matches the sequential token bucket (10 seeds)") {
    import spark.implicits._
    val capacity = 2L
    val age = 100L
    (1 to 10).foreach { seed =>
      val rnd = new Random(seed * 31)
      // distinct (key, ts) so intra-timestamp admit order cannot be ambiguous
      val uniq = Seq.fill(40)((rnd.nextInt(3), rnd.nextInt(500).toLong)).distinct
        .zipWithIndex.map { case ((k, t), i) => KRecord.of(k, i.toString, t) }
      val out = StatefulOps.rateLimiter(spark.createDataset(uniq), capacity, age)
        .collect().map(r => (r.key, r.eventTime)).toSet
      var buckets = Map.empty[Int, (Long, Long)] // key -> (tokens, tstamp)
      val expected = scala.collection.mutable.Set.empty[(Int, Long)]
      uniq.sortBy(r => (r.key, r.eventTime)).foreach { r =>
        var (tokens, tstamp) = buckets.getOrElse(r.key, (capacity, 0L))
        val delta = ((r.eventTime - tstamp) * capacity) / age
        if (delta > 0) { tstamp = r.eventTime; tokens = math.min(capacity, tokens + delta) }
        if (tokens > 0) { tokens -= 1; expected += ((r.key, r.eventTime)) }
        buckets += r.key -> (tokens, tstamp)
      }
      assert(out == expected.toSet, s"seed=$seed in=$uniq")
    }
  }

  test("changelog outer join property: emission count equals input count; final probe state matches LWW (10 seeds)") {
    import spark.implicits._
    (1 to 10).foreach { seed =>
      val rnd = new Random(seed * 97)
      // distinct event times across both sides: the operator orders by event
      // time within the batch, so ties between sides would be arbitrary
      val times = rnd.shuffle((1L to 60L).toList).take(40)
      val (lt, rt) = times.splitAt(20)
      val left = lt.map(t => KRecord(rnd.nextInt(3),
        if (rnd.nextBoolean()) Some("L" + rnd.nextInt(3)) else None, t))
      val right = rt.map(t => KRecord(rnd.nextInt(3),
        if (rnd.nextBoolean()) Some("R" + rnd.nextInt(3)) else None, t))
      val out = StatefulOps.tableTableJoinChangelog(
        spark.createDataset(left), spark.createDataset(right), StatefulOps.OuterJoin)
        .collect().toSeq
      // ktable forwards every event (ktable.h:66-72) → one emission per input
      assert(out.size == left.size + right.size, s"seed=$seed")
      // the last emission per key reflects the LWW state of both sides
      val lastPerKey = out.groupBy(_.key).view.mapValues(_.maxBy(_.eventTime)).toMap
      val lSt = naiveLww(left.map(r => KRecord(r.key, r.value, r.eventTime)))
      val rSt = naiveLww(right.map(r => KRecord(r.key, r.value, r.eventTime)))
      lastPerKey.foreach { case (k, e) =>
        val lv = lSt.get(k).flatMap(_._1)
        val rv = rSt.get(k).flatMap(_._1)
        if (lv.isDefined || rv.isDefined) {
          assert(!e.tombstone && e.left == lv && e.right == rv,
            s"seed=$seed key=$k got=$e want=($lv,$rv)")
        } else assert(e.tombstone, s"seed=$seed key=$k")
      }
    }
  }
}
