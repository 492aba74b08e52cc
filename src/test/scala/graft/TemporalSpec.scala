package graft

import graft.ops.Temporal
import org.apache.spark.sql.functions._

/** As-of join, sessionization, and bucketed interval join semantics on
  * handcrafted timelines where every match is enumerable by eye, plus the
  * equivalence of the bucketed interval join with a brute-force range
  * join on real data.
  */
class TemporalSpec extends SparkTestBase {

  import spark.implicits._

  // trades (left): key, ts, id                      quotes (right): key, ts, qid, px
  private lazy val trades = Seq(
    ("a", 10L, 1L), ("a", 20L, 2L), ("a", 35L, 3L),
    ("b", 5L, 4L), // before any quote of b
    ("b", 50L, 5L),
    ("c", 100L, 6L) // key with no quotes at all
  ).toDF("sym", "ts", "trade_id")

  private lazy val quotes = Seq(
    ("a", 10L, 11L, 1.0), // same instant as trade 1 → inclusive match
    ("a", 15L, 12L, 2.0),
    ("a", 15L, 13L, 3.0), // tie on ts → greatest qid (13) wins
    ("b", 6L, 14L, 4.0),
    ("b", 7L, 15L, 5.0)
  ).toDF("sym", "ts", "qid", "px")

  private def asof(tol: Option[Long] = None) =
    Temporal.asofJoin(trades, quotes, "sym", "ts", "qid", Seq("qid", "px"), tol)
      .select("trade_id", "asof_qid", "asof_px", "asof_ts")
      .as[(Long, Option[Long], Option[Double], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("as-of join: inclusive same-instant match, latest-at-or-before, deterministic tie-break") {
    val m = asof()
    assert(m(1L) == ((Some(11L), Some(1.0), Some(10L)))) // ts 10 matches quote AT 10
    assert(m(2L) == ((Some(13L), Some(3.0), Some(15L)))) // tie at 15 → max qid
    assert(m(3L) == ((Some(13L), Some(3.0), Some(15L)))) // nothing newer than 15
    assert(m(4L) == ((None, None, None))) // no quote at or before ts 5
    assert(m(5L) == ((Some(15L), Some(5.0), Some(7L))))
    assert(m(6L) == ((None, None, None))) // key with no right rows
  }

  test("as-of join: tolerance voids stale matches but keeps the left row") {
    val m = asof(tol = Some(10L))
    assert(m(5L) == ((None, None, None))) // quote at 7 is 43 ticks stale
    assert(m(3L) == ((None, None, None))) // 35 - 15 = 20 > 10
    assert(m(2L) == ((Some(13L), Some(3.0), Some(15L)))) // 20 - 15 = 5 ≤ 10
    assert(m.size == 6) // every left row survives
  }

  test("sessionize: gap splits, boundary gap keeps one session, per-key numbering") {
    val e = Seq(
      ("u1", 0L, 1L), ("u1", 100L, 2L), ("u1", 200L, 3L), // gaps of exactly 100 = gap → one session
      ("u1", 301L, 4L), // 101 > 100 → new session
      ("u2", 0L, 5L)
    ).toDF("k", "ts", "eid")
    val s = Temporal.sessionize(e, "k", "ts", "eid", gap = 100L)
      .select("k", "session", "start_ts", "end_ts", "n_events")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(s == Set(("u1", 0L, 0L, 200L, 3L), ("u1", 1L, 301L, 301L, 1L), ("u2", 0L, 0L, 0L, 1L)))
  }

  test("interval join: containment is inclusive at both ends and key-scoped") {
    val pts = Seq(("a", 10L, 1L), ("a", 20L, 2L), ("a", 21L, 3L), ("b", 15L, 4L))
      .toDF("k", "ts", "pid")
    val ivls = Seq(("a", 10L, 20L, "s1"), ("b", 0L, 30L, "s2")).toDF("k", "lo", "hi", "name")
    val j = Temporal.intervalJoin(pts, ivls, "k", "ts", "lo", "hi",
        bucket = 7L, payload = Seq("name"))
      .select("pid", "ivl_name").as[(Long, String)].collect().toSet
    // pid 1 at the start bound, pid 2 at the end bound, pid 3 outside,
    // pid 4 only in b's interval despite overlapping a's time range
    assert(j == Set((1L, "s1"), (2L, "s1"), (4L, "s2")))
  }

  test("interval join: bucketed result equals the brute-force range join on real events") {
    val e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", unix_micros(col("ts").cast("timestamp")))
    val sessions = Temporal.sessionize(e, "user_id", "ts", "event_id", gap = 1800000000L)
    val errors = e.filter(col("event_type") === "error")
      .select("event_id", "user_id", "ts")
    val bucketed = Temporal.intervalJoin(errors, sessions, "user_id", "ts",
        "start_ts", "end_ts", bucket = 3600000000L, payload = Seq("session"),
        maxBucketsPerInterval = 1 << 20)
      .select("event_id", "ivl_session").as[(Long, Long)].collect().toSet
    val brute = errors.as("p").join(sessions.as("i"),
        col("p.user_id") === col("i.user_id") &&
          col("p.ts") >= col("i.start_ts") && col("p.ts") <= col("i.end_ts"))
      .select(col("p.event_id"), col("i.session")).as[(Long, Long)].collect().toSet
    assert(bucketed == brute)
    assert(brute.nonEmpty) // the comparison must not pass vacuously
  }

  test("interval join: an interval fanning out past the bucket cap fails loudly") {
    val pts = Seq(("a", 5L, 1L)).toDF("k", "ts", "pid")
    val ivls = Seq(("a", 0L, 1000L, "wide")).toDF("k", "lo", "hi", "name")
    val ex = intercept[Exception] {
      Temporal.intervalJoin(pts, ivls, "k", "ts", "lo", "hi",
        bucket = 1L, payload = Seq("name"), maxBucketsPerInterval = 10).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(ex).exists(_.contains("spans more than 10 buckets")))
  }
}
