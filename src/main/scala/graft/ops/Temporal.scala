package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Temporal joins Spark lacks natively, in the shapes a 100 TB event
  * pipeline can actually run: AS-OF join (each left row enriched with the
  * latest right row at-or-before its timestamp) as ONE key-partitioned
  * window pass — no inequality join, no per-key cross product — and
  * bucketed INTERVAL join (point-in-range containment) as an equi-join on
  * time buckets, so the shuffle key space is (key, bucket) and the range
  * predicate only filters candidate pairs that already share a bucket.
  *
  * The reference engine has no temporal operators (its query surface is
  * pure vector search, `storage/dataset.go:349-433`); these cover the
  * event-log side of the same data platform — sessionization, as-of
  * enrichment, containment counting — with deterministic tie-breaks so
  * every result is oracle-checkable.
  */
object Temporal {

  /** Backward AS-OF join: for each left row, the single right row of the
    * same key with the greatest `tsCol` at-or-before the left row's
    * (a left and a right row at the same instant MATCH — the standard
    * inclusive as-of; ties AMONG right rows at one instant resolve to the
    * greatest `seqCol`, deterministically).
    *
    * Plan shape — the 100 TB point of this formulation: both sides union
    * into one relation tagged by side, ONE shuffle on `keyCol` sorts each
    * key's timeline, and a running `last(_, ignoreNulls)` carries the most
    * recent right row forward onto every left row. Cost is a single
    * Exchange + per-partition sort — the same as any window aggregation —
    * versus the per-key cross product Spark's nested-loop plan for
    * `l.ts >= r.ts AND <per-left-row max>` degenerates into. The right
    * payload travels as ONE struct, so the winning row is picked once
    * (a per-column `last` would skip independently past legitimately-null
    * payload fields onto older rows).
    *
    * Left rows with no prior right row keep null payloads (left-outer
    * as-of). `tolerance` (same unit as `tsCol`) voids matches older than
    * `left.ts - tolerance`, nulling the payload instead of dropping the
    * row — pandas `merge_asof` semantics.
    *
    * `payload` names the right-side columns to carry; they land on the
    * output prefixed `asof_`, plus `asof_ts` (the matched right
    * timestamp). Left columns pass through untouched.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      seqCol: String,
      payload: Seq[String],
      tolerance: Option[Long] = None): DataFrame = {
    require(payload.nonEmpty, "asofJoin: payload must name at least one right-side column")
    require(!payload.contains("ts") && !payload.contains("seq"),
      "asofJoin: payload names 'ts'/'seq' collide with the carried match struct's own fields — " +
        "alias them on the right side first")
    val leftCols = left.columns.toSeq
    val reserved = Seq("__key", "__ts", "__side", "__seq", "__r", "__m")
    require(!leftCols.exists(reserved.contains),
      s"asofJoin: left side uses a reserved column name (${reserved.mkString(", ")})")
    val rStruct = struct(
      col(tsCol).as("ts") +: col(seqCol).as("seq") +: payload.map(c => col(c).as(c)): _*)
    val rTagged = right.select(
      col(keyCol).as("__key") +: col(tsCol).as("__ts") +: lit(0).as("__side") +:
        col(seqCol).as("__seq") +: rStruct.as("__r") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lTagged = left.select(
      col(keyCol).as("__key") +: col(tsCol).as("__ts") +: lit(1).as("__side") +:
        lit(null).cast(right.schema(seqCol).dataType).as("__seq") +:
        lit(null).cast(rTagged.schema("__r").dataType).as("__r") +:
        leftCols.map(col): _*)
    // side=0 before side=1 at an equal instant ⇒ inclusive (ts_r ≤ ts_l);
    // __seq orders right rows within one instant (left rows carry a null
    // __r, so their relative order within an instant cannot matter)
    val w = Window.partitionBy("__key")
      .orderBy(col("__ts"), col("__side"), col("__seq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rTagged.unionByName(lTagged)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val stale = tolerance.map(tol => col("__m.ts") < col("__ts") - tol)
      .getOrElse(lit(false))
    val matched = col("__m").isNotNull && !stale
    carried.select(
      leftCols.map(col) ++
        payload.map(c => when(matched, col(s"__m.$c")).as(s"asof_$c")) :+
        when(matched, col("__m.ts")).as("asof_ts"): _*)
  }

  /** Gap-based sessionization MATERIALIZED as intervals: consecutive
    * events of one key closer than or exactly `gap` apart (same unit as
    * `tsCol`) belong to one session; returns one row per session —
    * (key, session, start_ts, end_ts, n_events) with `session` numbered
    * 0.. per key in time order. ONE shuffle on the key: the lag window,
    * the running-sum island id, and the session aggregation all share the
    * key partitioning (the aggregation keys on (key, session), which the
    * key shuffle already co-locates — AQE keeps the exchange). `seqCol`
    * breaks ts ties deterministically.
    */
  def sessionize(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      seqCol: String,
      gap: Long): DataFrame = {
    val byKey = Window.partitionBy(keyCol).orderBy(col(tsCol), col(seqCol))
    events
      .withColumn("__prev", lag(col(tsCol), 1).over(byKey))
      .withColumn("__brk",
        when(col("__prev").isNull, 0L)
          .otherwise((col(tsCol) - col("__prev") > gap).cast("long")))
      .withColumn("session",
        sum(col("__brk")).over(byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("session"))
      .agg(min(col(tsCol)).as("start_ts"), max(col(tsCol)).as("end_ts"),
        count(lit(1)).as("n_events"))
  }

  /** Point-in-interval join WITHOUT the range-join cross product: every
    * (point, interval) pair of the same key with
    * start ≤ point.ts ≤ end. Intervals explode onto the fixed-width time
    * buckets they overlap, points land in exactly one bucket, and the
    * candidate set is an EQUI-join on (key, bucket) — a hash-partitioned,
    * data-bounded shuffle, where Spark's native plan for the inequality
    * predicate is a broadcast nested loop that dies at the first
    * multi-GB side. The containment predicate then filters co-bucketed
    * candidates; each true pair meets exactly once (in the point's one
    * bucket), so no dedup pass is needed. Bucket ids use truncating
    * integer division, consistent (and monotone) on both sides, so
    * correctness is sign-independent.
    *
    * `bucket` (same unit as the timestamps) trades explode factor against
    * candidate precision: an interval emits span/bucket + 1 rows — size
    * it near the TYPICAL interval length. `maxBucketsPerInterval` fails
    * loudly on an interval that would fan out past the bound (an
    * open-ended or corrupt interval silently exploding into millions of
    * bucket rows is the classic interval-join foot-gun at scale); the
    * guard rides the exploded `sequence` expression itself, so it cannot
    * be optimized away.
    *
    * Point columns pass through; interval payload arrives prefixed
    * `ivl_` plus the (ivl_start, ivl_end) pair.
    */
  def intervalJoin(
      points: DataFrame,
      intervals: DataFrame,
      keyCol: String,
      tsCol: String,
      startCol: String,
      endCol: String,
      bucket: Long,
      payload: Seq[String],
      maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucket > 0, s"bucket width must be positive, got $bucket")
    def bucketOf(c: String): Column = expr(s"CAST(`$c` AS BIGINT) DIV ${bucket}L")
    val startB = bucketOf(startCol)
    val endB = bucketOf(endCol)
    val guardedEnd = when(endB - startB + 1 > maxBucketsPerInterval,
      raise_error(concat(
        lit(s"intervalJoin: interval spans more than $maxBucketsPerInterval buckets " +
          s"of width $bucket ("), (endB - startB + 1).cast("string"),
        lit(" buckets) — widen `bucket`, raise the cap, or fix the interval"))))
      .otherwise(endB)
    val exploded = intervals.select(
      col(keyCol).as("__ikey") +:
        explode(sequence(startB, guardedEnd)).as("__ibucket") +:
        col(startCol).as("ivl_start") +: col(endCol).as("ivl_end") +:
        payload.map(c => col(c).as(s"ivl_$c")): _*)
    points
      .withColumn("__pbucket", bucketOf(tsCol))
      .join(exploded,
        col(keyCol) === col("__ikey") && col("__pbucket") === col("__ibucket"))
      .filter(col(tsCol) >= col("ivl_start") && col(tsCol) <= col("ivl_end"))
      .drop("__ikey", "__ibucket", "__pbucket")
  }
}
