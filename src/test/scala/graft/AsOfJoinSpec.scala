package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {

  test("backward as-of picks latest right ts <= left ts, null when none") {
    import spark.implicits._
    val left = Seq(
      (1L, Timestamp.valueOf("2024-01-10 00:00:00")),
      (1L, Timestamp.valueOf("2024-01-01 00:00:00")),
      (2L, Timestamp.valueOf("2024-01-05 00:00:00"))
    ).toDF("k", "ts")
    val right = Seq(
      (1L, Timestamp.valueOf("2024-01-02 00:00:00")),
      (1L, Timestamp.valueOf("2024-01-09 00:00:00")),
      (1L, Timestamp.valueOf("2024-01-11 00:00:00")), // after every left row
      (3L, Timestamp.valueOf("2024-01-01 00:00:00"))  // other key
    ).toDF("k", "rts")
    val out = AsOfJoin.backward(left, right, "k", "ts", "rts", "rts", "asof")
      .orderBy("k", "ts").collect()
    assert(out(0).getTimestamp(1) == Timestamp.valueOf("2024-01-01 00:00:00")
      && out(0).isNullAt(2)) // k=1 @01-01: no right <= it
    assert(out(1).getAs[Timestamp]("asof") == Timestamp.valueOf("2024-01-09 00:00:00"))
    assert(out(2).isNullAt(2)) // k=2: no right rows at all
  }

  test("as-of equality boundary matches (right ts == left ts)") {
    import spark.implicits._
    val left = Seq((1L, Timestamp.valueOf("2024-01-02 00:00:00"))).toDF("k", "ts")
    val right = Seq((1L, Timestamp.valueOf("2024-01-02 00:00:00"))).toDF("k", "rts")
    val out = AsOfJoin.backward(left, right, "k", "ts", "rts", "rts", "asof").collect()
    assert(out(0).getAs[Timestamp]("asof") == Timestamp.valueOf("2024-01-02 00:00:00"))
  }

  test("interval pairs are within bound, ordered, and bucket-join complete") {
    import graft.operators.IntervalJoin
    val pairs = IntervalJoin.eventPairs(spark, sfDir).collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall { r =>
      val g = r.getAs[Long]("gap_sec"); g >= 0 && g <= IntervalJoin.BoundSec
    })
    // no duplicates from the two-bucket explode
    val keys = pairs.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(keys.distinct.length == keys.length)
    // completeness: the bucket join finds every pair the naive
    // same-user range filter finds (incl. pairs straddling a bucket edge)
    val e = graft.operators.Events.eventsWithEpochSeconds(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val naive = (for {
      (u1, id1, es1) <- e
      (u2, id2, es2) <- e
      if u1 == u2 && es2 - es1 >= 0 && es2 - es1 <= IntervalJoin.BoundSec &&
        (es1 < es2 || (es1 == es2 && id1 < id2))
    } yield (u1, id1, id2)).toSet
    assert(keys.toSet == naive)
  }

  test("every event gets a match on testdata (orders all precede events)") {
    val out = AsOfJoin.eventAsOfOrder(spark, sfDir)
    assert(out.where(col("asof_order_date").isNull).count() == 0)
    assert(out.count() == 1000)
  }

  test("single-pass nearest equals the backward+forward composition") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val orders = Seq((1L, ts(100)), (1L, ts(200))).toDF("user_id", "o_ts")
    // includes an exact-hit event (t=100): prev_o is the distance-0 match
    // and must win, making the exclusive next frame invisible
    val events = Seq(
      (1L, 1L, ts(50)), (2L, 1L, ts(120)), (3L, 1L, ts(150)),
      (4L, 1L, ts(180)), (5L, 1L, ts(300)), (6L, 2L, ts(100)),
      (7L, 1L, ts(100)))
      .toDF("event_id", "user_id", "ts")
    val got = AsOfJoin.nearest(events, orders, "user_id", "ts", "o_ts", "o_ts",
        "prev_o", "next_o")
      .select(col("event_id"),
        when(col("prev_o").isNull, col("next_o"))
          .when(col("next_o").isNull, col("prev_o"))
          .when(col("ts") - col("prev_o") <= col("next_o") - col("ts"), col("prev_o"))
          .otherwise(col("next_o")).as("nearest"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getTimestamp(1).getTime / 1000L)))
      .toMap
    assert(got == Map(1L -> Some(100L), 2L -> Some(100L), 3L -> Some(100L),
      4L -> Some(200L), 5L -> Some(200L), 6L -> None, 7L -> Some(100L)))
  }

  test("nearest as-of plans ONE window shuffle — no join, ≤2 exchanges") {
    val plan = AsOfJoin.eventAsOfNearestOrder(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(600))
    // one hash exchange for the user_id window + the output range sort
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 2, s"$exchanges exchanges:\n" +
      plan.linesIterator.take(15).mkString("\n"))
  }

  test("nearest as-of picks the closer side, earlier on exact ties") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    // user 1 orders at t=100 and t=200
    val orders = Seq((1L, ts(100)), (1L, ts(200))).toDF("user_id", "o_ts")
    // events: before both, closer-to-prev, exact midpoint (tie → prev),
    // closer-to-next, after both; user 2 has no orders
    val events = Seq(
      (1L, 1L, ts(50)), (2L, 1L, ts(120)), (3L, 1L, ts(150)),
      (4L, 1L, ts(180)), (5L, 1L, ts(300)), (6L, 2L, ts(100)))
      .toDF("event_id", "user_id", "ts")
    val b = AsOfJoin.backward(events, orders, "user_id", "ts", "o_ts", "o_ts", "prev_o")
    val f = AsOfJoin.forward(events, orders, "user_id", "ts", "o_ts", "o_ts", "next_o")
    val got = b.join(f.select("event_id", "next_o"), "event_id")
      .select(col("event_id"),
        when(col("prev_o").isNull, col("next_o"))
          .when(col("next_o").isNull, col("prev_o"))
          .when(col("ts") - col("prev_o") <= col("next_o") - col("ts"), col("prev_o"))
          .otherwise(col("next_o")).as("nearest"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getTimestamp(1).getTime / 1000L)))
      .toMap
    assert(got == Map(1L -> Some(100L), 2L -> Some(100L), 3L -> Some(100L),
      4L -> Some(200L), 5L -> Some(200L), 6L -> None))
  }
}
