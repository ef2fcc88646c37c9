package graft.ops

import graft.SparkTestBase
import java.sql.Timestamp

class AsOfJoinSpec extends SparkTestBase {

  test("forward as-of join: earliest right at-or-after each left row, per key") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val left = Seq((1L, "a", 10L), (2L, "a", 25L), (3L, "b", 5L), (4L, "a", 100L))
      .toDF("id", "k", "t").withColumn("ts", col("t").cast("timestamp"))
    val right = Seq(("a", 10L, "p1"), ("a", 30L, "p2"), ("b", 50L, "p3"))
      .toDF("k", "t2", "v").withColumn("ts", col("t2").cast("timestamp"))
    val out = AsOfJoin.forward(left, right, Seq("k"), "ts", "ts", Seq("v"))
      .select($"id", $"r_v").as[(Long, Option[String])].collect().toMap
    assert(out(1L) === Some("p1")) // tie at t=10 matches forward
    assert(out(2L) === Some("p2")) // next at-or-after 25 is 30
    assert(out(3L) === Some("p3"))
    assert(out(4L) === None)       // nothing after t=100
  }
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward as-of join: latest right at-or-before each left row, per key") {
    val clicks = Seq(
      (1L, 10L, ts("2026-01-01 10:00:00")), // before any purchase -> null
      (2L, 10L, ts("2026-01-01 12:00:00")), // matches p1 (exact tie)
      (3L, 10L, ts("2026-01-01 15:00:00")), // matches p2 (latest <=)
      (4L, 20L, ts("2026-01-01 15:00:00"))  // other user, no purchases -> null
    ).toDF("event_id", "user_id", "ts")
    val purchases = Seq(
      (100L, 10L, ts("2026-01-01 12:00:00"), 5.0),
      (101L, 10L, ts("2026-01-01 14:00:00"), 7.5),
      (102L, 30L, ts("2026-01-01 09:00:00"), 9.9)
    ).toDF("purchase_id", "user_id", "ts", "value")

    val out = AsOfJoin.backward(clicks, purchases, Seq("user_id"), "ts", "ts",
        payload = Seq("purchase_id", "value"))
      .select($"event_id", $"r_purchase_id", $"r_value")
      .as[(Long, Option[Long], Option[Double])].collect()
      .map { case (k, v1, v2) => k -> ((v1, v2)) }.toMap

    assert(out(1L) === (None, None))
    assert(out(2L) === (Some(100L), Some(5.0)))
    assert(out(3L) === (Some(101L), Some(7.5)))
    assert(out(4L) === (None, None))
  }

  test("payload fields always come from the same right row (struct semantics)") {
    // p2 has a null value: a per-column last(ignoreNulls) would pair p2's id
    // with p1's value; the struct formulation must keep (101, null) together.
    val left = Seq((1L, 1L, ts("2026-01-01 12:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 1L, ts("2026-01-01 10:00:00"), Some(5.0)),
      (101L, 1L, ts("2026-01-01 11:00:00"), None: Option[Double])
    ).toDF("purchase_id", "user_id", "ts", "value")
    val row = AsOfJoin.backward(left, right, Seq("user_id"), "ts", "ts",
        payload = Seq("purchase_id", "value"))
      .select($"r_purchase_id", $"r_value")
      .as[(Option[Long], Option[Double])].head()
    assert(row === (Some(101L), None))
  }
}
