package graft.ops

import java.sql.Timestamp

import graft.SparkSuite

class AsOfSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val left = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100L),
    (1L, ts("2024-01-01 12:00:00"), 101L),
    (2L, ts("2024-01-01 09:00:00"), 200L)) // key 2 has no prior right row
    .toDF("user_id", "ts", "event_id")

  private lazy val right = Seq(
    (1L, ts("2024-01-01 09:30:00"), 5.0),
    (1L, ts("2024-01-01 11:00:00"), 7.0),
    (2L, ts("2024-01-01 09:30:00"), 9.0)) // after left's only row
    .toDF("user_id", "ts", "value")

  test("each left row gets the latest right value at-or-before its time") {
    val out = AsOf.joinPrior(left, right, "user_id", "ts", "ts",
        Seq("value" -> "prior"))
      .collect().map(r => r.getLong(2) -> Option(r.get(3))).toMap
    assert(out(100L) === Some(5.0)) // 10:00 sees 09:30
    assert(out(101L) === Some(7.0)) // 12:00 sees 11:00
    assert(out(200L) === None)      // 09:00 has no prior
  }

  test("tie at equal timestamps: inclusive by default, excluded when strict") {
    val l = Seq((1L, ts("2024-01-01 09:30:00"), 100L)).toDF("user_id", "ts", "event_id")
    val inclusive = AsOf.joinPrior(l, right, "user_id", "ts", "ts",
      Seq("value" -> "prior")).collect().head
    assert(Option(inclusive.get(3)) === Some(5.0))
    val strict = AsOf.joinPrior(l, right, "user_id", "ts", "ts",
      Seq("value" -> "prior"), strict = true).collect().head
    assert(Option(strict.get(3)) === None)
  }

  test("left row count is preserved") {
    val out = AsOf.joinPrior(left, right, "user_id", "ts", "ts",
      Seq("value" -> "prior"))
    assert(out.count() === left.count())
  }

  test("custom AsOfJoinExec matches the fixture expectations and the plan is the merge exec") {
    val df = AsOf.joinPriorExec(left, right, "user_id", "ts", "ts",
      Seq("value" -> "prior"))
    // SparkPlan.nodeName strips the "Exec" suffix: the custom operator
    // renders as "AsOfJoin" with the Exchange+Sort the requirements induce
    assert(df.queryExecution.executedPlan.toString.contains("AsOfJoin"))
    val out = df.collect().map(r => r.getLong(2) -> Option(r.get(3))).toMap
    assert(out(100L) === Some(5.0))
    assert(out(101L) === Some(7.0))
    assert(out(200L) === None)

    val strictOut = AsOf.joinPriorExec(
      Seq((1L, ts("2024-01-01 09:30:00"), 100L)).toDF("user_id", "ts", "event_id"),
      right, "user_id", "ts", "ts", Seq("value" -> "prior"), strict = true)
      .collect().head
    assert(Option(strictOut.get(3)) === None)
  }

  test("custom exec agrees with the union-merge form on the full events table") {
    val ev = graft.Tables.events(spark, sf0001)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"value")
    val viaWindow = AsOf.joinPrior(purchases, clicks, "user_id", "ts", "ts",
        Seq("value" -> "prior_click"))
      .select("user_id", "event_id", "prior_click")
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toSet
    val viaExec = AsOf.joinPriorExec(purchases, clicks, "user_id", "ts", "ts",
        Seq("value" -> "prior_click"))
      .select("user_id", "event_id", "prior_click")
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toSet
    assert(viaExec === viaWindow)
    assert(viaExec.nonEmpty)
  }
}
