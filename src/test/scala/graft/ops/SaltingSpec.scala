package graft.ops

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

class SaltingSpec extends SparkSuite {

  /** Max shuffle-read records of any single task while `action` runs —
    * the straggler metric: a skewed join is as slow as this task. The
    * listener bus is async, so poll until the max stabilizes. */
  private def maxTaskShuffleRecords(action: => Unit): Long = {
    val listener = new SparkListener {
      @volatile var max = 0L
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null && m.shuffleReadMetrics.recordsRead > max)
          max = m.shuffleReadMetrics.recordsRead
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      action
      var last = -1L
      var stable = 0
      var waited = 0
      while (stable < 3 && waited < 10000) { // settle the async bus
        Thread.sleep(100); waited += 100
        if (listener.max == last) stable += 1 else { stable = 0; last = listener.max }
      }
      listener.max
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("salted two-phase aggregation equals the direct group-by exactly") {
    val li = Tables.lineitem(spark, sf0001)
    val salted = Salting.saltedSumCount(li, Seq("l_returnflag"),
        Seq(col("l_quantity").cast("decimal(18,2)") -> "sum_qty"), salts = 8)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).doubleValue())).sortBy(_._1)
    val direct = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("decimal(18,2)")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).doubleValue())).sortBy(_._1)
    assert(salted === direct)
  }

  test("salted join equals the direct join and spreads the hot key across tasks") {
    val conf = spark.conf
    val saved = Seq("spark.sql.shuffle.partitions",
      "spark.sql.autoBroadcastJoinThreshold", "spark.sql.adaptive.enabled")
      .map(k => k -> conf.getOption(k)).toMap
    // SMJ path with fixed partitioning: broadcast would hide the shuffle
    // entirely, and AQE would coalesce these tiny partitions back together.
    conf.set("spark.sql.shuffle.partitions", "16")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val n = 200000L
      val salts = 32
      // 90% of the big side on key 0, the rest uniform over 1000 keys
      def big: DataFrame = spark.range(n).select(
        when(col("id") % 10 < 9, 0L).otherwise(pmod(col("id"), lit(1000))).as("k"),
        col("id").as("payload"))
      def small: DataFrame = spark.range(1000).select(
        col("id").as("k"), (col("id") * 2).as("attr"))

      // results identical to the direct join (multiset equality via agg)
      def summarize(df: DataFrame) = df.groupBy("k")
        .agg(count(lit(1)).as("n"), sum("payload").as("sp"), sum("attr").as("sa"))
        .orderBy("k").collect().toSeq
      assert(summarize(Salting.saltedJoin(big, small, Seq("k"), salts)) ===
        summarize(big.join(small, Seq("k"))))

      // straggler metric: the direct join funnels the hot key into ONE task
      val directMax = maxTaskShuffleRecords(big.join(small, Seq("k")).count(): Unit)
      val saltedMax = maxTaskShuffleRecords(
        Salting.saltedJoin(big, small, Seq("k"), salts).count(): Unit)
      info(s"max task shuffle-read records: direct=$directMax salted=$saltedMax")
      assert(directMax >= (n * 9 / 10), "direct join should read the full hot key in one task")
      assert(directMax > 2 * saltedMax,
        s"salting should spread the hot key (direct=$directMax, salted=$saltedMax)")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }
}
