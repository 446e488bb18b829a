package graft

import org.apache.spark.sql.graftshim.Shims

class ShimsSpec extends SparkSuite {
  import spark.implicits._

  test("checkpointedRdd matches only a direct checkpoint root") {
    val snap = Seq(1, 2, 3).toDF("x").localCheckpoint(true)
    assert(Shims.checkpointedRdd(snap).isDefined)

    // a DERIVED plan still contains the LogicalRDD leaf, but unpersisting
    // it from here would yank blocks other operators still reference —
    // the root-only contract must return None
    assert(Shims.checkpointedRdd(snap.filter($"x" > 1)).isEmpty)
    assert(Shims.checkpointedRdd(snap.select(($"x" * 2).as("y"))).isEmpty)

    // and a plain non-checkpointed frame is None too
    assert(Shims.checkpointedRdd(Seq(1).toDF("x")).isEmpty)
    Shims.checkpointedRdd(snap).foreach(_.unpersist(false))
  }
}
