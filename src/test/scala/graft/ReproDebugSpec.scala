package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingDownsample
import graft.streaming.StreamingDownsample.Event

class ReproDebugSpec extends SparkTestBase {

  test("debug: bounded sessionize eviction repro") {
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, user: Long, sec: Long) =
      Event(id, new Timestamp(sec * 1000L), user, "x", 0.0)
    val mem = MemoryStream[Event]
    val q = StreamingDownsample.sessionizeStream(
        mem.toDS().withWatermark("ts", "3000 seconds"),
        evictAfterSeconds = Some(7200L))
      .writeStream.format("memory").queryName("dbg_out")
      .outputMode("update").start()
    mem.addData(Seq(ev(1, 1L, 0L), ev(2, 1L, 1000L), ev(3, 2L, 500L)))
    q.processAllAvailable()
    println("=== AFTER BATCH1 ===")
    spark.table("dbg_out").orderBy("user_id", "n_seen").show(false)
    mem.addData(Seq(ev(4, 1L, 800L))); q.processAllAvailable()
    println("=== AFTER BATCH2 ===")
    spark.table("dbg_out").orderBy("user_id", "n_seen").show(false)
    mem.addData(Seq(ev(5, 2L, 100000L))); q.processAllAvailable()
    mem.addData(Seq(ev(6, 2L, 100001L))); q.processAllAvailable()
    println("=== FINAL ===")
    spark.table("dbg_out").orderBy("user_id", "n_seen").show(false)
    println("=== PROGRESS ===")
    q.recentProgress.foreach { p =>
      p.stateOperators.foreach { so =>
        println(s"batch ${p.batchId} dropped=${so.numRowsDroppedByWatermark} " +
          s"total=${so.numRowsTotal} updated=${so.numRowsUpdated} " +
          s"removed=${so.numRowsRemoved} wm=${p.eventTime}")
      }
    }
    q.stop()
  }
}
