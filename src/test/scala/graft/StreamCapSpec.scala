package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Dedup
import graft.streaming.Events

/** Streaming per-bucket arrival cap (Events.cappedBucketSurvivors): a
  * planted boilerplate flood must contribute at most `maxPerBucket`
  * survivors per LSH bucket — across micro-batches — while genuinely
  * distinct documents pass untouched. The in-stream twin of the batch
  * LshCapSpec.
  */
class StreamCapSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.session

  private val flood =
    "the same boilerplate text repeated everywhere in this flood corpus"

  private def banded(docs: org.apache.spark.sql.DataFrame) =
    Dedup.bandKeys(
        Dedup.minhashSignatures(Dedup.shingled(docs, 3), 8), 4, 2)
      .withColumn("t", timestamp_micros(col("doc_id") + 1000000L))
      .withWatermark("t", "10 minutes")

  test("planted flood: survivors per bucket bounded at the cap; " +
      "distinct docs pass") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = s.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = Events.cappedBucketSurvivors(banded(docs), maxPerBucket = 3)
      .writeStream.format("memory").queryName("cap_flood_mem")
      .outputMode("append").start()
    try {
      input.addData((1L to 60L).map(i => (i, flood)): _*)
      q.processAllAvailable()
      input.addData(
        (1000L, "a genuinely distinct document about gardens and rivers"),
        (1001L, "yet another unrelated text mentioning ships and stars"))
      q.processAllAvailable()
    } finally q.stop()
    val rows = s.table("cap_flood_mem").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val perBucket = rows.groupBy(r => (r._1, r._2)).values.map(_.size)
    assert(perBucket.nonEmpty && perBucket.max <= 3,
      s"bucket overflow: ${perBucket.max}")
    // identical flood docs share all 4 band buckets: at most 3 flood
    // doc_ids can survive per bucket, 4 buckets -> <= 12 flood rows
    assert(rows.count(_._3 <= 60L) <= 12)
    // the distinct docs are not flood-bucket members and must pass
    assert(rows.exists(_._3 == 1000L))
    assert(rows.exists(_._3 == 1001L))
  }

  test("transition state carries across micro-batches; within-batch " +
    "order recovers") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = s.sqlContext
    val input = MemoryStream[(Long, Long, String, Long)]
    val events = input.toDF()
      .toDF("user_id", "event_id", "event_type", "ts_us")
    val q = Events.transitionPairs(events)
      .writeStream.format("memory").queryName("st_trans_mem")
      .outputMode("append").start()
    try {
      // batch 1, deliberately out of arrival order: (b@20, a@10) must
      // emit __start__->a, a->b after the within-batch sort
      input.addData((1L, 2L, "b", 20L), (1L, 1L, "a", 10L))
      q.processAllAvailable()
      // batch 2: the stored last event (b) must seed the next pair
      input.addData((1L, 3L, "c", 30L))
      q.processAllAvailable()
    } finally q.stop()
    val pairs = s.table("st_trans_mem").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(pairs.sorted.toSeq ===
      Seq(("__start__", "a"), ("a", "b"), ("b", "c")))
  }

  test("windowed-funnel state carries across micro-batches; " +
      "within-batch order recovers; window and order rules hold") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = s.sqlContext
    val input = MemoryStream[(Long, Long, String, Long)]
    val events = input.toDF()
      .toDF("user_id", "event_id", "event_type", "ts_us")
    val q = Events.funnelUserReach(events,
        Seq("signup", "click", "purchase"), windowUs = 100L)
      .writeStream.format("memory").queryName("st_funnel_spec_mem")
      .outputMode("update").start()
    try {
      // u1: signup+click batch 1 (arrival order REVERSED — the
      //     within-batch sort must recover signup-then-click);
      // u2: signup, then a click 200us later — OUTSIDE the 100us
      //     window anchored at signup;
      // u3: a click BEFORE any signup (must not count), then signup
      input.addData(
        (1L, 2L, "click", 20L), (1L, 1L, "signup", 10L),
        (2L, 10L, "signup", 10L), (2L, 11L, "click", 210L),
        (3L, 20L, "click", 5L), (3L, 21L, "signup", 30L))
      q.processAllAvailable()
      // batch 2: u1 purchases within window (state must resume at
      // step 2); u3 clicks after its signup (resume at step 1)
      input.addData((1L, 3L, "purchase", 90L),
        (3L, 22L, "click", 40L))
      q.processAllAvailable()
    } finally q.stop()
    val reach = s.table("st_funnel_spec_mem").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
      .groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).max }
    assert(reach === Map(1L -> 3, 2L -> 1, 3L -> 2),
      s"per-user reach wrong: $reach")
  }

  test("cap state persists across micro-batches") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = s.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = Events.cappedBucketSurvivors(banded(docs), maxPerBucket = 3)
      .writeStream.format("memory").queryName("cap_batches_mem")
      .outputMode("append").start()
    try {
      input.addData((1L, flood), (2L, flood))
      q.processAllAvailable() // 2 survivors: under the cap
      input.addData((3L to 12L).map(i => (i, flood)): _*)
      q.processAllAvailable() // only 1 more slot per bucket remains
    } finally q.stop()
    val rows = s.table("cap_batches_mem").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val perBucket = rows.groupBy(r => (r._1, r._2)).values.map(_.size)
    assert(perBucket.max <= 3)
    // docs 1 and 2 survived batch 1 in every bucket; batch 2 may add
    // at most one more doc per bucket
    val batch1 = rows.filter(_._3 <= 2L)
    assert(batch1.map(_._3).distinct.sorted.toSeq === Seq(1L, 2L))
  }

  test("maxPerBucket = 1 reduces to single-survivor suppression") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = s.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = Events.cappedBucketSurvivors(banded(docs), maxPerBucket = 1)
      .writeStream.format("memory").queryName("cap_one_mem")
      .outputMode("append").start()
    try {
      input.addData((1L to 20L).map(i => (i, flood)): _*)
      q.processAllAvailable()
    } finally q.stop()
    val rows = s.table("cap_one_mem").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(rows.groupBy(r => (r._1, r._2)).values.map(_.size).max === 1)
  }
}
