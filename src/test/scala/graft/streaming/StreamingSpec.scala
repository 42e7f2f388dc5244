package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.core.Registry
import graft.crud.CrudEngine
import graft.storage.ParquetBackend

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  test("streaming windowed counts equal the batch aggregation") {
    val sfDir = "/root/testdata/sf0.001"
    // the file stream source wants a directory (at scale: a landing
    // dir or Kafka topic) — stage the single test file into one
    val streamDir = Files.createTempDirectory("events-stream")
    Files.copy(java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val q = EventsStream.windowedCounts(spark, streamDir.toString)
      .writeStream.format("memory").queryName("ev_counts")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("ev_counts")
      .agg(sum("n_events"), sum("value_cents")).head
    val batch = EventsStream.readBatch(spark, s"$sfDir/events.parquet")
      .agg(count(lit(1)), sum(round(col("value") * 100).cast("long"))).head
    assert(streamed.getLong(0) == batch.getLong(0), "event counts agree")
    assert(streamed.getLong(1) == batch.getLong(1), "value sums agree")
    assert(spark.table("ev_counts").count() > 10, "multiple windows emitted")
  }

  test("stream-static dim enrichment: windowed per-segment counts " +
      "equal the batch twin exactly") {
    val sfDir = "/root/testdata/sf0.001"
    val streamDir = Files.createTempDirectory("events-enrich")
    Files.copy(java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val q = EventsStream.enrichedSegmentCounts(spark,
        streamDir.toString, sfDir)
      .writeStream.format("memory").queryName("ev_enriched")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("ev_enriched")
    val batch = EventsStream.enrichedSegmentCountsBatch(spark,
      streamDir.toString, sfDir)
    // full-result equality, not just totals: the enrichment join must
    // not change a single (window, segment) cell between the engines
    assert(streamed.exceptAll(batch).count() == 0 &&
      batch.exceptAll(streamed).count() == 0,
      "stream and batch enrichment disagree")
    assert(streamed.select(col("c_mktsegment")).distinct().count() >= 3,
      "expected several enriched segments")
  }

  test("stream-stream join attributes purchases to preceding clicks") {
    val sfDir = "/root/testdata/sf0.001"
    val streamDir = Files.createTempDirectory("events-ssj")
    Files.copy(java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val q = EventsStream.clickToPurchase(spark, streamDir.toString)
      .writeStream.format("memory").queryName("attributions")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val rows = spark.table("attributions").collect()
    assert(rows.nonEmpty, "expected at least one attribution")
    assert(rows.forall { r =>
      val dt = r.getAs[java.sql.Timestamp]("purchase_time").getTime -
        r.getAs[java.sql.Timestamp]("click_time").getTime
      dt >= 0 && dt <= 30 * 60000L
    }, "purchases within 30min after the click")
    // batch cross-check: same join as a plain query
    val ev = EventsStream.readBatch(spark, streamDir.toString)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"))
    val expected = clicks.join(purchases,
      col("cu") === col("pu") && col("pts") >= col("cts") &&
        col("pts") <= col("cts") + lit(30L * 60 * 1000000000L)).count()
    assert(rows.length == expected,
      s"stream join found ${rows.length}, batch join $expected")
  }

  test("streaming dedup matches the batch distinct-hash count") {
    val sfDir = "/root/testdata/sf0.001"
    val streamDir = Files.createTempDirectory("events-dedup")
    Files.copy(java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val q = EventsStream.dedupedEvents(spark, streamDir.toString)
      .writeStream.format("memory").queryName("ev_dedup")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("ev_dedup")
    val batchDistinct = EventsStream
      .readBatch(spark, s"$sfDir/events.parquet")
      .select(md5(concat_ws(":", col("user_id"), col("event_type"),
        round(col("value") * 100).cast("long"))).as("h"))
      .distinct().count()
    // one batch, so the watermark never evicts mid-stream: the kept
    // set is exactly one event per distinct hash
    assert(streamed.count() == batchDistinct, "one survivor per hash")
    assert(streamed.select("h").distinct().count() == batchDistinct)
  }

  test("flatMapGroupsWithState sessionization emits valid sessions") {
    val sfDir = "/root/testdata/sf0.001"
    val streamDir = Files.createTempDirectory("events-sessions")
    Files.copy(java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val q = Sessionize.sessions(spark, streamDir.toString, gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val rows = spark.table("sessions").collect()
    assert(rows.length > 10, s"expected closed sessions, got ${rows.length}")
    // session invariants
    assert(rows.forall(r =>
      r.getAs[Long]("end_ms") >= r.getAs[Long]("start_ms") &&
        r.getAs[Int]("n_events") > 0))
    // per-user sessions are disjoint and separated by > gap
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    byUser.values.foreach { ss =>
      val sorted = ss.sortBy(_.getAs[Long]("start_ms"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("start_ms") - a.getAs[Long]("end_ms") >
            30 * 60000L, "sessions separated by more than the gap")
        case _ =>
      }
    }
  }

  test("CRUD changelog feeds a subscription stream") {
    val modelsDir = Files.createTempDirectory("sub-models")
    Files.writeString(modelsDir.resolve("movie.json"),
      """{"model_name":"movie","storage_type":"json",
        |"attributes":{"id":"Integer","name":"String","year":"Integer",
        |"actors":["String"],"recommended":"Boolean"},
        |"primary_key":"id","required":["id","name","recommended"]}"""
        .stripMargin.replace("\n", ""))
    val reg = Registry.load(modelsDir).toOption.get
    val movie = reg.lookup("movie").toOption.get
    val logDir = Files.createTempDirectory("sub-log").toString
    val log = new ChangeLog(spark, logDir)
    val engine = new CrudEngine(spark,
      new ParquetBackend(spark,
        Files.createTempDirectory("sub-store").toString, 4), Some(log))

    engine.createOne(movie, """{"id":1,"name":"a","recommended":true}""")
    engine.updateOne(movie, "1", """{"year":2001}""")
    engine.deleteOne(movie, "1")

    val q = log.subscribe(movie)
      .writeStream.format("memory").queryName("movie_changes")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val rows = spark.table("movie_changes")
      .orderBy("seq").collect()
    assert(rows.map(_.getAs[String]("op")).toSeq ==
      Seq("create", "update", "delete"))
    assert(rows.forall(_.getAs[String]("pk") == "1"))
    assert(rows(1).getAs[String]("record").contains("\"year\":2001"))
  }

  test("changelog repairs every compaction crash state on construction") {
    // compact() swaps directories with two non-atomic moves; a crash at
    // any point must leave a log the NEXT ChangeLog construction fully
    // restores. Stage each crash state by hand and reopen.
    import java.nio.file.{Files => F, Paths, StandardCopyOption}
    val modelsDir = Files.createTempDirectory("crash-models")
    F.writeString(modelsDir.resolve("movie.json"),
      """{"model_name":"movie","storage_type":"json",
        |"attributes":{"id":"Integer","name":"String"},
        |"primary_key":"id","required":["id"]}"""
        .stripMargin.replace("\n", ""))
    val movie = Registry.load(modelsDir).toOption.get
      .lookup("movie").toOption.get
    val logDir = Files.createTempDirectory("crash-log")
      .resolve("log").toString
    val log = new ChangeLog(spark, logDir)
    val engine = new CrudEngine(spark,
      new ParquetBackend(spark,
        Files.createTempDirectory("crash-store").toString, 4), Some(log))
    engine.createOne(movie, """{"id":1,"name":"a"}""")
    engine.createOne(movie, """{"id":2,"name":"b"}""")

    def copyTree(from: String, to: String): Unit = {
      val src = Paths.get(from)
      F.walk(src).forEach { p =>
        val dst = Paths.get(to).resolve(src.relativize(p).toString)
        if (F.isDirectory(p)) F.createDirectories(dst)
        else { F.createDirectories(dst.getParent)
          F.copy(p, dst, StandardCopyOption.REPLACE_EXISTING) }
      }
    }
    def moveTree(from: String, to: String): Unit =
      F.move(Paths.get(from), Paths.get(to))

    // state A: died between move(dir→.old) and move(.compacting→dir) —
    // dir missing, both .old (complete) and .compacting present
    copyTree(logDir, logDir + ".compacting")
    moveTree(logDir, logDir + ".old")
    val reopenedA = new ChangeLog(spark, logDir)
    assert(reopenedA.all().count() == 2L, "rolled back to the .old log")
    assert(!F.exists(Paths.get(logDir + ".old")) &&
      !F.exists(Paths.get(logDir + ".compacting")), "scratch dirs gone")

    // state B: died after the swap, before deleting .old — both present
    copyTree(logDir, logDir + ".old")
    val reopenedB = new ChangeLog(spark, logDir)
    assert(reopenedB.all().count() == 2L)
    assert(!F.exists(Paths.get(logDir + ".old")), "stale .old dropped")

    // state C: died mid-fold — only .compacting is stale
    copyTree(logDir, logDir + ".compacting")
    val reopenedC = new ChangeLog(spark, logDir)
    assert(reopenedC.all().count() == 2L)
    assert(!F.exists(Paths.get(logDir + ".compacting")))

    // the repaired log still appends and resumes seq correctly
    val engine2 = new CrudEngine(spark,
      new ParquetBackend(spark,
        Files.createTempDirectory("crash-store2").toString, 4),
      Some(reopenedC))
    engine2.createOne(movie, """{"id":3,"name":"c"}""")
    val seqs = reopenedC.all().orderBy("seq").collect()
      .map(_.getAs[Long]("seq")).toSeq
    assert(seqs == Seq(1L, 2L, 3L), s"seq resumed without reuse: $seqs")
  }

  test("changelog auto-compacts on the append path once history " +
      "outgrows live keys, preserving latest state, tombstones and seq") {
    val modelsDir = Files.createTempDirectory("ac-models")
    Files.writeString(modelsDir.resolve("movie.json"),
      """{"model_name":"movie","storage_type":"json",
        |"attributes":{"id":"Integer","name":"String"},
        |"primary_key":"id","required":["id"]}"""
        .stripMargin.replace("\n", ""))
    val movie = Registry.load(modelsDir).toOption.get
      .lookup("movie").toOption.get
    val logDir = Files.createTempDirectory("ac-log")
      .resolve("log").toString
    // tight policy so the trigger is reachable in-spec: fold when the
    // log holds > 2× live keys AND ≥ 4 rows landed since last fold
    val log = new ChangeLog(spark, logDir,
      autoCompactRatio = 2L, autoCompactMinAppends = 4L)
    val engine = new CrudEngine(spark,
      new ParquetBackend(spark,
        Files.createTempDirectory("ac-store").toString, 4), Some(log))

    engine.createOne(movie, """{"id":1,"name":"v0"}""")
    (1 to 7).foreach(i =>
      engine.updateOne(movie, "1", s"""{"name":"v$i"}"""))

    // 8 events against 1 live key: compaction must have folded —
    // the on-disk log is smaller than the history...
    val rows = log.all().orderBy("seq").collect()
    assert(rows.length < 8, s"auto-compaction never fired: ${rows.length}")
    // ...while the surviving row is the key's LATEST state with its
    // ORIGINAL seq (Last-Event-ID resume stays exact)
    val last = rows.last
    assert(last.getAs[Long]("seq") == 8L)
    assert(last.getAs[String]("record").contains("\"name\":\"v7\""))
    assert(log.liveKeyCount == 1)

    // a post-compaction client catch-up sees exactly the folded rows
    assert(log.eventsSince(0L).map(_.getAs[Long]("seq")).toSeq ==
      rows.map(_.getAs[Long]("seq")).toSeq)

    // deletes fold to retained tombstones and drop the live key
    engine.createOne(movie, """{"id":2,"name":"b"}""")
    engine.deleteOne(movie, "2")
    (1 to 4).foreach(i =>
      engine.updateOne(movie, "1", s"""{"name":"w$i"}"""))
    val ops = log.all().orderBy("seq").collect()
      .map(r => (r.getAs[String]("pk"), r.getAs[String]("op")))
    assert(ops.contains(("2", "delete")), s"tombstone retained: ${ops.toSeq}")
    assert(log.liveKeyCount == 1)

    // seq keeps advancing without reuse across folds
    val maxSeq = log.all().agg(
      org.apache.spark.sql.functions.max(col("seq"))).head.getLong(0)
    assert(maxSeq == 14L, s"got $maxSeq")
  }
}
