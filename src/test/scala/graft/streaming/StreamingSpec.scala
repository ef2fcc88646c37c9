package graft.streaming

import graft.SparkTestBase
import graft.graph.PropertyGraph
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val eventRows = Seq(
    (1L, ts("2024-01-01 00:05:00"), 1L, "click", 10.0),
    (2L, ts("2024-01-01 00:20:00"), 1L, "click", 20.0),
    (3L, ts("2024-01-01 00:55:00"), 2L, "view", 5.0),
    (4L, ts("2024-01-01 01:10:00"), 1L, "click", 7.5),
    (5L, ts("2024-01-01 02:00:00"), 2L, "view", 2.5))

  private def eventDf = eventRows
    .toDF("event_id", "ts", "user_id", "event_type", "value")

  test("tumbling window: streaming result equals batch result") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val stream = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val agg = EventWindows.tumbling(EventWindows.withLateDataBound(stream, "10 minutes"), "1 hour")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("tumbling_out").start()
    try {
      mem.addData(eventRows: _*)
      q.processAllAvailable()
      val streamed = spark.table("tumbling_out")
        .orderBy("window_start", "event_type").collect().toSeq
      val batch = EventWindows.tumbling(eventDf, "1 hour")
        .orderBy("window_start", "event_type").collect().toSeq
      assert(streamed === batch)
    } finally q.stop()
  }

  test("incremental near-dup runs per micro-batch via foreachBatch against static history") {
    // d17's streaming form: each micro-batch of arriving docs is matched
    // against the standing corpus through the banded MinHash index —
    // foreachBatch is exactly where an ingest pipeline calls it.
    implicit val sc = spark.sqlContext
    val history = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "an unrelated history document about query planners"))
      .toDF("doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    val arrivals = mem.toDF().toDF("doc_id", "text")
    val results = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    val q = arrivals.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.analytics.Dedup.incrementalNearDups(history, batch, "doc_id", "text")
          .collect().foreach(r => results.synchronized {
            results += r.getLong(0) -> ((r.getLong(1), r.getLong(2)))
          })
      }.start()
    try {
      mem.addData((10L, "the quick brown fox jumps over the lazy dog today"))
      q.processAllAvailable()
      mem.addData((11L, "a clean arrival with entirely fresh content here"))
      q.processAllAvailable()
      assert(results(10L) == ((1L, 1L)))  // batch 1: duplicate of history doc 1
      assert(results(11L) == ((0L, -1L))) // batch 2: clean
    } finally q.stop()
  }

  test("two-level window ladder: streaming (append) equals batch on closed windows") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val stream = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    // chained stateful aggregation (5 min → 1 hour) — append mode; the fine
    // level's window_time feeds the coarse level's event time
    val agg = EventWindows.twoLevel(
      EventWindows.withLateDataBound(stream, "10 minutes"), "5 minutes", "1 hour")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("twolevel_out").start()
    try {
      mem.addData(eventRows: _*)
      q.processAllAvailable()
      // push the watermark past every fixture hour so both levels close
      mem.addData((99L, ts("2024-01-02 00:00:00"), 9L, "flush", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("twolevel_out")
        .filter($"window_start" < ts("2024-01-01 12:00:00")) // exclude flush
        .orderBy("window_start", "event_type").collect().toSeq
      val batch = EventWindows.twoLevel(eventDf, "5 minutes", "1 hour")
        .orderBy("window_start", "event_type").collect().toSeq
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("session windows merge by gap in batch mode") {
    val sessions = EventWindows.sessions(eventDf, "30 minutes")
      .orderBy("user_id", "session_start")
      .select($"user_id", $"n_events").as[(Long, Long)].collect().toSeq
    // user 1: events at 00:05, 00:20 merge (gap 15m); 01:10 separate
    // user 2: 00:55 and 02:00 separate
    assert(sessions === Seq((1L, 2L), (1L, 1L), (2L, 1L), (2L, 1L)))
  }

  test("streaming dedup: dropDuplicates within watermark removes re-deliveries") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val stream = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
      .withWatermark("ts", "1 hour")
      .dropDuplicates("event_id")
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      mem.addData(eventRows: _*)
      q.processAllAvailable()
      mem.addData(eventRows.take(3): _*) // redelivery of first three
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() === eventRows.length)
    } finally q.stop()
  }

  test("flatMapGroupsWithState: custom running per-user event counter") {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, Long)] // (user_id, event_id)
    val counted = mem.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, events: Iterator[(Long, Long)], state: GroupState[Long]) =>
          val prev = state.getOption.getOrElse(0L)
          val total = prev + events.size
          state.update(total)
          Iterator((user, total))
      }.toDF("user_id", "running_events")
    val q = counted.writeStream.outputMode("append")
      .format("memory").queryName("state_out").start()
    try {
      mem.addData((1L, 1L), (1L, 2L), (2L, 3L))
      q.processAllAvailable()
      mem.addData((1L, 4L))
      q.processAllAvailable()
      val last = spark.table("state_out")
        .groupBy("user_id").agg(max("running_events").as("n"))
        .orderBy("user_id").as[(Long, Long)].collect().toSeq
      assert(last === Seq((1L, 3L), (2L, 1L))) // state carried across batches
    } finally q.stop()
  }

  test("Sessionize state machine: streamed-in-batches equals one-shot batch (s12 twin)") {
    import Sessionize.{EvRow, SessionOut}
    implicit val sc = spark.sqlContext
    def us(s: String) = ts(s).getTime * 1000L
    // user 1: two sessions (00:00+00:10 merge; 01:00+01:05 merge);
    // user 2: two single-event sessions 2h apart
    val evs = Seq(
      EvRow(1L, us("2024-01-01 00:00:00"), 1L),
      EvRow(1L, us("2024-01-01 00:10:00"), 2L),
      EvRow(1L, us("2024-01-01 01:00:00"), 3L),
      EvRow(1L, us("2024-01-01 01:05:00"), 4L),
      EvRow(2L, us("2024-01-01 00:00:00"), 5L),
      EvRow(2L, us("2024-01-01 02:00:00"), 6L))
    val sentinels = Seq(EvRow(1L, Sessionize.SentinelTs, Long.MaxValue),
      EvRow(2L, Sessionize.SentinelTs, Long.MaxValue))
    // batch: whole history in one invocation with empty state
    val batchOut = Sessionize.sessions(
        Sessionize.withSentinels(spark, evs.toDS()))
      .collect().toSeq.sortBy(s => (s.user_id, s.n_events, s.span_min))
    assert(batchOut.toSet === Set(
      SessionOut(1L, 2, 10L), SessionOut(1L, 2, 5L),
      SessionOut(2L, 1, 0L), SessionOut(2L, 1, 0L)))
    // streaming: same events in ts order across 3 micro-batches; state
    // (the open session) must survive batch boundaries — the 00:10 event
    // arrives a batch after 00:00 and must still merge into its session
    val mem = MemoryStream[EvRow]
    val q = Sessionize.sessions(mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("sessionize_out").start()
    try {
      mem.addData(evs.filter(_.tu <= us("2024-01-01 00:00:00")): _*)
      q.processAllAvailable()
      mem.addData(evs.filter(e =>
        e.tu > us("2024-01-01 00:00:00") && e.tu <= us("2024-01-01 01:00:00")): _*)
      q.processAllAvailable()
      mem.addData(evs.filter(_.tu > us("2024-01-01 01:00:00")): _*)
      q.processAllAvailable()
      mem.addData(sentinels: _*) // end-of-input flush
      q.processAllAvailable()
      val streamed = spark.table("sessionize_out").as[SessionOut]
        .collect().toSeq.sortBy(s => (s.user_id, s.n_events, s.span_min))
      assert(streamed === batchOut)
    } finally q.stop()
  }

  test("RocksDB state store: sessionizer and stream dedup match the default store") {
    // At 100 TB state the RocksDB provider is the deployment reality
    // (state spills off-heap instead of living in executor memory); the
    // stateful operators must not depend on any default-store semantics.
    // Same inputs as the s12 twin and the dedup test above, provider
    // swapped — outputs must be identical (VERDICT r7 #6).
    import Sessionize.{EvRow, SessionOut}
    implicit val sc = spark.sqlContext
    def us(s: String) = ts(s).getTime * 1000L
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val evs = Seq(
        EvRow(1L, us("2024-01-01 00:00:00"), 1L),
        EvRow(1L, us("2024-01-01 00:10:00"), 2L),
        EvRow(1L, us("2024-01-01 01:00:00"), 3L),
        EvRow(1L, us("2024-01-01 01:05:00"), 4L),
        EvRow(2L, us("2024-01-01 00:00:00"), 5L),
        EvRow(2L, us("2024-01-01 02:00:00"), 6L))
      val mem = MemoryStream[EvRow]
      val q = Sessionize.sessions(mem.toDS())
        .writeStream.outputMode("append")
        .format("memory").queryName("sessionize_rocksdb").start()
      try {
        // flatMapGroupsWithState state must round-trip the RocksDB store
        // ACROSS batches: split so user 1's open session straddles two
        mem.addData(evs.take(2): _*)
        q.processAllAvailable()
        mem.addData(evs.drop(2): _*)
        q.processAllAvailable()
        mem.addData(EvRow(1L, Sessionize.SentinelTs, Long.MaxValue),
          EvRow(2L, Sessionize.SentinelTs, Long.MaxValue))
        q.processAllAvailable()
        assert(q.lastProgress.stateOperators.exists(
          _.customMetrics.containsKey("rocksdbGetCount")),
          "query did not actually run on the RocksDB provider")
        val streamed = spark.table("sessionize_rocksdb").as[SessionOut]
          .collect().toSet
        assert(streamed === Set(
          SessionOut(1L, 2, 10L), SessionOut(1L, 2, 5L),
          SessionOut(2L, 1, 0L), SessionOut(2L, 1, 0L)))
      } finally q.stop()
      // watermarked dropDuplicates keeps its exactly-once dedup semantics
      val dmem = MemoryStream[(Long, Timestamp, Long, String, Double)]
      val dq = dmem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
        .withWatermark("ts", "1 hour")
        .dropDuplicates("event_id")
        .writeStream.outputMode("append")
        .format("memory").queryName("dedup_rocksdb").start()
      try {
        dmem.addData(eventRows: _*)
        dq.processAllAvailable()
        dmem.addData(eventRows.take(3): _*)
        dq.processAllAvailable()
        assert(spark.table("dedup_rocksdb").count() === eventRows.length)
      } finally dq.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("session windows: streaming (watermarked, complete) equals batch") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val stream = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val agg = EventWindows.sessions(
      EventWindows.withLateDataBound(stream, "10 minutes"), "30 minutes")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("sessions_out").start()
    try {
      mem.addData(eventRows: _*)
      q.processAllAvailable()
      val streamed = spark.table("sessions_out")
        .orderBy("user_id", "session_start").collect().toSeq
      val batch = EventWindows.sessions(eventDf, "30 minutes")
        .orderBy("user_id", "session_start").collect().toSeq
      assert(streamed === batch)
    } finally q.stop()
  }

  test("stream-stream interval join: clicks enriched by purchases within the window") {
    implicit val sc = spark.sqlContext
    val clicksMem = MemoryStream[(Long, Timestamp, Long)]    // (event_id, ts, user_id)
    val purchMem = MemoryStream[(Long, Timestamp, Long, Double)]
    val clicks = clicksMem.toDF().toDF("click_id", "c_ts", "user_id")
      .withWatermark("c_ts", "1 hour")
    val purchases = purchMem.toDF().toDF("purchase_id", "p_ts", "user_id", "value")
      .withWatermark("p_ts", "1 hour")
    // purchase within the hour BEFORE the click — both sides stateful,
    // state bounded by watermark + the interval condition
    val joined = clicks.join(purchases.withColumnRenamed("user_id", "p_user_id"),
      expr("user_id = p_user_id AND p_ts <= c_ts AND p_ts >= c_ts - INTERVAL 1 HOUR"))
    val q = joined.select("click_id", "purchase_id")
      .writeStream.outputMode("append").format("memory")
      .queryName("ssj_out").start()
    try {
      clicksMem.addData((1L, ts("2024-01-01 10:00:00"), 1L), (2L, ts("2024-01-01 12:00:00"), 1L))
      purchMem.addData((100L, ts("2024-01-01 09:30:00"), 1L, 5.0),
        (101L, ts("2024-01-01 09:30:00"), 2L, 9.0)) // other user — no match
      q.processAllAvailable()
      val rows = spark.table("ssj_out").as[(Long, Long)].collect().toSet
      // click 1 (10:00) matches purchase 100 (09:30, within 1h);
      // click 2 (12:00) does not (2.5h later); user 2's purchase matches nothing
      assert(rows === Set((1L, 100L)))
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER interval join emits null rows after watermark expiry") {
    implicit val sc = spark.sqlContext
    val clicksMem = MemoryStream[(Long, Timestamp, Long)]
    val purchMem = MemoryStream[(Long, Timestamp, Long, Double)]
    val clicks = clicksMem.toDF().toDF("click_id", "c_ts", "user_id")
      .withWatermark("c_ts", "10 minutes")
    val purchases = purchMem.toDF().toDF("purchase_id", "p_ts", "p_user_id", "value")
      .withWatermark("p_ts", "10 minutes")
    val joined = clicks.join(purchases,
      expr("user_id = p_user_id AND p_ts <= c_ts AND p_ts >= c_ts - INTERVAL 1 HOUR"),
      "left_outer")
    val q = joined.select("click_id", "purchase_id")
      .writeStream.outputMode("append").format("memory")
      .queryName("ssj_outer_out").start()
    try {
      clicksMem.addData((1L, ts("2024-01-01 10:00:00"), 1L), // will match
        (2L, ts("2024-01-01 10:00:00"), 2L))                 // will NOT match
      purchMem.addData((100L, ts("2024-01-01 09:30:00"), 1L, 5.0))
      q.processAllAvailable()
      // advance both watermarks far enough that click 2's unmatched state
      // expires — the outer (null) row is only emitted then
      clicksMem.addData((3L, ts("2024-01-01 14:00:00"), 9L))
      purchMem.addData((999L, ts("2024-01-01 14:00:00"), 9L, 1.0))
      q.processAllAvailable()
      val rows = spark.table("ssj_outer_out")
        .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      assert(rows.contains((1L, 100L)))  // matched pair
      assert(rows.contains((2L, -1L)))   // outer row with null purchase
    } finally q.stop()
  }

  test("stream-static join: streaming events enriched from a static dim table") {
    implicit val sc = spark.sqlContext
    val users = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val joined = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
      .join(users, Seq("user_id")) // static side broadcast per micro-batch
    val q = joined.select("event_id", "tier")
      .writeStream.outputMode("append").format("memory")
      .queryName("ssj_static_out").start()
    try {
      mem.addData(eventRows: _*)
      q.processAllAvailable()
      val tiers = spark.table("ssj_static_out").as[(Long, String)].collect().toMap
      assert(tiers === Map(1L -> "gold", 2L -> "gold", 3L -> "basic",
        4L -> "gold", 5L -> "basic"))
    } finally q.stop()
  }

  test("round-13: streamed ingest keeps a vector index LIVE — foreachBatch " +
      "imports patch incrementally, retrieval never re-pays the build") {
    implicit val sc = spark.sqlContext
    // the s13 catalog entry hashes the batched twin against c68's oracle;
    // this is the TRUE Structured-Streaming wiring: a MemoryStream of
    // embedded chunks drains through foreachBatch into one CypherSession
    // whose index was created BEFORE any data arrived
    val sess = new graft.cypher.CypherSession(
      PropertyGraph.empty(spark), keyProps = Map("Doc" -> "id"))
    sess.run("""CREATE VECTOR INDEX live FOR (d:Doc) ON d.embedding
               |OPTIONS {indexConfig: {`vector.dimensions`: 4}}""".stripMargin)
    def top(v: Seq[Double]): Seq[String] = sess.run(
      "CALL db.index.vector.queryNodes('live', 2, $q) YIELD node, score " +
        "RETURN node.id AS id", Map("q" -> v))
      .asInstanceOf[graft.cypher.CypherRows].df.as[String].collect().toSeq
    val full0 = sess.vectorIndexFullBuilds.get
    val inc0 = sess.vectorIndexIncrementalUpdates.get
    val mem = MemoryStream[(String, Seq[Double])]
    val q = mem.toDF().toDF("id", "embedding")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // LangChain's add_embeddings shape: the driver holds the batch it
        // just embedded (bounded by the micro-batch, never the corpus)
        val rows = batch.collect().map(r => Map(
          "id" -> r.getString(0),
          "embedding" -> r.getSeq[Double](1)))
        if (rows.nonEmpty) sess.run(
          """UNWIND $data AS row
            |MERGE (d:Doc {id: row.id})
            |WITH d, row
            |CALL db.create.setNodeVectorProperty(d, 'embedding', row.embedding)"""
            .stripMargin, Map("data" -> rows.toSeq))
        ()
      }.start()
    try {
      mem.addData(("a", Seq(1.0, 0.0, 0.0, 0.0)), ("b", Seq(0.9, 0.1, 0.0, 0.0)))
      q.processAllAvailable()
      assert(top(Seq(1.0, 0.0, 0.0, 0.0)) === Seq("a", "b"))
      mem.addData(("c", Seq(1.0, 0.05, 0.0, 0.0)))
      q.processAllAvailable()
      assert(top(Seq(1.0, 0.0, 0.0, 0.0)) === Seq("a", "c"))
      mem.addData(("a", Seq(0.0, 0.0, 0.0, 1.0))) // re-embed an existing doc
      q.processAllAvailable()
      assert(top(Seq(0.0, 0.0, 0.0, 1.0)) === Seq("a"))
      // THE structural claim: three micro-batches, three incremental
      // patches, zero additional full builds
      assert(sess.vectorIndexFullBuilds.get === full0,
        "a streamed micro-batch must never re-pay the index build")
      assert(sess.vectorIndexIncrementalUpdates.get >= inc0 + 3)
    } finally q.stop()
  }

  test("foreachBatch MERGE sink upserts idempotently into the graph") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    var graph = PropertyGraph.empty(spark)
    val q = mem.toDF().toDF("label_key", "title")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val nodes = batch.select(
          lit("Article").as("label"),
          col("label_key").as("key"),
          map(lit("title"), col("title")).as("props"))
        graph = graph.mergeNodes(nodes)
        graph.nodes.count() // materialize within the epoch
        ()
      }.start()
    try {
      mem.addData(("a", "t1"), ("b", "t2"))
      q.processAllAvailable()
      mem.addData(("a", "t1-updated"), ("c", "t3")) // a merges, c creates
      q.processAllAvailable()
      assert(graph.nodes.count() === 3)
      val title = graph.nodes.filter($"key" === "a")
        .select(element_at($"props", "title")).as[String].head()
      assert(title === "t1-updated")
    } finally q.stop()
  }

  test("durable streaming MERGE: partition-scoped store upsert across 3 micro-batches") {
    import graft.graph.GraphStore
    import graft.model.GraphSchema
    implicit val sc = spark.sqlContext
    val store = java.nio.file.Files.createTempDirectory("graft_stream_store").toString
    // seed a partition no batch touches — it must never be rewritten
    GraphStore.write(PropertyGraph.empty(spark).mergeNodes(
      Seq(("Publisher", "P0", Map("seed" -> "y")))
        .toDF("label", "key", "props")), store)
    def pubFiles() = new java.io.File(s"$store/nodes/label=Publisher")
      .listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.lastModified)).toSet
    val before = pubFiles()
    val counters = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val mem = MemoryStream[(String, String)]
    val q = mem.toDF().toDF("key", "title")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val nodes = batch.select(lit("Article").as("label"), col("key"),
          map(lit("title"), col("title")).as("props"))
        counters += GraphStore.upsertNodes(spark, store, nodes)
        GraphStore.upsertEdges(spark, store, batch.select(
          GraphSchema.stableId(lit("Article"), col("key")).as("srcId"),
          GraphSchema.stableId(lit("Publisher"), lit("P0")).as("dstId"),
          lit("WRITTEN_BY").as("relType")))
        ()
      }.start()
    try {
      mem.addData(("a", "t1"), ("b", "t2")); q.processAllAvailable()
      mem.addData(("a", "t1-updated"), ("c", "t3")); q.processAllAvailable()
      mem.addData(("d", "t4")); q.processAllAvailable()
    } finally q.stop()
    // per-batch created/matched counters, the reference's branch signal
    assert(counters.toSeq === Seq((2L, 0L), (1L, 1L), (1L, 0L)))
    val g = GraphStore.read(spark, store)
    assert(g.matchLabel("Article").count() === 4)
    assert(g.matchLabel("Publisher").count() === 1)
    assert(g.edges.count() === 4)
    // the re-merged key carries the LAST batch's property
    assert(g.matchLabel("Article").filter(col("key") === "a")
      .select(element_at(col("props"), "title")).as[String].head() === "t1-updated")
    // partition-scoped writes: the untouched Publisher partition's files
    // are bit-identical across all three batches (no full-store rewrite)
    assert(pubFiles() === before)
  }

  test("checkpoint recovery: committed batches never replay; a crashed batch replays idempotently") {
    // The exactly-once property the reference gets from Neo4j transactions,
    // proven on OUR sink instead of argued: a file-source query with a real
    // checkpoint is stopped and restarted twice —
    //   restart A: new data only; the committed batch 0 must NOT reprocess
    //     (created counters sum once across the whole run);
    //   restart B: batch 2's side effect RAN but its commit was lost (the
    //     injected crash fires after upsertNodes returns) — the replay
    //     re-applies the MERGE and the store still holds each key once.
    // Spark's offset log gives at-least-once per uncommitted batch; the
    // idempotent set-oriented MERGE upgrades the EFFECT to exactly-once.
    import graft.graph.GraphStore
    import org.apache.spark.sql.types._
    val dirs = Seq("in", "chk", "store").map(n =>
      java.nio.file.Files.createTempDirectory(s"graft_recovery_$n").toString)
    val Seq(inDir, chkDir, store) = dirs
    // seed unrelated nodes AND an edge: a zero-file parquet dir (which an
    // edge-less store's edges/ would be) can't infer its schema on read
    GraphStore.write(PropertyGraph.empty(spark)
      .mergeNodes(Seq(
        ("Publisher", "P0", Map("seed" -> "y")),
        ("Publisher", "P1", Map("seed" -> "y")))
        .toDF("label", "key", "props"))
      .mergeEdgesByKey(Seq(("Publisher", "P0", "Publisher", "P1", "RELATES"))
        .toDF("srcLabel", "srcKey", "dstLabel", "dstKey", "relType")), store)
    val schema = new StructType().add("key", StringType).add("title", StringType)
    val counters = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    @volatile var crashOnce = false
    def startQuery() = spark.readStream.schema(schema).json(inDir)
      .writeStream.outputMode("append")
      .option("checkpointLocation", chkDir)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val nodes = batch.select(lit("Article").as("label"), col("key"),
          map(lit("title"), col("title")).as("props"))
        counters += GraphStore.upsertNodes(spark, store, nodes)
        if (crashOnce) { crashOnce = false
          throw new RuntimeException("injected crash AFTER side effect, before commit")
        }
        ()
      }.start()
    def writeFile(name: String, lines: String*): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(inDir, name),
        lines.mkString("\n").getBytes("UTF-8"))
    def articles() = GraphStore.read(spark, store).matchLabel("Article")

    // run 1: batch 0 commits, clean stop
    writeFile("f1.json", """{"key":"a","title":"t1"}""", """{"key":"b","title":"t2"}""")
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    assert(counters.toSeq === Seq((2L, 0L)))

    // restart A: only the NEW file may process — a committed batch
    // reprocessing here would show up as extra counter rows
    writeFile("f2.json", """{"key":"a","title":"t1-v2"}""", """{"key":"c","title":"t3"}""")
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    assert(counters.toSeq === Seq((2L, 0L), (1L, 1L)),
      s"committed batch replayed: $counters")
    assert(articles().count() === 3)

    // run 3: the batch's side effect runs, then the commit is lost
    writeFile("f3.json", """{"key":"d","title":"t4"}""")
    crashOnce = true
    val q3 = startQuery()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q3.processAllAvailable(); q3.awaitTermination()
    }
    q3.stop()
    assert(counters.toSeq === Seq((2L, 0L), (1L, 1L), (1L, 0L)),
      s"crashed batch's first attempt missing: $counters")

    // restart B: the uncommitted batch REPLAYS (at-least-once), the
    // idempotent MERGE reports it as matched, and the store is unchanged
    val q4 = startQuery()
    try q4.processAllAvailable() finally q4.stop()
    assert(counters.toSeq === Seq((2L, 0L), (1L, 1L), (1L, 0L), (0L, 1L)),
      s"replay after crash not idempotent: $counters")
    assert(articles().count() === 4, "a key was double-created")
    assert(articles().filter(col("key") === "d").count() === 1)
    assert(articles().filter(col("key") === "a")
      .select(element_at(col("props"), "title")).as[String].head() === "t1-v2")
  }
}
