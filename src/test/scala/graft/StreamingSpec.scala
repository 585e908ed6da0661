package graft

import java.nio.file.Files

import graft.datagen.DataGen
import graft.ops.Multimodal
import graft.pipeline.Incremental
import graft.streaming.IncrementalStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** S1 streaming facade + multimodal plumbing. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("AvailableNow drain: landing files flow through the fact transform once") {
    val root = Files.createTempDirectory("graft_stream").toString
    val landing = s"$root/landing"
    val wh = Incremental.Warehouse(s"$root/wh")
    DataGen.writeOrdersNdjson(spark, landing, n = 25, seed = 11L)
    IncrementalStream.runAvailableNow(spark, landing, wh, s"$root/ckpt")
    val fact = spark.read.parquet(wh.factOrders)
    val lineCount = fact.count()
    assert(lineCount > 0 && fact.select("order_id").distinct().count() == 25)

    // restart with NO new files: checkpoint must prevent reprocessing
    IncrementalStream.runAvailableNow(spark, landing, wh, s"$root/ckpt")
    assert(spark.read.parquet(wh.factOrders).count() == lineCount,
      "checkpointed files must not be reprocessed")
  }

  test("resident ProcessingTime mode: a live query processes files across two ticks",
      org.scalatest.Tag("Slow")) {
    // the resident twin of the AvailableNow drain: ONE long-lived query,
    // 1 s ticks (prod default is the reference's 15 min), with new files
    // landing WHILE it runs — the second wave must flow through the same
    // checkpoint without a restart.
    val root = Files.createTempDirectory("graft_resident").toString
    val landing = s"$root/landing"
    val wh = Incremental.Warehouse(s"$root/wh")
    def factOrderIds(): Long =
      try spark.read.parquet(wh.factOrders).select("order_id").distinct().count()
      catch { case _: Exception => -1L } // sink dir not created yet
    def waitFor(cond: => Boolean, what: String, timeoutMs: Long = 60000L): Unit = {
      val deadline = System.currentTimeMillis + timeoutMs
      while (!cond && System.currentTimeMillis < deadline) Thread.sleep(250)
      assert(cond, s"timed out waiting for $what")
    }
    DataGen.writeOrdersNdjson(spark, landing, n = 10, seed = 31L)
    val q = IncrementalStream.runResident(spark, landing, wh, s"$root/ckpt",
      interval = "1 second")
    try {
      waitFor(factOrderIds() == 10L, "tick 1 to land 10 orders")
      DataGen.writeOrdersNdjson(spark, landing, n = 10, seed = 32L)
      waitFor(factOrderIds() == 20L, "tick 2 to land 10 more orders")
      assert(q.isActive, "resident query must still be running after both ticks")
    } finally q.stop()
  }

  test("streaming hourly merge: two drains maintain exact running revenue per hour") {
    val root = Files.createTempDirectory("graft_hms").toString
    val landing = s"$root/landing"
    val aggPath = s"$root/agg_hourly"
    // wave 1, then wave 2 with DIFFERENT orders (some same hour): touched
    // hours must update to the running total, untouched hours must keep
    DataGen.writeOrdersNdjson(spark, landing, n = 20, seed = 21L)
    IncrementalStream.runHourlyMergeStream(spark, landing, aggPath, s"$root/ckpt")
    DataGen.writeOrdersNdjson(spark, landing, n = 20, seed = 22L)
    IncrementalStream.runHourlyMergeStream(spark, landing, aggPath, s"$root/ckpt")

    val got = spark.read.parquet(aggPath)
      .select(col("metric_hour").cast("long").as("h"),
        col("total_revenue").cast("double").as("rev"))
      .as[(Long, Double)].collect().toMap
    // exact recompute over ALL landed orders (revenue is decimal-exact in
    // both paths; the approx distincts are excluded from the comparison)
    val expected = DataGen.orders(spark, 20, seed = 21L)
      .unionByName(DataGen.orders(spark, 20, seed = 22L))
      .groupBy(date_trunc("hour", col("order_timestamp")).as("metric_hour"))
      .agg(sumMoney(col("total_amount")).cast("double").as("rev"))
      .select(col("metric_hour").cast("long"), col("rev"))
      .as[(Long, Double)].collect().toMap
    assert(got == expected, s"streaming merge diverged: $got vs $expected")
  }

  test("streaming hourly counts: two waves + late revision match batch; scores identical") {
    val root = Files.createTempDirectory("graft_rates").toString
    val countsPath = s"$root/counts"
    val base = DataGen.defaultBaseMs / 3600000L * 3600000L
    def ev(id: Long, hour: Int, min: Int, tp: String) =
      (id, new java.sql.Timestamp(base + hour * 3600000L + min * 60000L), tp)
    // wave 1: hours 0-4 for type a (3/hour), hour 1 for type b
    val wave1 = (0 until 5).flatMap(h =>
      (0 until 3).map(i => ev(h * 10L + i, h, i, "a"))) :+ ev(100L, 1, 5, "b")
    // wave 2: a NEW hour 5 burst, plus a LATE arrival revising hour 4
    val wave2 = (0 until 9).map(i => ev(200L + i, 5, i, "a")) :+ ev(300L, 4, 50, "a")
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)](spark)
    def drain(): Unit =
      IncrementalStream.runHourlyCountsStream(spark,
        mem.toDF().toDF("event_id", "ts", "event_type"),
        countsPath, s"$root/ckpt", watermark = "6 hours")
    mem.addData(wave1: _*)
    drain()
    mem.addData(wave2: _*)
    drain()

    val all = (wave1 ++ wave2).toDF("event_id", "ts", "event_type")
    val got = spark.read.parquet(countsPath)
      .select(col("event_type"), col("metric_hour").cast("long"), col("n_events"))
      .as[(String, Long, Long)].collect().toSet
    val expected = graft.ops.TimeSeries.hourlyCounts(all)
      .select(col("event_type"), col("metric_hour").cast("long"), col("n_events"))
      .as[(String, Long, Long)].collect().toSet
    assert(got == expected,
      s"maintained counts diverged (late revision lost?): $got vs $expected")
    // the batch scorer over the maintained table == batch rateAnomaly
    val maintained = spark.read.parquet(countsPath)
      .select(col("event_type"), col("metric_hour").cast("timestamp").as("metric_hour"),
        col("n_events"))
    val scoredStream = graft.ops.TimeSeries.scoreSeries(
      graft.ops.TimeSeries.gapFillCounts(maintained), window = 3)
      .select(col("event_type"), col("metric_hour").cast("long"),
        col("n_events"), col("z_score"), col("is_anomaly"))
      .as[(String, Long, Long, Option[Double], Boolean)].collect().toSet
    val scoredBatch = graft.ops.TimeSeries.rateAnomaly(all, window = 3)
      .select(col("event_type"), col("metric_hour").cast("long"),
        col("n_events"), col("z_score"), col("is_anomaly"))
      .as[(String, Long, Long, Option[Double], Boolean)].collect().toSet
    assert(scoredStream == scoredBatch)
  }

  test("streaming SCD2: two waves maintain the history; equals batch scd2 of all") {
    val root = Files.createTempDirectory("graft_scd2").toString
    val histPath = s"$root/dim_history"
    val base = DataGen.defaultBaseMs
    def ts(min: Int) = new java.sql.Timestamp(base + min * 60000L)
    // key 1: A A B | B A (cross-wave run collapse + reopen);
    // key 2: X | (untouched in wave 2 — bucket pass-through);
    // key 3: | new key arriving only in wave 2
    val wave1 = Seq((1L, ts(0), "A", 1L), (1L, ts(1), "A", 2L),
      (1L, ts(2), "B", 3L), (2L, ts(0), "X", 4L))
    val wave2 = Seq((1L, ts(3), "B", 5L), (1L, ts(4), "A", 6L),
      (3L, ts(5), "N", 7L))
    val mem = MemoryStream[(Long, java.sql.Timestamp, String, Long)](spark)
    def drain(): Unit =
      IncrementalStream.runScd2Stream(spark,
        mem.toDF().toDF("k", "ts", "status", "seq"),
        histPath, s"$root/ckpt", key = "k", ts = "ts",
        attrs = Seq("status"), tieBreak = Seq("seq"), nBuckets = 4)
    mem.addData(wave1: _*)
    drain()
    mem.addData(wave2: _*)
    drain()

    def snap(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "status", "effective_from", "effective_to", "is_current", "version")
        .collect().map(_.toSeq).toSet
    val maintained = spark.read.parquet(histPath)
    val batch = graft.ops.Temporal.scd2(
      (wave1 ++ wave2).toDF("k", "ts", "status", "seq"),
      "k", "ts", Seq("status"), Seq("seq"))
    assert(snap(maintained) == snap(batch),
      "maintained history must equal the batch recompute")
    // the physical layout is bucketed for partial overwrite
    assert(maintained.columns.contains("key_bucket"))
    // a restart with a different nBuckets would read the wrong buckets
    // and fork histories — the pinned bucket count must refuse it
    mem.addData((1L, ts(9), "Z", 9L))
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      IncrementalStream.runScd2Stream(spark,
        mem.toDF().toDF("k", "ts", "status", "seq"),
        histPath, s"$root/ckpt", key = "k", ts = "ts",
        attrs = Seq("status"), tieBreak = Seq("seq"), nBuckets = 8)
    }
    assert(ex.getMessage.contains("nBuckets"), s"got: ${ex.getMessage}")
    // history data with NO marker (pre-marker layout / deleted marker)
    // must refuse to run rather than bless the caller's value — silently
    // recreating it with a wrong count is the history-fork scenario the
    // marker exists to prevent
    val markerPath = new org.apache.hadoop.fs.Path(histPath, "_graft_nbuckets")
    val fs = markerPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(markerPath, false)
    val exNoMarker = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      IncrementalStream.runScd2Stream(spark,
        mem.toDF().toDF("k", "ts", "status", "seq"),
        histPath, s"$root/ckpt", key = "k", ts = "ts",
        attrs = Seq("status"), tieBreak = Seq("seq"), nBuckets = 4)
    }
    assert(exNoMarker.getMessage.contains("_graft_nbuckets"),
      s"got: ${exNoMarker.getMessage}")
    assert(!fs.exists(markerPath),
      "refusal must not recreate the marker from the caller's value")
  }

  test("streaming ingest curation: the registry advances between " +
    "batches, so a wave-2 near-copy of a wave-1 ACCEPT drops") {
    import graft.ops.text.{Corpus, Dedup, TextStats}
    import graft.pipeline
    val root = java.nio.file.Files
      .createTempDirectory("graft_ingest").toString
    val corpusSeed = Seq(
      (10L, "the cat and the dog ran in the park with the red ball", "en"),
      (12L, "the fox and the hen sat in the barn with the old hat", "en"))
      .toDF("doc_id", "text", "lang")
    corpusSeed.write.parquet(s"$root/corpus")
    val registryTable = s"$root/sigs"
    assert(Dedup.signatureRefresh(corpusSeed, registryTable,
      k = 32, bands = 8) == 1)
    val thresholds = Corpus.quantileThresholds(
      TextStats.qualityScore(corpusSeed, Seq("lang")),
      "quality_score", "lang", p = 0.5)
    val benchmark = Seq((100L,
      "the physics question is about the speed of light and the mass of the sun",
      "en")).toDF("doc_id", "text", "lang")

    val novelA = "the weather in the mountains is mild and the rain " +
      "falls in the valley near the lake"
    val novelB = "the wind and the rain came in the night and the door " +
      "of the house shut"
    val mem = MemoryStream[(Long, String, String)](spark)
    def drain(): Unit =
      IncrementalStream.runCurationIngest(spark,
        mem.toDF().toDF("doc_id", "text", "lang"),
        s"$root/corpus", registryTable, thresholds, benchmark,
        s"$root/accepted", s"$root/ckpt")
    // wave 1: novel A accepted; a corpus-10 near-copy drops
    mem.addData(
      (21L, novelA, "en"),
      (23L, "the cat and the dog ran in the park with the red ball quickly", "en"))
    drain()
    assert(spark.read.parquet(s"$root/accepted")
      .select("doc_id").as[Long].collect().toSeq == Seq(21L))
    // registry advanced past the seed version
    assert(graft.io.Manifest.read(spark, registryTable)
      .select("doc_id").distinct().as[Long].collect().toSet ==
      Set(10L, 12L, 21L))
    // wave 2: a near-copy of WAVE-1-ACCEPTED doc 21 must drop (the
    // registry advance is what catches it); novel B is accepted
    mem.addData(
      (31L, novelA + " today", "en"),
      (33L, novelB, "en"))
    drain()
    assert(spark.read.parquet(s"$root/accepted")
      .select("doc_id").as[Long].collect().toSet == Set(21L, 33L),
      "wave-2 near-copy of the accepted doc must drop via the updated registry")
    assert(graft.io.Manifest.read(spark, registryTable)
      .select("doc_id").distinct().as[Long].collect().toSet ==
      Set(10L, 12L, 21L, 33L))
  }

  test("streaming ingest curation with the served domain gate: a " +
    "blocklisted-domain doc drops at stage 0; a decision-table refresh " +
    "between waves serves at the next micro-batch") {
    import graft.ops.text.{Corpus, Dedup, Domains, TextStats}
    val root = java.nio.file.Files
      .createTempDirectory("graft_doming").toString
    // the streamed corpus stays url-free (the accepted parquet carries
    // no url, and the per-batch corpus read re-selects seed columns);
    // the URL-bearing twin exists only to build the decision table
    val corpusUrls = Seq(
      (10L, "the cat and the dog ran in the park with the red ball",
        "en", "https://mirror1.com/a"),
      (12L, "the fox and the hen sat in the barn with the old hat",
        "en", "https://farm2.net/b"))
      .toDF("doc_id", "text", "lang", "url")
    val corpusSeed = corpusUrls.drop("url")
    corpusSeed.write.parquet(s"$root/corpus")
    val registryTable = s"$root/sigs"
    assert(Dedup.signatureRefresh(corpusSeed, registryTable,
      k = 32, bands = 8) == 1)
    val thresholds = Corpus.quantileThresholds(
      TextStats.qualityScore(corpusSeed, Seq("lang")),
      "quality_score", "lang", p = 0.5)
    val benchmark = Seq((100L,
      "the physics question is about the speed of light and the mass of the sun",
      "en")).toDF("doc_id", "text", "lang")
    val decisionsTable = s"$root/domains"
    Domains.domainRefresh(corpusUrls, decisionsTable,
      blocklist = Seq("mirror1.com"))
    val novelA = "the weather in the mountains is mild and the rain " +
      "falls in the valley near the lake"
    val novelB = "the wind and the rain came in the night and the door " +
      "of the house shut"
    val mem = MemoryStream[(Long, String, String, String)](spark)
    def drain(): Unit =
      IncrementalStream.runCurationIngest(spark,
        mem.toDF().toDF("doc_id", "text", "lang", "url"),
        s"$root/corpus", registryTable, thresholds, benchmark,
        s"$root/accepted", s"$root/ckpt",
        domainDecisionsTable = Some(decisionsTable))
    // wave 1: unknown-domain novel doc accepted; the blocklisted-domain
    // doc drops at the gate even though its text is novel
    mem.addData(
      (21L, novelA, "en", "https://fresh9.org/x"),
      (23L, novelB, "en", "https://www.mirror1.com/y"))
    drain()
    assert(spark.read.parquet(s"$root/accepted")
      .select("doc_id").as[Long].collect().toSeq == Seq(21L),
      "the blocklisted-domain doc must not be admitted")
    // refresh the decisions between waves: fresh9.org is now
    // blocklisted too — the NEXT batch must see the new snapshot
    Domains.domainRefresh(corpusUrls, decisionsTable,
      blocklist = Seq("mirror1.com", "fresh9.org"))
    val novelC = "the ship sailed over the sea and the crew watched " +
      "the stars from the deck at night"
    mem.addData(
      (31L, novelC, "en", "https://fresh9.org/z"))
    drain()
    assert(spark.read.parquet(s"$root/accepted")
      .select("doc_id").as[Long].collect().toSet == Set(21L),
      "the refreshed decision table must gate the next micro-batch")
  }

  test("streaming fuzzy ingest: the segment registry advances between " +
    "batches, so a wave-2 near-copy of a wave-1 ACCEPT drops") {
    import graft.ops.text.Fuzzy
    val root = Files.createTempDirectory("graft_fzing").toString
    val seed = Seq((10L, "spark streaming engine"),
      (12L, "relational algebra kernel")).toDF("id", "s")
    seed.write.parquet(s"$root/corpus")
    val registryTable = s"$root/segs"
    assert(Fuzzy.segIndexRefresh(seed, registryTable, "id", "s",
      maxDist = 2) == 1)
    val mem = MemoryStream[(Long, String)](spark)
    def drain(): Unit = {
      IncrementalStream.runFuzzyIngest(
        mem.toDF().toDF("id", "s"), s"$root/corpus", registryTable,
        s"$root/accepted", s"$root/ckpt", "id", "s", maxDist = 2)
      ()
    }
    // wave 1: novel string accepted; a dist-1 edit of seed 10 drops
    mem.addData((21L, "quantum flux capacitor"),
      (23L, "spark streaming enginex"))
    drain()
    assert(spark.read.parquet(s"$root/accepted")
      .select("id").as[Long].collect().toSeq == Seq(21L))
    assert(graft.io.Manifest.read(spark, registryTable)
      .select("doc_id").distinct().as[Long].collect().toSet ==
      Set(10L, 12L, 21L))
    // wave 2: a dist-1 edit of WAVE-1-ACCEPTED 21 must drop (the
    // registry advance catches it); a novel string is accepted; an
    // EXACT resend of the accepted string is a dist-0 match and drops;
    // a SAME-BATCH duplicate of the novel string admits only the
    // lowest id (the within-batch exact dedup)
    mem.addData((31L, "quantum flux capacitorz"),
      (33L, "columnar shuffle service"),
      (35L, "quantum flux capacitor"),
      (37L, "columnar shuffle service"))
    drain()
    assert(spark.read.parquet(s"$root/accepted")
      .select("id").as[Long].collect().toSet == Set(21L, 33L),
      "wave-2 near-copy and exact resend must drop via the updated registry")
    assert(graft.io.Manifest.read(spark, registryTable)
      .select("doc_id").distinct().as[Long].collect().toSet ==
      Set(10L, 12L, 21L, 33L))
    // the registry's current tag names the last committing batch,
    // scoped by the stream's checkpoint-derived identity
    assert(graft.io.Manifest.currentTag(spark, registryTable)
      .exists(t => t.startsWith("fuzzy-ingest-") && t.contains("-batch-")))
  }

  test("streaming simhash ingest: the fingerprint registry advances " +
    "between batches; near-copy and exact resend drop; replay never " +
    "double-admits") {
    import graft.ops.text.Dedup
    val root = Files.createTempDirectory("graft_shing").toString
    // long docs: one changed token out of 24 leaves ~22/23 bigram
    // shingles shared -> small Hamming; unrelated docs share none
    def doc(w: String): String =
      "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda " +
        s"mu nu xi omicron pi rho sigma tau upsilon phi chi psi $w"
    val novel1 = "storage engines compact levels and bloom filters guard " +
      "the manifest while write amplification stays bounded by tiering " +
      "and the compaction scheduler drains each level before promotion " +
      "so read amplification holds steady under sustained ingest"
    val novel2 = "the crawler frontier orders hosts by politeness budget " +
      "and revisits stale pages on an adaptive schedule each day"
    val seed = Seq((10L, doc("omega")),
      (12L, "an entirely different second corpus document about nothing " +
        "in particular that shares no shingles with the first one at all"))
      .toDF("doc_id", "text")
    val registryTable = s"$root/fps"
    assert(Dedup.simhashIndexRefresh(seed, registryTable) == 1)
    // fixture sanity: the near-copy really is a simhash near-dup of seed
    // 10 under the serve defaults (failure here names the fixture, not
    // the stream)
    assert(Dedup.simhashAgainstIndex(
      graft.io.Manifest.read(spark, registryTable),
      Seq((23L, doc("omegaz"))).toDF("doc_id", "text"))
      .filter($"doc_corp" === 10L).count() == 1,
      "fixture must be a simhash near-dup of seed 10")
    val mem = MemoryStream[(Long, String)](spark)
    def drain(): Unit = {
      IncrementalStream.runSimhashIngest(
        mem.toDF().toDF("doc_id", "text"), registryTable,
        s"$root/accepted", s"$root/ckpt")
      ()
    }
    // wave 1: novel doc accepted; the near-copy of seed 10 drops
    mem.addData((21L, novel1), (23L, doc("omegaz")))
    drain()
    assert(spark.read.parquet(s"$root/accepted")
      .select("doc_id").as[Long].collect().toSeq == Seq(21L))
    assert(graft.io.Manifest.read(spark, registryTable)
      .select("doc_id").distinct().as[Long].collect().toSet ==
      Set(10L, 12L, 21L))
    // wave 2: a near-copy of WAVE-1-ACCEPTED 21 drops (registry
    // advance); a novel doc is accepted; an EXACT resend of novel1 is a
    // Hamming-0 match and drops; a same-batch duplicate of novel2
    // admits only the lowest id (within-batch exact dedup)
    val nearCopy21 = novel1.replace("bounded", "boundedz")
    assert(Dedup.simhashAgainstIndex(
      graft.io.Manifest.read(spark, registryTable),
      Seq((31L, nearCopy21)).toDF("doc_id", "text"))
      .filter($"doc_corp" === 21L).count() == 1,
      "fixture must be a simhash near-dup of wave-1-accepted 21")
    mem.addData((31L, nearCopy21),
      (33L, novel2), (35L, novel1), (37L, novel2))
    drain()
    assert(spark.read.parquet(s"$root/accepted")
      .select("doc_id").as[Long].collect().toSet == Set(21L, 33L),
      "wave-2 near-copy and exact resend must drop via the updated registry")
    assert(graft.io.Manifest.currentTag(spark, registryTable)
      .exists(t => t.startsWith("simhash-ingest-") && t.contains("-batch-")))
    // replay leg: a fully-committed batch replayed from a FRESH
    // checkpoint (same explicit tag scope) skips outright
    val root2 = Files.createTempDirectory("graft_shing_rp").toString
    val table2 = s"$root2/fps"
    assert(Dedup.simhashIndexRefresh(seed, table2) == 1)
    def drainWith(ckpt: String): Unit = {
      val m = MemoryStream[(Long, String)](spark)
      m.addData((21L, novel1))
      IncrementalStream.runSimhashIngest(
        m.toDF().toDF("doc_id", "text"), table2,
        s"$root2/accepted", ckpt, tagScope = Some("t"))
      ()
    }
    drainWith(s"$root2/ckpt1")
    assert(graft.io.Manifest.currentVersion(spark, table2).contains(2))
    drainWith(s"$root2/ckpt2")
    assert(spark.read.parquet(s"$root2/accepted")
      .select("doc_id").as[Long].collect().toSeq == Seq(21L),
      "the replayed batch must not append a second copy of doc 21")
    assert(graft.io.Manifest.currentVersion(spark, table2).contains(2),
      "the replayed batch must not commit another registry version")
  }

  test("streaming containment ingest: the shingle index advances between " +
    "batches; an excerpt and an exact resend drop; replay never " +
    "double-admits") {
    import graft.ops.text.Dedup
    val root = Files.createTempDirectory("graft_cting").toString
    val seedText = "the quick brown fox jumps over the lazy dog while the " +
      "hunter watches from the hill beyond the river bend at dusk"
    val novel1 = "partition pruning keeps the scan on the touched dates " +
      "only so the fact table read stays bounded by the batch span"
    val novel2 = "watermarks bound the state store while late events " +
      "revise the closed windows through the documented grace interval"
    val seed = Seq((10L, seedText),
      (12L, "another unrelated corpus document about graph coloring and " +
        "label propagation over the co purchase network fixture"))
      .toDF("doc_id", "text")
    seed.write.parquet(s"$root/corpus")
    val registryTable = s"$root/cidx"
    assert(Dedup.containmentIndexRefresh(seed, registryTable) == 1)
    // a 12-token contiguous EXCERPT of seed 10: all its 3-shingles are
    // the seed's, containment 1.0 >= 0.8 -> must drop
    val excerpt = "quick brown fox jumps over the lazy dog while the " +
      "hunter watches"
    val mem = MemoryStream[(Long, String)](spark)
    def drain(): Unit = {
      IncrementalStream.runContainmentIngest(
        mem.toDF().toDF("doc_id", "text"), s"$root/corpus", registryTable,
        s"$root/accepted", s"$root/ckpt")
      ()
    }
    mem.addData((21L, novel1), (23L, excerpt))
    drain()
    assert(spark.read.parquet(s"$root/accepted")
      .select("doc_id").as[Long].collect().toSeq == Seq(21L))
    // wave 2: an excerpt of WAVE-1-ACCEPTED novel1 drops (the registry
    // advance catches it AND its text is probe-able via acceptedPath);
    // a novel doc is accepted; an exact resend of novel1 drops
    // (containment 1.0); a same-batch duplicate admits the lowest id
    val excerpt21 = "partition pruning keeps the scan on the touched " +
      "dates only so the fact"
    mem.addData((31L, excerpt21), (33L, novel2), (35L, novel1),
      (37L, novel2))
    drain()
    assert(spark.read.parquet(s"$root/accepted")
      .select("doc_id").as[Long].collect().toSet == Set(21L, 33L),
      "wave-2 excerpt and exact resend must drop via the updated registry")
    assert(graft.io.Manifest.currentTag(spark, registryTable)
      .exists(t => t.startsWith("containment-ingest-") && t.contains("-batch-")))
    // replay leg (the curation-ingest contract verbatim)
    val root2 = Files.createTempDirectory("graft_cting_rp").toString
    seed.write.parquet(s"$root2/corpus")
    val table2 = s"$root2/cidx"
    assert(Dedup.containmentIndexRefresh(seed, table2) == 1)
    def drainWith(ckpt: String): Unit = {
      val m = MemoryStream[(Long, String)](spark)
      m.addData((21L, novel1))
      IncrementalStream.runContainmentIngest(
        m.toDF().toDF("doc_id", "text"), s"$root2/corpus", table2,
        s"$root2/accepted", ckpt, tagScope = Some("t"))
      ()
    }
    drainWith(s"$root2/ckpt1")
    assert(graft.io.Manifest.currentVersion(spark, table2).contains(2))
    drainWith(s"$root2/ckpt2")
    assert(spark.read.parquet(s"$root2/accepted")
      .select("doc_id").as[Long].collect().toSeq == Seq(21L),
      "the replayed batch must not append a second copy of doc 21")
    assert(graft.io.Manifest.currentVersion(spark, table2).contains(2),
      "the replayed batch must not commit another registry version")
  }

  test("streaming jaccard ingest: the shared shingle index advances " +
    "between batches; near-copy and exact resend drop; replay never " +
    "double-admits") {
    import graft.ops.text.Dedup
    val root = Files.createTempDirectory("graft_jcing").toString
    // long docs: one changed token leaves jaccard >> 0.6 vs the source;
    // unrelated docs share no 3-shingles
    def doc(w: String): String =
      "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda " +
        s"mu nu xi omicron pi rho sigma tau upsilon phi chi psi $w"
    val novel1 = "storage engines compact levels and bloom filters guard " +
      "the manifest while write amplification stays bounded by tiering " +
      "and the compaction scheduler drains each level before promotion"
    val novel2 = "the crawler frontier orders hosts by politeness budget " +
      "and revisits stale pages on an adaptive schedule each day"
    val seed = Seq((10L, doc("omega")),
      (12L, "another unrelated corpus document about graph coloring and " +
        "label propagation over the co purchase network fixture"))
      .toDF("doc_id", "text")
    seed.write.parquet(s"$root/corpus")
    val registryTable = s"$root/jidx"
    assert(Dedup.containmentIndexRefresh(seed, registryTable) == 1)
    // fixture sanity: the near-copy really is a jaccard>=0.6 match of
    // seed 10 through the index probe
    assert(Dedup.jaccardAgainstIndex(
      graft.io.Manifest.read(spark, registryTable), seed,
      Seq((23L, doc("omegaz"))).toDF("doc_id", "text"))
      .filter($"doc_corp" === 10L).count() == 1,
      "fixture must be a jaccard near-dup of seed 10")
    val mem = MemoryStream[(Long, String)](spark)
    def drain(): Unit = {
      IncrementalStream.runJaccardIngest(
        mem.toDF().toDF("doc_id", "text"), s"$root/corpus", registryTable,
        s"$root/accepted", s"$root/ckpt")
      ()
    }
    // wave 1: novel doc accepted; the near-copy of seed 10 drops
    mem.addData((21L, novel1), (23L, doc("omegaz")))
    drain()
    assert(spark.read.parquet(s"$root/accepted")
      .select("doc_id").as[Long].collect().toSeq == Seq(21L))
    // wave 2: a near-copy of WAVE-1-ACCEPTED 21 drops (registry
    // advance); a novel doc is accepted; an exact resend of novel1 is
    // a jaccard-1.0 match and drops; a same-batch duplicate of novel2
    // admits only the lowest id (within-batch exact dedup)
    val nearCopy21 = novel1.replace("bounded", "boundedz")
    mem.addData((31L, nearCopy21), (33L, novel2), (35L, novel1),
      (37L, novel2))
    drain()
    assert(spark.read.parquet(s"$root/accepted")
      .select("doc_id").as[Long].collect().toSet == Set(21L, 33L),
      "wave-2 near-copy and exact resend must drop via the updated registry")
    assert(graft.io.Manifest.currentTag(spark, registryTable)
      .exists(t => t.startsWith("jaccard-ingest-") && t.contains("-batch-")))
    // replay leg: a fully-committed batch replayed from a FRESH
    // checkpoint (same explicit tag scope) skips outright
    val root2 = Files.createTempDirectory("graft_jcing_rp").toString
    seed.write.parquet(s"$root2/corpus")
    val table2 = s"$root2/jidx"
    assert(Dedup.containmentIndexRefresh(seed, table2) == 1)
    def drainWith(ckpt: String): Unit = {
      val m = MemoryStream[(Long, String)](spark)
      m.addData((21L, novel1))
      IncrementalStream.runJaccardIngest(
        m.toDF().toDF("doc_id", "text"), s"$root2/corpus", table2,
        s"$root2/accepted", ckpt, tagScope = Some("t"))
      ()
    }
    drainWith(s"$root2/ckpt1")
    assert(graft.io.Manifest.currentVersion(spark, table2).contains(2))
    drainWith(s"$root2/ckpt2")
    assert(spark.read.parquet(s"$root2/accepted")
      .select("doc_id").as[Long].collect().toSeq == Seq(21L),
      "the replayed batch must not append a second copy of doc 21")
    assert(graft.io.Manifest.currentVersion(spark, table2).contains(2),
      "the replayed batch must not commit another registry version")
  }

  test("streaming image ingest: the phash registry advances between " +
    "batches; recompressed near-copy and exact resend drop; replay " +
    "never double-admits") {
    import graft.ops.Multimodal
    val root = Files.createTempDirectory("graft_iming").toString
    def encodeImg(pix: (Int, Int) => Int, fmt: String): Array[Byte] = {
      val bi = new java.awt.image.BufferedImage(
        32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 32; x <- 0 until 32) bi.setRGB(x, y, pix(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(bi, fmt, bos), s"no JDK writer for $fmt")
      bos.toByteArray
    }
    def grey(v: Int) = (v << 16) | (v << 8) | v
    // distinct dHash classes: ascending/descending horizontal gradients
    // and their half-height mixes sit ≥ tens of bits apart; the one-hot
    // -pixel variant of a gradient sits within the tolerance
    val asc = (x: Int, _: Int) => grey(x * 8)
    val desc = (x: Int, _: Int) => grey(255 - x * 8)
    val novelApix = (x: Int, y: Int) =>
      if (y < 16) grey(x * 8) else grey(255 - x * 8)
    val novelBpix = (x: Int, y: Int) =>
      if (y < 16) grey(255 - x * 8) else grey(x * 8)
    val near10pix = (x: Int, y: Int) =>
      if (x == 5 && y == 5) 0xffffff else asc(x, y)
    val seed10 = encodeImg(asc, "png")
    val seed12 = encodeImg(desc, "png")
    val novelA = encodeImg(novelApix, "png")
    val novelArec = encodeImg(novelApix, "bmp") // recompressed container
    val novelB = encodeImg(novelBpix, "png")
    val near10 = encodeImg(near10pix, "png")
    def media(id: Long, p: Array[Byte]) =
      Multimodal.MediaRow(id, "image", p, s"synthetic://$id")
    // fixture sanity: the tolerance gaps the waves rely on really hold
    val hs = Multimodal.perceptualHashes(spark.createDataset(Seq(
      media(1L, seed10), media(2L, seed12), media(3L, novelA),
      media(4L, novelB), media(5L, near10), media(6L, novelArec))))
      .as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(hs(a) ^ hs(b))
    assert(ham(1L, 5L) <= 3, s"near-copy must be in tolerance: ${ham(1L, 5L)}")
    assert(hs(3L) == hs(6L), "recompression must not change the dHash")
    assert(Seq(ham(1L, 3L), ham(1L, 4L), ham(2L, 3L), ham(2L, 4L),
      ham(3L, 4L), ham(2L, 5L)).forall(_ > 3),
      s"novel fixtures must be far from seeds and each other: $hs")
    val registry = s"$root/phash"
    assert(Multimodal.phashRefresh(spark.createDataset(Seq(
      media(10L, seed10), media(12L, seed12))), registry) == 1)
    val mem = MemoryStream[(Long, String, Array[Byte], String)](spark)
    def drain(): Unit = {
      IncrementalStream.runImageIngest(
        mem.toDF().toDF("media_id", "kind", "payload", "source_uri"),
        registry, s"$root/accepted", s"$root/ckpt")
      ()
    }
    // wave 1: the novel image is accepted; the near-copy of seed 10
    // (one hot pixel away) drops through the seeded registry
    mem.addData((21L, "image", novelA, "u21"), (23L, "image", near10, "u23"))
    drain()
    assert(spark.read.parquet(s"$root/accepted")
      .select("media_id").as[Long].collect().toSeq == Seq(21L))
    // wave 2: a RECOMPRESSED copy of wave-1-accepted 21 drops (the
    // registry advanced — the seed registry never saw that hash); a
    // novel image is accepted; an exact byte resend of novelA is a
    // hamming-0 match and drops; a same-batch duplicate of novelB
    // admits only the lowest id (within-batch exact payload dedup)
    mem.addData((31L, "image", novelArec, "u31"), (33L, "image", novelB, "u33"),
      (35L, "image", novelA, "u35"), (37L, "image", novelB, "u37"))
    drain()
    assert(spark.read.parquet(s"$root/accepted")
      .select("media_id").as[Long].collect().toSet == Set(21L, 33L),
      "wave-2 recompressed near-copy and exact resend must drop")
    assert(graft.io.Manifest.currentTag(spark, registry)
      .exists(t => t.startsWith("image-ingest-") && t.contains("-batch-")))
    // replay leg: a fully-committed batch replayed from a FRESH
    // checkpoint (same explicit tag scope) skips outright
    val root2 = Files.createTempDirectory("graft_iming_rp").toString
    val table2 = s"$root2/phash"
    assert(Multimodal.phashRefresh(spark.createDataset(Seq(
      media(10L, seed10), media(12L, seed12))), table2) == 1)
    def drainWith(ckpt: String): Unit = {
      val m = MemoryStream[(Long, String, Array[Byte], String)](spark)
      m.addData((21L, "image", novelA, "u21"))
      IncrementalStream.runImageIngest(
        m.toDF().toDF("media_id", "kind", "payload", "source_uri"),
        table2, s"$root2/accepted", ckpt, tagScope = Some("t"))
      ()
    }
    drainWith(s"$root2/ckpt1")
    assert(graft.io.Manifest.currentVersion(spark, table2).contains(2))
    drainWith(s"$root2/ckpt2")
    assert(spark.read.parquet(s"$root2/accepted")
      .select("media_id").as[Long].collect().toSeq == Seq(21L),
      "the replayed batch must not append a second copy of image 21")
    assert(graft.io.Manifest.currentVersion(spark, table2).contains(2),
      "the replayed batch must not commit another registry version")
  }

  test("streaming embed ingest: the band registry advances between " +
    "batches; near-copy and exact resend drop; replay never " +
    "double-admits") {
    import graft.ops.Similarity
    val root = Files.createTempDirectory("graft_ebing").toString
    val (np, nb, dm, sd) = (8, 4, 4, 7L)
    def v(a: Float, b: Float, c: Float, d: Float) = Array(a, b, c, d)
    val v10 = v(1f, 0f, 0f, 0f)
    val novel1 = v(0f, 0f, 1f, 0f)
    val novel2 = v(0f, 0f, 0f, 1f)
    val seed = Seq((10L, v10), (12L, v(0f, 1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    seed.write.parquet(s"$root/corpus")
    val registryTable = s"$root/ebands"
    assert(Similarity.embedSignatureRefresh(seed, registryTable,
      nPlanes = np, bands = nb, dim = dm, seed = sd) == 1)
    // a tiny perturbation of v10: cosine ~0.9999, same hyperplane signs
    val near10 = v(0.999f, 0.001f, 0.001f, 0f)
    assert(Similarity.embeddingNearDupAgainstSigs(
      graft.io.Manifest.read(spark, registryTable), seed,
      Seq((23L, near10)).toDF("vec_id", "embedding"),
      nPlanes = np, bands = nb, dim = dm, seed = sd)
      .filter($"vec_corp" === 10L).count() == 1,
      "fixture must be an embedding near-dup of seed 10")
    val mem = MemoryStream[(Long, Array[Float])](spark)
    def drain(): Unit = {
      IncrementalStream.runEmbedIngest(
        mem.toDF().toDF("vec_id", "embedding"), s"$root/corpus",
        registryTable, s"$root/accepted", s"$root/ckpt",
        nPlanes = np, bands = nb, dim = dm, seed = sd)
      ()
    }
    // wave 1: the orthogonal novel vector is accepted; the near-copy of
    // seed 10 drops
    mem.addData((21L, novel1), (23L, near10))
    drain()
    assert(spark.read.parquet(s"$root/accepted")
      .select("vec_id").as[Long].collect().toSeq == Seq(21L))
    // wave 2: a near-copy of WAVE-1-ACCEPTED 21 drops (registry
    // advance); a novel orthogonal vector is accepted; an EXACT resend
    // of novel1 is a cosine-1.0 match and drops; a same-batch duplicate
    // of novel2's exact array admits only the lowest id (within-batch
    // dedup keys on the embedding array)
    val near21 = v(0.001f, 0f, 0.999f, 0.001f)
    mem.addData((31L, near21), (33L, novel2), (35L, novel1),
      (37L, novel2))
    drain()
    assert(spark.read.parquet(s"$root/accepted")
      .select("vec_id").as[Long].collect().toSet == Set(21L, 33L),
      "wave-2 near-copy and exact resend must drop via the updated registry")
    assert(graft.io.Manifest.currentTag(spark, registryTable)
      .exists(t => t.startsWith("embed-ingest-") && t.contains("-batch-")))
    // replay leg: a fully-committed batch replayed from a FRESH
    // checkpoint (same explicit tag scope) skips outright
    val root2 = Files.createTempDirectory("graft_ebing_rp").toString
    seed.write.parquet(s"$root2/corpus")
    val table2 = s"$root2/ebands"
    assert(Similarity.embedSignatureRefresh(seed, table2,
      nPlanes = np, bands = nb, dim = dm, seed = sd) == 1)
    def drainWith(ckpt: String): Unit = {
      val m = MemoryStream[(Long, Array[Float])](spark)
      m.addData((21L, novel1))
      IncrementalStream.runEmbedIngest(
        m.toDF().toDF("vec_id", "embedding"), s"$root2/corpus", table2,
        s"$root2/accepted", ckpt,
        nPlanes = np, bands = nb, dim = dm, seed = sd,
        tagScope = Some("t"))
      ()
    }
    drainWith(s"$root2/ckpt1")
    assert(graft.io.Manifest.currentVersion(spark, table2).contains(2))
    drainWith(s"$root2/ckpt2")
    assert(spark.read.parquet(s"$root2/accepted")
      .select("vec_id").as[Long].collect().toSeq == Seq(21L),
      "the replayed batch must not append a second copy of vec 21")
    assert(graft.io.Manifest.currentVersion(spark, table2).contains(2),
      "the replayed batch must not commit another registry version")
  }

  test("streaming sequence match: cascaded interval joins equal the batch instance count") {
    val base = DataGen.defaultBaseMs
    def ts(min: Int) = new java.sql.Timestamp(base + min * 60000L)
    // u1: one full a->b->c; u2: two b's -> two occurrences; u3: c too late
    val wave1 = Seq((1L, 1L, ts(0), "a"), (2L, 1L, ts(5), "b"),
      (10L, 2L, ts(0), "a"), (11L, 2L, ts(3), "b"), (12L, 2L, ts(5), "b"),
      (20L, 3L, ts(0), "a"), (21L, 3L, ts(5), "b"))
    // wave 2 completes u1 and u2 across the batch boundary; u3 misses band
    val wave2 = Seq((3L, 1L, ts(9), "c"), (13L, 2L, ts(9), "c"),
      (22L, 3L, ts(40), "c"))
    val mem = MemoryStream[(Long, Long, java.sql.Timestamp, String)](spark)
    val out = IncrementalStream.sequenceMatchesStream(
      mem.toDF().toDF("event_id", "user_id", "ts", "event_type"),
      Seq("a", "b", "c"), withinMs = 10 * 60000L, watermark = "2 hours")
    val q = out.writeStream.format("memory").queryName("seqm")
      .outputMode("append").start()
    try {
      mem.addData(wave1: _*)
      q.processAllAvailable()
      mem.addData(wave2: _*)
      q.processAllAvailable()
      val got = spark.table("seqm")
        .groupBy("user_id").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expected = graft.ops.Events.sequenceMatches(
        (wave1 ++ wave2).toDF("event_id", "user_id", "ts", "event_type"),
        Seq("a", "b", "c"), withinMs = 10 * 60000L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"stream $got vs batch $expected")
      assert(expected == Map(1L -> 1L, 2L -> 2L))
    } finally q.stop()
  }

  test("session_window stream matches batch sessionization on closed sessions") {
    val mem = MemoryStream[(Long, java.sql.Timestamp, Double)](spark)
    val base = DataGen.defaultBaseMs
    def ts(min: Int) = new java.sql.Timestamp(base + min * 60000L)
    mem.addData((1L, ts(0), 1.0), (1L, ts(10), 1.0), (1L, ts(60), 1.0), (2L, ts(0), 1.0))
    // events far past the watermark close the earlier sessions
    mem.addData((1L, ts(600), 1.0))
    val sessions = IncrementalStream.sessionStream(
      mem.toDF().toDF("user_id", "ts", "value"), gapMinutes = 30, watermark = "1 hour")
    val q = sessions.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val out = spark.table("sess")
        .select("user_id", "n_events").as[(Long, Long)].collect().toSet
      // closed sessions: user1 {2 events}, {1 event}; user2 {1 event}
      assert(out == Set((1L, 2L), (1L, 1L), (2L, 1L)))
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionizer matches session_window on closed sessions") {
    val mem = MemoryStream[(Long, java.sql.Timestamp, Double)](spark)
    val base = DataGen.defaultBaseMs
    def ts(min: Int) = new java.sql.Timestamp(base + min * 60000L)
    mem.addData((1L, ts(0), 1.0), (1L, ts(10), 2.0), (1L, ts(60), 4.0), (2L, ts(0), 8.0))
    mem.addData((1L, ts(600), 16.0))
    val sessions = IncrementalStream.sessionStreamCustomState(
      mem.toDF().toDF("user_id", "ts", "value"), gapMinutes = 30, watermark = "1 hour")
    val q = sessions.writeStream.format("memory").queryName("sess_custom")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val out = spark.table("sess_custom")
        .select("user_id", "n_events", "total_value")
        .as[(Long, Long, Double)].collect().toSet
      // closed: user1 {ts0,ts10}=3.0, {ts60}=4.0; user2 {ts0}=8.0
      assert(out == Set((1L, 2L, 3.0), (1L, 1L, 4.0), (2L, 1L, 8.0)))
    } finally q.stop()
  }

  test("stream-stream attribution join matches purchases to in-window views") {
    val views = MemoryStream[(Long, java.sql.Timestamp, Long)](spark)
    val purchases = MemoryStream[(Long, java.sql.Timestamp, Long, Double)](spark)
    val base = DataGen.defaultBaseMs
    def ts(min: Int) = new java.sql.Timestamp(base + min * 60000L)
    val joined = IncrementalStream.attributionJoin(
      views.toDF().toDF("user_id", "ts", "event_id"),
      purchases.toDF().toDF("user_id", "ts", "event_id", "value"),
      withinMinutes = 30)
    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      views.addData((1L, ts(0), 100L), (1L, ts(50), 101L), (2L, ts(0), 102L))
      purchases.addData(
        (1L, ts(20), 200L, 9.99),   // within 30m of view 100
        (1L, ts(60), 201L, 5.00),   // within 30m of view 101 only
        (2L, ts(45), 202L, 1.00),   // 45m after view 102 -> no match
        (3L, ts(10), 203L, 2.00))   // user never viewed -> no match
      q.processAllAvailable()
      val got = spark.table("attrib")
        .select("view_id", "purchase_id")
        .as[(Long, Long)].collect().toSet
      assert(got == Set((100L, 200L), (101L, 201L)), s"got $got")
    } finally q.stop()
  }

  test("custom-state sessionizer: cross-batch out-of-order events widen, never regress") {
    val mem = MemoryStream[(Long, java.sql.Timestamp, Double)](spark)
    val base = DataGen.defaultBaseMs
    def ts(min: Int) = new java.sql.Timestamp(base + min * 60000L)
    def ms(min: Int) = base + min * 60000L
    // batch 1 opens a session [10, 20]
    mem.addData((1L, ts(10), 1.0), (1L, ts(20), 1.0))
    val sessions = IncrementalStream.sessionStreamCustomState(
      mem.toDF().toDF("user_id", "ts", "value"), gapMinutes = 30, watermark = "1 hour")
    val q = sessions.writeStream.format("memory").queryName("sess_ooo")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // batch 2 arrives out of order but above the watermark: ts(5) is
      // earlier than the open session's start, ts(15) is inside its span.
      // The min/max fold must widen the session to [5, 20], not regress
      // lastMs to 15 (which would corrupt the next gap test and could
      // emit end < start).
      mem.addData((1L, ts(15), 1.0), (1L, ts(5), 1.0))
      q.processAllAvailable()
      // batch 3 closes it (600 is > gap past 20, and advances the watermark)
      mem.addData((1L, ts(600), 1.0))
      q.processAllAvailable()
      val out = spark.table("sess_ooo")
        .select("session_start_ms", "session_end_ms", "n_events")
        .as[(Long, Long, Long)].collect().toSet
      assert(out == Set((ms(5), ms(20), 4L)),
        s"expected one widened session [5,20] with 4 events, got $out")
    } finally q.stop()
  }

  test("streaming exact dedup: re-arrivals within the watermark are dropped") {
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)](spark)
    val base = DataGen.defaultBaseMs
    def ts(min: Int) = new java.sql.Timestamp(base + min * 60000L)
    mem.addData(
      (1L, "same content", ts(0)),
      (2L, "Same Content", ts(1)), // case-normalized duplicate of 1
      (3L, "different content", ts(2)))
    val deduped = IncrementalStream.exactDedupStream(
      mem.toDF().toDF("doc_id", "text", "event_time"))
    val q = deduped.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // a later batch re-sends doc 1's content — still within watermark
      mem.addData((4L, "same content", ts(3)))
      q.processAllAvailable()
      val kept = spark.table("dedup_stream").select("doc_id")
        .as[Long].collect().toSet
      assert(kept == Set(1L, 3L), s"expected first arrivals only, got $kept")
    } finally q.stop()
  }

  test("streaming minhash near-dup: online pairs within the watermark, eviction past it") {
    import IncrementalStream.NearDupPair
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)](spark)
    val base = DataGen.defaultBaseMs
    def ts(min: Int) = new java.sql.Timestamp(base + min * 60000L)
    val doc = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = ((1 to 39).map(i => s"tok$i") :+ "changed").mkString(" ")
    val other = (1 to 40).map(i => s"zzz$i").mkString(" ")
    val later = (1 to 40).map(i => s"qqq$i").mkString(" ")
    val pairs = IncrementalStream.nearDupPairsStream(
      mem.toDF().toDF("doc_id", "text", "event_time"), watermark = "10 minutes")
    val q = pairs.writeStream.format("memory").queryName("neardup_stream")
      .outputMode("append").start()
    try {
      mem.addData((1L, doc, ts(0)), (2L, nearDup, ts(1)), (3L, other, ts(2)))
      q.processAllAvailable()
      mem.addData((4L, doc, ts(5))) // exact copy of 1, within the horizon
      q.processAllAvailable()
      mem.addData((4L, doc, ts(6))) // re-delivery: must NOT re-emit pairs
      q.processAllAvailable()
      mem.addData((5L, later, ts(60))) // advances the watermark past 1/2/4
      q.processAllAvailable()
      mem.addData((6L, doc, ts(61))) // copy of 1 AFTER eviction: no pair
      q.processAllAvailable()

      val got = spark.table("neardup_stream").as[NearDupPair].collect().toSeq
      assert(got.map(p => (p.doc_a, p.doc_b)).toSet ==
        Set((1L, 2L), (1L, 4L), (2L, 4L)),
        s"unexpected pair set: ${got.map(p => (p.doc_a, p.doc_b)).toSet}")
      assert(got.size == 3, "multi-band collisions must dedup to one row per pair")
      // exact copies agree on every signature; the near dup clears threshold
      got.find(p => (p.doc_a, p.doc_b) == ((1L, 4L))).foreach(p =>
        assert(p.sig_agreement == 1.0))
      assert(got.forall(_.sig_agreement >= 0.5))
    } finally q.stop()
  }

  test("streaming embedding near-dup: exact-cosine pairs within the watermark, eviction past it") {
    import IncrementalStream.EmbedPair
    val mem = MemoryStream[(Long, Seq[Float], java.sql.Timestamp)](spark)
    val base = DataGen.defaultBaseMs
    def ts(min: Int) = new java.sql.Timestamp(base + min * 60000L)
    val v = Seq(1f, 0f, 0f, 0f)
    val near = Seq(0.99f, 0.01f, 0f, 0f) // cos ≈ 0.99995
    val ortho = Seq(0f, 1f, 0f, 0f)
    val later = Seq(0f, 0f, 1f, 0f)
    val pairs = IncrementalStream.embedNearDupStream(
      mem.toDF().toDF("vec_id", "embedding", "event_time"),
      watermark = "10 minutes", threshold = 0.9, dim = 4)
    val q = pairs.writeStream.format("memory").queryName("embeddup_stream")
      .outputMode("append").start()
    try {
      mem.addData((1L, v, ts(0)), (2L, near, ts(1)), (3L, ortho, ts(2)))
      q.processAllAvailable()
      mem.addData((4L, v, ts(5))) // exact copy of 1, within the horizon
      q.processAllAvailable()
      mem.addData((4L, v, ts(6))) // re-delivery: must NOT re-emit pairs
      q.processAllAvailable()
      mem.addData((5L, later, ts(60))) // advances the watermark past 1/2/4
      q.processAllAvailable()
      mem.addData((6L, v, ts(61))) // copy of 1 AFTER eviction: no pair
      q.processAllAvailable()

      val got = spark.table("embeddup_stream").as[EmbedPair].collect().toSeq
      assert(got.map(p => (p.vec_a, p.vec_b)).toSet ==
        Set((1L, 2L), (1L, 4L), (2L, 4L)),
        s"unexpected pair set: ${got.map(p => (p.vec_a, p.vec_b)).toSet}")
      assert(got.size == 3, "multi-band collisions must dedup to one row per pair")
      // the exact copy verifies at cosine exactly 1; all pairs clear τ
      got.find(p => (p.vec_a, p.vec_b) == ((1L, 4L))).foreach(p =>
        assert(p.sim == 1.0))
      assert(got.forall(_.sim >= 0.9))
    } finally q.stop()
  }

  test("streaming minhash near-dup: state rows are bounded by the watermark " +
    "horizon under a two-horizon load (measured, not argued)") {
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)](spark)
    val base = DataGen.defaultBaseMs
    def ts(min: Int) = new java.sql.Timestamp(base + min * 60000L)
    // all-distinct vocabularies: every doc enrolls in its own buckets, so
    // state rows ≈ bands × live docs — the worst case for the bound
    def doc(i: Int) = (1 to 40).map(j => s"w${i}_$j").mkString(" ")
    val bands = 8
    val n = 30
    val pairs = IncrementalStream.nearDupPairsStream(
      mem.toDF().toDF("doc_id", "text", "event_time"), watermark = "10 minutes")
    val q = pairs.writeStream.format("memory").queryName("neardup_state")
      .outputMode("append").start()
    try {
      def stateRows: Long =
        q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      mem.addData((1 to n).map(i => (i.toLong, doc(i), ts(i % 10))): _*)
      q.processAllAvailable()
      val wave1 = stateRows
      assert(wave1 > 0, "state operator must report enrolled rows")
      assert(wave1 <= bands.toLong * n,
        s"one-horizon ceiling: $wave1 state rows > bands*docs = ${bands * n}")
      // two horizons later: a same-sized second wave. The watermark
      // evicts wave 1, so state must stay ~one horizon, never 2×.
      mem.addData((1 to n).map(i =>
        ((100 + i).toLong, doc(100 + i), ts(40 + i % 10))): _*)
      q.processAllAvailable()
      // one more tick fires the store's timeout purge for wave 1
      mem.addData((200L, doc(200), ts(55)))
      q.processAllAvailable()
      val wave2 = stateRows
      assert(wave2 <= bands.toLong * (n + 1),
        s"post-eviction ceiling: $wave2 state rows > ${bands * (n + 1)}")
      assert(wave2 <= wave1 + bands,
        s"state accumulated across horizons: wave1=$wave1 wave2=$wave2")
      assert(q.lastProgress.stateOperators.map(_.memoryUsedBytes).sum > 0,
        "state memory must be reported for capacity planning")
    } finally q.stop()
  }

  test("streaming embedding near-dup: state rows are bounded by the " +
    "watermark horizon under a two-horizon load (measured, not argued)") {
    val mem = MemoryStream[(Long, Seq[Float], java.sql.Timestamp)](spark)
    val base = DataGen.defaultBaseMs
    def ts(min: Int) = new java.sql.Timestamp(base + min * 60000L)
    // seeded ±1 vectors in dim 16: pairwise cosine concentrates near 0,
    // far from τ, and signatures spread across buckets
    def vec(i: Int): Seq[Float] = {
      val r = new scala.util.Random(i)
      Seq.fill(16)(if (r.nextBoolean()) 1f else -1f)
    }
    val bands = 4
    val n = 30
    val pairs = IncrementalStream.embedNearDupStream(
      mem.toDF().toDF("vec_id", "embedding", "event_time"),
      watermark = "10 minutes", threshold = 0.9, dim = 16)
    val q = pairs.writeStream.format("memory").queryName("embeddup_state")
      .outputMode("append").start()
    try {
      def stateRows: Long =
        q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      mem.addData((1 to n).map(i => (i.toLong, vec(i), ts(i % 10))): _*)
      q.processAllAvailable()
      val wave1 = stateRows
      assert(wave1 > 0 && wave1 <= bands.toLong * n)
      mem.addData((1 to n).map(i =>
        ((100 + i).toLong, vec(100 + i), ts(40 + i % 10))): _*)
      q.processAllAvailable()
      mem.addData((200L, vec(200), ts(55)))
      q.processAllAvailable()
      val wave2 = stateRows
      assert(wave2 <= bands.toLong * (n + 1),
        s"post-eviction ceiling: $wave2 state rows > ${bands * (n + 1)}")
      assert(wave2 <= wave1 + bands,
        s"state accumulated across horizons: wave1=$wave1 wave2=$wave2")
      assert(q.lastProgress.stateOperators.map(_.memoryUsedBytes).sum > 0)
    } finally q.stop()
  }

  test("streaming embedding near-dup: maxBucketSize caps enrolment, not comparison") {
    // cap=1: the first arrival enrolls; later identical vectors COMPARE
    // against the enrolled survivor (pairing with it) but do not enroll,
    // so they never pair with EACH OTHER — the documented cap trade.
    import IncrementalStream.EmbedPair
    val mem = MemoryStream[(Long, Seq[Float], java.sql.Timestamp)](spark)
    val base = DataGen.defaultBaseMs
    def ts(min: Int) = new java.sql.Timestamp(base + min * 60000L)
    val v = Seq(1f, 0f, 0f, 0f)
    val stream = IncrementalStream.embedNearDupStream(
      mem.toDF().toDF("vec_id", "embedding", "event_time"),
      watermark = "10 minutes", threshold = 0.9, dim = 4, maxBucketSize = 1)
    val q = stream.writeStream.format("memory").queryName("embeddup_cap")
      .outputMode("append").start()
    try {
      mem.addData((1L, v, ts(0)))
      q.processAllAvailable()
      mem.addData((2L, v, ts(1)))
      q.processAllAvailable()
      mem.addData((3L, v, ts(2)))
      q.processAllAvailable()
      val got = spark.table("embeddup_cap").as[EmbedPair].collect()
        .map(p => (p.vec_a, p.vec_b)).toSet
      assert(got == Set((1L, 2L), (1L, 3L)),
        s"cap=1 must pair later arrivals with the enrolled survivor only: $got")
    } finally q.stop()
  }

  test("embed stream cap loss mode (documented): a pair whose MIN matching " +
    "band was capped is suppressed in every band") {
    import IncrementalStream.EmbedPair
    import graft.ops.Similarity
    val base = DataGen.defaultBaseMs
    def ts(min: Int) = new java.sql.Timestamp(base + min * 60000L)
    def rvec(seed: Int): Seq[Float] = {
      val r = new scala.util.Random(seed)
      Seq.fill(16)(if (r.nextBoolean()) 1f else -1f)
    }
    // find a crowd vector u sharing a's BAND-0 value but not its band-1
    // value and dissimilar to a (cos < τ): u then caps a's minimum
    // matching bucket while a still enrolls in band 1
    val aVec = rvec(1)
    def bits(v: Seq[Float]): Long = {
      val df = Seq((0L, v)).toDF("vec_id", "embedding")
      df.select(Similarity.hyperplaneBucket(col("embedding"), 16, 16, 7L))
        .head().getLong(0)
    }
    def cos(x: Seq[Float], y: Seq[Float]): Double = {
      def d(p: Seq[Float], q: Seq[Float]) =
        p.zip(q).map { case (i, j) => i.toDouble * j.toDouble }.sum
      d(x, y) / math.sqrt(d(x, x) * d(y, y))
    }
    val aBits = bits(aVec)
    val uVec = (100 to 400).map(rvec).find { u =>
      val ub = bits(u)
      (ub & 0xFL) == (aBits & 0xFL) &&
        ((ub >> 4) & 0xFL) != ((aBits >> 4) & 0xFL) &&
        math.abs(cos(u, aVec)) < 0.5
    }.getOrElse(fail("no crowd vector found in 300 seeded candidates"))

    def run(withCrowd: Boolean): Set[(Long, Long)] = {
      val mem = MemoryStream[(Long, Seq[Float], java.sql.Timestamp)](spark)
      val name = s"embed_caploss_$withCrowd"
      val q = IncrementalStream.embedNearDupStream(
          mem.toDF().toDF("vec_id", "embedding", "event_time"),
          watermark = "10 minutes", threshold = 0.9, dim = 16,
          maxBucketSize = 1)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        if (withCrowd) { mem.addData((1L, uVec, ts(0))); q.processAllAvailable() }
        mem.addData((2L, aVec, ts(1)))
        q.processAllAvailable()
        mem.addData((3L, aVec, ts(2))) // same direction as 2: cos = 1
        q.processAllAvailable()
        spark.table(name).as[EmbedPair].collect()
          .map(p => (p.vec_a, p.vec_b)).toSet
      } finally q.stop()
    }
    // control: without the crowd the exactly-once matcher emits the pair
    assert(run(withCrowd = false) == Set((2L, 3L)),
      "sanity: the pair emits when nothing caps its min matching band")
    // with the crowd capping the min matching bucket: suppressed in EVERY
    // band — the documented silent-loss mode of maxBucketSize
    assert(run(withCrowd = true) == Set.empty,
      "capped-min-band pair must be (documentedly) lost under cap pressure")
  }

  test("streaming embedding near-dup ≡ batch embeddingNearDup on one drained batch") {
    // same hyperplanes/bands/seed ⇒ identical candidate sets; both verify
    // exact cosine ⇒ the drained stream must reproduce the batch operator's
    // pair set (and sims) exactly. 60 seeded vectors with planted near-dups.
    import IncrementalStream.EmbedPair
    val rnd = new scala.util.Random(23)
    val dim = 8
    val vecs: Seq[(Long, Seq[Float])] = (0 until 60).map { i =>
      val v =
        if (i >= 3 && i % 7 == 0) // planted near-dup of an earlier vector
          (0 until dim).map(d => (math.sin((i % 3) + d * 0.7) + rnd.nextGaussian() * 0.01).toFloat)
        else (0 until dim).map(_ => rnd.nextGaussian().toFloat)
      (i.toLong, v)
    }
    val batchPairs = graft.ops.Similarity.embeddingNearDup(
      vecs.toDF("vec_id", "embedding"), nPlanes = 16, bands = 4,
      threshold = 0.5, dim = dim, seed = 7L)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, s) => (a, b, s) }.toSet

    val base = DataGen.defaultBaseMs
    val mem = MemoryStream[(Long, Seq[Float], java.sql.Timestamp)](spark)
    val stream = IncrementalStream.embedNearDupStream(
      mem.toDF().toDF("vec_id", "embedding", "event_time"),
      watermark = "1 hour", nPlanes = 16, bands = 4,
      threshold = 0.5, dim = dim, seed = 7L)
    val q = stream.writeStream.format("memory").queryName("embeddup_equiv")
      .outputMode("append").start()
    try {
      mem.addData(vecs.map { case (id, v) =>
        (id, v, new java.sql.Timestamp(base + id * 1000L)) })
      q.processAllAvailable()
      val streamPairs = spark.table("embeddup_equiv").as[EmbedPair].collect()
        .map(p => (p.vec_a, p.vec_b, p.sim)).toSet
      assert(streamPairs == batchPairs,
        s"stream ${streamPairs.size} pairs vs batch ${batchPairs.size}:\n" +
          s"only-stream=${streamPairs -- batchPairs}\nonly-batch=${batchPairs -- streamPairs}")
      assert(batchPairs.nonEmpty, "fixture must plant at least one near-dup pair")
    } finally q.stop()
  }

  test("classifier scoring is a pure map: stream scores == batch scores") {
    import graft.ops.Classifier
    val docs = Seq(
      (1L, "alpha beta gamma", "en"),
      (2L, "delta epsilon zeta", "de"),
      (3L, "alpha gamma delta", "en"))
    val batch = docs.toDF("doc_id", "text", "lang")
    val w = new Array[Double](9)
    Classifier.fit(batch, col("lang") === "en", dim = 8, iters = 5)
      .collect().foreach(r => w(r.getInt(0)) = r.getDouble(1))
    val expected = Classifier.score(batch, col("lang") === "en", w, dim = 8)
      .as[(Long, Double, Double, Int)].collect().toSet
    // the same operator applies UNCHANGED to a stream (no agg, no join —
    // the ingest-time quality filter)
    val mem = MemoryStream[(Long, String, String)](spark)
    val q = Classifier.score(
      mem.toDF().toDF("doc_id", "text", "lang"),
      col("lang") === "en", w, dim = 8)
      .writeStream.format("memory").queryName("cls_scores")
      .outputMode("append").start()
    try {
      mem.addData(docs: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cls_scores")
      .as[(Long, Double, Double, Int)].collect().toSet
    assert(got == expected)
  }

  test("dsir serving is a pure map: stream scores == batch scores") {
    import graft.ops.text.Corpus
    val docs = Seq(
      (1L, "alpha beta alpha beta"),
      (2L, "gamma delta gamma delta"),
      (3L, "alpha beta gamma"),
      (4L, "solo"))
    val raw = docs.toDF("doc_id", "text")
    val target = Seq((10L, "alpha beta alpha beta alpha"))
      .toDF("doc_id", "text")
    // fit once (the dim-row model artifact), serve the SAME call on a
    // stream — literal-fold map, no agg, no join: the ingest-time
    // domain filter
    val ratios = Corpus.dsirRatios(raw, target)
    val expected = Corpus.dsirScoreWith(raw, ratios)
      .as[(Long, String, Option[Int], Option[Double])].collect().toSet
    val mem = MemoryStream[(Long, String)](spark)
    val q = Corpus.dsirScoreWith(mem.toDF().toDF("doc_id", "text"), ratios)
      .writeStream.format("memory").queryName("dsir_scores")
      .outputMode("append").start()
    try {
      mem.addData(docs: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("dsir_scores")
      .as[(Long, String, Option[Int], Option[Double])].collect().toSet
    assert(got == expected)
  }

  test("token-budget serving is a broadcast gate: stream flags == batch flags") {
    import graft.ops.text.Corpus
    val rows = Seq((1L, "en", 0.9, 10L), (2L, "en", 0.5, 15L),
      (3L, "en", 0.1, 10L), (4L, "de", 0.8, 100L))
    val d = rows.toDF("doc_id", "lang", "score", "n_tok")
    // fit once on the reference batch; serve the SAME call on a stream —
    // broadcast threshold join + one compare, zero stateful operators
    val th = Corpus.tokenBudgetThresholds(d, "score", "n_tok", "lang", 30L)
    val expected = Corpus.tokenBudgetSelectWith(d, th, "score", "lang")
      .select("doc_id", "is_kept").as[(Long, Boolean)].collect().toSet
    val mem = MemoryStream[(Long, String, Double, Long)](spark)
    val q = Corpus.tokenBudgetSelectWith(
      mem.toDF().toDF("doc_id", "lang", "score", "n_tok"), th,
      "score", "lang")
      .select("doc_id", "is_kept")
      .writeStream.format("memory").queryName("budget_flags")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("budget_flags")
      .as[(Long, Boolean)].collect().toSet
    assert(got == expected)
    assert(expected == Set(1L -> true, 2L -> true, 3L -> false, 4L -> false))
  }

  test("bpe encode applies unchanged to a stream (stateless map; stream ≡ batch)") {
    import graft.ops.text.Bpe
    val docs = Seq(
      (1L, "low lower newest"),
      (2L, "newest newest widest"),
      (3L, "low es t"))
    val batch = docs.toDF("doc_id", "text")
    val merges = Bpe.bpeTrain(batch, numMerges = 4)
      .orderBy("merge_rank")
      .as[(Int, String, String, String, Long)].collect()
      .map(m => (m._2, m._3)).toSeq
    val expected = Bpe.encode(batch, merges)
      .as[(Long, Int, Int, String)].collect().toSet
    // the compiled encoder is mapPartitions over a broadcast automaton —
    // stateless, so the ingest-time tokenization pass runs on the stream
    // exactly as on the batch
    val mem = MemoryStream[(Long, String)](spark)
    val q = Bpe.encode(mem.toDF().toDF("doc_id", "text"), merges)
      .writeStream.format("memory").queryName("bpe_stream")
      .outputMode("append").start()
    try {
      mem.addData(docs: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("bpe_stream")
      .as[(Long, Int, Int, String)].collect().toSet
    assert(got == expected)
  }

  test("multimodal: decode stub is deterministic, partition-parallel, schema-stable") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val media = Multimodal.mediaFromDocuments(spark, docs)
    val feats = Multimodal.decodeFeatures(media.repartition(4))
    assert(feats.columns.toSeq ==
      Seq("media_id", "kind", "n_bytes", "width", "height", "duration_ms", "embedding"))
    val twice = Multimodal.decodeFeatures(media.repartition(2))
    def key(f: Multimodal.MediaFeatures) =
      (f.media_id, f.kind, f.n_bytes, f.width, f.height, f.duration_ms, f.embedding.toSeq)
    val a = feats.collect().map(key).sortBy(_._1).toSeq
    val b = twice.collect().map(key).sortBy(_._1).toSeq
    assert(a.length == docs.count() && a == b, "decode must not depend on partitioning")
    // images have no duration; payload length matches text bytes
    val img = feats.filter($"kind" === "image")
    assert(img.filter($"duration_ms" =!= 0).count() == 0)
  }

  test("multimodal: JDK imageio decodes real PNG/BMP; features follow pixels, not format") {
    def encodeImg(w: Int, h: Int, pix: (Int, Int) => Int, fmt: String): Array[Byte] = {
      val bi = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) bi.setRGB(x, y, pix(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(bi, fmt, bos), s"no JDK writer for $fmt")
      bos.toByteArray
    }
    // 4×2 image, left half black, right half white — luminance histogram
    // must put exactly half the mass in bin 0 and half in bin 7
    val pix = (x: Int, _: Int) => if (x < 2) 0x000000 else 0xffffff
    val pngBytes = encodeImg(4, 2, pix, "png")
    val bmpBytes = encodeImg(4, 2, pix, "bmp")
    val jpgBytes = encodeImg(4, 2, pix, "jpg")
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", pngBytes, "synthetic://png"),
      Multimodal.MediaRow(2L, "image", bmpBytes, "synthetic://bmp"),
      Multimodal.MediaRow(3L, "image", "not an image".getBytes("UTF-8"), "synthetic://txt"),
      Multimodal.MediaRow(4L, "image", jpgBytes, "synthetic://jpg"))
    val out = Multimodal.decodeFeatures(spark.createDataset(rows))
      .collect().map(f => f.media_id -> f).toMap
    // real dimensions out of the codec, not the stub's hash-derived fakes
    assert(out(1L).width == 4 && out(1L).height == 2 && out(1L).duration_ms == 0)
    assert(out(1L).embedding.toSeq == Seq(0.5f, 0f, 0f, 0f, 0f, 0f, 0f, 0.5f))
    // same pixels through a different container: identical content features,
    // different payload byte counts
    assert(out(2L).width == 4 && out(2L).height == 2)
    assert(out(2L).embedding.toSeq == out(1L).embedding.toSeq)
    assert(out(1L).n_bytes == pngBytes.length && out(2L).n_bytes == bmpBytes.length)
    assert(pngBytes.length != bmpBytes.length)
    // a payload no reader recognizes falls back to the deterministic stub
    val stub = Multimodal.fakeDecode(rows(2))
    assert(out(3L).copy(embedding = null) == stub.copy(embedding = null) &&
      out(3L).embedding.toSeq == stub.embedding.toSeq)
    // JPEG (r8 verdict optional item — this JDK ships the codec):
    // dimensions exact; the lossy codec may smear the hard edge, but the
    // mass must stay concentrated in the darkest and brightest bins
    assert(out(4L).width == 4 && out(4L).height == 2 && out(4L).duration_ms == 0)
    val jh = out(4L).embedding.toSeq
    assert(math.abs(jh.sum - 1f) < 1e-6, "histogram mass must normalize")
    assert(jh.head + jh.last > 0.9f,
      s"lossy JPEG of a black/white image must stay bimodal: $jh")
  }

  test("multimodal: dHash is format-invariant; imageNearDup pairs near-identical images only") {
    def encodeImg(w: Int, h: Int, pix: (Int, Int) => Int, fmt: String): Array[Byte] = {
      val bi = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) bi.setRGB(x, y, pix(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(bi, fmt, bos), s"no JDK writer for $fmt")
      bos.toByteArray
    }
    def grey(v: Int) = (v << 16) | (v << 8) | v
    val base = (x: Int, _: Int) => grey(x * 8)            // L->R gradient
    val near = (x: Int, y: Int) =>                        // one hot pixel
      if (x == 5 && y == 5) 0xffffff else base(x, y)
    val far = (x: Int, _: Int) => grey(255 - x * 8)       // inverted
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", encodeImg(32, 32, base, "png"), "p"),
      Multimodal.MediaRow(2L, "image", encodeImg(32, 32, near, "png"), "p"),
      Multimodal.MediaRow(3L, "image", encodeImg(32, 32, far, "png"), "p"),
      Multimodal.MediaRow(4L, "image", encodeImg(32, 32, base, "bmp"), "p"),
      Multimodal.MediaRow(5L, "audio", Array[Byte](1, 2, 3), "p"),
      Multimodal.MediaRow(6L, "image", "not an image".getBytes("UTF-8"), "p"))
    val ds = spark.createDataset(rows)
    val hashes = Multimodal.perceptualHashes(ds)
      .as[(Long, Long)].collect().toMap
    // only decodable images hash; same pixels -> same hash across formats
    assert(hashes.keySet == Set(1L, 2L, 3L, 4L))
    assert(hashes(1L) == hashes(4L), "dHash must be container-invariant")
    // near-identical differs in a couple of bits; inverted differs in many
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hashes(1L), hashes(2L)) <= 3,
      s"near-dup hamming ${ham(hashes(1L), hashes(2L))}")
    assert(ham(hashes(1L), hashes(3L)) > 3)
    val pairs = Multimodal.imageNearDup(ds, maxHamming = 3)
      .as[(Long, Long, Int)].collect().map(p => (p._1, p._2)).toSet
    // hamming <= 3 < bands=4 guarantees pairing (lossless pigeonhole)
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 4L)), "identical pixels must pair")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)),
      "inverted image must not pair")
  }

  test("multimodal: imageNearDup maxBucketSize drops the uniform-image hot " +
    "bucket; organic near/far separation unchanged") {
    def encodeImg(w: Int, h: Int, pix: (Int, Int) => Int): Array[Byte] = {
      val bi = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) bi.setRGB(x, y, pix(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(bi, "png", bos))
      bos.toByteArray
    }
    def grey(v: Int) = (v << 16) | (v << 8) | v
    // 40 solid-color frames: dHash of ANY uniform image is exactly 0L (no
    // cell strictly brighter than its right neighbor), so all 40 share
    // every band bucket — the tracking-pixel/blank-frame class that goes
    // quadratic in a crawl.
    val solids = (0 until 40).map { k =>
      Multimodal.MediaRow(100L + k, "image",
        encodeImg(16, 16, (_, _) => grey(40 + k * 5)), "solid")
    }
    // organic near-dup pair with a NONZERO hash: descending gradient (every
    // cell brighter than its right neighbor → all bits set) + a one-hot
    // -pixel variant a couple of bits away
    val base = (x: Int, _: Int) => grey(255 - x * 8)
    val near = (x: Int, y: Int) =>
      if (x == 5 && y == 5) 0x000000 else base(x, y)
    val organic = Seq(
      Multimodal.MediaRow(1L, "image", encodeImg(32, 32, base), "p"),
      Multimodal.MediaRow(2L, "image", encodeImg(32, 32, near), "p"))
    val ds = spark.createDataset(organic ++ solids)
    // capless: the uniform bucket pairs quadratically (the scale defect)
    val uncapped = Multimodal.imageNearDup(ds, maxHamming = 3)
      .as[(Long, Long, Int)].collect()
    assert(uncapped.count { case (a, b, _) => a >= 100L && b >= 100L }
      == 40 * 39 / 2, "uniform images are identical under dHash")
    // capped: the hot bucket is dropped wholesale, the organic pair stays
    val capped = Multimodal.imageNearDup(ds, maxHamming = 3,
      maxBucketSize = 10).as[(Long, Long, Int)].collect()
    assert(!capped.exists { case (a, b, _) => a >= 100L || b >= 100L },
      "over-cap buckets must emit no candidates")
    assert(capped.exists { case (a, b, _) => a == 1L && b == 2L },
      "near-identical organic images must still pair under the cap")
  }

  test("multimodal: imageNearDupAgainst flags incoming near-dups exactly " +
    "once, runs unchanged on a stream, and honors the corpus-bucket cap") {
    def encodeImg(w: Int, h: Int, pix: (Int, Int) => Int): Array[Byte] = {
      val bi = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) bi.setRGB(x, y, pix(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(bi, "png", bos))
      bos.toByteArray
    }
    def grey(v: Int) = (v << 16) | (v << 8) | v
    val base = (x: Int, _: Int) => grey(255 - x * 8) // all-bits hash
    val near = (x: Int, y: Int) =>
      if (x == 5 && y == 5) 0x000000 else base(x, y)
    // stripes: alternating bright/dark columns — roughly half the dHash
    // bits set, far from both the all-ones base and the all-zero solids
    // (an ASCENDING gradient would hash to 0L like the solids do)
    val far = (x: Int, _: Int) => if ((x / 4) % 2 == 0) 0xffffff else 0x000000
    // corpus: the base image + 20 solid frames (the shared 0L hot bucket)
    val corpusRows = Multimodal.MediaRow(1L, "image", encodeImg(32, 32, base), "c") +:
      (0 until 20).map(k => Multimodal.MediaRow(50L + k, "image",
        encodeImg(16, 16, (_, _) => grey(40 + k * 8)), "c"))
    val corpusFps = Multimodal.perceptualHashes(spark.createDataset(corpusRows))
    // incoming: a near-dup of the base (identical pixels -> identical
    // hash, matches in EVERY band — the exactly-once case), a far image,
    // and one solid frame probing the hot bucket
    val incRows = Seq(
      Multimodal.MediaRow(100L, "image", encodeImg(32, 32, near), "i"),
      Multimodal.MediaRow(101L, "image", encodeImg(32, 32, base), "i"),
      Multimodal.MediaRow(102L, "image", encodeImg(32, 32, far), "i"),
      Multimodal.MediaRow(103L, "image", encodeImg(16, 16, (_, _) => grey(7)), "i"))
    val inc = spark.createDataset(incRows)
    val batch = Multimodal.imageNearDupAgainst(inc, corpusFps, maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSeq
    // 101 matches corpus 1 in all 4 bands — exactly ONE row, not four
    assert(batch.count(p => p._1 == 101L && p._2 == 1L) == 1,
      s"multi-band match must emit exactly once: $batch")
    assert(batch.exists(p => p._1 == 100L && p._2 == 1L))
    assert(!batch.exists(p => p._1 == 102L), "far image must not flag")
    // solid 103 duplicates every corpus solid (all dHash 0L)
    assert(batch.count(p => p._1 == 103L) == 20)
    // corpus-bucket cap drops the accumulated uniform class, keeps organics
    val capped = Multimodal.imageNearDupAgainst(inc, corpusFps,
      maxHamming = 3, maxBucketSize = 10).as[(Long, Long, Int)].collect().toSeq
    assert(!capped.exists(_._1 == 103L), "capped hot bucket must not pair")
    assert(capped.exists(p => p._1 == 101L && p._2 == 1L))
    // the cap's loss is OBSERVABLE: the audit census names exactly the
    // dropped buckets — the all-zero dHash bucket in every band, with
    // its 20-member solid-frame crowd — so a capped run can be priced
    // instead of trusted blind
    val audit = Multimodal.imageBandCapAudit(corpusFps, maxBucketSize = 10)
      .as[(Int, Long, Long)].collect().toSeq.sorted
    assert(audit == (0 until 4).map(j => (j, 0L, 20L)),
      s"cap audit must report the uniform-image bucket per band: $audit")
    assert(Multimodal.imageBandCapAudit(corpusFps, maxBucketSize = 20)
      .isEmpty, "a cap above the crowd drops nothing")
    // stream-static: the SAME call over a memory stream ≡ batch
    val mem = MemoryStream[Multimodal.MediaRow](spark)
    val q = Multimodal.imageNearDupAgainst(
      mem.toDS(), corpusFps, maxHamming = 3)
      .writeStream.format("memory").queryName("img_inc_dedup")
      .outputMode("append").start()
    try {
      mem.addData(incRows: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("img_inc_dedup")
      .as[(Long, Long, Int)].collect().toSeq
    assert(got.sorted == batch.sorted, "stream must equal batch")
  }

  test("multimodal: frame sampling fans out evenly, resize preserves aspect ratio") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val media = Multimodal.mediaFromDocuments(spark, docs)
    val frames = Multimodal.frameSample(media, nFrames = 4).collect()
    // only audio/video assets (duration > 0) produce frames, 4 each
    val byId = frames.groupBy(_.media_id)
    assert(byId.nonEmpty && byId.values.forall(_.length == 4))
    assert(frames.forall(f => f.frame_bytes.nonEmpty && f.offset_ms >= 0))
    // deterministic offsets: idx 0 starts at byte 0
    assert(frames.filter(_.frame_idx == 0).forall(_.offset_ms == 0))

    val feats = Multimodal.decodeFeatures(media)
    val resized = Multimodal.resizeFeatures(feats, maxSide = 256).collect()
    resized.foreach { f =>
      assert(math.max(f.width, f.height) <= 256)
      assert(f.width >= 1 && f.height >= 1)
    }
    // exact geometry contract for the shrunk ones: dims are the rounded
    // uniform rescale (aspect preserved up to integer rounding, floor 1)
    val orig = feats.collect().map(f => f.media_id -> f).toMap
    resized.filter(f => math.max(orig(f.media_id).width, orig(f.media_id).height) > 256)
      .foreach { f =>
        val o = orig(f.media_id)
        val scale = 256.0 / math.max(o.width, o.height)
        assert(f.width == math.max(1, math.round(o.width * scale).toInt))
        assert(f.height == math.max(1, math.round(o.height * scale).toInt))
      }
  }

  test("multimodal: payload stats never decode (pure column expressions)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(10)
    val media = Multimodal.mediaFromDocuments(spark, docs)
    val stats = Multimodal.payloadStats(media.toDF())
    val row = stats.orderBy("media_id").head()
    assert(row.getAs[String]("content_sha256").length == 64)
    assert(stats.count() == 10)
  }

  test("streaming incremental line dedup: stateless against-join, stream equals batch") {
    import graft.ops.text.Corpus
    val corpus = Seq((10L, "seen line\nshared tail")).toDF("doc_id", "text")
    val reg = Corpus.lineRegistry(corpus)
    val incRows = Seq((1L, "seen line\nfresh one"), (2L, "shared tail"))
    val batch = Corpus.dedupLinesAgainst(
      incRows.toDF("doc_id", "text"), reg)
      .as[(Long, Int, String, Boolean)].collect().toSeq
    val mem = MemoryStream[(Long, String)](spark)
    val q = Corpus.dedupLinesAgainst(
      mem.toDS().toDF("doc_id", "text"), reg)
      .writeStream.format("memory").queryName("line_inc_dedup")
      .outputMode("append").start()
    try {
      mem.addData(incRows: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("line_inc_dedup")
      .as[(Long, Int, String, Boolean)].collect().toSeq
    assert(got.sorted == batch.sorted, "stream must equal batch")
    assert(batch.sorted.map(r => (r._1, r._2, r._4)) ==
      Seq((1L, 0, true), (1L, 1, false), (2L, 0, true)))
  }

  test("streaming line cleaning: stateless C4 rules, stream equals batch") {
    import graft.ops.text.Corpus
    val rows = Seq((1L, "good line here\nno\nthe bad one"), (2L, "solid three tokens"))
    val batch = Corpus.cleanLines(rows.toDF("doc_id", "text"),
      minTokens = 3, banned = Seq("the"))
      .select("doc_id", "n_lines", "n_kept", "text_clean")
      .as[(Long, Int, Int, String)].collect().toSeq
    val mem = MemoryStream[(Long, String)](spark)
    val q = Corpus.cleanLines(mem.toDS().toDF("doc_id", "text"),
      minTokens = 3, banned = Seq("the"))
      .select("doc_id", "n_lines", "n_kept", "text_clean")
      .writeStream.format("memory").queryName("line_clean")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("line_clean")
      .as[(Long, Int, Int, String)].collect().toSeq
    assert(got.sorted == batch.sorted, "stream must equal batch")
  }

  test("streaming authority maintenance: edge merge advances the " +
    "registry and warm rounds equal the batch replay chain") {
    import graft.ops.Graph
    val root = java.nio.file.Files
      .createTempDirectory("graft_authority").toString
    val edgeTable = s"$root/edges"
    val authTable = s"$root/authority"
    val wave1 = Seq((1L, 2L, 2L), (2L, 3L, 1L), (3L, 1L, 1L))
    val wave2 = Seq((1L, 2L, 1L), (3L, 4L, 2L), (4L, 1L, 1L))
    val mem = MemoryStream[(Long, Long, Long)](spark)
    def drain(): Unit =
      IncrementalStream.runAuthorityStream(spark,
        mem.toDF().toDF("src", "dst", "weight"),
        edgeTable, authTable, s"$root/ckpt", iters = 2)
    mem.addData(wave1: _*)
    drain()
    assert(graft.io.Manifest.currentVersion(spark, edgeTable).contains(1))
    assert(graft.io.Manifest.currentVersion(spark, authTable).contains(1))
    mem.addData(wave2: _*)
    drain()
    assert(graft.io.Manifest.currentVersion(spark, edgeTable).contains(2))
    // edge registry v2 == groupBy-sum of ALL deltas
    val gotEdges = graft.io.Manifest.read(spark, edgeTable)
      .as[(Long, Long, Long)].collect().toSet
    val wantEdges = (wave1 ++ wave2).groupBy(e => (e._1, e._2))
      .map { case ((s, d), es) => (s, d, es.map(_._3).sum) }.toSet
    assert(gotEdges == wantEdges)
    // streamed authority == the batch chain: cold 2 rounds on wave-1's
    // graph, then warm 2 rounds on the merged graph (bit-exact)
    def graph(edges: Set[(Long, Long, Long)]) = {
      val e = edges.toSeq.toDF("src", "dst", "weight")
      val n = e.select(col("src").as("node"))
        .unionAll(e.select(col("dst").as("node"))).distinct()
      (n, e)
    }
    val e1 = wave1.groupBy(e => (e._1, e._2))
      .map { case ((s, d), es) => (s, d, es.map(_._3).sum) }.toSet
    val (n1, g1) = graph(e1)
    val (nAll, gAll) = graph(wantEdges)
    val want = Graph.linkRankFrom(
      Graph.linkRank(n1, g1, iters = 2), nAll, gAll, iters = 2)
      .as[(Long, Long)].collect().toMap
    val gotAuth = graft.io.Manifest.read(spark, authTable)
      .as[(Long, Long)].collect().toMap
    CacheScope.release(spark)
    assert(gotAuth == want, "stream must equal the batch replay chain")
  }

  test("streaming community maintenance: edge merge advances the " +
    "registry and warm LPA rounds equal the batch replay chain; " +
    "replay never double-advances") {
    import graft.ops.Graph
    val root = java.nio.file.Files
      .createTempDirectory("graft_community").toString
    val edgeTable = s"$root/edges"
    val commTable = s"$root/communities"
    // wave 1: one triangle; wave 2 densifies and attaches node 4
    val wave1 = Seq((1L, 2L, 10L), (2L, 3L, 10L), (3L, 1L, 10L))
    val wave2 = Seq((1L, 2L, 5L), (3L, 4L, 2L), (4L, 1L, 1L))
    val mem = MemoryStream[(Long, Long, Long)](spark)
    def drain(): Unit =
      IncrementalStream.runCommunityStream(
        mem.toDF().toDF("src", "dst", "weight"),
        edgeTable, commTable, s"$root/ckpt", rounds = 2,
        tagScope = Some("t"))
    mem.addData(wave1: _*)
    drain()
    assert(graft.io.Manifest.currentVersion(spark, commTable).contains(1))
    mem.addData(wave2: _*)
    drain()
    assert(graft.io.Manifest.currentVersion(spark, commTable).contains(2))
    // streamed labeling == the batch chain: cold 2 rounds on wave-1's
    // graph, then warm 2 rounds on the merged graph (bit-exact)
    def graph(edges: Seq[(Long, Long, Long)]) = {
      val e = edges.groupBy(x => (x._1, x._2))
        .map { case ((s, d), es) => (s, d, es.map(_._3).sum) }.toSeq
        .toDF("src", "dst", "weight")
      val n = e.select(col("src").as("node"))
        .unionAll(e.select(col("dst").as("node"))).distinct()
      (n, e)
    }
    val (n1, g1) = graph(wave1)
    val (nAll, gAll) = graph(wave1 ++ wave2)
    val want = Graph.labelPropFrom(
      Graph.labelPropagate(n1, g1, rounds = 2), nAll, gAll, rounds = 2)
      .as[(Long, Long)].collect().toMap
    val got = graft.io.Manifest.read(spark, commTable)
      .as[(Long, Long)].collect().toMap
    CacheScope.release(spark)
    assert(got == want, "stream must equal the batch replay chain")
    assert(got.contains(4L), "the wave-2 node must be labeled")
    // replay leg (the authority-replay contract verbatim, own tables):
    // a fully-committed single batch replayed from a FRESH checkpoint
    // under the same scope skips both legs — no extra edge version
    // (double-merge double-counts weights), no extra warm rounds (which
    // would break stream ≡ batch-replay)
    val root2 = java.nio.file.Files
      .createTempDirectory("graft_comm_replay").toString
    def drainReplay(ckpt: String): Unit = {
      val m = MemoryStream[(Long, Long, Long)](spark)
      m.addData(wave1: _*)
      IncrementalStream.runCommunityStream(
        m.toDF().toDF("src", "dst", "weight"),
        s"$root2/edges", s"$root2/communities", ckpt, rounds = 2,
        tagScope = Some("t"))
      ()
    }
    drainReplay(s"$root2/ckpt1")
    val labels1 = graft.io.Manifest.read(spark, s"$root2/communities")
      .as[(Long, Long)].collect().toMap
    drainReplay(s"$root2/ckpt2")
    assert(graft.io.Manifest.currentVersion(spark, s"$root2/edges")
      .contains(1), "replayed merge must skip — re-merging double-counts")
    assert(graft.io.Manifest.currentVersion(spark, s"$root2/communities")
      .contains(1), "replayed label leg must skip — extra rounds drift")
    assert(graft.io.Manifest.read(spark, s"$root2/communities")
      .as[(Long, Long)].collect().toMap == labels1)
    CacheScope.release(spark)
  }

  test("streaming distance maintenance: edge merge advances the " +
    "registry and warm min-plus rounds equal the batch replay chain " +
    "(including a RE-IMPROVED committed distance); replay never " +
    "double-advances") {
    import graft.ops.Graph
    val root = java.nio.file.Files
      .createTempDirectory("graft_distance").toString
    val edgeTable = s"$root/edges"
    val distTable = s"$root/distances"
    // wave 1: the path 1→2→3→4; wave 2 opens the shortcut 1→5→4 (node
    // 4's committed distance must IMPROVE 3→2) and extends to 6
    val wave1 = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L))
    val wave2 = Seq((1L, 5L, 1L), (5L, 4L, 1L), (4L, 6L, 1L))
    val seeds = Seq(1L)
    val mem = MemoryStream[(Long, Long, Long)](spark)
    def drain(): Unit =
      IncrementalStream.runDistanceStream(
        mem.toDF().toDF("src", "dst", "weight"),
        edgeTable, distTable, s"$root/ckpt", seeds,
        rounds = 4, maxHops = 6, tagScope = Some("t"))
    mem.addData(wave1: _*)
    drain()
    assert(graft.io.Manifest.currentVersion(spark, distTable).contains(1))
    mem.addData(wave2: _*)
    drain()
    assert(graft.io.Manifest.currentVersion(spark, distTable).contains(2))
    // streamed distances == the batch chain: cold BFS on wave-1's
    // graph, then warm min-plus rounds on the merged graph (bit-exact)
    def graph(edges: Seq[(Long, Long, Long)]) = {
      val e = edges.toDF("src", "dst", "weight")
      val n = e.select(col("src").as("node"))
        .unionAll(e.select(col("dst").as("node"))).distinct()
      (n, e)
    }
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val (n1, g1) = graph(wave1)
    val (nAll, gAll) = graph(wave1 ++ wave2)
    val want = asMap(Graph.hopDistanceFrom(
      Graph.hopDistance(n1, g1, seeds.toDF("node"), maxHops = 6),
      nAll, gAll, seeds.toDF("node"), rounds = 4))
    val got = asMap(graft.io.Manifest.read(spark, distTable))
    CacheScope.release(spark)
    assert(got == want, "stream must equal the batch replay chain")
    assert(got(4L) == Some(2L),
      "the committed wave-1 distance of node 4 must re-improve via the shortcut")
    assert(got(6L) == Some(3L), "the wave-2 extension must be reached")
    // replay leg: a fully-committed single batch replayed from a FRESH
    // checkpoint under the same scope skips both legs — no extra edge
    // version, no extra warm rounds
    val root2 = java.nio.file.Files
      .createTempDirectory("graft_dist_replay").toString
    def drainReplay(ckpt: String): Unit = {
      val m = MemoryStream[(Long, Long, Long)](spark)
      m.addData(wave1: _*)
      IncrementalStream.runDistanceStream(
        m.toDF().toDF("src", "dst", "weight"),
        s"$root2/edges", s"$root2/distances", ckpt, seeds,
        rounds = 4, maxHops = 6, tagScope = Some("t"))
      ()
    }
    drainReplay(s"$root2/ckpt1")
    val dist1 = asMap(graft.io.Manifest.read(spark, s"$root2/distances"))
    drainReplay(s"$root2/ckpt2")
    assert(graft.io.Manifest.currentVersion(spark, s"$root2/edges")
      .contains(1), "replayed merge must skip — re-merging double-counts")
    assert(graft.io.Manifest.currentVersion(spark, s"$root2/distances")
      .contains(1), "replayed distance leg must skip")
    assert(asMap(graft.io.Manifest.read(spark, s"$root2/distances")) == dist1)
    CacheScope.release(spark)
  }

  test("streaming WEIGHTED distance maintenance: min-merged edge " +
    "registry keeps the warm contract; warm min-plus rounds equal the " +
    "batch replay chain (including a committed distance re-improved " +
    "by a cheaper route AND a re-sent pair at a cheaper weight); " +
    "replay never double-advances") {
    import graft.ops.Graph
    val root = java.nio.file.Files
      .createTempDirectory("graft_wdistance").toString
    val edgeTable = s"$root/edges"
    val distTable = s"$root/distances"
    // wave 1: 1→2 (5), 2→3 (5), 1→4 (20). wave 2: a cheaper PARALLEL
    // offer for 1→4 (weight 7 < 20 — the min-merge case SUM would
    // corrupt: 20+7=27 raises the registry weight and breaks the warm
    // bound) plus the extension 4→5 (1)
    val wave1 = Seq((1L, 2L, 5L), (2L, 3L, 5L), (1L, 4L, 20L))
    val wave2 = Seq((1L, 4L, 7L), (4L, 5L, 1L))
    val seeds = Seq(1L)
    val mem = MemoryStream[(Long, Long, Long)](spark)
    def drain(): Unit =
      IncrementalStream.runWeightedDistanceStream(
        mem.toDF().toDF("src", "dst", "weight"),
        edgeTable, distTable, s"$root/ckpt", seeds,
        rounds = 4, maxRounds = 6, tagScope = Some("t"))
    mem.addData(wave1: _*)
    drain()
    assert(graft.io.Manifest.currentVersion(spark, distTable).contains(1))
    mem.addData(wave2: _*)
    drain()
    assert(graft.io.Manifest.currentVersion(spark, distTable).contains(2))
    // the registry must hold the MIN weight for the re-sent pair
    val regW = graft.io.Manifest.read(spark, edgeTable)
      .filter(col("src") === 1L && col("dst") === 4L)
      .select("weight").head().getLong(0)
    assert(regW == 7L, s"min-merge must keep the cheaper offer, got $regW")
    // streamed distances == the batch chain over the MIN-merged graph
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    def graph(edges: Seq[(Long, Long, Long)]) = {
      val e = edges.toDF("src", "dst", "weight")
        .groupBy("src", "dst").agg(min("weight").as("weight"))
      val n = e.select(col("src").as("node"))
        .unionAll(e.select(col("dst").as("node"))).distinct()
      (n, e)
    }
    val (n1, g1) = graph(wave1)
    val (nAll, gAll) = graph(wave1 ++ wave2)
    val want = asMap(Graph.hopDistanceWeightedFrom(
      Graph.hopDistanceWeighted(n1, g1, seeds.toDF("node"), maxRounds = 6),
      nAll, gAll, seeds.toDF("node"), rounds = 4))
    val got = asMap(graft.io.Manifest.read(spark, distTable))
    CacheScope.release(spark)
    assert(got == want, "stream must equal the batch replay chain")
    assert(got(4L) == Some(7L),
      "node 4's committed distance (20) must re-improve to the cheaper offer")
    assert(got(5L) == Some(8L), "the wave-2 extension must be reached")
    // replay leg: a fully-committed single batch replayed from a FRESH
    // checkpoint under the same scope skips both legs (MIN-merge is
    // idempotent, but the tag skip is the shared proof — no extra
    // versions, no extra warm rounds)
    val root2 = java.nio.file.Files
      .createTempDirectory("graft_wdist_replay").toString
    def drainReplay(ckpt: String): Unit = {
      val m = MemoryStream[(Long, Long, Long)](spark)
      m.addData(wave1: _*)
      IncrementalStream.runWeightedDistanceStream(
        m.toDF().toDF("src", "dst", "weight"),
        s"$root2/edges", s"$root2/distances", ckpt, seeds,
        rounds = 4, maxRounds = 6, tagScope = Some("t"))
      ()
    }
    drainReplay(s"$root2/ckpt1")
    val dist1 = asMap(graft.io.Manifest.read(spark, s"$root2/distances"))
    drainReplay(s"$root2/ckpt2")
    assert(graft.io.Manifest.currentVersion(spark, s"$root2/edges")
      .contains(1), "replayed merge must skip")
    assert(graft.io.Manifest.currentVersion(spark, s"$root2/distances")
      .contains(1), "replayed distance leg must skip")
    assert(asMap(graft.io.Manifest.read(spark, s"$root2/distances")) == dist1)
    CacheScope.release(spark)
  }

  test("authority stream replay-idempotency: a fully-committed batch " +
    "replays as a no-op (no double-counted weights, no extra rounds)") {
    val root = Files.createTempDirectory("graft_auth_replay").toString
    val edgeTable = s"$root/edges"
    val authTable = s"$root/authority"
    val wave = Seq((1L, 2L, 2L), (2L, 1L, 1L))
    val mem1 = MemoryStream[(Long, Long, Long)](spark)
    mem1.addData(wave: _*)
    IncrementalStream.runAuthorityStream(spark,
      mem1.toDF().toDF("src", "dst", "weight"),
      edgeTable, authTable, s"$root/ckpt1", iters = 2,
      tagScope = Some("t"))
    val edges1 = graft.io.Manifest.read(spark, edgeTable)
      .as[(Long, Long, Long)].collect().toSet
    val auth1 = graft.io.Manifest.read(spark, authTable)
      .as[(Long, Long)].collect().toMap
    assert(graft.io.Manifest.currentVersion(spark, edgeTable).contains(1))
    // replay batch 0 from a FRESH checkpoint — the crash window after
    // both Manifest commits but before the checkpoint mark: both legs
    // find their own batchId tag and skip
    val mem2 = MemoryStream[(Long, Long, Long)](spark)
    mem2.addData(wave: _*)
    IncrementalStream.runAuthorityStream(spark,
      mem2.toDF().toDF("src", "dst", "weight"),
      edgeTable, authTable, s"$root/ckpt2", iters = 2,
      tagScope = Some("t"))
    assert(graft.io.Manifest.currentVersion(spark, edgeTable).contains(1),
      "replayed merge must be skipped — re-merging double-counts weights")
    assert(graft.io.Manifest.currentVersion(spark, authTable).contains(1),
      "replayed authority leg must be skipped — extra warm rounds drift")
    assert(graft.io.Manifest.read(spark, edgeTable)
      .as[(Long, Long, Long)].collect().toSet == edges1)
    assert(graft.io.Manifest.read(spark, authTable)
      .as[(Long, Long)].collect().toMap == auth1)
    // a DIFFERENT stream identity (default checkpoint-derived scope)
    // restarting at batchId 0 with NEW data must NOT be mistaken for a
    // replay — the pre-fix bare `authority-batch-0` tag would silently
    // skip this merge
    val mem3 = MemoryStream[(Long, Long, Long)](spark)
    mem3.addData((3L, 4L, 5L))
    IncrementalStream.runAuthorityStream(spark,
      mem3.toDF().toDF("src", "dst", "weight"),
      edgeTable, authTable, s"$root/ckpt3", iters = 2)
    assert(graft.io.Manifest.currentVersion(spark, edgeTable).contains(2),
      "new data under a new stream identity must merge, not skip")
    assert(graft.io.Manifest.read(spark, edgeTable)
      .as[(Long, Long, Long)].collect().toSet == edges1 + ((3L, 4L, 5L)))
    CacheScope.release(spark)
  }

  test("authority stream crash BETWEEN the edge and authority commits: " +
    "the replay skips only the merge and lands like the uncrashed run") {
    import graft.ops.Graph
    val root = Files.createTempDirectory("graft_auth_halfcommit").toString
    val edgeTable = s"$root/edges"
    val authTable = s"$root/authority"
    val wave = Seq((1L, 2L, 2L), (2L, 3L, 1L), (3L, 1L, 1L))
    // simulate the half-committed state: the merge of batch 0 landed
    // (tagged with its batchId) but the crash hit before the authority
    // commit
    graft.io.Manifest.writeTagged(wave.toDF("src", "dst", "weight"),
      edgeTable, "authority-t-batch-0")
    val mem = MemoryStream[(Long, Long, Long)](spark)
    mem.addData(wave: _*)
    IncrementalStream.runAuthorityStream(spark,
      mem.toDF().toDF("src", "dst", "weight"),
      edgeTable, authTable, s"$root/ckpt", iters = 2,
      tagScope = Some("t"))
    // merge leg skipped: still v1, weights NOT doubled
    assert(graft.io.Manifest.currentVersion(spark, edgeTable).contains(1))
    assert(graft.io.Manifest.read(spark, edgeTable)
      .as[(Long, Long, Long)].collect().toSet == wave.toSet,
      "a replayed merge would have doubled every weight")
    // authority leg ran: cold-start rounds over the committed graph
    val e = wave.toDF("src", "dst", "weight")
    val n = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node"))).distinct()
    val want = Graph.linkRank(n, e, iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(graft.io.Manifest.read(spark, authTable)
      .as[(Long, Long)].collect().toMap == want)
    CacheScope.release(spark)
  }

  test("curation ingest replay-idempotency: a replayed committed batch " +
    "never double-admits") {
    import graft.ops.text.{Corpus, Dedup, TextStats}
    val root = Files.createTempDirectory("graft_ingest_replay").toString
    val corpusSeed = Seq(
      (10L, "the cat and the dog ran in the park with the red ball", "en"))
      .toDF("doc_id", "text", "lang")
    corpusSeed.write.parquet(s"$root/corpus")
    val registryTable = s"$root/sigs"
    Dedup.signatureRefresh(corpusSeed, registryTable, k = 32, bands = 8)
    val thresholds = Corpus.quantileThresholds(
      TextStats.qualityScore(corpusSeed, Seq("lang")),
      "quality_score", "lang", p = 0.5)
    val benchmark = Seq((100L,
      "the physics question is about the speed of light", "en"))
      .toDF("doc_id", "text", "lang")
    val novel = "the weather in the mountains is mild and the rain " +
      "falls in the valley near the lake"
    def drainWith(ckpt: String): Unit = {
      val mem = MemoryStream[(Long, String, String)](spark)
      mem.addData((21L, novel, "en"))
      IncrementalStream.runCurationIngest(spark,
        mem.toDF().toDF("doc_id", "text", "lang"),
        s"$root/corpus", registryTable, thresholds, benchmark,
        s"$root/accepted", ckpt, tagScope = Some("t"))
    }
    drainWith(s"$root/ckpt1")
    assert(spark.read.parquet(s"$root/accepted")
      .select("doc_id").as[Long].collect().toSeq == Seq(21L))
    assert(graft.io.Manifest.currentVersion(spark, registryTable).contains(2))
    // replay batch 0 from a fresh checkpoint — the crash window after the
    // registry commit: the batchId tag short-circuits the whole batch
    drainWith(s"$root/ckpt2")
    assert(spark.read.parquet(s"$root/accepted")
      .select("doc_id").as[Long].collect().toSeq == Seq(21L),
      "the replayed batch must not append a second copy of doc 21")
    assert(graft.io.Manifest.currentVersion(spark, registryTable).contains(2),
      "the replayed batch must not commit another registry version")
  }
}
