package graft

import java.nio.file.Files

import graft.io.Sources
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Registry-wide fixture/schema smoke check (r7 verdict item 2).
  *
  * Round 7 went red because the driver regenerated the fixtures with a new
  * `events.ts` encoding and nothing cheap noticed: 22 queries silently lost
  * their correctness rows. This spec turns any such drift into ONE named,
  * loud failure:
  *
  *  - every table in the fixture dir must load through [[Sources.table]];
  *  - every registered query must pass ANALYSIS (plan resolution only — no
  *    execution, seconds total) against sf0.001;
  *  - [[Sources.table]] must normalize BOTH historical `events.ts`
  *    encodings (int64 nanos read as LongType under the legacy conf, and
  *    parquet TIMESTAMP(MICROS) read as TIMESTAMP_NTZ) to the same
  *    microsecond `TimestampType` instants.
  */
class AnalysisSmokeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("every fixture table loads and reports a schema") {
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    val failures = tables.flatMap { t =>
      try { Sources.table(spark, dir, t).schema; None }
      catch { case e: Exception =>
        Some(s"$t: ${Option(e.getMessage).getOrElse(e.toString).linesIterator.next()}")
      }
    }
    assert(failures.isEmpty, s"tables failing to load:\n${failures.mkString("\n")}")
  }

  test("documents fixture carries no tokenless text (the BPE-oracle doc " +
    "contract)") {
    // The q_bpe_segment/encode/ids/fertility oracles reconstruct each
    // document from its WORDS (inner join on the trained word states), so
    // a document with NO nonempty whitespace token — null, empty, or
    // all-spaces text — would emit a Spark row the oracle cannot produce.
    // The engine sides agree with each other (empty tokens filter
    // identically, BpeSpec covers it); this pins the FIXTURE so the next
    // driver regen that introduces such a doc fails one named test
    // instead of four correctness rows.
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val docs = Sources.table(spark, s"/root/testdata/$sf", "documents")
      val tokenless = docs.filter(col("text").isNull ||
        size(filter(split(col("text"), " "), t => t =!= "")) === 0).count()
      assert(tokenless == 0,
        s"$sf documents has $tokenless tokenless doc(s): the BPE-family " +
          "oracles (q_bpe_segment/encode/ids/fertility) drop such docs " +
          "via their word join while Spark emits rows for them — " +
          "restructure those oracles before accepting this fixture")
    }
  }

  test("events.ts normalizes to TimestampType under Sources.table") {
    val df = Sources.table(spark, dir, "events")
    assert(df.schema("ts").dataType == TimestampType,
      s"expected TimestampType, got ${df.schema("ts").dataType}")
  }

  test("every registered query analyzes against the sf0.001 fixtures") {
    // analysis only: resolves every column/table reference without running
    // a job, so a fixture schema change fails HERE with the query name
    // instead of wiping correctness rows downstream.
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, dir).queryExecution.analyzed; None }
        catch { case e: Exception =>
          Some(s"$name: ${Option(e.getMessage).getOrElse(e.toString).linesIterator.next()}")
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries fail analysis:\n${failures.mkString("\n")}")
  }

  test("every oracleSql key has a matching queries entry") {
    val orphans = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(orphans.isEmpty, s"oracleSql keys without a query: $orphans")
  }

  test("Sources.table handles both events.ts encodings identically") {
    val root = Files.createTempDirectory("graft_events_enc").toString
    import spark.implicits._
    // three instants, microsecond precision
    val micros = Seq(1721000000000000L, 1721000123456789L, 1721086400000000L)

    // encoding A: int64 nanos column named ts (the pre-2026-08 fixture
    // shape — reads back as LongType, exercising the DIV-1000 branch)
    val nanosDir = s"$root/nanos"
    micros.map(us => (us * 1000L, "click")).toDF("ts", "kind")
      .write.parquet(nanosDir)
    // Sources.table reads "<dir>/events.parquet"
    val nanosTbl = s"$root/a"
    Files.createDirectories(java.nio.file.Paths.get(nanosTbl))
    java.nio.file.Files.move(
      java.nio.file.Paths.get(nanosDir),
      java.nio.file.Paths.get(s"$nanosTbl/events.parquet"))

    // encoding B: TIMESTAMP_NTZ column (writes parquet TIMESTAMP(MICROS,
    // isAdjustedToUTC=false) — the current fixture shape, exercising the
    // NTZ-cast branch)
    val ntzDir = s"$root/ntz"
    micros.map(us => (us, "click")).toDF("us", "kind")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"),
        col("kind"))
      .write.parquet(ntzDir)
    val ntzTbl = s"$root/b"
    Files.createDirectories(java.nio.file.Paths.get(ntzTbl))
    java.nio.file.Files.move(
      java.nio.file.Paths.get(ntzDir),
      java.nio.file.Paths.get(s"$ntzTbl/events.parquet"))

    val a = Sources.table(spark, nanosTbl, "events")
    val b = Sources.table(spark, ntzTbl, "events")
    assert(a.schema("ts").dataType == TimestampType)
    assert(b.schema("ts").dataType == TimestampType)
    val gotA = a.select(unix_micros(col("ts"))).as[Long].collect().sorted
    val gotB = b.select(unix_micros(col("ts"))).as[Long].collect().sorted
    assert(gotA.toSeq == micros.sorted, s"nanos branch: ${gotA.toSeq}")
    assert(gotB.toSeq == micros.sorted, s"ntz branch: ${gotB.toSeq}")
  }

  test("genuinely TIMESTAMP(NANOS)-annotated parquet trips the refusal " +
    "predicate and the legacy-flag retry") {
    // Encoding A above writes a PLAIN int64 column, which reads back as
    // LongType without ever throwing — it exercises the DIV-1000 branch
    // but not the PARQUET_TYPE_ILLEGAL catch/retry. This writes the real
    // thing with the parquet-java Group writer, so the message matcher in
    // Sources.isNanosRefusal is pinned against the ACTUAL error a Spark
    // upgrade could reword.
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.schema.MessageTypeParser
    val root = Files.createTempDirectory("graft_nanos_annot").toString
    val tbl = s"$root/events.parquet"
    Files.createDirectories(java.nio.file.Paths.get(tbl))
    val schema = MessageTypeParser.parseMessageType(
      "message events { required int64 event_id; " +
        "required int64 ts (TIMESTAMP(NANOS,true)); }")
    val microsTs = 1721000123456789L
    val writer = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(s"$tbl/part-00000.parquet"))
      .withConf(new org.apache.hadoop.conf.Configuration())
      .withType(schema)
      .build()
    try {
      val gf = new SimpleGroupFactory(schema)
      writer.write(gf.newGroup()
        .append("event_id", 1L)
        .append("ts", microsTs * 1000L + 789L)) // sub-µs nanos truncate
    } finally writer.close()

    // a shared session may carry the flag from an earlier Sources.table
    // retry — clear it so the clean-read-first path really throws here
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    val e = intercept[Exception] { spark.read.parquet(tbl).schema }
    assert(Sources.isNanosRefusal(e),
      s"refusal predicate must match Spark's actual error: ${e.getMessage}")
    // and an unrelated failure must NOT match (no blind retry loops)
    assert(!Sources.isNanosRefusal(new RuntimeException("file not found")))

    val df = Sources.table(spark, root, "events")
    assert(df.schema("ts").dataType == TimestampType)
    import spark.implicits._
    assert(df.select(unix_micros(col("ts"))).as[Long].collect().toSeq ==
      Seq(microsTs), "nanos value must normalize to truncated micros")
  }
}
