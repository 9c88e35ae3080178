package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.types.TimestampType

/** Boundary-validation gates for the typed testdata readers
  * (reference validation.py — dtype checks at data boundaries, not
  * assumptions). Round 12 regression: the driver regenerated
  * events.parquet and its `ts` flipped from TIMESTAMP(NANOS) to
  * timestamp[us]; a reader hard-coded to one physical encoding broke
  * three green queries. These specs pin the reader over EVERY valid
  * encoding, plus a live smoke pass over the real testdata so any
  * future physical-schema drift fails in-round under `sbt test`
  * instead of at the driver's Verify run. */
class TablesSpec extends SparkSpec {

  /** Stage a fixture parquet as `<tmp>/events.parquet` (the reader
    * addresses tables by directory + fixed file name). */
  private def stage(fixture: String): String = {
    val url = getClass.getResource(s"/$fixture")
    assert(url != null, s"missing test resource $fixture")
    val dir = Files.createTempDirectory("graft-tables")
    Files.copy(Paths.get(url.toURI), dir.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    dir.toFile.deleteOnExit()
    dir.toString
  }

  private def readEvents(fixture: String) = {
    val f = tables.events(spark, stage(fixture))
    val rows = f.toNative.orderBy("event_id")
      .selectExpr("event_id", "cast(ts as string) as ts", "user_id",
        "event_type", "value", "props")
      .collect().toSeq
    (f, rows)
  }

  test("events reader admits all three physical ts encodings and yields identical values") {
    val (fNanos, nanos)   = readEvents("events_ts_nanos.parquet")
    val (fMicros, micros) = readEvents("events_ts_micros.parquet")
    val (fUtc, utc)       = readEvents("events_ts_micros_utc.parquet")
    for (f <- Seq(fNanos, fMicros, fUtc))
      assert(f.toNative.schema("ts").dataType == TimestampType)
    assert(nanos.nonEmpty)
    assert(micros == nanos, "timestamp[us] file must read identically to the nanos file")
    assert(utc == nanos, "timestamp[us, UTC] file must read identically to the nanos file")
  }

  test("events reader rejects an unsupported ts physical type with a pointed error") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-tables-bad")
    Seq((1L, "not-a-ts", 2L, "click", 1.0, "p"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(dir.resolve("events.parquet").toString)
    val e = intercept[IllegalArgumentException] {
      tables.events(spark, dir.toString)
    }
    assert(e.getMessage.contains("unsupported physical type"))
  }

  // ---------------------------------------------------- testdata smoke gate
  // `sbt test` never touched /root/testdata before round 13, so a physical
  // drift in driver-generated parquet was invisible until Verify ran.
  // This suite opens all 10 tables through their typed readers (the same
  // code path every query uses) and asserts non-empty; it self-skips when
  // the testdata tree is absent (e.g. a bare clone).
  private val sfDir = "/root/testdata/sf0.001"

  private val readers: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)] = Seq(
    "lineitem"   -> ((s, d) => tables.lineitem(s, d).toNative),
    "orders"     -> ((s, d) => tables.orders(s, d).toNative),
    "customer"   -> ((s, d) => tables.customer(s, d).toNative),
    "supplier"   -> ((s, d) => tables.supplier(s, d).toNative),
    "part"       -> ((s, d) => tables.part(s, d).toNative),
    "nation"     -> ((s, d) => tables.nation(s, d).toNative),
    "region"     -> ((s, d) => tables.region(s, d).toNative),
    "events"     -> ((s, d) => tables.events(s, d).toNative),
    "documents"  -> ((s, d) => tables.documents(s, d).toNative),
    "embeddings" -> ((s, d) => tables.embeddings(s, d).toNative),
  )

  test("driver contract smoke: SparkEntry.entry returns rows at sf0.001") {
    assume(Files.isDirectory(Paths.get(sfDir)), s"$sfDir absent — skipping smoke gate")
    assert(SparkEntry.entry(spark).count() > 0L)
  }

  test("testdata smoke: all 10 typed readers open the driver parquet and see rows") {
    assume(Files.isDirectory(Paths.get(sfDir)), s"$sfDir absent — skipping smoke gate")
    val empty = readers.flatMap { case (name, rd) =>
      val n =
        try rd(spark, sfDir).count()
        catch { case e: Throwable => fail(s"typed reader for '$name' threw: ${e.getMessage}") }
      if (n > 0L) None else Some(name)
    }
    assert(empty.isEmpty, s"typed readers returned zero rows for: ${empty.mkString(", ")}")
  }
}
