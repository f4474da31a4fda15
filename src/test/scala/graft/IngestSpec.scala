package graft

import java.nio.file.{Files, Paths}
import graft.dw.{Ingest, Schemas, Sources}

class IngestSpec extends SparkTestBase {

  test("ingest copies only matching extensions and creates the bucket (S3-S5)") {
    val src = Files.createTempDirectory("graft_ingest_src")
    Files.write(src.resolve("a.json"), """{"business_id":"b1","date":"x"}""".getBytes)
    Files.write(src.resolve("b.csv"), "date,min\n20150101,1.0".getBytes)
    Files.write(src.resolve("c.parquet"), Array[Byte](1, 2, 3)) // filtered out
    val dest = src.resolve("bucket").toString // does not exist yet

    val copied = Ingest.ingest(spark, src.toString, dest)
    assert(copied.toSet === Set("a.json", "b.csv"))
    assert(Files.exists(Paths.get(dest, "a.json")))
    assert(!Files.exists(Paths.get(dest, "c.parquet")))
    // idempotent re-run (overwrite=true, like fput_object)
    assert(Ingest.ingest(spark, src.toString, dest).toSet === Set("a.json", "b.csv"))
  }

  test("ingested NDJSON round-trips through the schema-enforced reader (S1 after S4)") {
    val src = Files.createTempDirectory("graft_ingest_rt")
    Files.write(src.resolve("checkin.json"),
      """{"business_id":"b1","date":"2015-04-26 19:49:16"}""".getBytes)
    val dest = src.resolve("raw").toString
    Ingest.ingest(spark, src.toString, dest)
    val df = Sources.ndjson(spark, s"$dest/checkin.json", Schemas.checkin)
    assert(df.count() === 1)
    assert(df.collect()(0).getString(0) === "b1")
  }
}
