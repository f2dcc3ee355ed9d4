package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 regression class, made un-reintroducible: the driver once
  * regenerated `events.parquet` as naive `timestamp[us]` (surfacing as
  * TIMESTAMP_NTZ), and three queries using `unix_micros` failed at
  * ANALYSIS time — then vanished from every artifact. This spec analyzes
  * (no execution) every registered query against a testdata dir whose
  * events table is forcibly TIMESTAMP_NTZ parquet, so any query that
  * regresses to an NTZ-unsafe expression fails here first, whatever
  * physical shape the next testdata generation ships.
  */
// @Slow: a per-query analysis SWEEP guarding against driver testdata
// shape drift between rounds -- tier-2 (quick tier skips it)
@org.scalatest.tags.Slow
class NtzRobustnessSpec extends AnyFunSuite {
  import TestSpark._

  lazy val ntzDir: String = {
    val tmp = Files.createTempDirectory("graft-ntz").toFile.getAbsolutePath
    for (t <- Tables.all if t != "events")
      Files.createSymbolicLink(Paths.get(s"$tmp/$t.parquet"),
        Paths.get(s"$sfDir/$t.parquet"))
    // normalized events → strip the zone back off: written parquet is
    // isAdjustedToUTC=false, read back as TIMESTAMP_NTZ
    Tables.events(spark, sfDir)
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    tmp
  }

  test("forced events table reads as TIMESTAMP_NTZ pre-normalization") {
    val raw = spark.read.parquet(s"$ntzDir/events.parquet")
    assert(raw.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    // and Tables.events normalizes it away
    assert(Tables.events(spark, ntzDir).schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name analyzes cleanly over NTZ events") {
      // analysis only — DATATYPE_MISMATCH (the r8 failure mode) throws
      // here; execution correctness is QueriesSpec/driver territory
      fn(spark, ntzDir).queryExecution.analyzed
    }
  }
}
