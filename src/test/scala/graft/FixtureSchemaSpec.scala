package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Fixture-drift tripwire (VERDICT r6 "Next round" #2).
  *
  * Round 6 lost 20 queries, 11 tests, and the driver bench to a single
  * silent fixture regeneration: `events.ts` changed physical encoding from
  * TIMESTAMP(NANOS) to timestamp[us] and `Tables.load`'s normalization
  * assumed the old encoding. This spec pins the contract at its narrowest
  * point — every driver fixture, read through `Tables.load`, must surface
  * exactly the declared logical schema — so the next regeneration fails ONE
  * named test with the drifted (name, type) pairs in the message instead of
  * an analysis-error blast radius across the query surface.
  */
class FixtureSchemaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("every fixture table loads and normalizes to its declared schema") {
    Tables.schemas.keys.toSeq.sorted.foreach { name =>
      val df = Tables.load(spark, TestSpark.sf, name)
      val got = df.schema.fields.map(f => (f.name, f.dataType)).toSeq
      val want = Tables.schemas(name).fields.map(f => (f.name, f.dataType)).toSeq
      assert(got == want, s"fixture $name drifted: got $got want $want")
      assert(df.limit(1).count() == 1, s"fixture $name is empty")
    }
  }

  test("events.ts normalizes to timestamp_ntz from either physical encoding") {
    import org.apache.spark.sql.functions._
    // Whatever encoding the current fixture uses, the loaded column must be
    // NTZ micros whose values round-trip through a micros write unchanged.
    val ev = Tables.events(spark, TestSpark.sf)
    assert(ev.schema("ts").dataType == TimestampNTZType)
    // Values must be sane timestamps (fixture generates 2024-era events),
    // not 1970-epoch artifacts of a wrong div/cast.
    val yr = ev.select(min(year(col("ts"))), max(year(col("ts")))).head()
    assert(yr.getInt(0) >= 2000 && yr.getInt(1) <= 2100,
      s"events.ts values out of range: $yr — wrong physical-encoding branch?")
  }

  test("synthetic nanos-encoded events normalize identically to the fixture") {
    // Write an int64-nanos parquet shaped like the old fixture and read it
    // back through the same normalization path Tables.load uses, proving the
    // LongType branch still yields identical micros.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("nanos_events").toString
    val micros = Tables.events(spark, TestSpark.sf)
      .select(col("event_id"),
        unix_micros(col("ts").cast(TimestampType)).as("us"))
    micros.select(col("event_id"), (col("us") * 1000L).as("ts"))
      .write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
      .withColumn("ts",
        expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
      .select(col("event_id"),
        unix_micros(col("ts").cast(TimestampType)).as("us_back"))
    val diff = micros.join(back, "event_id")
      .filter(col("us") =!= col("us_back")).count()
    assert(diff == 0, s"$diff rows drifted through the nanos branch")
  }
}
