package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-generated fixture tables (TESTDATA.md). Plain
  * vectorized parquet scans — filters/projections composed on top reach the
  * scan via Catalyst pushdown (verified in plan specs). */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = name match {
    case "events" =>
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects
      // outright; read it as raw nanos and truncate to microseconds — the
      // same ns→µs truncation DuckDB applies, so oracle timestamps agree.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    case _ =>
      spark.read.parquet(s"$dir/$name.parquet")
  }
}
