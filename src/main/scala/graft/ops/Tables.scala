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
      // events.ts has shipped as both parquet TIMESTAMP(NANOS) (which Spark's
      // reader surfaces only as raw longs via nanosAsLong) and TIMESTAMP(MICROS)
      // (plain timestamp) across fixture generations. Dispatch on the schema the
      // reader actually produces: a LongType ts gets the ns→µs truncation (the
      // same truncation DuckDB applies, so oracle timestamps agree); a native
      // timestamp passes through untouched.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
        case _ => df
      }
    case _ =>
      spark.read.parquet(s"$dir/$name.parquet")
  }
}
