package graft
import org.apache.spark.sql.SparkSession
object VerifySubset {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false).appName("vsub").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0); val out = args(1)
    args.drop(2).foreach { n =>
      // materialize-then-coalesce, same reason as Verify: a bare
      // coalesce(1) single-threads the whole upstream plan
      SparkEntry.queries(n)(spark, dir).localCheckpoint(true).coalesce(1)
        .write.mode("overwrite").parquet(s"$out/$n")
      println(s"dumped $n")
    }
    val sqls = args.drop(2).map(n => s""""$n": ${ujsonEscape(SparkEntry.oracleSql(n))}""")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$out/oracle_sql.json"),
      s"{${sqls.mkString(",")}}".getBytes)
    spark.stop()
  }
  def ujsonEscape(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n") + "\""
}
