package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("salted join equals the plain join on a skewed key distribution") {
    // one giant key (0) and a tail — the shape salting exists for
    val left = spark.range(2000)
      .select((when($"id" < 1500, 0L).otherwise($"id")).as("k"), $"id".as("l"))
    val right = Seq((0L, "hot"), (1600L, "cold"), (1700L, "cold2")).toDF("k", "tag")

    val plain = left.join(right, Seq("k")).select("k", "l", "tag")
    val salted = SkewJoin.saltedInner(left, right, Seq("k"), salt = 8)
      .select("k", "l", "tag")

    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salt spreads a hot key of IDENTICAL duplicate rows across buckets") {
    // content-identical rows — a content hash would give them all one salt
    val left = spark.range(1000).select(lit(0L).as("k"), lit("same").as("l"))
    val salts = left.withColumn("__salt",
        pmod(monotonically_increasing_id(), lit(8L)).cast("int"))
      .select(countDistinct($"__salt")).as[Long].head()
    assert(salts === 8)
  }

  test("salted join works on unhashable column types (map columns)") {
    val left = spark.range(100)
      .select((when($"id" < 80, 0L).otherwise($"id")).as("k"),
        map(lit("a"), $"id").as("m"))
    val right = Seq((0L, "hot")).toDF("k", "tag")
    val plain = left.join(right, Seq("k")).select("k", "tag")
    val salted = SkewJoin.saltedInner(left, right, Seq("k"), salt = 4)
      .select("k", "tag")
    assert(salted.count() === plain.count())
  }
}
