package graft.graph

import graft.SparkTestBase
import org.apache.spark.sql.functions._

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

/** The durable store's transactional property: concurrent MERGE batches on
  * the same path must not lose updates — the guarantee the reference gets
  * from Neo4j transactions (crwling.py:48, counters :61-64), enforced here
  * by the single-writer lease in GraphStore.
  */
class GraphStoreLeaseSpec extends SparkTestBase {
  import spark.implicits._

  private def nodeBatch(keys: Seq[String]) =
    keys.toDF("key").select(lit("Article").as("label"), col("key"),
      map(lit("title"), concat(lit("t-"), col("key"))).as("props"))

  test("two interleaved node upserts: no lost updates, counters sum correctly") {
    val store = java.nio.file.Files.createTempDirectory("graft_lease").toString
    val aKeys = (1 to 10).map(i => s"a$i") :+ "shared"
    val bKeys = (1 to 10).map(i => s"b$i") :+ "shared"
    val gate = new java.util.concurrent.CountDownLatch(1)
    def writer(keys: Seq[String]) = Future {
      gate.await()
      GraphStore.upsertNodes(spark, store, nodeBatch(keys))
    }
    val fa = writer(aKeys); val fb = writer(bKeys)
    gate.countDown() // release both at once — they race for the lease
    val (ca, cb) = (Await.result(fa, 120.seconds), Await.result(fb, 120.seconds))
    // whichever writer ran second saw the first's rows: exactly one of the
    // two observed "shared" as a match, so created totals the distinct keys
    assert(ca._1 + cb._1 === 21L, s"created counters $ca + $cb must sum to 21")
    assert(ca._2 + cb._2 === 1L, s"matched counters $ca + $cb must sum to 1")
    val nodes = spark.read.parquet(s"$store/nodes")
    assert(nodes.count() === 21L) // a second writer did NOT erase the first
    assert(nodes.filter($"key".startsWith("a")).count() === 10L)
    assert(nodes.filter($"key".startsWith("b")).count() === 10L)
    // the lease is released after the last commit
    assert(!new java.io.File(s"$store/_writer.lock").exists())
  }

  test("an active lease blocks a second writer until released") {
    val store = java.nio.file.Files.createTempDirectory("graft_lease2").toString
    val lock = new java.io.File(s"$store/_writer.lock")
    lock.getParentFile.mkdirs()
    assert(lock.createNewFile())
    lock.setLastModified(System.currentTimeMillis()) // fresh: must be honored
    val started = System.currentTimeMillis()
    val f = Future { GraphStore.upsertNodes(spark, store, nodeBatch(Seq("x"))) }
    Thread.sleep(1500)
    assert(!f.isCompleted, "writer must spin while the lease is held")
    assert(lock.delete()) // holder releases
    val counts = Await.result(f, 120.seconds)
    assert(counts === ((1L, 0L)))
    assert(System.currentTimeMillis() - started >= 1500)
    assert(spark.read.parquet(s"$store/nodes").count() === 1L)
  }

  test("a stale lease (crashed holder) is broken, not waited on forever") {
    val store = java.nio.file.Files.createTempDirectory("graft_lease3").toString
    val lock = new java.io.File(s"$store/_writer.lock")
    lock.getParentFile.mkdirs()
    assert(lock.createNewFile())
    assert(lock.setLastModified(
      System.currentTimeMillis() - GraphStore.LeaseStaleMs - 60000))
    val counts = GraphStore.upsertNodes(spark, store, nodeBatch(Seq("y")))
    assert(counts === ((1L, 0L)))
    assert(spark.read.parquet(s"$store/nodes").count() === 1L)
    assert(!lock.exists())
  }
}
