package graft

import org.apache.spark.sql.SparkSession

import graft.cypher.CypherSession
import graft.graph.{GraphStore, PropertyGraph}
import graft.server.{BoltServer, HttpQueryServer}

/** One-command service deployment — the repo's analog of the reference's
  * `start.sh` (a docker run exposing Bolt 7687 and HTTP 7474,
  * /root/reference/start.sh:4-6) plus its dotenv config
  * (/root/reference/src/config.py:1-8 loads NEO4J_* from a `.env` file):
  * ONE main boots both listeners over a persisted [[GraphStore]] and
  * flushes the store back on shutdown, so `sbt "runMain graft.Serve"` is
  * the whole deployment — a Bolt driver (langchain-neo4j, neo4j-python)
  * connects to 7687, the HTTP query API serves 7474.
  *
  * Config keys (a `.env` file; real environment variables win, as dotenv's
  * "existing env is never overridden" rule prescribes):
  *   - GRAFT_STORE_DIR   persisted GraphStore path (default /tmp/graft_store)
  *   - GRAFT_BOLT_PORT   Bolt listener port  (default 7687)
  *   - GRAFT_HTTP_PORT   HTTP query port     (default 7474)
  *   - GRAFT_MAX_ROWS    per-result row cap  (default 10000)
  *   - SPARK_MASTER      Spark master        (default local[32])
  * The `.env` path comes from argv(0), then $GRAFT_ENV_FILE, then `./.env`;
  * a missing file is fine (all keys default).
  */
object Serve {

  /** Parse a dotenv file: `KEY=VALUE` lines, `#` comments and blank lines
    * skipped, an optional `export ` prefix stripped, matching single or
    * double quotes around the value stripped. Entries from the real
    * environment override file entries (dotenv semantics — the file
    * supplies defaults, the environment wins). A missing file yields just
    * the environment. */
  def loadEnv(path: String,
      env: collection.Map[String, String] = sys.env): Map[String, String] = {
    val f = new java.io.File(path)
    val fileVals: Map[String, String] =
      if (!f.isFile) Map.empty
      else {
        val src = scala.io.Source.fromFile(f, "UTF-8")
        try src.getLines().flatMap { line0 =>
          val line = line0.trim
          if (line.isEmpty || line.startsWith("#")) None
          else {
            val body = if (line.startsWith("export ")) line.drop(7).trim else line
            body.indexOf('=') match {
              case i if i > 0 =>
                val k = body.substring(0, i).trim
                val v0 = body.substring(i + 1).trim
                val v =
                  if (v0.length >= 2 &&
                      ((v0.head == '"' && v0.last == '"') ||
                        (v0.head == '\'' && v0.last == '\'')))
                    v0.substring(1, v0.length - 1)
                  else v0
                Some(k -> v)
              case _ => None // not KEY=VALUE — ignored, as dotenv does
            }
          }
        }.toMap
        finally src.close()
      }
    fileVals ++ env
  }

  /** A running deployment: both listeners bound, the session shared. */
  final case class Booted(session: CypherSession, boltPort: Int,
      httpPort: Int, storeDir: String,
      private val bolt: BoltServer, private val http: HttpQueryServer) {
    /** Stop both listeners; `persist` flushes the session graph back to
      * the store dir (label-partitioned parquet — the durable layout). */
    def stop(persist: Boolean = true): Unit = {
      bolt.stop()
      http.stop()
      if (persist) GraphStore.write(session.graph, storeDir)
    }
  }

  /** Boot both servers over the configured store. Port 0 binds ephemeral
    * (specs); the defaults are the reference's published ports. */
  def boot(conf: Map[String, String], spark: SparkSession): Booted = {
    val storeDir = conf.getOrElse("GRAFT_STORE_DIR", "/tmp/graft_store")
    // Empty-graph fallback ONLY for a store that does not exist yet (first
    // boot). An EXISTING store that fails to read (corrupt file, FS hiccup,
    // partial write from a crashed writer) must fail the boot loudly: the
    // flush-on-exit overwrites the store dir, so booting empty over a
    // transient read failure would silently erase the data on shutdown.
    // Existence is PROBED, not caught (round 16, VERDICT r15 #7): catching
    // PATH_NOT_FOUND out of a failed Dataset analysis left a poisoned
    // QueryExecution behind whose cached failure Spark's ObservationManager
    // listener re-threw asynchronously on the execution-end event — the
    // ERROR-level ExecutionListenerBus traces in every later suite's log.
    val initial =
      if (GraphStore.exists(spark, s"$storeDir/nodes"))
        GraphStore.read(spark, storeDir)
      else PropertyGraph.empty(spark)
    val sess = new CypherSession(initial)
    val maxRows = conf.get("GRAFT_MAX_ROWS").map(_.toInt).getOrElse(10000)
    val bolt = new BoltServer(sess, maxRows)
    val http = new HttpQueryServer(sess, maxRows)
    val bp = bolt.start(conf.get("GRAFT_BOLT_PORT").map(_.toInt).getOrElse(7687))
    val hp =
      try http.start(conf.get("GRAFT_HTTP_PORT").map(_.toInt).getOrElse(7474))
      catch { case t: Throwable => bolt.stop(); throw t }
    Booted(sess, bp, hp, storeDir, bolt, http)
  }

  def main(args: Array[String]): Unit = {
    val envFile = args.headOption
      .orElse(sys.env.get("GRAFT_ENV_FILE")).getOrElse(".env")
    val conf = loadEnv(envFile)
    val spark = SparkSession.builder()
      .master(conf.getOrElse("SPARK_MASTER", "local[32]"))
      .appName("graft-serve")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val booted = boot(conf, spark)
    // flush-on-exit mirrors the Shell's save-on-quit; SIGTERM from a
    // container runtime lands here (the reference's docker stop path).
    // The flush is a Spark WRITE JOB, so it must run while the stack is
    // fully alive: a plain JVM shutdown hook races the parallel
    // Netty/Hadoop teardown hooks and the write dies under a closing
    // FileSystem (found live on the SIGTERM path — the store directory
    // was never written). Signal handlers run BEFORE JVM shutdown begins;
    // the Spark-manager hook stays as a backup for System.exit paths.
    val flushed = new java.util.concurrent.atomic.AtomicBoolean(false)
    def flushOnce(): Unit =
      if (flushed.compareAndSet(false, true)) {
        try {
          booted.stop(persist = true)
          println(s"graft serve: store flushed -> ${booted.storeDir}")
        } catch { case scala.util.control.NonFatal(t) =>
          System.err.println(s"graft serve: flush-on-exit failed: $t")
        }
      }
    org.apache.spark.util.GraftShutdownBridge.onSignal("TERM")(flushOnce())
    org.apache.spark.util.GraftShutdownBridge.onSignal("INT")(flushOnce())
    org.apache.spark.util.GraftShutdownBridge.addHook(80)(flushOnce())
    println(s"graft serve — bolt://127.0.0.1:${booted.boltPort}  " +
      s"http://127.0.0.1:${booted.httpPort}/query  store: ${booted.storeDir}")
    new java.util.concurrent.CountDownLatch(1).await()
  }
}
