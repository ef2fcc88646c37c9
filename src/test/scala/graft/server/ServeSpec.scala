package graft.server

import graft.{Serve, SparkTestBase}
import graft.server.PackStream.Struct

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** Drives the one-command deployment (`graft.Serve`) end to end: dotenv
  * config, BOTH listeners from one boot, a Cypher write arriving over the
  * Bolt wire read back through the HTTP query API, and the store flushing
  * to disk on stop so a re-boot serves the same graph — the reference's
  * start.sh + .env deployment shape (/root/reference/start.sh:4-6,
  * /root/reference/src/config.py:1-8). */
class ServeSpec extends SparkTestBase {

  // ---- minimal Bolt client (same wire shape BoltServerSpec proves) ------
  private final class Client(port: Int) {
    private val sock = new Socket("127.0.0.1", port)
    private val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
    private val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
    def handshake(): Unit = {
      out.write(Array[Byte](0x60, 0x60, 0xB0.toByte, 0x17))
      // one proposal: Bolt 5.0 ([pad, range=0, minor=0, major=5])
      Seq(0x00000005, 0, 0, 0).foreach(out.writeInt)
      out.flush()
      val v = in.readInt()
      require(v != 0, "handshake rejected")
    }
    def send(tag: Int, fields: Any*): Unit = {
      val body = new ByteArrayOutputStream()
      PackStream.write(new DataOutputStream(body), Struct(tag.toByte, fields))
      val bytes = body.toByteArray
      out.writeShort(bytes.length); out.write(bytes); out.writeShort(0); out.flush()
    }
    def recv(): Struct = {
      val buf = new ByteArrayOutputStream()
      var done = false
      while (!done) {
        val size = in.readUnsignedShort()
        if (size == 0 && buf.size() > 0) done = true
        else if (size > 0) {
          val chunk = new Array[Byte](size); in.readFully(chunk); buf.write(chunk)
        }
      }
      PackStream.read(new DataInputStream(new ByteArrayInputStream(buf.toByteArray)))
        .asInstanceOf[Struct]
    }
    def close(): Unit = sock.close()
  }

  private def httpQuery(port: Int, statement: String): String = {
    val url = new java.net.URL(s"http://127.0.0.1:$port/query")
    val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    val payload =
      s"""{"statements": [{"statement": ${com.fasterxml.jackson.databind.json.JsonMapper.builder().build().writeValueAsString(statement)}}]}"""
    conn.getOutputStream.write(payload.getBytes(StandardCharsets.UTF_8))
    conn.getOutputStream.close()
    val body = new String(conn.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
    conn.disconnect()
    body
  }

  test("dotenv parsing: comments, export prefix, quotes, env-wins override") {
    val f = Files.createTempFile("graftenv", ".env")
    Files.write(f,
      """# deployment config
        |GRAFT_BOLT_PORT=7777
        |export GRAFT_HTTP_PORT="8888"
        |GRAFT_STORE_DIR='/data/store'
        |BROKEN LINE WITHOUT EQUALS
        |
        |SPARK_MASTER=local[4]
        |""".stripMargin.getBytes(StandardCharsets.UTF_8))
    val conf = Serve.loadEnv(f.toString,
      env = Map("GRAFT_HTTP_PORT" -> "9999"))
    assert(conf("GRAFT_BOLT_PORT") === "7777")
    assert(conf("GRAFT_HTTP_PORT") === "9999",
      "a real environment variable must win over the file entry")
    assert(conf("GRAFT_STORE_DIR") === "/data/store")
    assert(conf("SPARK_MASTER") === "local[4]")
    assert(!conf.contains("BROKEN LINE WITHOUT EQUALS"))
    // a missing file is fine — just the environment
    assert(Serve.loadEnv("/nonexistent/.env", env = Map("A" -> "b")) ===
      Map("A" -> "b"))
    Files.deleteIfExists(f)
  }

  test("round-13: concurrent writers never lose updates — the session " +
      "write lock serializes mutations (Neo4j's transactional guarantee)") {
    // two Bolt clients and an HTTP client all write through ONE session;
    // without the write lock each statement computes `new = graph+batch`
    // from a possibly-stale instance and the last `graph = new` drops the
    // others' rows. 12 threads × 3 MERGEs = 36 distinct keys, all of
    // which must land.
    val dir = Files.createTempDirectory("graft_serve_conc").toString + "/g"
    val conf = Map("GRAFT_STORE_DIR" -> dir,
      "GRAFT_BOLT_PORT" -> "0", "GRAFT_HTTP_PORT" -> "0")
    val b = Serve.boot(conf, spark)
    try {
      val threads = (0 until 12).map { t =>
        new Thread(() => {
          val c = new Client(b.boltPort)
          c.handshake()
          c.send(0x01, Map("user_agent" -> s"writer-$t"))
          c.recv()
          (0 until 3).foreach { i =>
            c.send(0x10, s"MERGE (a:Article {link: 'w$t-$i'})",
              Map.empty[String, Any], Map.empty[String, Any])
            c.recv()
            c.send(0x3F, Map("n" -> -1L))
            var s = c.recv()
            while ((s.tag & 0xFF) == 0x71) s = c.recv()
          }
          c.send(0x02); c.close()
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join(120000))
      val body = httpQuery(b.httpPort,
        "MATCH (a:Article) RETURN count(a) AS n")
      assert(body.contains("[36]") || body.contains("\"row\":[36]"), body)
    } finally b.stop(persist = false)
  }

  test("one boot serves Bolt AND HTTP over a persisted store; the flush " +
      "survives a re-boot") {
    val dir = Files.createTempDirectory("graft_serve_store").toString + "/g"
    val conf = Map("GRAFT_STORE_DIR" -> dir,
      "GRAFT_BOLT_PORT" -> "0", "GRAFT_HTTP_PORT" -> "0")
    val b1 = Serve.boot(conf, spark)
    try {
      // write through the BOLT wire
      val c = new Client(b1.boltPort)
      c.handshake()
      c.send(0x01, Map("user_agent" -> "serve-spec/1.0")) // HELLO
      assert((c.recv().tag & 0xFF) == 0x70)
      c.send(0x10,
        "MERGE (a:Article {link: 'http://x/1'}) SET a.title = 'Hello Graft'",
        Map.empty[String, Any], Map.empty[String, Any]) // RUN
      assert((c.recv().tag & 0xFF) == 0x70)
      c.send(0x3F, Map("n" -> -1L)) // PULL
      val sum = c.recv()
      assert((sum.tag & 0xFF) == 0x70, sum)
      c.send(0x02); c.close() // GOODBYE
      // read back through the HTTP query API — same process, same session
      val body = httpQuery(b1.httpPort,
        "MATCH (a:Article) RETURN a.title AS title")
      assert(body.contains("\"Hello Graft\""), body)
      assert(body.contains("\"errors\":[]") || body.contains("\"errors\": []"),
        body)
    } finally b1.stop(persist = true)
    // the store flushed on stop: a fresh boot serves the written graph
    val b2 = Serve.boot(conf, spark)
    try {
      val body2 = httpQuery(b2.httpPort,
        "MATCH (a:Article {link: 'http://x/1'}) RETURN a.title AS title")
      assert(body2.contains("\"Hello Graft\""), body2)
    } finally b2.stop(persist = false)
  }
}
