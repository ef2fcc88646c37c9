package graft.server

import graft.SparkTestBase
import graft.cypher.CypherSession
import graft.graph.PropertyGraph
import org.apache.spark.sql.functions._

/** Loopback-drives the HTTP query endpoint end to end: write statements
  * with parameters, read-back with rows, statement errors, and the
  * streamed-row cap. No external egress — JDK HttpServer on 127.0.0.1. */
class HttpQueryServerSpec extends SparkTestBase {

  private def post(port: Int, body: String): (Int, String) = {
    val conn = new java.net.URL(s"http://127.0.0.1:$port/query")
      .openConnection().asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.setRequestProperty("Content-Type", "application/json")
    conn.getOutputStream.write(body.getBytes("UTF-8"))
    val code = conn.getResponseCode
    val in = if (code < 400) conn.getInputStream else conn.getErrorStream
    val out = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    conn.disconnect()
    (code, out)
  }

  test("POST /query: parameterized writes, read-back rows, counters, errors") {
    val sess = new CypherSession(PropertyGraph.empty(spark),
      clock = () => lit("2026-01-01 00:00:00"))
    val server = new HttpQueryServer(sess)
    val port = server.start()
    try {
      // parameterized MERGE (the reference's kwargs convention over the wire)
      val (wc, wbody) = post(port,
        """{"statements": [
          |  {"statement": "MERGE (u:User {name: $n}) MERGE (t:Tech {name: $t}) MERGE (u)-[:INTERESTED_IN]->(t)",
          |   "parameters": {"n": "ada", "t": "spark"}}
          |]}""".stripMargin)
      assert(wc == 200, wbody)
      assert(wbody.contains("nodesCreated"))

      // read-back: columns + rows in Neo4j HTTP shape
      val (rc, rbody) = post(port,
        """{"statements": [{"statement":
          |  "MATCH (u:User)-[:INTERESTED_IN]->(t:Tech) RETURN u.name AS user, t.name AS tech"}]}"""
          .stripMargin)
      assert(rc == 200, rbody)
      assert(rbody.contains(""""columns":["user","tech"]"""))
      assert(rbody.contains(""""row":["ada","spark"]"""))

      // two statements in one request run in order against the same graph
      val (mc, mbody) = post(port,
        """{"statements": [
          |  {"statement": "MERGE (t:Tech {name: 'flink'})"},
          |  {"statement": "MATCH (t:Tech) RETURN count(*) AS n"}
          |]}""".stripMargin)
      assert(mc == 200, mbody)
      assert(mbody.contains(""""row":[2]"""), mbody)

      // a broken statement answers 200 with the in-band errors array
      // (Neo4j's contract: clients check `errors`, not the status code)
      val (ec, ebody) = post(port,
        """{"statements": [{"statement": "THIS IS NOT CYPHER"}]}""")
      assert(ec == 200)
      assert(ebody.contains("Neo.ClientError"))
    } finally server.stop()
  }

  test("multi-statement failure: earlier writes persist, offset names the failure, later statements don't run") {
    val sess = new CypherSession(PropertyGraph.empty(spark),
      clock = () => lit("2026-01-01 00:00:00"))
    val server = new HttpQueryServer(sess)
    val port = server.start()
    try {
      // stmt 0 writes, stmt 1 fails, stmt 2 would write again — the
      // documented no-rollback contract: exactly one result (stmt 0), an
      // error with offset 1, and stmt 2's node must NOT exist
      val (c, body) = post(port,
        """{"statements": [
          |  {"statement": "MERGE (t:Tech {name: 'ray'})"},
          |  {"statement": "NOT CYPHER AT ALL"},
          |  {"statement": "MERGE (t:Tech {name: 'never'})"}
          |]}""".stripMargin)
      assert(c == 200, body)
      assert(body.contains(""""offset":1"""), body)
      assert(body.split("\\\"stats\\\"").length - 1 == 1,
        s"expected exactly one executed statement result: $body")
      val (_, after) = post(port,
        """{"statements": [{"statement":
          |  "MATCH (t:Tech) RETURN t.name AS name ORDER BY name"}]}""".stripMargin)
      assert(after.contains(""""row":["ray"]"""), after)
      assert(!after.contains("never"), "a statement after the failure ran")

      // malformed request body: in-band InvalidFormat error, still 200
      val (mc, mbody) = post(port, """{"nope": true}""")
      assert(mc == 200)
      assert(mbody.contains("Neo.ClientError.Request.InvalidFormat"), mbody)

      // non-POST: out-of-band 405
      val conn = new java.net.URL(s"http://127.0.0.1:$port/query")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("GET")
      assert(conn.getResponseCode == 405)
      conn.disconnect()
    } finally server.stop()
  }

  test("row cap: a huge result truncates instead of buffering unbounded") {
    val sess = new CypherSession(PropertyGraph.empty(spark),
      clock = () => lit("2026-01-01 00:00:00"))
    val server = new HttpQueryServer(sess, maxRows = 5)
    val port = server.start()
    try {
      val (c, body) = post(port,
        """{"statements": [{"statement": "UNWIND range(1, 100) AS i RETURN i"}]}""")
      assert(c == 200)
      assert(body.contains(""""truncated":true"""))
      assert(body.split("\\\"row\\\"").length - 1 == 5)
    } finally server.stop()
  }
}
