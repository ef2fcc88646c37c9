package graft

import java.io.{BufferedReader, ByteArrayOutputStream, PrintStream, StringReader}

import graft.cypher.CypherSession
import graft.graph.{GraphStore, PropertyGraph}
import org.apache.spark.sql.functions._

/** Drives the interactive shell loop with a scripted session — the
  * smoke-test equivalent of typing into the reference's port-7474 browser
  * (/root/reference/cypher.txt:1-8). */
class ShellSpec extends SparkTestBase {

  private def runShell(script: String,
      persistTo: Option[String] = None): (Int, String) = {
    val sess = new CypherSession(PropertyGraph.empty(spark),
      clock = () => lit("2026-01-01 00:00:00"))
    val bytes = new ByteArrayOutputStream()
    val out = new PrintStream(bytes, true, "UTF-8")
    val n = Shell.repl(sess, new BufferedReader(new StringReader(script)),
      out, persistTo)
    (n, bytes.toString("UTF-8"))
  }

  test("multi-statement session: MERGE counters, read-back table, :help") {
    val script =
      """:help
        |MERGE (u:User {name: 'Beomzh'})
        |MERGE (t:Tech {name: 'GraphRAG'})
        |MERGE (u)-[:INTERESTED_IN]->(t);
        |MATCH (u:User)-[r:INTERESTED_IN]->(t:Tech)
        |RETURN u.name AS user, t.name AS tech;
        |:quit
        |""".stripMargin
    val (n, outStr) = runShell(script)
    assert(n === 2, outStr)
    assert(outStr.contains("Commands:"), outStr)
    assert(outStr.contains("nodes created: 2"), outStr)
    assert(outStr.contains("Beomzh"), outStr)
    assert(outStr.contains("GraphRAG"), outStr)
    assert(outStr.contains("1 row(s)"), outStr)
  }

  test("statements span lines and split quote-aware; errors don't kill the loop") {
    val script =
      """MERGE (a:Article {link: 'http://x/1; with a semicolon'})
        |SET a.title = 'T1';
        |THIS IS NOT CYPHER;
        |MATCH (a:Article) RETURN a.title AS title;
        |""".stripMargin
    val (n, outStr) = runShell(script)
    assert(n === 2, outStr) // the bad statement errored, the rest ran
    assert(outStr.contains("error:"), outStr)
    assert(outStr.contains("T1"), outStr)
  }

  test("exit persists the graph to the store path and it reads back") {
    val store = java.nio.file.Files.createTempDirectory("graft_shell").toString
    val script =
      """MERGE (u:User {name: 'w1'}) MERGE (t:Tech {name: 'spark'})
        |MERGE (u)-[:INTERESTED_IN]->(t);
        |""".stripMargin
    val (n, outStr) = runShell(script, persistTo = Some(store))
    assert(n === 1)
    assert(outStr.contains(s"saved -> $store"), outStr)
    val g = GraphStore.read(spark, store)
    assert(g.nodes.count() === 2)
    assert(g.edges.count() === 1)
  }
}
