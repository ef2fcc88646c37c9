package graft.cypher

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Review probe: does a MATCH-driven `CREATE (a)-[:T]->(b)` invalidate a
  * relationship index on T, or does the write lineage wrongly scope it out? */
class ReviewProbeSpec extends SparkTestBase {
  import spark.implicits._

  private def freshSession = new CypherSession(
    graft.graph.PropertyGraph.empty(spark),
    keyProps = Map("User" -> "name", "Tech" -> "name"))

  test("review probe: CREATE edge invalidates relationship index") {
    val sess = freshSession
    sess.run("""MERGE (u:User {name: 'alice'}) MERGE (t:Tech {name: 'spark'})
               |MERGE (u)-[:INTERESTED_IN {note: 'loves spark', w: '1.0,0.0'}]->(t)""".stripMargin)
    sess.run("""CREATE VECTOR INDEX rvi FOR ()-[r:INTERESTED_IN]-() ON r.w
               |OPTIONS {indexConfig: {`vector.dimensions`: 2}}""".stripMargin)
    def count(): Long = sess.run(
      "CALL db.index.vector.queryRelationships('rvi', 10, $q) " +
        "YIELD relationship, score RETURN score",
      Map("q" -> Seq(1.0, 0.0)))
      .asInstanceOf[CypherRows].df.count()
    assert(count() === 1)
    // MATCH-driven CREATE of a new edge of the INDEXED type
    sess.run("MERGE (b:User {name: 'bob'})")
    sess.run("MATCH (a:User {name: 'bob'}) MATCH (t:Tech {name: 'spark'}) " +
      "CREATE (a)-[:INTERESTED_IN {note: 'new', w: '2.0,0.0'}]->(t)")
    assert(sess.run("MATCH ()-[r:INTERESTED_IN]->() RETURN count(r) AS n")
      .asInstanceOf[CypherRows].df.as[Long].collect().head === 2L)
    assert(count() === 2, "relationship index must see the CREATEd edge")
  }
}
