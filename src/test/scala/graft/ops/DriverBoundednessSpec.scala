package graft.ops

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Lint-spec for driver-boundedness (VERDICT r13 #7): every
  * `.collect()` / `.toLocalIterator()` in src/main materializes rows on
  * the driver — at 100 TB an unbounded one is an OOM, and round 13's only
  * near-miss (s13's corpus-fraction batch collect) is exactly the class a
  * grep-based gate catches at review time instead of at scale.
  *
  * The contract: a driver-materializing call is legal iff it is
  *  - structurally bounded on its own line (a literal `.limit(<n>)`
  *    immediately feeding `.collect()`), or
  *  - annotated within the six preceding lines (or its own) by a comment
  *    containing `bounded` that names WHAT bounds it
  *    (`// bounded: <what bounds it>`).
  * Anything else fails this spec, so a new unbounded site cannot land
  * without either a bound or an explicit, reviewable claim. */
class DriverBoundednessSpec extends AnyFunSuite {

  private val callRe = """\.collect\(\)|\.toLocalIterator\(\)""".r
  private val selfBoundedRe = """.*\.limit\(\d+\)\s*\.collect\(\).*"""
  /** The annotation TAG form, not a bare substring (ADVICE r14: an
    * identifier like `unbounded` or an unrelated comment must not
    * silence the check): `bounded:` inside a `//` or block-comment
    * line. `\bbounded:` rejects `unbounded:` via the word boundary. */
  private val boundedTagRe =
    """(?i).*(//|/\*|^\s*\*).*\bbounded:.*""".r

  /** Pure checker so the spec can also prove it goes RED: returns the
    * (1-based line, text) of every unjustified driver-materializing call. */
  def offenders(lines: Seq[String]): Seq[(Int, String)] =
    lines.zipWithIndex.flatMap { case (line, i) =>
      val trimmed = line.trim
      val isComment = trimmed.startsWith("//") || trimmed.startsWith("*") ||
        trimmed.startsWith("/*")
      if (isComment || callRe.findFirstIn(line).isEmpty) None
      else if (line.matches(selfBoundedRe)) None
      else {
        val window = lines.slice(math.max(0, i - 6), i + 1)
        if (window.exists(l => boundedTagRe.matches(l))) None
        else Some((i + 1, trimmed))
      }
    }

  test("round-14: every driver-materializing site in src/main is bounded " +
      "or carries a `bounded:` justification") {
    val mainRoot = Paths.get("src/main/scala")
    assume(Files.isDirectory(mainRoot), "run from the repo root")
    val bad: Seq[String] = Files.walk(mainRoot).iterator().asScala
      .filter(_.toString.endsWith(".scala")).toSeq.sortBy(_.toString)
      .flatMap { p: Path =>
        offenders(Files.readAllLines(p).asScala.toSeq)
          .map { case (ln, txt) => s"$p:$ln: $txt" }
      }
    assert(bad.isEmpty,
      "unjustified driver-side materialization — add the bound or a " +
        "`// bounded: <what bounds it>` comment within 6 lines:\n" +
        bad.mkString("\n"))
  }

  test("the checker itself goes red on an untagged collect and stays " +
      "green on the two legal forms") {
    assert(offenders(Seq("val x = df.collect()")) ===
      Seq((1, "val x = df.collect()")))
    assert(offenders(Seq("val x = df.limit(1).collect()")).isEmpty,
      "a literal same-line limit is self-bounding")
    assert(offenders(Seq(
      "// bounded: k query vectors, k <= 8",
      "val x = df.collect()")).isEmpty,
      "a bounded: annotation within the window justifies the site")
    assert(offenders(Seq(
      "// bounded: first call",
      "val a = df.collect()",
      "", "", "", "", "", "",
      "val b = df.collect()")).nonEmpty,
      "an annotation must be within SIX lines — it never carries farther")
    assert(offenders(Seq("// a comment mentioning .collect() only")).isEmpty,
      "comment lines are not call sites")
    assert(offenders(Seq(
      "val unbounded = true // handles the unbounded case",
      "val x = df.collect()")).nonEmpty,
      "ADVICE r14: a bare 'unbounded' identifier or prose must NOT " +
        "silence the check — only the 'bounded:' tag form does")
    assert(offenders(Seq(
      "val x = df.collect() // something bounded happened",
      "")).nonEmpty,
      "prose containing 'bounded' without the colon tag is not a claim")
    assert(offenders(Seq(
      "  * bounded: k probe rows inside scaladoc",
      "val x = df.collect()")).isEmpty,
      "a block-comment continuation line carries the tag too")
  }
}
