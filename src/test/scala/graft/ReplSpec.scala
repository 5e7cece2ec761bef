package graft

/** Scripted end-to-end drive of the interactive shell (reference
  * semantic.py:76-106): a fixed stdin script exercises the rank-list
  * display, every `rank N` guard branch (valid switch, out-of-bounds,
  * non-digit, >Int.MaxValue digit run), the RAG answer path, and exit.
  * The transcript is asserted structurally (the ranked titles are
  * data-derived) and for determinism (two runs, identical bytes).
  */
class ReplSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def transcript(script: String): String = {
    val in = new java.io.BufferedReader(new java.io.StringReader(script))
    val bytes = new java.io.ByteArrayOutputStream()
    val out = new java.io.PrintStream(bytes, true, "UTF-8")
    Repl.run(spark, sf, in, out)
    out.flush()
    new String(bytes.toByteArray, "UTF-8")
  }

  private val script = Seq(
    "rank 2",            // valid focus switch
    "rank 99",           // out of bounds
    "rank 99999999999",  // digits past Int range: bounds message, no crash
    "rank xx",           // non-digit
    "what is the price", // RAG answer over the focused product
    "exit").mkString("\n")

  test("scripted session walks every branch of the reference loop") {
    val t = transcript(script)
    assert(t.contains("Top Recommended Items:"), t.take(500))
    val rankLines = t.linesIterator.count(_.startsWith("Rank: "))
    assert(rankLines == 10, s"expected 10 ranked rows, got $rankLines")
    assert(t.contains("Now focusing on the product at rank 1, which is "))
    assert(t.contains("Now focusing on the product at rank 2, which is "))
    assert(t.contains("Please choose a number between 1 and 10."))
    // the bounds message fires for BOTH 99 and the >Int.MaxValue run
    assert(t.sliding("Please choose a number between 1 and 10.".length)
      .count(_ == "Please choose a number between 1 and 10.") == 2)
    assert(t.contains("please input a number."))
    assert(t.contains("RAG Answer:"))
    assert(t.contains("type 'exit' to end this procedure"))
    // one prompt per script line (6), plus none after exit
    assert(t.split("> ", -1).length - 1 == 6, t.takeRight(300))
  }

  test("the scripted session is deterministic run-to-run") {
    assert(transcript(script) == transcript(script))
  }
}
