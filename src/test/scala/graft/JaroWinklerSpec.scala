package graft

import graft.text.JaroWinkler
import org.scalatest.funsuite.AnyFunSuite

/** Pins JaroWinkler.sim to reference values probed from DuckDB 1.0's
  * `jaro_winkler_similarity` (the q214 oracle function) — the pinned
  * set exercises every branch: empty sides, the zero-window short
  * strings, transposition counting (integer-halved, RapidFuzz
  * convention), the 0.7 boost threshold (prefix present but jaro
  * below threshold → NO boost), and the 4-char prefix cap.
  */
class JaroWinklerSpec extends AnyFunSuite {

  private val eps = 1e-12

  private val pinned = Seq(
    ("martha", "marhta", 0.9611111111111111), // classic Winkler example
    ("DWAYNE", "DUANE", 0.8400000000000001),
    ("CRATE", "TRACE", 0.7333333333333334), // boost-eligible, prefix 0
    ("abcdef", "abzzzz", 0.5555555555555555), // prefix 2 but jaro<0.7: no boost
    ("abcdefgh", "abwxyzzz", 0.5),
    ("aXcde", "aYcde", 0.88),
    ("abab", "baba", 0.8333333333333334), // pure transpositions
    ("ab", "ba", 0.0), // window 0: no cross-position matches
    ("abcd", "abcde", 0.96),
    ("abcdx", "abcdy", 0.92), // 4-char prefix cap
    ("aZZZZZZb", "ab", 0.5416666666666666),
    ("a", "a", 1.0),
    ("a", "b", 0.0),
    ("", "", 0.0), // DuckDB convention: empty is never similar
    ("abc", "", 0.0),
    ("aaaa", "aaaa", 1.0),
    // non-ASCII: the comparison unit is the UTF-8 BYTE, like DuckDB —
    // a UTF-16 char walk gives 0.88 on the first pair, not 0.9111…
    ("héllo", "hállo", 0.9111111111111112),
    ("café", "cafe", 0.8483333333333334),
    ("naïve", "naive", 0.8577777777777779),
    ("über", "uber", 0.7833333333333333),
    ("日本語", "日本誤", 0.9555555555555556),
    ("Müller", "Mueller", 0.8285714285714287))

  test("sim matches DuckDB jaro_winkler_similarity on the pinned set") {
    pinned.foreach { case (a, b, expect) =>
      assert(math.abs(JaroWinkler.sim(a, b) - expect) < eps, s"sim($a, $b)")
    }
  }

  test("sim is symmetric and bounded on the pinned inputs") {
    for ((a, b, _) <- pinned) {
      val s = JaroWinkler.sim(a, b)
      assert(math.abs(s - JaroWinkler.sim(b, a)) < eps, s"symmetry($a, $b)")
      assert(s >= 0.0 && s <= 1.0)
    }
  }
}
