package graft

import graft.rank.MMR
import graft.rank.MMR.Candidate
import org.scalatest.funsuite.AnyFunSuite

/** Greedy MMR on hand-checkable fixtures (reference: rank.py:291-325). */
class MMRSpec extends AnyFunSuite {

  test("diversification displaces a redundant higher-scored candidate") {
    val cands = Seq(
      Candidate(1, 0.90, Array(1.0, 0.0)),
      Candidate(2, 0.85, Array(1.0, 0.0)), // duplicate direction of 1
      Candidate(3, 0.50, Array(0.0, 1.0)))
    val picked = MMR.select(cands, k = 2, lambda = 0.66)
    // second pick: c2 = .66*.85-.34*1 = .221 < c3 = .66*.5-0 = .33
    assert(picked.map(_.id) == Seq(1, 3))
  }

  test("lambda=1 reduces to plain score order") {
    val cands = Seq(
      Candidate(1, 0.2, Array(1.0, 0.0)),
      Candidate(2, 0.9, Array(1.0, 0.0)),
      Candidate(3, 0.5, Array(1.0, 0.0)))
    assert(MMR.select(cands, k = 3, lambda = 1.0).map(_.id) == Seq(2, 3, 1))
  }

  test("k larger than input returns a permutation of all candidates") {
    val cands = Seq(
      Candidate(1, 0.3, Array(1.0, 0.0)),
      Candidate(2, 0.2, Array(0.0, 1.0)))
    val picked = MMR.select(cands, k = 10)
    assert(picked.map(_.id).sorted == Seq(1L, 2L))
  }

  test("empty input yields empty output") {
    assert(MMR.select(Nil, 3).isEmpty)
  }

  test("first pick is pure relevance regardless of vectors") {
    val cands = Seq(
      Candidate(1, 0.1, Array(1.0, 0.0)),
      Candidate(2, 0.9, Array(1.0, 0.0)))
    assert(MMR.select(cands, 1).map(_.id) == Seq(2))
  }
}
