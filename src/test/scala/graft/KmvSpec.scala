package graft

import graft.sketch.{KmvAgg, KmvBuf}
import graft.text.StableHash
import org.scalatest.funsuite.AnyFunSuite

class KmvSpec extends AnyFunSuite {

  private def run(k: Int, xs: Seq[Long], splits: Int = 4) = {
    val agg = new KmvAgg(k)
    val parts = xs.grouped(math.max(1, xs.length / splits)).toSeq
    val bufs = parts.map(_.foldLeft(agg.zero)(agg.reduce))
    agg.finish(bufs.foldLeft(agg.zero)(agg.merge))
  }

  test("sketch kth equals kth smallest distinct value") {
    val xs = Seq[Long](9, 3, 7, 3, -5, 11, 7, 0, -5, 20, 15, 2)
    val distinctSorted = xs.distinct.sorted
    val r = run(4, xs)
    assert(r.kEff == 4)
    assert(r.kth == distinctSorted(3))
  }

  test("fewer distinct values than k: keeps them all") {
    val r = run(10, Seq[Long](5, 1, 5, 1, 3))
    assert(r.kEff == 3)
    assert(r.kth == 5)
  }

  test("merge order does not change the result") {
    val xs = (1 to 200).map(i => StableHash.hash64(s"v$i"))
    val a = run(32, xs, splits = 1)
    val b = run(32, xs, splits = 7)
    val c = run(32, xs.reverse, splits = 3)
    assert(a == b && b == c)
    assert(a.kth == xs.distinct.sorted.apply(31))
  }

  test("estimate lands near the true cardinality for uniform hashes") {
    val n = 5000
    val xs = (1 to n).map(i => StableHash.hash64(s"user:$i"))
    val r = run(64, xs)
    val u = (r.kth.toDouble + 9.223372036854775808e18) / 1.8446744073709551616e19
    val est = (r.kEff - 1) / u
    assert(math.abs(est - n) / n < 0.30, s"est=$est n=$n")
  }

  test("duplicate-heavy stream never inflates the sketch") {
    val xs = Seq.fill(1000)(Seq[Long](1, 2, 3)).flatten
    val r = run(8, xs)
    assert(r == run(8, Seq(1L, 2L, 3L)))
  }

  test("merge with empty buffer is identity") {
    val agg = new KmvAgg(4)
    val b = Seq(5L, 1L, 9L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(b, agg.zero).hs.toSeq == b.hs.toSeq)
    assert(agg.merge(agg.zero, b).hs.toSeq == b.hs.toSeq)
    assert(agg.merge(agg.zero, agg.zero) == KmvBuf(Array.emptyLongArray))
  }
}
