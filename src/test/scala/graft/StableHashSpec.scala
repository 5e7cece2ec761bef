package graft

import graft.text.StableHash
import org.scalatest.funsuite.AnyFunSuite

/** Pins StableHash to reference values cross-validated against the
  * DuckDB SQL mirror (StableHash.hashes64Sql) — if either side changes,
  * the oracle parity of every hash-seeded query breaks, so these exact
  * longs are load-bearing.
  */
class StableHashSpec extends AnyFunSuite {

  // unsigned reference values from the DuckDB HUGEINT evaluation
  private val pinned = Seq(
    "hello" -> "3767173640193804509",
    "world" -> "11330743517387817124",
    "a" -> "12609935244270955673",
    "" -> "0",
    "the quick brown" -> "15983364626120109848",
    "123.45" -> "5886599063451695375",
    "it's" -> "18065736082844571732")

  test("hash64 matches the DuckDB HUGEINT mirror bit-for-bit") {
    pinned.foreach { case (s, expect) =>
      assert(java.lang.Long.toUnsignedString(StableHash.hash64(s)) == expect,
        s"hash64($s)")
    }
  }

  test("bucket is the unsigned remainder (HUGEINT % mirror)") {
    val expect = Seq(29, 36, 25, 0, 24, 15, 20)
    pinned.map(_._1).zip(expect).foreach { case (s, b) =>
      assert(StableHash.bucket(s, 64) == b, s"bucket($s)")
    }
  }

  test("simHash64 bit convention: MSB first, empty votes to all-zero") {
    val bits = graft.dedup.Dedup.simHash64(Seq("hello"))
    val h = StableHash.hash64("hello")
    (0 until 64).foreach { b =>
      assert(bits(b) == ((h >>> (63 - b)) & 1L).toInt)
    }
    assert(graft.dedup.Dedup.simHash64(Nil).forall(_ == 0))
  }

  test("avalanche: single-character change flips ~half the bits") {
    val d = java.lang.Long.bitCount(
      StableHash.hash64("hello") ^ StableHash.hash64("hellp"))
    assert(d >= 16 && d <= 48, s"bit distance $d out of avalanche range")
  }
}
