package graft.sketch

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Result of a KMV pass over one group: how many values the sketch holds
  * (`kEff`, = min(k, distinct inputs)) and the kEff-th smallest distinct
  * hash (signed 64-bit order).
  */
case class KmvResult(kEff: Long, kth: Long)

/** Buffer: the up-to-k smallest DISTINCT hashes seen so far, sorted
  * ascending.
  */
case class KmvBuf(hs: Array[Long])

/** K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002) as a
  * typed Aggregator — the cardinality-estimation primitive of the
  * HLL/theta family, chosen over HLL because its estimate is an exact
  * deterministic function of the input hash set and therefore
  * DuckDB-oracle-checkable (kth smallest distinct hash is pure SQL).
  *
  * Scale shape: contrast with `distinct().groupBy(...)` + full sort —
  * that shuffles EVERY distinct value. This aggregator keeps a bounded
  * k-array per partition (map-side combine), so only ≤ k longs per
  * partition per group cross the wire, regardless of input size: the
  * 100 TB-safe plan. Estimate for uniform hashes: (kEff-1) / u_k where
  * u_k is the kth value normalized to [0,1).
  */
class KmvAgg(k: Int) extends Aggregator[Long, KmvBuf, KmvResult] {

  override def zero: KmvBuf = KmvBuf(Array.emptyLongArray)

  /** Insert h keeping the array the sorted set of ≤ k smallest values. */
  override def reduce(b: KmvBuf, h: Long): KmvBuf = {
    val hs = b.hs
    val pos = java.util.Arrays.binarySearch(hs, h)
    if (pos >= 0) b // already present
    else {
      val ins = -pos - 1
      if (hs.length < k) {
        val out = new Array[Long](hs.length + 1)
        System.arraycopy(hs, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(hs, ins, out, ins + 1, hs.length - ins)
        KmvBuf(out)
      } else if (ins >= k) b // larger than current kth: not in sketch
      else {
        val out = hs.clone()
        System.arraycopy(hs, ins, out, ins + 1, k - ins - 1)
        out(ins) = h
        KmvBuf(out)
      }
    }
  }

  /** Sorted-merge two sketches, dropping duplicates, keeping k smallest. */
  override def merge(x: KmvBuf, y: KmvBuf): KmvBuf = {
    if (x.hs.isEmpty) y
    else if (y.hs.isEmpty) x
    else {
      val out = new Array[Long](math.min(k, x.hs.length + y.hs.length))
      var i = 0; var j = 0; var n = 0
      while (n < out.length && (i < x.hs.length || j < y.hs.length)) {
        val takeX = j >= y.hs.length || (i < x.hs.length && x.hs(i) <= y.hs(j))
        val v = if (takeX) x.hs(i) else y.hs(j)
        if (takeX) i += 1 else j += 1
        if (i <= x.hs.length && j <= y.hs.length &&
          (n == 0 || out(n - 1) != v)) { out(n) = v; n += 1 }
      }
      KmvBuf(if (n == out.length) out else java.util.Arrays.copyOf(out, n))
    }
  }

  override def finish(b: KmvBuf): KmvResult =
    if (b.hs.isEmpty) KmvResult(0L, 0L)
    else KmvResult(b.hs.length.toLong, b.hs(b.hs.length - 1))

  override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
  override def outputEncoder: Encoder[KmvResult] = Encoders.product[KmvResult]
}
