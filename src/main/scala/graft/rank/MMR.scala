package graft.rank

/** Greedy Maximal-Marginal-Relevance diversification (reference:
  * rank.py:291-325). Inherently sequential (each pick depends on all
  * previous picks), so it runs driver-side on the collected top-K
  * candidate set (≤200 rows × small vectors) — the same
  * collect-then-iterate boundary the reference uses, and the only
  * non-distributed step in the ranking pipeline.
  */
object MMR {
  final case class Candidate(id: Long, score: Double, vec: Array[Double])

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  private def l2normalize(v: Array[Double], eps: Double = 1e-9): Array[Double] = {
    val n = math.sqrt(dot(v, v)) + eps
    v.map(_ / n)
  }

  /** Selects up to k candidates maximizing
    * `λ·relevance − (1−λ)·max cosine-to-selected`; first pick is pure
    * relevance (rank.py:304-305). Vectors are L2-normalized with +1e-9
    * (rank.py:282-289) so the pairwise dot IS the cosine. Candidates are
    * scanned in score-desc order (ties by id asc for determinism); a
    * strictly greater MMR value is required to displace the current best,
    * matching the reference's `>` comparison (rank.py:315).
    */
  def select(candidates: Seq[Candidate], k: Int,
             lambda: Double = Features.MmrLambda): Seq[Candidate] = {
    val ordered = candidates.sortBy(c => (-c.score, c.id))
    val normed = ordered.map(c => c.copy(vec = l2normalize(c.vec)))
    val selected = scala.collection.mutable.ArrayBuffer.empty[Candidate]
    val remaining = scala.collection.mutable.ArrayBuffer(normed: _*)
    while (selected.length < math.min(k, normed.length) && remaining.nonEmpty) {
      var best: Candidate = null
      var bestScore = -1e9
      for (c <- remaining) {
        val mmrVal =
          if (selected.isEmpty) c.score
          else {
            val maxSim = selected.map(s => dot(c.vec, s.vec)).max
            lambda * c.score - (1 - lambda) * maxSim
          }
        if (mmrVal > bestScore) { best = c; bestScore = mmrVal }
      }
      selected += best
      remaining -= best
    }
    selected.toSeq
  }
}
