package graft.text

/** Deterministic 64-bit string hash shared — bit-for-bit — between the
  * engine (JVM `Long` arithmetic, wrapping = mod 2^64) and the DuckDB
  * oracle (HUGEINT mod-2^64 SQL generated HERE from the same constants,
  * so the two sides cannot drift): a polynomial-31 fold over the
  * characters followed by the splitmix64 finalizer for avalanche.
  *
  * Why not xxhash64/MurmurHash3: neither has a DuckDB twin, which forced
  * every hash-seeded query (simhash fingerprints, hashed-TF embeddings)
  * down to the driver's weaker rows-only check. This hash keeps full
  * avalanche quality (splitmix64 finalizer — see Dedup.seeded for why
  * that matters for sketch independence) while staying expressible as
  * pure SQL integer arithmetic.
  *
  * Scope: inputs are cleanText output or lowercase ASCII question text,
  * where UTF-16 code units == Unicode code points == DuckDB's per-
  * character ascii() values, so both engines fold identical integer
  * sequences. (Non-BMP input would split into surrogates on the JVM but
  * not in DuckDB — out of scope by the cleanText charset contract.)
  */
object StableHash {
  final val C1 = 0xbf58476d1ce4e5b9L
  final val C2 = 0x94d049bb133111ebL

  /** h_{i+1} = h_i * 31 + code, wrapping. Empty string → 0. */
  def poly31(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) { h = h * 31 + s.charAt(i); i += 1 }
    h
  }

  /** splitmix64 finalizer (public-domain constants). */
  def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * C1
    z = (z ^ (z >>> 27)) * C2
    z ^ (z >>> 31)
  }

  def hash64(s: String): Long = mix(poly31(s))

  /** Hashed-TF bucket: unsigned remainder — mirrors HUGEINT `%` in SQL,
    * where the hash is a non-negative value in [0, 2^64).
    */
  def bucket(s: String, dim: Int): Int =
    java.lang.Long.remainderUnsigned(hash64(s), dim.toLong).toInt

  // ---------------------------------------------------- DuckDB mirrors

  private val M: BigInt = BigInt(1) << 64
  private val M32: BigInt = BigInt(1) << 32

  private def uns(c: Long): BigInt = BigInt(java.lang.Long.toUnsignedString(c))

  /** (e * c) mod 2^64 over HUGEINT without 128-bit overflow: schoolbook
    * split of the constant into 32-bit halves (every partial product and
    * the final sum stay under 2^65 < HUGEINT max).
    */
  private def mulModSql(e: String, c: Long): String = {
    val cu = uns(c)
    val clo = cu % M32
    val chi = cu / M32
    s"(((($e) % $M32) * $clo + (((($e) % $M32) * $chi + (($e) // $M32) * $clo) % $M32) * $M32) % $M::HUGEINT)"
  }

  /** HUGEINT[] of `hash64` over a VARCHAR[] expression. SQL has no `let`,
    * so each finalizer stage is bound by a staged list_transform wrapper
    * (the lambda variable makes the repeated references cheap).
    */
  def hashes64Sql(toksExpr: String): String = {
    val poly = "list_reduce(list_prepend(CAST(0 AS HUGEINT), " +
      "list_transform(string_split(t, ''), c -> CAST(ascii(c) AS HUGEINT))), " +
      s"(h, c) -> (h * 31 + c) % $M::HUGEINT)"
    val s1 = mulModSql("xor(z, z >> 30)", C1)
    val s2 = mulModSql("xor(z, z >> 27)", C2)
    s"list_transform(list_transform(list_transform(" +
      s"list_transform($toksExpr, t -> $poly), " +
      s"z -> $s1), z -> $s2), z -> xor(z, z >> 31))"
  }

  /** DOUBLE[] hashed-TF embedding of a VARCHAR[] expression — the exact
    * HashTfEmbedder mirror (bucket counts, L2-normalized, +1e-9 eps).
    */
  def hashEmbedSql(toksExpr: String, dim: Int): String = {
    val buckets =
      s"list_transform(${hashes64Sql(toksExpr)}, h -> CAST(h % $dim AS BIGINT))"
    s"list_transform(list_transform([$buckets], bs -> " +
      s"list_transform(range(0, $dim), p -> CAST(len(list_filter(bs, x -> x = p)) AS DOUBLE))), " +
      "cnt -> list_transform(cnt, x -> x / (sqrt(list_sum(list_transform(cnt, y -> y*y))) + 1e-9)))[1]"
  }

  /** 64-char SimHash bitstring (VARCHAR, MSB first) of a VARCHAR[]
    * expression — the Dedup.simHashBits mirror. Empty token lists vote 0
    * on every bit → all-zero fingerprint on both engines.
    */
  def simHashSql(toksExpr: String): String =
    s"list_transform(list_transform([${hashes64Sql(toksExpr)}], hs -> " +
      "list_transform(range(0, 64), b -> CASE WHEN coalesce(list_sum(" +
      "list_transform(hs, h -> CASE WHEN (h >> CAST(63 - b AS HUGEINT)) % 2 = 1 THEN 1 ELSE -1 END)), 0) > 0 THEN 1 ELSE 0 END)), " +
      "bits -> array_to_string(bits, ''))[1]"
}
