package graft

/** One-shot box-speed sample as a JSON line — the cheap (2-3 s,
  * Spark-free) way to poll for a fast window before committing to a
  * full-suite bench invocation. Run directly on the compiled classes:
  *
  *   java -cp target/scala-2.13/classes:/opt/spark/jars/'*' graft.CanaryPoll
  *
  * Compare oneCore against CANARY.json's reference: meaningfully below
  * it means the box is in a fast window (the committed min-merge legs
  * were all measured at oneCore ≈ 1.04-1.09 s).
  */
object CanaryPoll {
  def main(args: Array[String]): Unit = {
    val (one, all) = BoxCanary.sample()
    println(s"""{"epochMs":${System.currentTimeMillis()},"iters":${BoxCanary.Iters},"oneCore":${Bench.num4(one)},"allCores":${Bench.num4(all)}}""")
  }
}
