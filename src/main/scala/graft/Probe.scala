package graft

/** Scratch profiling main (not part of the driver contract). */
object Probe {
  // old KmvBase.reduce/merge for A/B
  private def oldReduce(k: Int)(b: Seq[Long], h0: Long): Seq[Long] = {
    val h = h0 ^ Long.MinValue
    if (b.length == k && h >= b.last) b
    else if (b.contains(h)) b
    else ((b :+ h).sorted: Seq[Long]).take(k)
  }

  def main(args: Array[String]): Unit = {
    val k = 4096
    val n = 1000000
    val nKeys = 30000 // distinct keys, each repeated ~33x (the events shape)
    val rnd = new scala.util.Random(7)
    val keys = Array.fill(nKeys)(rnd.nextLong())
    val stream = Array.tabulate(n)(i => {
      val key = keys(((i * 2654435761L) % nKeys).toInt.abs)
      // xxhash64-ish mix
      var h = key * -7046029254386353131L
      h ^= h >>> 32
      h
    })
    val agg = new functions.Sketches.KmvDistinct(k)
    for (round <- 1 to 3) {
      var t0 = System.nanoTime()
      var bNew: Seq[Long] = agg.zero
      stream.foreach(h => bNew = agg.reduce(bNew, h))
      val tNew = (System.nanoTime() - t0) / 1e6
      t0 = System.nanoTime()
      var bOld: Seq[Long] = Vector.empty
      stream.foreach(h => bOld = oldReduce(k)(bOld, h))
      val tOld = (System.nanoTime() - t0) / 1e6
      println(f"round $round: new $tNew%.1f ms  old $tOld%.1f ms  equal=${bNew == bOld}")
    }
  }
}
