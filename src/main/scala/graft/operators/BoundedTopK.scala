package graft.operators

/** The shared core of the exact bounded top-k aggregators
  * ([[AnchorText.TopK]], [[CrawlBudget.TopKUrls]]): buffers stay SORTED
  * under a caller-supplied strict total order `beats`, so reduce is a
  * bounded binary-search insertion (O(1) for the common non-qualifying
  * row once the buffer fills) and merge is a linear walk of two sorted
  * buffers stopping at k. Exactness requires distinct input items
  * (pre-aggregated), which makes bounded top-k a mergeable semilattice.
  */
object BoundedTopK {

  /** Inserts `t` into sorted buffer `b` keeping at most `k` entries. */
  def insert[T](b: Seq[T], t: T, k: Int, beats: (T, T) => Boolean): Seq[T] = {
    if (b.size >= k && !beats(t, b.last)) b
    else {
      val buf = scala.collection.mutable.ArrayBuffer.from(b)
      var lo = 0
      var hi = buf.size
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (beats(t, buf(mid))) hi = mid else lo = mid + 1
      }
      buf.insert(lo, t)
      if (buf.size > k) buf.remove(buf.size - 1)
      buf.toSeq
    }
  }

  /** Merges two sorted buffers, keeping the best `k`. */
  def mergeSorted[T](a: Seq[T], b: Seq[T], k: Int, beats: (T, T) => Boolean): Seq[T] = {
    if (a.isEmpty) return b.take(k)
    if (b.isEmpty) return a.take(k)
    val av = a.toIndexedSeq
    val bv = b.toIndexedSeq
    val out = new scala.collection.mutable.ArrayBuffer[T](k)
    var i = 0
    var j = 0
    while (out.size < k && (i < av.size || j < bv.size)) {
      if (j >= bv.size || (i < av.size && !beats(bv(j), av(i)))) { out += av(i); i += 1 }
      else { out += bv(j); j += 1 }
    }
    out.toSeq
  }
}
