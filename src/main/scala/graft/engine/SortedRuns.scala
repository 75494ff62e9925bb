package graft.engine

/** Streams contiguous equal-key runs of an already-sorted iterator through
  * a per-run fold — the consumer side of the secondary-sort pattern
  * (repartition by key + sortWithinPartitions(key, seq) upstream). A run is
  * never materialized; the fold sees a forward-only iterator. If the fold
  * returns without draining its run, the remainder is skipped automatically
  * so the next run still starts at the right row — the grouping invariant
  * is enforced here, not by every caller.
  */
object SortedRuns {
  def fold[T, K, R](it: Iterator[T], keyOf: T => K)(
      f: (K, Iterator[T]) => R): Iterator[R] = {
    val buf = it.buffered
    new Iterator[R] {
      def hasNext: Boolean = buf.hasNext
      def next(): R = {
        val k = keyOf(buf.head)
        val run = new Iterator[T] {
          def hasNext: Boolean = buf.hasNext && keyOf(buf.head) == k
          def next(): T = buf.next()
        }
        val r = f(k, run)
        while (run.hasNext) run.next()
        r
      }
    }
  }
}
