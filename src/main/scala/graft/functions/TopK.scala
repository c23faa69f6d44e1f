package graft.functions

import scala.collection.mutable

/** Bounded-heap top-k selection: the k smallest elements under an
  * ordering, exactly equal to `xs.sorted(ord).take(k)` — including
  * tie behavior, because every call site uses a TOTAL order (score
  * desc, id asc) — but in O(n log k) time and O(k) space instead of
  * O(n log n) time and a full copy.
  *
  * This is the linking/kNN kernel's hot loop (the reference sorts the
  * whole catalogue per mention, entityMatching.py:69-78; we keep its
  * semantics but not its cost): with |catalogue|=C and k=4, a full
  * sort is C·log C comparisons + a C-element copy PER DISTINCT
  * MENTION; the heap does one pass with a 4-element buffer.
  */
object TopK {

  /** k smallest elements of `it` under `ord`, ascending. Equivalent to
    * `it.toSeq.sorted(ord).take(k)` when `ord` is a total order. */
  def smallest[T](it: Iterator[T], k: Int)(implicit ord: Ordering[T]): IndexedSeq[T] = {
    if (k <= 0) return Vector.empty
    // max-heap of the k smallest seen so far (head = largest kept)
    val heap = mutable.PriorityQueue.empty[T](ord)
    while (it.hasNext) {
      val x = it.next()
      if (heap.size < k) heap.enqueue(x)
      else if (ord.lt(x, heap.head)) { heap.dequeue(); heap.enqueue(x) }
    }
    val out = new mutable.ArrayBuffer[T](heap.size)
    while (heap.nonEmpty) out += heap.dequeue() // descending
    val n = out.length
    IndexedSeq.tabulate(n)(i => out(n - 1 - i))
  }
}
