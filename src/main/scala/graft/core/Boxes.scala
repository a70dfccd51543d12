package graft.core

/** Bounding-box geometry ops.
  *
  * Exact ports of the reference semantics:
  *  - boxTwoPointConvert: /root/reference/data/data_utils.py:7-28
  *  - normalizeBbox (int truncation + clip): /root/reference/data/data_utils.py:31-59
  *  - mergeBbox: /root/reference/data/data_utils.py:62-76
  *  - sortBoxes (reading-order banding): /root/reference/data/data_utils.py:79-119
  */
object Boxes {

  /** 8-value quad -> [min x, min y, max x, max y]; 4-value passes through. */
  def boxTwoPointConvert(box: Seq[Int]): Vector[Int] = {
    if (box.length == 4) return box.toVector
    require(box.length == 8, s"Box should contain 4 or 8 values, got ${box.length}")
    var minX, minY = Int.MaxValue
    var maxX, maxY = Int.MinValue
    var i = 0
    while (i < 8) {
      val v = box(i)
      if (i % 2 == 0) { if (v < minX) minX = v; if (v > maxX) maxX = v }
      else { if (v < minY) minY = v; if (v > maxY) maxY = v }
      i += 1
    }
    Vector(minX, minY, maxX, maxY)
  }

  /** Scale to [0,1000] with Python `int()` truncation-toward-zero, then clip. */
  def normalizeBbox(box: Seq[Int], width: Int, height: Int): Vector[Int] = {
    @inline def clip(v: Int): Int = math.min(math.max(v, 0), 1000)
    val x0 = clip(((box(0).toDouble / width) * 1000).toInt)
    val y0 = clip(((box(1).toDouble / height) * 1000).toInt)
    val x1 = clip(((box(2).toDouble / width) * 1000).toInt)
    val y1 = clip(((box(3).toDouble / height) * 1000).toInt)
    require(x1 >= x0 && y1 >= y0, s"degenerate normalized box ($x0,$y0,$x1,$y1)")
    Vector(x0, y0, x1, y1)
  }

  /** [[mergeBbox]] over boxes(s..eIncl) without materializing the slice —
    * the decode chain merges a range per line/chain step on the hot path.
    */
  def mergeBboxRange(boxes: IndexedSeq[Vector[Int]], s: Int, eIncl: Int): Vector[Int] = {
    var minX, minY = Int.MaxValue
    var maxX, maxY = Int.MinValue
    var k = s
    while (k <= eIncl) {
      val b = boxes(k)
      if (b(0) < minX) minX = b(0)
      if (b(1) < minY) minY = b(1)
      if (b(2) > maxX) maxX = b(2)
      if (b(3) > maxY) maxY = b(3)
      k += 1
    }
    Vector(minX, minY, maxX, maxY)
  }

  /** Component-wise min/min/max/max over a non-empty box list. */
  def mergeBbox(boxes: Seq[Seq[Int]]): Vector[Int] = {
    var minX, minY = Int.MaxValue
    var maxX, maxY = Int.MinValue
    boxes.foreach { b =>
      if (b(0) < minX) minX = b(0)
      if (b(1) < minY) minY = b(1)
      if (b(2) > maxX) maxX = b(2)
      if (b(3) > maxY) maxY = b(3)
    }
    Vector(minX, minY, maxX, maxY)
  }

  /** Reading-order sort returning the permutation of input indices.
    *
    * Algorithm (data_utils.py:79-119): sort by center-y (stable argsort); a
    * new visual band starts when the gap between consecutive sorted center-y
    * values is >= m_h, where m_h = sum(heights) / (2N); within each band,
    * re-sort by center-x (stable argsort). numpy's default argsort is
    * unstable on ties; the corpus synthesizer guarantees distinct centers so
    * a stable sort is observationally identical.
    */
  def sortBoxes(boxes: scala.collection.IndexedSeq[Seq[Int]]): Vector[Int] = {
    val n = boxes.length
    if (n == 0) return Vector.empty
    val px = new Array[Double](n)
    val py = new Array[Double](n)
    var hSum = 0.0
    var i = 0
    while (i < n) {
      val b = boxes(i)
      px(i) = (b(0) + b(2)) / 2.0
      py(i) = (b(1) + b(3)) / 2.0
      hSum += (b(3) - b(1))
      i += 1
    }
    val mH = hSum / (2.0 * n)
    val sortY: Array[Int] = Array.range(0, n).sortBy(py(_)) // stable
    // band ids over the y-sorted order
    val band = new Array[Int](n)
    var line = 0
    i = 1
    while (i < n) {
      if (py(sortY(i)) - py(sortY(i - 1)) >= mH) line += 1
      band(i) = line
      i += 1
    }
    // within each band (a contiguous run), stable re-sort by center-x
    var start = 0
    while (start < n) {
      var end = start + 1
      while (end < n && band(end) == band(start)) end += 1
      val slice = java.util.Arrays.copyOfRange(sortY, start, end)
      val sorted = slice.sortBy(px(_)) // stable
      var k = 0
      while (k < sorted.length) { sortY(start + k) = sorted(k); k += 1 }
      start = end
    }
    sortY.toVector
  }
}
