package graft.core

/** Deterministic url -> bucket assignment (FNV-1a 64 over chars, mod n)
  * shared by the write path, the resume scan, and the golden oracle.
  * Single source of truth so the native Catalyst expression
  * (graft.functions.FnvBucketExpression), the typed kernel
  * (graft.engine.Pipeline.extractDoc) and the corpus generator can never
  * drift apart.
  */
object UrlBucket {
  def of(url: String, buckets: Int): Int = {
    var h = 1469598103934665603L // FNV-1a 64
    var i = 0
    while (i < url.length) { h ^= url.charAt(i); h *= 1099511628211L; i += 1 }
    val m = (h % buckets).toInt
    if (m < 0) m + buckets else m
  }
}
