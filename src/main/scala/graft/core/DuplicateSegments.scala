package graft.core

/** Detection of repeated consecutive path segments, semantics of the
  * reference's `DuplicateSegmentsLessThan` filter
  * (`warc/filters/DuplicateSegmentsLessThan.java:50-130`).
  *
  * A URL is accepted iff its raw path does NOT contain any sequence of one
  * or more consecutive segments repeated `threshold` or more times — the
  * reference documents this as equivalent to rejecting paths matching
  * `.*(/.*)\1{t-1,}/.*` or `.*(/.*)\1{t-1,}` (its own assertion oracle,
  * DuplicateSegmentsLessThan.java:72-77).
  *
  * The reference uses a Kasai-LCP suffix-array visit for linearity; paths
  * have few segments, so a direct segment-aligned tandem scan is simpler,
  * allocation-light and equally exact (property-tested against the regex
  * oracle in `DuplicateSegmentsSpec`).
  */
object DuplicateSegments {

  /** True iff `rawPath` contains < `threshold` duplicate consecutive
    * segment sequences (i.e. the URL should be accepted). */
  def lessThan(rawPath: String, threshold: Int): Boolean = {
    require(threshold >= 2, "threshold must be at least 2")
    if (rawPath == null || rawPath.isEmpty) return true
    // Normalize like the reference: ensure the path ends with '/' so every
    // segment is slash-terminated (DuplicateSegmentsLessThan.java:92-95).
    val s = if (rawPath.endsWith("/")) rawPath else rawPath + "/"
    // Segment start positions (positions of '/').
    val starts = {
      val b = new scala.collection.mutable.ArrayBuffer[Int]
      var i = 0
      while (i < s.length) { if (s.charAt(i) == '/') b += i; i += 1 }
      b
    }
    // starts = boundary positions; segments live between consecutive
    // boundaries, so there are starts.length - 1 segments. A repeated unit
    // always covers a whole number of segments and every repetition starts
    // and ends on a boundary (each unit starts with '/', and the reference
    // regex requires the final unit to end at a '/' or at end-of-path —
    // which the appended trailing slash turns into a boundary too).
    val nSeg = starts.length - 1
    if (nSeg < threshold) return true // fewer segments than threshold: no way

    var p = 1 // unit length in segments
    while (p * threshold <= nSeg) {
      var i = 0 // unit start segment index
      while (i + p * threshold <= nSeg) {
        val aStart = starts(i)
        val len = starts(i + p) - aStart
        var k = 1
        var ok = true
        while (ok && k < threshold) {
          val bStart = starts(i + p * k)
          if (starts(i + p * k + p) - bStart != len ||
              !s.regionMatches(aStart, s, bStart, len)) ok = false
          else k += 1
        }
        if (ok) return false
        i += 1
      }
      p += 1
    }
    true
  }
}
