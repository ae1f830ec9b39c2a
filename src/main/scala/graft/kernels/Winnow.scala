package graft.kernels

import scala.collection.mutable.ArrayBuffer

/**
 * Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003,
 * the MOSS algorithm): a true ROLLING hash over character k-grams
 * (polynomial base-B wrapping in 64 bits, O(1) per shift), then the
 * minimum hash of every window of `w` consecutive k-grams is selected
 * (rightmost minimum on ties, each selected position emitted once).
 * The guarantee: any shared substring of length ≥ w + k − 1 between
 * two documents yields at least one shared fingerprint, so containment
 * and near-duplication are detectable from small sketches.
 */
object Winnow {

  private final val Base = 1000003L

  /** Selected fingerprint hashes, deduplicated, order of selection. */
  def fingerprints(text: String, k: Int, w: Int): Array[Long] = {
    val n = text.length
    if (n < k) return Array.emptyLongArray
    val m = n - k + 1 // number of k-grams
    val hashes = new Array[Long](m)
    // rolling polynomial hash: h(i+1) = (h(i) - c_i * B^(k-1)) * B + c_{i+k}
    var pow = 1L
    var j = 0
    while (j < k - 1) { pow *= Base; j += 1 }
    var h = 0L
    j = 0
    while (j < k) { h = h * Base + text.charAt(j); j += 1 }
    hashes(0) = mix(h)
    var i = 1
    while (i < m) {
      h = (h - text.charAt(i - 1) * pow) * Base + text.charAt(i + k - 1)
      hashes(i) = mix(h)
      i += 1
    }
    if (m <= w) {
      // document shorter than one window: its single minimum
      var best = 0
      i = 1
      while (i < m) { if (java.lang.Long.compareUnsigned(hashes(i), hashes(best)) <= 0) best = i; i += 1 }
      return Array(hashes(best))
    }
    // winnow: rightmost minimum per window, emit on change of position
    val out = new ArrayBuffer[Long]()
    var minPos = -1
    i = 0
    while (i + w <= m) {
      if (minPos < i) {
        minPos = i
        var p = i + 1
        while (p < i + w) {
          if (java.lang.Long.compareUnsigned(hashes(p), hashes(minPos)) <= 0) minPos = p
          p += 1
        }
        out += hashes(minPos)
      } else {
        val newest = i + w - 1
        if (java.lang.Long.compareUnsigned(hashes(newest), hashes(minPos)) <= 0) {
          minPos = newest
          out += hashes(minPos)
        }
      }
      i += 1
    }
    out.toArray
  }

  /** 64-bit finalizer (splitmix-style) so the weak polynomial hash
    * distributes uniformly before the min selection. */
  @inline private def mix(z0: Long): Long = {
    var z = z0 + -7046029254386353131L
    z = (z ^ (z >>> 30)) * -4658895280553007687L
    z = (z ^ (z >>> 27)) * -7723592293110705685L
    z ^ (z >>> 31)
  }
}
