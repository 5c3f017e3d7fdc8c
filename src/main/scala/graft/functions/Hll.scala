package graft.functions

/** Minimal HyperLogLog sketch (Flajolet et al. 2007, with the standard
  * small-range linear-counting correction) for bounded-state distinct
  * counting in streaming state stores. 2^p byte registers; merge is
  * register-wise max, so partial sketches from different partitions /
  * replays combine exactly like any commutative monoid — the property
  * that makes it safe inside flatMapGroupsWithState.
  *
  * p = 12 → 4 KiB per key, ~1.6% standard error; for per-key distinct
  * counts in the thousands the linear-counting regime is near-exact.
  */
object Hll {
  def emptyRegisters(p: Int = 12): Array[Byte] = new Array[Byte](1 << p)

  /** splitmix64 — the one shared implementation (RhpPlanes.mix); a
    * second verbatim copy here drifted-in-waiting.
    */
  private def mix(x0: Long): Long = RhpPlanes.mix(x0)

  /** Add one element (by 64-bit value) to the sketch in place. */
  def add(regs: Array[Byte], value: Long): Unit = {
    val p = Integer.numberOfTrailingZeros(regs.length)
    val h = mix(value)
    val idx = (h >>> (64 - p)).toInt
    val rest = h << p
    val rank = (java.lang.Long.numberOfLeadingZeros(rest | (1L << (p - 1))) + 1).toByte
    if (rank > regs(idx)) regs(idx) = rank
  }

  /** Register-wise max merge of `other` into `regs` (in place). */
  def merge(regs: Array[Byte], other: Array[Byte]): Unit = {
    require(regs.length == other.length, "sketch sizes differ")
    var i = 0
    while (i < regs.length) {
      if (other(i) > regs(i)) regs(i) = other(i)
      i += 1
    }
  }

  /** Cardinality estimate with small-range correction. */
  def estimate(regs: Array[Byte]): Long = {
    val m = regs.length
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      invSum += 1.0 / (1L << regs(i))
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val raw = alpha * m * m / invSum
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) // linear counting
      else raw
    math.round(est)
  }
}
