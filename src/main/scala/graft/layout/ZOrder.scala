package graft.layout

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-dimensional data
  * skipping — the Delta/Iceberg `OPTIMIZE ZORDER BY` layout idea,
  * re-expressed as plain Spark expressions.
  *
  * Why it matters at 100 TB: min/max file statistics prune a scan
  * only along the physical sort order. A table sorted by `custkey`
  * answers custkey predicates from few files but date predicates from
  * ALL files. Interleaving the bits of both dimensions' range buckets
  * into one sort key bounds EVERY interleaved dimension within each
  * file to a narrow band (≈ sqrt of the linear span for 2 dims), so
  * min/max skipping works for either predicate —
  * [[StatsPrunedRead]] is the reader that consumes those measured
  * per-file statistics and cuts the file list before the scan
  * (q_zorder_prune proves the cut: 5-8 of 40 files read at sf0.1,
  * content identical to the full scan). The production write
  * is one line on top of [[zValue]]:
  * `df.repartitionByRange(n, zv).sortWithinPartitions(zv).write…` —
  * a single range shuffle, no new physical operator needed.
  *
  * Everything here is integer shift/mask arithmetic on columns —
  * codegen'd end to end, no UDF, engine-portable (the DuckDB oracle
  * restates it with the same shifts).
  */
object ZOrder {

  /** Smallest right-shift `s` such that `range >> s` fits in `bits`
    * bits — the fixed-cell grid coarsening for a dimension whose
    * values span `range` distinct integers. Driver-side scalar math
    * (the caller supplies min/max from a bounded aggregate, the
    * q_histogram two-pass shape).
    */
  def shiftFor(range: Long, bits: Int): Int = {
    require(range > 0 && bits > 0 && bits < 63)
    // fit the maximum VALUE (range - 1), not the count: a range of
    // exactly 2^bits needs no shift at all (max value 2^bits - 1)
    val width = 64 - java.lang.Long.numberOfLeadingZeros(range - 1)
    math.max(0, width - bits)
  }

  /** Bit-interleave two bucket columns, each already in
    * `[0, 2^bits)`: x's bit i lands at output bit 2i+1, y's at 2i.
    * Disjoint bit positions make the sum an OR — pure shifts, masks
    * and adds that whole-stage codegen fuses into straight-line JVM
    * arithmetic.
    */
  def interleave(xb: Column, yb: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31)
    (0 until bits).map { i =>
      shiftleft(shiftright(xb, i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(yb, i).bitwiseAND(lit(1L)), 2 * i)
    }.reduce(_ + _)
  }

  /** Z-value of a row from two integer dimension columns with known
    * [min, max] ranges: each dimension is grid-bucketed to `bits`
    * bits by a right shift (exact integer math — no double division
    * whose rounding could flip a boundary bucket), then interleaved.
    * Result lies in `[0, 2^(2*bits))`.
    */
  def zValue(x: Column, xMin: Long, xMax: Long,
      y: Column, yMin: Long, yMax: Long, bits: Int): Column = {
    val xs = shiftFor(xMax - xMin + 1, bits)
    val ys = shiftFor(yMax - yMin + 1, bits)
    interleave(shiftright(x - lit(xMin), xs), shiftright(y - lit(yMin), ys), bits)
  }

  /** File assignment from a z-value: the top `fileBits` bits, i.e.
    * 2^fileBits contiguous z-curve range blocks. Deterministic (an
    * engine-independent pure function of the row, unlike a partition
    * id), which is what makes the layout oracle-checkable; the
    * physical write would instead `repartitionByRange` on the raw
    * z-value for equal-SIZE files.
    */
  def fileId(zv: Column, bits: Int, fileBits: Int): Column = {
    require(fileBits > 0 && fileBits <= 2 * bits)
    shiftright(zv, 2 * bits - fileBits)
  }
}
