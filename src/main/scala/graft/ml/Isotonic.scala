package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Isotonic (monotone) probability calibration via Pool-Adjacent-Violators
  * — the non-parametric companion to [[Calibration]]'s diagnostic surface:
  * where a reliability curve MEASURES miscalibration, the PAV fit REPAIRS
  * it, mapping raw scores onto the empirical positive rate under the one
  * assumption that better scores mean better odds (Zadrozny & Elkan 2002).
  *
  * Scale shape: scores aggregate into `bins` equal-width cells in ONE
  * keyed job (≤ bins rows leave the executors); PAV runs on the driver
  * over those cells (O(bins), the classical stack algorithm); applying
  * the fit is a broadcast map literal lookup — a pure row-local
  * projection, no model object near the scan, same economics as
  * [[QualityClassifier.score]]. Binning caps resolution at 1/bins, the
  * standard large-data trade (a billion exact (score, label) pairs
  * cannot be sorted on a driver; 1000 cells lose nothing a calibration
  * consumer can see).
  */
object Isotonic {

  /** One fitted cell: scores binned to `bin` calibrate to `p`. */
  final case class Cell(bin: Int, p: Double)

  /** Fit on (scoreCol ∈ [0,1], labelCol ∈ {0,1}). Returns one cell per
    * OCCUPIED score bin with monotone non-decreasing `p`. */
  def fit(df: DataFrame, scoreCol: String, labelCol: String,
      bins: Int = 1000): Seq[Cell] = {
    require(bins >= 2, "need at least two bins")
    val rows = df
      .groupBy(least(floor(col(scoreCol) * bins), lit(bins - 1L)).cast("int").as("bin"))
      .agg(sum(col(labelCol).cast("double")).as("pos"), count(lit(1)).as("n"))
      .orderBy("bin")
      .collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getLong(2).toDouble))
    // PAV: maintain a stack of blocks (bin-range, pos, n); merge while the
    // new block's rate violates monotonicity against the stack top
    final case class Block(firstBin: Int, lastBin: Int, pos: Double, n: Double) {
      def rate: Double = pos / n
    }
    val stack = scala.collection.mutable.ArrayBuffer.empty[Block]
    rows.foreach { case (b, pos, n) =>
      var blk = Block(b, b, pos, n)
      while (stack.nonEmpty && stack.last.rate >= blk.rate) {
        val top = stack.remove(stack.size - 1)
        blk = Block(top.firstBin, blk.lastBin, top.pos + blk.pos, top.n + blk.n)
      }
      stack += blk
    }
    stack.flatMap(blk => rows.collect {
      case (b, _, _) if b >= blk.firstBin && b <= blk.lastBin => Cell(b, blk.rate)
    }).toSeq
  }

  /** The calibrated probability of `scoreCol` under a fit: a broadcast
    * map-literal lookup (bins entries), scores in UNOCCUPIED bins take
    * the nearest occupied cell below (above for the leading gap) — the
    * step-function extension. */
  def calibrate(scoreCol: Column, cells: Seq[Cell], bins: Int = 1000): Column = {
    require(cells.nonEmpty, "empty fit")
    val sorted = cells.sortBy(_.bin)
    // fill gaps driver-side so the lookup is total over [0, bins)
    val filled = (0 until bins).map { b =>
      val below = sorted.takeWhile(_.bin <= b).lastOption
      b -> below.getOrElse(sorted.head).p
    }
    val m = map(filled.flatMap { case (b, p) => Seq(lit(b), lit(p)) }: _*)
    element_at(m, least(floor(scoreCol * bins), lit(bins - 1L)).cast("int"))
  }
}
