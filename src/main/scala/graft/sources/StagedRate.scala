package graft.sources

/**
 * Staged rate schedule (reference S4: data/source/rate/
 * StagedRateControllerBuilder.java:6-60 — thresholds -> rates; rate < 0
 * means one record per |rate| seconds, 0 = unlimited, > 0 = records/s).
 *
 * In Structured Streaming the schedule applies as per-trigger row budgets
 * (`maxRowsPerTrigger`-style admission) — [[rowsForWindow]] computes the
 * budget for a wall-window. The schedule itself is a pure, testable
 * function of the record count, exactly like the reference's.
 */
final case class StagedRate(thresholds: Seq[Long], rates: Seq[Double]) {
  require(rates.length == thresholds.length + 1,
    s"need ${thresholds.length + 1} rates for ${thresholds.length} thresholds")

  /** Rate in effect after `emitted` records. */
  def rateAt(emitted: Long): Double = {
    var i = 0
    while (i < thresholds.length && emitted >= thresholds(i)) i += 1
    rates(i)
  }

  /** Records/second interpretation of a raw rate value. */
  def recordsPerSecond(rate: Double): Double =
    if (rate == 0) Double.PositiveInfinity
    else if (rate < 0) 1.0 / -rate
    else rate

  /** Row budget for a trigger window of `windowMs`, given records emitted
   * so far. Infinite when the current stage is unlimited. */
  def rowsForWindow(emitted: Long, windowMs: Long): Long = {
    val rps = recordsPerSecond(rateAt(emitted))
    if (rps.isInfinite) Long.MaxValue
    else math.max(1L, (rps * windowMs / 1000.0).toLong)
  }
}

object StagedRate {
  /** Single sustained rate (the reference's common configuration). */
  def constant(rate: Double): StagedRate = StagedRate(Nil, Seq(rate))
}
