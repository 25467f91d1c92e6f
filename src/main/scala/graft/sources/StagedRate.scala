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

/**
 * S5: query rate bound to insert progress (reference
 * BindingRateControllerBuilder.java — once the data source has emitted
 * `callbackCount` records it pushes a new query delay to a shared file,
 * which the query source polls every 10 s,
 * PollingRateControllerBuilder.java). The binding decision is a pure
 * function of insert progress; [[RateChannel]] is the cross-source
 * signal file.
 */
final case class BoundRate(initial: StagedRate, afterCallback: StagedRate,
    callbackCount: Long) {
  /** The query schedule in effect given the insert stream's progress. */
  def scheduleFor(insertsEmitted: Long): StagedRate =
    if (insertsEmitted >= callbackCount) afterCallback else initial
}

/** Shared-file rate signal (the reference's DelayPusher/HDFS file): the
 * writer swaps the file atomically (tmp + rename), the poller reads the
 * current value or None before the first push. */
object RateChannel {
  import java.nio.file.{Files, Paths, StandardCopyOption}

  def push(path: String, rate: Double): Unit = {
    val target = Paths.get(path)
    val tmp = Paths.get(path + ".tmp")
    Files.writeString(tmp, rate.toString)
    Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  def poll(path: String): Option[Double] = {
    val p = Paths.get(path)
    if (Files.exists(p)) Some(Files.readString(p).trim.toDouble) else None
  }
}
