package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Watermarked stream-stream interval join — the streaming twin of the
 * batch `q11_interval_join` shape (key equality + a bounded event-time
 * range), and the hardest of the Structured Streaming join idioms: BOTH
 * sides must buffer state, and it is the watermark + the time-range
 * condition TOGETHER that let Spark evict it (each side's buffer holds
 * only rows a future match could still pair with; without the range
 * bound the state would grow forever — Spark rejects an unbounded
 * stream-stream join in append mode for exactly that reason).
 *
 * Scale shape: one hash exchange per side on the join key; state per
 * key bounded by (rows inside watermark + range horizon). The join
 * condition mirrors q11: right.ts in [left.ts, left.ts + maxDelay].
 */
object StreamJoins {

  /** Inner interval join of two streaming frames.
   * left: (lkey, lts TIMESTAMP, ...), right: (rkey, rts TIMESTAMP, ...);
   * joins lkey == rkey AND rts in [lts, lts + maxDelay]. Both sides are
   * watermarked with `lateness` so buffered state ages out. */
  def interval(left: DataFrame, right: DataFrame, maxDelay: String,
      lateness: String = "1 hour"): DataFrame = {
    val l = left.withWatermark("lts", lateness)
    val r = right.withWatermark("rts", lateness)
    l.join(r, expr(
      s"lkey = rkey AND rts >= lts AND rts <= lts + INTERVAL $maxDelay"))
  }
}
