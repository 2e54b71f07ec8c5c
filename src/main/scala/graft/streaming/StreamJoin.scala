package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join (the attribution shape: match each click to
  * the impression it followed within an attribution window). Both sides
  * carry watermarks so the join can BOUND ITS STATE: an impression older
  * than (watermark - window) can never match a future click and is evicted.
  * Inner matches emit as soon as both sides arrive — append mode needs no
  * window finalization for the emit, only for state cleanup.
  *
  * Scale shape: the join shuffles both streams on the key; state per
  * partition is bounded by (event rate × attribution window), independent
  * of stream lifetime — THE property that makes a join over unbounded
  * streams runnable at all.
  */
object StreamJoin {

  /** Clicks attributed to the impression with the same key within
    * `windowMinutes` after the impression. Inputs must have columns
    * (ad_id, ts) — impressions — and (ad_id, click_ts) — clicks.
    */
  def attribution(impressions: DataFrame, clicks: DataFrame, windowMinutes: Int): DataFrame = {
    val imp = impressions
      .withWatermark("ts", "10 minutes")
    val clk = clicks
      .withWatermark("click_ts", "10 minutes")
    imp.join(
      clk,
      imp("ad_id") === clk("ad_id") &&
        clk("click_ts") >= imp("ts") &&
        clk("click_ts") <= imp("ts") + expr(s"INTERVAL $windowMinutes MINUTES"),
      "inner")
      .select(imp("ad_id").as("ad_id"), imp("ts").as("imp_ts"), clk("click_ts"))
  }

  /** Stream-static enrichment: the streaming fact joined to a STATIC
    * (batch) dimension — the other half of §2.8's join surface. Unlike
    * the stream-stream join above this keeps NO state at all: the static
    * side is (re-)planned each micro-batch and broadcast, the stream side
    * never shuffles, and no watermark is required. LEFT join on purpose —
    * an enrichment must never lose events, so unknown keys flow through
    * with null attributes (and can be dead-letter-routed downstream)
    * rather than being silently dropped by an inner join.
    */
  def enrich(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")
}
