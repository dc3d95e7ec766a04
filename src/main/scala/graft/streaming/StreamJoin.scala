package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream joins — the attribution shape: click events
  * joined to the impression that produced them within a bounded event-time
  * window (Structured Streaming's stream-stream join with state eviction).
  *
  * Both sides carry watermarks and the join condition bounds `click_ts` to
  * `[imp_ts, imp_ts + window]`, so the engine can evict impression state
  * once the click watermark passes `imp_ts + window`, and click state once
  * the impression watermark passes `click_ts` — state is O(in-flight
  * window), never O(stream length). `left_outer` additionally emits
  * never-clicked impressions (null click columns) once the watermark closes
  * their window — the semantics an attribution/billing pipeline needs.
  *
  * (The reference's streaming layer is per-batch stateless — SURVEY.md
  * §2.11; this is the missing cross-stream primitive a production topology
  * adds on top, expressed entirely with built-in watermark + join operators.)
  */
object StreamJoin {

  /** @param impressions streaming DF with (imp_id, user_id, imp_ts)
    * @param clicks      streaming DF with (click_id, user_id, click_ts)
    * @param window      attribution window AND watermark delay
    * @param joinType    "inner" or "left_outer"
    */
  def attribution(impressions: DataFrame, clicks: DataFrame,
      window: String = "10 minutes", joinType: String = "inner"): DataFrame = {
    val imp = impressions.withWatermark("imp_ts", window)
      .select(col("imp_id"), col("user_id"), col("imp_ts"))
    val clk = clicks.withWatermark("click_ts", window)
      .select(col("click_id"), col("user_id").as("click_user"), col("click_ts"))
    imp.join(clk,
      expr(s"""user_id = click_user
        AND click_ts >= imp_ts
        AND click_ts <= imp_ts + interval $window"""),
      joinType)
      .select(col("imp_id"), col("user_id"), col("imp_ts"),
        col("click_id"), col("click_ts"))
  }
}
