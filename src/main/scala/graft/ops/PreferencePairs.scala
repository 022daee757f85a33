package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Preference-pair assembly — the DPO/RLHF reward-data prep step of a
  * training pipeline (Rafailov et al. 2023 consume exactly this shape):
  * per prompt group, elect the best-scored response as CHOSEN and pair
  * it with up to `maxRejected` responses whose score sits at least
  * `margin` below it. A margin keeps near-ties out (labels there are
  * noise); the cap bounds pair volume per prompt.
  *
  * '''Scale shape.''' No pairwise explosion: chosen is a rank-1 window
  * election and rejected a second window over the SAME partitioning, so
  * the whole op is ONE hash shuffle on the group key; the chosen
  * attributes ride a same-key join that reuses that partitioning.
  * Output volume is ≤ maxRejected rows per group — bounded by design,
  * not by data. All ordering is integer (score desc/asc, id tiebreak),
  * so results are deterministic under any partitioning and the DuckDB
  * oracle replays them row-for-row.
  *
  * Reference analog: Key_Shared per-key election — one winner per key,
  * deterministic under redistribution
  * (pulsar-broker/.../ConsistentHashingStickyKeyConsumerSelector.java).
  */
object PreferencePairs {

  /** (group, chosen_id, chosen_score, rejected_id, rejected_score,
    * score_gap) — up to `maxRejected` pairs per group, hardest-negative
    * first (lowest score, id tiebreak). Groups with no response clearing
    * the margin emit nothing. */
  def pairs(df: DataFrame, groupCol: String, idCol: String,
            score: Column, margin: Long, maxRejected: Int): DataFrame = {
    require(margin >= 0L, s"negative margin $margin")
    require(maxRejected >= 1, s"bad maxRejected $maxRejected")
    val scored = df.select(col(groupCol).as("grp"), col(idCol).as("id"),
      score.cast("long").as("score"))
    val byGroup = Window.partitionBy(col("grp"))
    val chosen = scored
      .withColumn("__rk", row_number().over(
        byGroup.orderBy(col("score").desc, col("id"))))
      .where(col("__rk") === 1)
      .select(col("grp"), col("id").as("chosen_id"),
        col("score").as("chosen_score"))
    scored.join(chosen, "grp")
      .where(col("id") =!= col("chosen_id") &&
        col("chosen_score") - col("score") >= margin)
      .withColumn("__rj", row_number().over(
        byGroup.orderBy(col("score").asc, col("id"))))
      .where(col("__rj") <= maxRejected)
      .select(col("grp").as(groupCol), col("chosen_id"),
        col("chosen_score"), col("id").as("rejected_id"),
        col("score").as("rejected_score"),
        (col("chosen_score") - col("score")).as("score_gap"))
  }
}
