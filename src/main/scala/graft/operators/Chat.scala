package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-turn conversation accounting — the SFT-side view of documents:
  * a conversation is (conv_id, turn, role, content) rows, and the
  * operations a chat-data pipeline needs before packing are role-aware
  * token budgeting and context-window truncation (serving keeps the most
  * RECENT turns that fit, dropping history from the front).
  *
  * Scale posture (100 TB): everything is one conv-keyed aggregation after
  * a per-conv window whose group size is the conversation's own turn
  * count — bounded by the chat format (tens of turns), never corpus-sized
  * or per-doc-unique (the rocAuc house rule). One shuffle on conv_id,
  * map-side combinable aggregates, content text never travels beyond its
  * own row's whitespace token count.
  */
object Chat {

  /** Per-conversation stats + suffix-truncation accounting: token counts
    * by role (whitespace tokens — the t1 convention), and the longest
    * SUFFIX of turns whose total fits `budget` tokens (kept_turns /
    * kept_tokens) — the "keep the latest history that fits the context
    * window" rule. A conversation whose final turn alone exceeds the
    * budget keeps zero turns.
    */
  def conversationStats(turns: DataFrame, convCol: String, turnCol: String,
                        roleCol: String, contentCol: String,
                        budget: Long): DataFrame = {
    val tk = size(split(col(contentCol), " ")).cast("long")
    val base = turns.select(col(convCol).as("conv_id"),
      col(turnCol).as("turn"), col(roleCol).as("role"), tk.as("tk"))
    val w = Window.partitionBy("conv_id").orderBy(col("turn").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .withColumn("sfx", sum(col("tk")).over(w))
      .groupBy(col("conv_id"))
      .agg(
        count(lit(1)).as("n_turns"),
        sum(when(col("role") === "user", col("tk")).otherwise(lit(0L)))
          .as("user_tokens"),
        sum(when(col("role") === "assistant", col("tk")).otherwise(lit(0L)))
          .as("assistant_tokens"),
        sum(col("tk")).as("total_tokens"),
        sum((col("sfx") <= budget).cast("long")).as("kept_turns"),
        coalesce(max(when(col("sfx") <= budget, col("sfx"))), lit(0L))
          .as("kept_tokens"))
  }
}
