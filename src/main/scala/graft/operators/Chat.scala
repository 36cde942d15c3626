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

  /** Conversation-level exact dedup: two conversations are duplicates when
    * their turn-ordered rendered lines are byte-identical (role-tagged —
    * the same words under swapped roles are NOT a dup). Keep-first =
    * lowest conv id per fingerprint group. Output one row per
    * conversation: (conv_id, conv_fp, keep, group_size).
    *
    * The rendering aggregates each conversation's own turns behind an
    * `array_sort` on (turn, line) — `collect_list` order is
    * shuffle-dependent, so the canonical order is re-established inside
    * the row before hashing (the d37 determinism discipline). Group sizes
    * are duplicate-family-sized, so the keeper join is an aggregate+join,
    * never a window over a hot key.
    */
  def dedupConversations(turns: DataFrame, convCol: String, turnCol: String,
                         lineCol: String): DataFrame = {
    val rendered = turns
      .groupBy(col(convCol).as("conv_id"))
      .agg(md5(array_join(
        transform(
          array_sort(collect_list(struct(col(turnCol).as("t"),
            col(lineCol).as("l")))),
          x => x.getField("l")),
        "\n")).as("conv_fp"))
    val groups = rendered.groupBy(col("conv_fp"))
      .agg(min(col("conv_id")).as("__keeper"),
        count(lit(1)).as("group_size"))
    rendered.join(groups, Seq("conv_fp"))
      .select(col("conv_id"), col("conv_fp"),
        (col("conv_id") === col("__keeper")).as("keep"), col("group_size"))
  }
}
