package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Budget edges of Chat.conversationStats the i3 fixture can't force:
  * a final turn that alone busts the budget (kept = 0), an exact-fit
  * suffix, and a single-turn conversation.
  */
class ChatSpec extends SparkSpec {
  import spark.implicits._

  test("suffix truncation keeps the latest turns that fit the budget") {
    val turns = Seq(
      // conv 1: tokens 4, 3, 2 by turn; suffixes from the end: 2, 5, 9
      (1L, 0L, "user", "a b c d"),
      (1L, 1L, "assistant", "e f g"),
      (1L, 2L, "user", "h i"),
      // conv 2: the final turn alone exceeds the budget -> keep nothing
      (2L, 0L, "user", "a"),
      (2L, 1L, "assistant", "b c d e f g h i j"),
      // conv 3: single turn, exact fit
      (3L, 0L, "user", "a b c d e")
    ).toDF("conv_id", "turn", "role", "content")
    val out = Chat.conversationStats(turns, "conv_id", "turn", "role",
        "content", budget = 5L)
      .select(col("conv_id"), col("n_turns"), col("user_tokens"),
        col("assistant_tokens"), col("total_tokens"), col("kept_turns"),
        col("kept_tokens"))
      .as[(Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 3L, 6L, 3L, 9L, 2L, 5L))) // keeps turns 1+2
    assert(out(2L) == ((2L, 2L, 1L, 9L, 10L, 0L, 0L)))
    assert(out(3L) == ((3L, 1L, 5L, 0L, 5L, 1L, 5L)))
  }
}
