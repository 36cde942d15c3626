package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def segment(w: String, model: Seq[(String, Long)]): Seq[String] = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    model.foreach { case (p, s) => m.put(p, java.lang.Long.valueOf(s)) }
    val maxLen = model.map(_._1.length).max
    graft.plans.UnigramSegment.segment(w, m, maxLen)
      .toObjectArray(org.apache.spark.sql.types.StringType)
      .map(_.toString).toSeq
  }

  /** Brute force: enumerate EVERY segmentation into vocab pieces, keep the
    * max total; ties prefer the longer-pieces-from-the-END ordering (the
    * additive-DP equivalent of "each position prefers the longer last
    * piece"). Independent implementation of the kernel's contract.
    */
  private def brute(w: String, model: Map[String, Long]): Seq[String] = {
    def all(s: String): Seq[List[String]] =
      if (s.isEmpty) Seq(Nil)
      else (1 to s.length).flatMap { j =>
        val head = s.substring(0, j)
        if (model.contains(head)) all(s.substring(j)).map(head :: _) else Nil
      }
    val cands = all(w)
    assert(cands.nonEmpty, s"'$w' not segmentable")
    cands.maxBy { seg =>
      // (total, piece lengths from the end) — lengths padded lexicographic
      (seg.map(model).sum, seg.reverse.map(_.length).mkString(","))
    }(Ordering.Tuple2(Ordering.Long, Ordering.String))
  }

  test("Viterbi kernel equals brute-force enumeration, ties included") {
    // score table engineered for heavy ties: equal scores for many pieces
    val model = Seq("a" -> -100L, "b" -> -100L, "ab" -> -200L, "ba" -> -200L,
      "aa" -> -150L, "bb" -> -250L, "aba" -> -300L, "abab" -> -405L)
    val words = for {
      n <- 1 to 8
      i <- 0 until 40
    } yield {
      val rng = new scala.util.Random(n * 100 + i)
      (1 to n).map(_ => if (rng.nextBoolean()) 'a' else 'b').mkString
    }
    words.distinct.foreach { w =>
      val k = segment(w, model)
      val b = brute(w, model.toMap)
      assert(k == b, s"'$w': kernel $k vs brute $b")
      assert(k.mkString("") == w, s"'$w': pieces must concatenate back")
    }
    // explicit tie: 'ab' as [ab] (-200) vs [a,b] (-200) — longer last
    // piece wins the tie, and that is [ab]
    assert(segment("ab", model) == Seq("ab"))
    // missing character fails loud with the word named
    val e = intercept[Exception] { segment("az", model) }
    assert(e.getMessage.contains("az"), e.getMessage)
    // multi-char-only vocabulary: intermediate positions are unreachable
    // (no "a"/"b" pieces) but the word still has a parse — must succeed,
    // not fail on the odd prefix (ADVICE r15)
    val multiOnly = Seq("ab" -> -200L, "bab" -> -290L)
    assert(segment("abab", multiOnly) == Seq("ab", "ab"))
    assert(segment("abbab", multiOnly) == Seq("ab", "bab"))
    // a word with reachable prefixes but NO full parse still fails loud
    val e2 = intercept[Exception] { segment("aba", multiOnly) }
    assert(e2.getMessage.contains("aba"), e2.getMessage)
  }

  test("unigramLmVocab matches the hand-computed EM round on a tiny corpus") {
    // corpus: "abab" x3, "ab" x2, "b" x1 — maxPieceLen 2, minCount 2.
    // Seeds (freq-weighted substring occurrences): a=8, b=9, ab=8, ba=3.
    // Viterbi under seed scores: "abab" -> [ab, ab] (two mid-probability
    // pieces beat any 3-piece path), "ab" -> [ab], "b" -> [b].
    // Round-1 usage: ab = 2*3 + 1*2 = 8, b = 1, a = 0 (mandatory char
    // floor), ba drops (unused multi-char piece).
    val docs = Seq("abab abab abab ab ab b").toDF("text")
    val out = TextOps.unigramLmVocab(docs, "text", maxPieceLen = 2,
        rounds = 1, vocabSize = 10, minCount = 2L)
      .select($"rank", $"piece", $"usage", $"score_fp")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(out.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((1L, "ab", 8L), (2L, "b", 1L), (3L, "a", 0L)), out.mkString(", "))
    // final scores are the LnFp micro-nats of floor(usage*1e12/9), floor 1
    val ln = graft.plans.LnFp.lnMicro _
    val q = 1000000000000L
    assert(out.find(_._2 == "ab").get._4 == ln(8L * q / 9L, q))
    assert(out.find(_._2 == "b").get._4 == ln(q / 9L, q))
    assert(out.find(_._2 == "a").get._4 == ln(1L, q))
  }

  test("trainer invariants: chars mandatory, vocab capped, rounds converge usage") {
    val docs = graft.core.Tables.documents(spark, sf)
    val out = TextOps.unigramLmVocab(docs, "text", maxPieceLen = 4,
      rounds = 2, vocabSize = 60, minCount = 2L).collect()
    assert(out.length <= 60)
    val pieces = out.map(_.getString(1)).toSet
    // every corpus character survives pruning
    val chars = docs.select(explode(split(col("text"), "")).as("c"))
      .filter(length($"c") > 0 && $"c" =!= " ")
      .distinct().as[String].collect().toSet
    assert(chars.subsetOf(pieces), (chars -- pieces).toString)
    // ranks are 1..n by (usage desc, piece asc)
    val byRank = out.sortBy(_.getLong(0))
    assert(byRank.map(_.getLong(0)).toSeq == (1L to out.length).toSeq)
    val key = byRank.map(r => (-r.getLong(2), r.getString(1))).toSeq
    assert(key == key.sorted, "rank order must be (usage desc, piece asc)")
    // total usage equals the corpus token-piece count of a final E-step?
    // weaker invariant that must hold: usage is nonnegative and multi-char
    // pieces carry usage >= 1 (unused ones drop before pruning)
    assert(out.forall(_.getLong(2) >= 0))
    assert(out.filter(_.getString(1).length > 1).forall(_.getLong(2) >= 1))
  }

  test("seedSize caps the seed inventory: >cap candidates train under the cap") {
    // Five bigram words, ALL clearing minCount, but seedSize = 3: only the
    // top three by usage (ab 1000, cd 800, ef 600) may enter the seed; gh
    // (500) and ij (400) would have trained uncapped and must NOT appear.
    // Each surviving bigram beats its char path in the DP (ln p(xy) =
    // ln(freq/9000) > 2 ln(freq/9000)), so the capped three all train.
    val words = Seq("ab" -> 1000, "cd" -> 800, "ef" -> 600,
      "gh" -> 500, "ij" -> 400)
    val docs = words.flatMap { case (w, n) => Seq.fill(n)(w) }
      .grouped(100).map(_.mkString(" ")).toSeq.toDF("text")
    val out = TextOps.unigramLmVocab(docs, "text", maxPieceLen = 2,
        rounds = 1, vocabSize = 50, minCount = 2L, seedSize = 3)
      .select($"piece").as[String].collect().toSet
    val multis = out.filter(_.length > 1)
    assert(multis == Set("ab", "cd", "ef"), s"seed cap leaked: $multis")
    // the 10 mandatory characters all survive alongside the capped seeds
    assert(words.flatMap(_._1.split("")).toSet.subsetOf(out))
  }
}
