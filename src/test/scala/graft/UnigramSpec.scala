package graft

import org.apache.spark.sql.functions._

import graft.ext.UnigramLm

/** Hand fixtures for the unigram-LM trainer (the Sennrich-fixture
  * discipline applied to Kudo 2018): the Viterbi fold is pinned against
  * hand-computed segmentations independently of the DuckDB replay. */
class UnigramSpec extends SparkSpec {

  private def segOne(word: String, costs: Map[String, Double])
      : Seq[String] = {
    import spark.implicits._
    Seq(word).toDF("tok")
      .select(UnigramLm.viterbiPieces(col("tok"), costs).as("ps"))
      .collect()(0).getSeq[String](0)
  }

  test("Viterbi picks the min-cost segmentation") {
    val costs = Map("ab" -> 1.0, "a" -> 2.0, "b" -> 2.0, "c" -> 2.5)
    // ab+c = 3.5 beats a+b+c = 6.5
    assert(segOne("abc", costs) == Seq("ab", "c"))
    assert(segOne("abab", costs) == Seq("ab", "ab"))
  }

  test("cost ties break toward the LONGER piece (the oracle's " +
      "ORDER BY cost ASC, l DESC twin)") {
    val costs = Map("a" -> 1.0, "b" -> 1.0, "ab" -> 2.0)
    assert(segOne("ab", costs) == Seq("ab"))
  }

  test("unknown characters segment through the UNK escape instead of " +
      "failing — and UNK spans collapse maximally (one flat escape " +
      "cost beats escape-plus-anything)") {
    val costs = Map("a" -> 1.0)
    // any segmentation touching an unknown char costs >= 1e9 + extras,
    // so the single whole-word UNK piece (exactly 1e9) wins
    assert(segOne("axa", costs) == Seq("axa"))
    // still lossless on content longer than maxPieceLen
    assert(segOne("axaxaxa", costs).mkString == "axaxaxa")
  }

  test("train(): pieces concatenate back to every fixture word; chars " +
      "kept through the prune; costs positive") {
    import spark.implicits._
    val docs = Seq(
      "the cat sat on the mat",
      "the cat ate the rat",
      "a cat and a rat sat",
      "the mats and the rats").toDF("text")
    val model = UnigramLm.train(docs, "text",
      topWords = 10, seedMulti = 8, keepMulti = 4)
    assert(model.chars.nonEmpty && model.chars.forall(_.length == 1))
    // every char survives the prune (the coverage guarantee)
    assert(model.chars.toSet.subsetOf(model.costs.keySet))
    assert(model.costs.values.forall(_ > 0))
    // losslessness: Viterbi pieces re-concatenate to the word
    val bad = UnigramLm.fixtureWords(docs, "text", 10)
      .select(col("tok"),
        concat_ws("",
          UnigramLm.viterbiPieces(col("tok"), model.costs)).as("re"))
      .filter(col("tok") =!= col("re")).collect()
    assert(bad.isEmpty, s"segmentation lost content: ${bad.mkString}")
    // the vocab rows carry the final-pass usage counts: every fixture
    // word's pieces are vocab members, so total usage is positive
    assert(model.vocab.map(_._3).sum > 0)
  }
}
