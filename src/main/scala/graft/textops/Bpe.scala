package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING over a distributed corpus
  * (Sennrich, Haddow & Birch 2016 — the subword vocabulary step every
  * modern LM pipeline runs before anything else sees the text). The
  * output is the model itself: the ordered merge table (rank → symbol
  * pair → merged symbol) that a tokenizer then applies greedily.
  *
  * Algorithm, exactly the reference formulation: start from the word
  * frequency table with each word split into characters plus a `</w>`
  * end-of-word marker; each round counts all adjacent symbol pairs
  * weighted by word frequency, merges the most frequent pair everywhere
  * (leftmost-first, non-overlapping), and records it; repeat.
  *
  * Determinism: ties on pair count break to the lexicographically
  * smallest (left, right), so the merge table is a pure function of the
  * corpus — bit-stable across partitionings and replayable in SQL.
  * Word states are SPACE-DELIMITED symbol strings and a merge is one
  * literal `replace(state, " a b ", " ab ")`: left-to-right
  * non-overlapping literal replacement IS greedy leftmost BPE merging
  * (any occurrence the scan skips shares a symbol with the one just
  * merged, which greedy merging must skip too), and `replace` has
  * identical semantics in Spark and DuckDB.
  *
  * Scale shape: the corpus collapses to the word-frequency table in one
  * map-side-combined hash agg (the Zipf head is absorbed by partial
  * aggregation); each round is then one agg over the VOCABULARY (not
  * the corpus) plus a TakeOrdered(1) — the per-round driver state is a
  * single (pair, count) row, the same bounded-model-read discipline as
  * the EM sufficient statistics and the IVF centroids. The vocab frame
  * is persisted once and the per-round merge rewrites ride a nested
  * column expression (depth = merges), so no round rescans the corpus.
  *
  * Only `^[a-z]+$` tokens train the vocabulary (the classic
  * alpha-filtered formulation; also keeps the char split engine-neutral
  * — Java regex `.` is a UTF-16 unit, RE2's a codepoint, equal on
  * ASCII).
  */
object Bpe {

  /** One learned merge operation. */
  final case class Merge(merge_rank: Int, left_sym: String,
    right_sym: String, merged: String, pair_count: Long)

  /** Shared fit loop: persisted word-frequency frame, learned merges,
    * and the final state column (nested replaces). Caller unpersists. */
  private def fit(docs: DataFrame, textCol: String,
      merges: Int): (Seq[Merge], DataFrame, Column) = {
    require(merges >= 1 && merges <= 64, s"merges=$merges")
    val words = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .where(col("w").rlike("^[a-z]+$"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .withColumn("state", concat(lit(" "),
        regexp_replace(col("w"), "(.)", "$1 "), lit("</w> ")))
      .persist()
    var state: Column = col("state")
    val learned = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var exhausted = false
    for (r <- 1 to merges if !exhausted) {
      val syms = split(trim(state), " ")
      val prs = zip_with(
        slice(syms, lit(1), size(syms) - 1),
        slice(syms, lit(2), size(syms) - 1),
        (x, y) => struct(x.as("a"), y.as("b")))
      val best = words.select(col("cnt"), explode(prs).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, c) = (best(0).getString(0), best(0).getString(1),
          best(0).getLong(2))
        learned += Merge(r, a, b, a + b, c)
        state = replace(state, lit(" " + a + " " + b + " "),
          lit(" " + a + b + " "))
      }
    }
    (learned.toSeq, words, state)
  }

  /** Train the first `merges` BPE merge operations on the corpus.
    * @return (merge_rank, left_sym, right_sym, merged, pair_count)
    *         ordered by merge_rank; pair_count is the frequency-weighted
    *         adjacent-pair count AT THE ROUND THAT MERGED IT. */
  def train(docs: DataFrame, textCol: String, merges: Int): DataFrame = {
    val spark = docs.sparkSession
    val (learned, words, _) = fit(docs, textCol, merges)
    try spark.createDataFrame(learned).orderBy("merge_rank")
    finally words.unpersist()
  }

  /** The ENCODE side: train `merges` operations, then report the
    * resulting subword segmentation of the `topK` most frequent words
    * (count DESC, word ASC — deterministic) — the vocabulary readout a
    * tokenizer build publishes (which frequent words are already single
    * tokens, which still fragment = where the next merges would go).
    * Output: (w, cnt, seg) with seg the space-joined subword symbols.
    * The topK collect is a bounded model read (like the merge table
    * itself); the segmentation of the full vocabulary stays distributed
    * in the state column. */
  def segmentTop(docs: DataFrame, textCol: String, merges: Int,
      topK: Int): DataFrame = {
    require(topK >= 1 && topK <= 10000, s"topK=$topK")
    val spark = docs.sparkSession
    val (_, words, state) = fit(docs, textCol, merges)
    try {
      val rows = words.select(col("w"), col("cnt"), trim(state).as("seg"))
        .orderBy(col("cnt").desc, col("w").asc)
        .limit(topK)
      spark.createDataFrame(rows.collect().toSeq
          .map(r => (r.getString(0), r.getLong(1), r.getString(2))))
        .toDF("w", "cnt", "seg")
    } finally words.unpersist()
  }
}
