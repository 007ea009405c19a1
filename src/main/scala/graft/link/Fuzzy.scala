package graft.link

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy string matching — the non-encoded cousin of the CLK
  * pipeline's block → candidate → confirm shape (reference:
  * `backend/entityservice/views/project.py` runs the same three stages
  * over Bloom encodings; here the confirm kernel is plain edit distance
  * so results stay SQL-replayable).
  *
  * Scale shape: candidates come from TWO equi-join block passes (prefix
  * and suffix of `affixLen` chars) — each is a plain shuffle hash join on
  * a short key, no cross product anywhere; the union dedupes before the
  * confirm so the O(maxDist·min(len)) banded Levenshtein (Spark's
  * threshold form — aborts once the distance exceeds `maxDist`) runs once
  * per distinct candidate pair. Dual-affix blocking survives one edit
  * anywhere: a single substitution/deletion/insertion can break the
  * prefix OR the suffix, never both (edits ≤ maxDist touching both
  * affixes require the string to be shorter than 2·affixLen + maxDist).
  */
object Fuzzy {

  /** All (query row, corpus row) pairs sharing a prefix or suffix block
    * whose edit distance is ≤ `maxDist`; adds a `dist` column. Inputs
    * must be distinct on their own columns (the union dedup relies on
    * it) and their column names disjoint.
    */
  def fuzzyJoin(queries: DataFrame, qCol: String,
                corpus: DataFrame, cCol: String,
                maxDist: Int, affixLen: Int = 2): DataFrame = {
    require(maxDist >= 0)
    affixCandidates(queries, qCol, corpus, cCol, affixLen)
      .withColumn("dist", levenshtein(col(qCol), col(cCol), maxDist))
      .where(col("dist") >= 0)
  }

  /** The candidate stage alone: distinct (query row × corpus row) pairs
    * sharing a prefix or suffix block — plug any confirm kernel on top
    * (threshold Levenshtein in [[fuzzyJoin]], Jaro-Winkler in the
    * q_jw_match driver query). */
  def affixCandidates(queries: DataFrame, qCol: String,
                      corpus: DataFrame, cCol: String,
                      affixLen: Int = 2): DataFrame = {
    require(affixLen > 0)
    def blocked(key: Column => Column): DataFrame = {
      val q = queries.withColumn("_fz_b", key(col(qCol)))
      val c = corpus.withColumn("_fz_b", key(col(cCol)))
      q.join(c, "_fz_b").drop("_fz_b")
    }
    val prefix = (s: Column) => substring(s, 1, affixLen)
    val suffix = (s: Column) => substring(s, -affixLen, affixLen)
    blocked(prefix).unionByName(blocked(suffix)).distinct()
  }
}
