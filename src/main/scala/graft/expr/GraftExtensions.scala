package graft.expr

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's Catalyst
  * expressions as SQL functions, so
  * `spark.sql("SELECT dice(a, b) ...")` works on any session built with
  * `.withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.expr.GraftExtensions`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "scala_udf")

  def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("popcount"),
      info("popcount", "popcount(bin) - set bits in a binary column"),
      (es: Seq[Expression]) => Popcount(es.head)))
    e.injectFunction((FunctionIdentifier("dice"),
      info("dice", "dice(a, b) - Sorensen-Dice of two bitvectors"),
      (es: Seq[Expression]) => DiceSimilarity(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("dice_pre"),
      info("dice_pre", "dice_pre(a, b, pcsum) - Dice with precomputed popcount sum"),
      (es: Seq[Expression]) => DiceSimilarityPre(es(0), es(1), es(2))))
    e.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - dot product of two double arrays"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("vector_norm"),
      info("vector_norm", "vector_norm(a) - L2 norm of a double array"),
      (es: Seq[Expression]) => VectorNorm(es.head)))
    e.injectFunction((FunctionIdentifier("sorted_intersect_count"),
      info("sorted_intersect_count",
        "sorted_intersect_count(a, b) - merge-scan intersection size of two " +
          "array<bigint> SET signatures; PRECONDITION: both arrays " +
          "ascending-sorted and duplicate-free (as produced by " +
          "hashed_char_ngrams) - undercounts otherwise"),
      (es: Seq[Expression]) => SortedIntersectCount(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("hashed_char_ngrams"),
      info("hashed_char_ngrams",
        "hashed_char_ngrams(text, n) - sorted distinct xxhash64 of character n-grams"),
      (es: Seq[Expression]) => HashedCharNgrams(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("jaro_winkler"),
      info("jaro_winkler",
        "jaro_winkler(a, b) - Jaro-Winkler similarity of two strings " +
          "(0.0 on empty input, boost above jaro 0.7, prefix cap 4)"),
      (es: Seq[Expression]) => JaroWinklerSimilarity(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("damerau_levenshtein"),
      info("damerau_levenshtein",
        "damerau_levenshtein(a, b) - true (unrestricted) Damerau-" +
          "Levenshtein distance, adjacent transpositions first-class"),
      (es: Seq[Expression]) => DamerauLevenshtein(es(0), es(1))))
  }
}
