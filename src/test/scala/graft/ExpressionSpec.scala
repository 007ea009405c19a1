package graft

import org.apache.spark.sql.functions._
import graft.core.BitOps
import graft.expr.{dice, dicePre, popcount}
import scala.util.Random

class ExpressionSpec extends SparkSpec {

  test("popcount/dice expressions match the JVM kernel (codegen + interpreted)") {
    import spark.implicits._
    val rnd = new Random(7)
    val rows = (1 to 200).map { i =>
      val a = new Array[Byte](128); rnd.nextBytes(a)
      val b = new Array[Byte](128); rnd.nextBytes(b)
      (i, a, b)
    }
    val df = rows.toDF("id", "a", "b")
      .withColumn("pa", popcount(col("a")))
      .withColumn("pb", popcount(col("b")))
      .withColumn("d", dice(col("a"), col("b")))
      .withColumn("dp", dicePre(col("a"), col("b"), col("pa") + col("pb")))
    val got = df.select($"id", $"pa", $"pb", $"d", $"dp")
      .as[(Int, Int, Int, Double, Double)].collect().sortBy(_._1)
    rows.zip(got).foreach { case ((_, a, b), (_, pa, pb, d, dp)) =>
      assert(pa == BitOps.popcount(a))
      assert(pb == BitOps.popcount(b))
      assert(d == BitOps.dice(a, b))
      assert(dp == d)
    }
  }

  test("hamming_lsh_keys == per-bit local recompute (positions in range)") {
    import spark.implicits._
    val bands = 64; val r = 12; val nBits = 1024
    val pos = graft.ingest.Blocking.hammingLshPositions(bands, r, nBits)
    assert(pos.length == bands * r && pos.forall(p => p >= 0 && p < nBits))
    // deterministic: same call, same positions
    assert(pos.sameElements(graft.ingest.Blocking.hammingLshPositions(bands, r, nBits)))
    val rnd = new Random(23)
    val rows = (1 to 150).map { i =>
      (i.toLong, Array.fill(nBits / 64)(rnd.nextLong()))
    }
    val got = rows.toDF("id", "words")
      .withColumn("keys", graft.expr.hammingLshKeys(col("words"), bands, r, nBits))
      .select($"id", $"keys").as[(Long, Array[Long])].collect().sortBy(_._1)
    rows.zip(got).foreach { case ((_, w), (_, keys)) =>
      assert(keys.length == bands)
      for (b <- 0 until bands) {
        var expect = 0L
        for (i <- 0 until r) {
          val p = pos(b * r + i)
          expect |= ((w(p / 64) >>> (p % 64)) & 1L) << i
        }
        assert(keys(b) == expect)
      }
    }
  }

  test("hammingLshPairs == local LSH-pairing brute force on random CLKs") {
    import spark.implicits._
    val rnd = new Random(37)
    val nBits = 1024
    // correlated pairs: provider-1 records are bit-flipped copies of
    // provider-0 ones, so true near-duplicates exist at Dice >= t
    val base = (0 until 60).map(i => Array.fill(16)(rnd.nextLong()))
    def flip(w: Array[Long], k: Int): Array[Long] = {
      val c = w.clone()
      (0 until k).foreach { _ =>
        val p = rnd.nextInt(nBits); c(p / 64) ^= 1L << (p % 64)
      }
      c
    }
    val recs =
      base.zipWithIndex.map { case (w, i) => (0, i.toLong, w) } ++
      base.zipWithIndex.map { case (w, i) =>
        (1, i.toLong, if (i % 3 == 0) flip(w, 30) else Array.fill(16)(rnd.nextLong()))
      }
    val df = recs.toDF("dp", "entity_id", "words")
      .withColumn("pc", aggregate(transform(col("words"), w => bit_count(w)),
        lit(0), (a, x) => a + x))
      .select(col("dp"), col("entity_id"), col("pc").cast("int"), col("words"))
    val t = 0.8
    val got = graft.ingest.Blocking.hammingLshPairs(df, t)
      .select($"rec0", $"rec1", $"n_bands", $"sim")
      .as[(Long, Long, Long, Double)].collect().toSet
    // local replay
    val pos = graft.ingest.Blocking.hammingLshPositions(64, 12, nBits)
    def keys(w: Array[Long]): Array[Long] = Array.tabulate(64) { b =>
      (0 until 12).foldLeft(0L) { (acc, i) =>
        val p = pos(b * 12 + i)
        acc | (((w(p / 64) >>> (p % 64)) & 1L) << i)
      }
    }
    val expect = (for {
      (0, i0, w0) <- recs
      (1, i1, w1) <- recs
      shared = keys(w0).zip(keys(w1)).count { case (a, b) => a == b }
      if shared > 0
      inter = w0.zip(w1).map { case (a, b) => java.lang.Long.bitCount(a & b) }.sum
      pcs = w0.map(java.lang.Long.bitCount).sum + w1.map(java.lang.Long.bitCount).sum
      sim = 2.0 * inter / pcs
      if sim >= t
    } yield (i0, i1, shared.toLong, sim)).toSet
    assert(expect.nonEmpty && got == expect)
  }

  test("sorted_intersect_count == set intersection on random long sets") {
    import spark.implicits._
    val rnd = new Random(11)
    val rows = (1 to 300).map { i =>
      val a = Array.fill(rnd.nextInt(200))(rnd.nextInt(300).toLong).distinct.sorted
      val b = Array.fill(rnd.nextInt(200))(rnd.nextInt(300).toLong).distinct.sorted
      (i, a, b)
    }
    val got = rows.toDF("id", "a", "b")
      .withColumn("n", graft.expr.sortedIntersectCount(col("a"), col("b")))
      .select($"id", $"n").as[(Int, Int)].collect().sortBy(_._1)
    rows.zip(got).foreach { case ((_, a, b), (_, n)) =>
      assert(n == a.toSet.intersect(b.toSet).size)
    }
    // hashedSet ∘ sorted_intersect_count == array_intersect on strings
    // (the per-document precompute + per-pair merge must reproduce the
    // generic string-set intersection count exactly)
    val srows = (1 to 100).map { i =>
      (i, Array.fill(1 + rnd.nextInt(80))("g" + rnd.nextInt(120)).distinct.toSeq,
        Array.fill(1 + rnd.nextInt(80))("g" + rnd.nextInt(120)).distinct.toSeq)
    }
    val sgot = srows.toDF("id", "a", "b")
      .withColumn("n", graft.expr.sortedIntersectCount(
        graft.dedup.Dedup.hashedSet(col("a")), graft.dedup.Dedup.hashedSet(col("b"))))
      .withColumn("m", size(array_intersect(col("a"), col("b"))))
      .select($"id", $"n", $"m").as[(Int, Int, Int)].collect()
    sgot.foreach { case (i, n, m) => assert(n == m, s"row $i: $n != $m") }
  }

  test("hashed_char_ngrams == hashed charNgrams string sets (incl. multibyte)") {
    import spark.implicits._
    val rnd = new Random(3)
    val alphabet = "ab cd€漢e" // multibyte chars exercise the UTF-8 walk
    val rows = (1 to 150).map { i =>
      (i, Array.fill(rnd.nextInt(60))(alphabet(rnd.nextInt(alphabet.length))).mkString)
    } :+ ((151, "")) :+ ((152, "ab")) // shorter than n -> whole-text gram
    val got = rows.toDF("id", "t")
      .withColumn("fast", graft.expr.hashedCharNgrams(col("t"), 3))
      .withColumn("slow", graft.dedup.Dedup.charNgrams(col("t"), 3))
      .select($"id", $"fast", size($"fast").as("nf"), size($"slow").as("ns"),
        // cross-check a pairwise intersection via both representations
        $"slow")
      .collect()
    got.foreach { r =>
      assert(r.getInt(2) == r.getInt(3), s"row ${r.getInt(0)} distinct-count mismatch")
      val fast = r.getSeq[Long](1)
      assert(fast == fast.sorted && fast.distinct == fast, "not sorted-distinct")
    }
    // intersection counts agree with string-set intersections on all pairs
    val sets = got.map(r => (r.getSeq[Long](1).toSet, r.getSeq[String](4).toSet))
    for (a <- sets.take(30); b <- sets.take(30)) {
      assert((a._1 intersect b._1).size == (a._2 intersect b._2).size)
    }
  }

  test("jaro_winkler matches DuckDB-derived vectors + invariants") {
    import spark.implicits._
    // expected values cross-checked against DuckDB v1.0
    // jaro_winkler_similarity (the q_jw_match oracle engine)
    val vectors = Seq(
      ("MARTHA", "MARHTA", 0.9611111111111111),
      ("DIXON", "DICKSONX", 0.8133333333333332),
      ("JELLYFISH", "SMELLYFISH", 0.8962962962962964), // no common prefix
      ("DWAYNE", "DUANE", 0.8400000000000001),
      ("PENNSYLVANIA", "PENNCISYLVANIA", 0.9214285714285715),
      ("cold widget", "cold widge", 0.9818181818181818),
      ("ABCDEF", "ABZZZZZZZZZZ", 0.5), // jaro <= 0.7: no boost
      ("abc", "abc", 1.0),
      ("", "abc", 0.0), ("", "", 0.0), ("a", "b", 0.0))
    val got = vectors.map(v => (v._1, v._2)).toDF("a", "b")
      .withColumn("jw", graft.expr.jaroWinkler($"a", $"b"))
      .select($"a", $"jw").as[(String, Double)].collect().toMap
    vectors.foreach { case (a, b, want) =>
      assert(got(a) == want, s"jw('$a','$b') = ${got(a)}, want $want")
    }
    // symmetry + bounds on random word pairs from the corpus
    val names = spark.read.parquet(s"$sfTiny/part.parquet")
      .select($"p_name").distinct().limit(30).as[String].collect()
    val pairs = for (x <- names; y <- names) yield (x, y)
    val sym = pairs.toSeq.toDF("a", "b")
      .select(graft.expr.jaroWinkler($"a", $"b").as[Double],
        graft.expr.jaroWinkler($"b", $"a").as[Double]).collect()
    sym.foreach { case (x, y) =>
      assert(x == y && x >= 0.0 && x <= 1.0)
    }
    // SQL registration
    graft.expr.registerAll(spark)
    assert(spark.sql("SELECT jaro_winkler('MARTHA','MARHTA')")
      .head().getDouble(0) == 0.9611111111111111)
  }

  test("expressions are null-safe and SQL-registered") {
    import spark.implicits._
    graft.expr.registerAll(spark)
    val df = Seq((Some(Array[Byte](1, 2)), Option.empty[Array[Byte]]))
      .toDF("a", "b")
    val r = df.selectExpr("popcount(a)", "dice(a, b)").collect()(0)
    assert(r.getInt(0) == 2)
    assert(r.isNullAt(1))
  }

  test("wrong SQL argument types fail at analysis, not on executors") {
    import spark.implicits._
    graft.expr.registerAll(spark)
    val df = Seq(("abc", 7L)).toDF("s", "n")
    df.createOrReplaceTempView("t_exprtypes")
    // each call used to reach the executor and die with
    // ClassCastException; ExpectsInputTypes turns them into analysis
    // errors before any job is launched
    for (bad <- Seq(
        "SELECT sorted_intersect_count(s, s) FROM t_exprtypes",
        "SELECT hashed_char_ngrams(n, s) FROM t_exprtypes",
        "SELECT popcount(n) FROM t_exprtypes",
        "SELECT dice(s, s) FROM t_exprtypes",
        "SELECT dot_product(s, s) FROM t_exprtypes",
        "SELECT vector_norm(n) FROM t_exprtypes",
        "SELECT dice_pre(s, s, s) FROM t_exprtypes")) {
      intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(bad).collect()
      }
    }
    // well-typed calls still pass analysis + execute
    val ok = spark.sql(
      "SELECT sorted_intersect_count(hashed_char_ngrams(s, 2), hashed_char_ngrams(s, 2)) FROM t_exprtypes")
      .collect()(0).getInt(0)
    assert(ok == 2) // "abc" -> {ab, bc}
  }

  test("dice stays inside whole-stage codegen (no fallback)") {
    // range source so constant folding can't collapse the expression
    val df = spark.range(100)
      .withColumn("a", org.apache.spark.sql.functions.sha2(col("id").cast("string"), 256).cast("binary"))
      .withColumn("b", org.apache.spark.sql.functions.sha2((col("id") + 1).cast("string"), 256).cast("binary"))
      .select(dice(col("a"), col("b")).as("d"))
      .where(col("d") >= 0.0)
    // "*(n)" marks operators inside a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("dice")), plan)
    assert(df.count() == 100)
  }
}
