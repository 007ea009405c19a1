package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.ingest.Blocking
import graft.cluster.{Survivorship, Triangles}

/** Sorted-neighborhood blocking, meta-blocking WEP, golden-record
  * survivorship, triangle counting — each checked against an
  * in-test brute-force re-computation on small inputs.
  */
class ResolveOpsSpec extends SparkSpec {
  import spark.implicits._

  test("suffixBlockPairs == local suffix-blocking brute force (prune + pairing)") {
    val rows = Seq(
      (0, 1L, "katherine"), (1, 2L, "catherine"), // shared tail "atherine"
      (0, 3L, "kathy"), (1, 4L, "kathy"),         // exact key
      (0, 5L, "jon"), (1, 6L, "jon"),             // below minLen: no suffixes
      (0, 7L, "williamson"), (1, 8L, "wiliamson"),
      // 4 records sharing tail "smith" -> block size 4 > cap 3, pruned
      (0, 9L, "xsmith"), (1, 10L, "ysmith"), (0, 11L, "zsmith"), (1, 12L, "smith"))
    val df = rows.toDF("dp", "rec", "key")
    val minLen = 5; val cap = 3L
    val got = Blocking.suffixBlockPairs(df, "dp", "rec", col("key"), minLen, cap)
      .select($"rec0", $"rec1", $"n_shared", $"max_len")
      .as[(Long, Long, Long, Int)].collect().toSet

    def sufs(k: String) =
      (1 to k.length - minLen + 1).map(i => k.substring(i - 1)).toSet
    val memAll = rows.flatMap { case (dp, r, k) => sufs(k).map(s => (dp, r, s)) }
    val kept = memAll.groupBy(_._3).filter(_._2.size <= cap).values.flatten.toSeq
    val want = (for {
      (0, r0, s0) <- kept; (1, r1, s1) <- kept; if s0 == s1
    } yield (r0, r1, s0)).groupBy(p => (p._1, p._2))
      .map { case ((r0, r1), ss) =>
        (r0, r1, ss.size.toLong, ss.map(_._3.length).max) }.toSet
    assert(got == want)
    // the sub-minLen keys produced no memberships at all
    assert(!got.exists(p => p._1 == 5L || p._2 == 6L))
    // katherine/catherine found via the shared tail despite first-char typo
    assert(got.exists(p => p._1 == 1L && p._2 == 2L))
    // the oversized "smith" block was pruned: no pair among recs 9..12
    assert(!got.exists(p => p._1 >= 9L || p._2 >= 9L))
  }

  test("sortedNeighborhoodPairs == brute-force window over the sort order") {
    val rows = Seq(
      (1L, "smith"), (2L, "smyth"), (3L, "smith"), (4L, "adams"),
      (5L, "adamson"), (6L, "zorro"), (7L, "smithe"), (8L, "adams"))
    val df = rows.toDF("id", "key")
    val w = 3
    val got = Blocking.sortedNeighborhoodPairs(df, "id", "key", w)
      .as[(Long, Long, Int)].collect().toSet

    val order = rows.sortBy { case (id, k) => (k, id) }.map(_._1)
    val want = (for {
      i <- order.indices; d <- 1 until w; if i + d < order.size
    } yield (order(i), order(i + d), d)).toSet
    assert(got == want)
    // every pair within the window, nothing outside it
    assert(got.size == (order.size - 1) + (order.size - 2))
  }

  test("sortedNeighborhoodPairs is partitioning-invariant") {
    val df = spark.range(200).select(col("id"),
      (col("id") * 7919 % 101).cast("string").as("key"))
    val a = Blocking.sortedNeighborhoodPairs(df.repartition(1), "id", "key", 4)
      .as[(Long, Long, Int)].collect().toSet
    val b = Blocking.sortedNeighborhoodPairs(df.repartition(13), "id", "key", 4)
      .as[(Long, Long, Int)].collect().toSet
    assert(a == b && a.size == 199 + 198 + 197)
  }

  test("multiPassPairs: union + sorted provenance matches a local scan") {
    val df = spark.range(20).select(col("id"),
      (col("id") % 3).cast("string").as("k3"),
      (col("id") % 6).cast("string").as("k6"))
    val got = Blocking.multiPassPairs(df, "id",
        Seq("mod3" -> col("k3"), "mod6" -> col("k6")))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getInt(3))).toMap
    val want = (for {
      i <- 0L until 20L; j <- i + 1 until 20L
      ss = Seq("mod3" -> (i % 3 == j % 3), "mod6" -> (i % 6 == j % 6))
        .filter(_._2).map(_._1)
      if ss.nonEmpty
    } yield (i, j) -> (ss.sorted.mkString(","), ss.size)).toMap
    assert(got == want)
    // mod6 agreement implies mod3 agreement -> two-scheme pairs exist
    assert(want.values.exists(_._2 == 2), "no multi-scheme pair in fixture")
    assert(want.values.exists(_._2 == 1))
  }

  test("rareTokenKeys: rarest token wins, ties lexicographic, df-distinct") {
    import spark.implicits._
    val df = Seq(
      // "zz" appears in 1 doc, "aa" in 3, "bb" in 2 -> doc 1 keys on zz
      (1L, "aa bb zz"),
      // repeated token counts ONCE per doc (document frequency): "cc"
      // appears twice here but df(cc)=1 < df(bb)=2 -> key cc
      (2L, "aa cc cc bb"),
      // tie: df(mm)=df(nn)=1 -> lexicographically smaller "mm" wins
      (3L, "aa mm nn"))
      .toDF("id", "text")
    val got = graft.ingest.Blocking.rareTokenKeys(df, "id", "text")
      .select($"id".as[Long], $"block_key".as[String], $"key_count".as[Long])
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == (("zz", 1L)))
    assert(got(2L) == (("cc", 1L)))
    assert(got(3L) == (("mm", 1L)))
    assert(got.size == 3)
  }

  test("blockingRuleProfile: comb-2 pair counts match a local group scan") {
    val df = spark.range(100).select(col("id"),
      (col("id") % 7).cast("string").as("k7"),
      (col("id") % 3).cast("string").as("k3"))
    val out = Blocking.blockingRuleProfile(df,
        Seq("mod7" -> col("k7"), "mod3" -> col("k3"),
          "all_one" -> org.apache.spark.sql.functions.lit("x")))
      .orderBy("rule").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toMap
    def comb2(sizes: Seq[Long]) = sizes.map(m => m * (m - 1) / 2).sum
    val s7 = (0 until 7).map(k => (0 until 100).count(_ % 7 == k).toLong)
    val s3 = (0 until 3).map(k => (0 until 100).count(_ % 3 == k).toLong)
    val total = 100.0 * 99 / 2
    assert(out("mod7") == ((7L, s7.max, comb2(s7), 1.0 - comb2(s7) / total)))
    assert(out("mod3") == ((3L, s3.max, comb2(s3), 1.0 - comb2(s3) / total)))
    // degenerate rule: one block of everything, zero reduction
    assert(out("all_one") == ((1L, 100L, 4950L, 0.0)))
  }

  test("metaBlockingWep == brute-force CBS weights + integer mean cut") {
    // ids sharing many blocks survive; single-shared-block noise is cut
    val membership = Seq(
      1L -> "a", 1L -> "b", 1L -> "c",
      2L -> "a", 2L -> "b", 2L -> "c",   // (1,2) weight 3
      3L -> "a", 3L -> "b",              // (1,3),(2,3) weight 2
      4L -> "c",                         // (·,4) weight 1
      5L -> "d",                         // block size 1: purged
      6L -> "e", 7L -> "e", 8L -> "e", 9L -> "e" // big block -> weight-1 pairs
    )
    val df = membership.toDF("id", "bk")
    val got = Blocking.metaBlockingWep(df, "id", "bk", maxBlock = 10)
      .as[(Long, Long, Long)].collect().toSet

    // brute force
    val byBlock = membership.groupBy(_._2).filter(_._2.size >= 2)
    val weights = byBlock.values.flatMap { ms =>
      val ids = ms.map(_._1).distinct.sorted
      for (i <- ids.indices; j <- i + 1 until ids.size)
        yield (ids(i), ids(j))
    }.groupBy(identity).map { case (p, o) => (p._1, p._2, o.size.toLong) }
    val totW = weights.map(_._3).sum
    val cnt = weights.size
    val want = weights.filter(t => t._3 * cnt > totW).toSet
    assert(got == want)
    assert(got.contains((1L, 2L, 3L)) && !got.exists(t => t._3 == 1L))
  }

  test("goldenRecord picks majority value, min-value ties, max fields") {
    val df = Seq(
      (10L, "en", "web", 100L),
      (10L, "en", "book", 250L),
      (10L, "de", "web", 50L),
      (20L, "fr", "web", 7L),
      (20L, "es", "news", 7L) // 1-1 tie -> lexicographic min "es"/"news"
    ).toDF("g", "lang", "source", "n")
    val got = Survivorship.goldenRecord(df, "g", Seq("lang", "source"),
        Seq("n")).orderBy("g").collect()
    assert(got(0) == Row(10L, 3L, "en", "web", 250L))
    assert(got(1) == Row(20L, 2L, "es", "news", 7L))
  }

  test("goldenRecord ignores nulls in vote fields") {
    val df = Seq[(Long, Option[String])](
      (1L, None), (1L, None), (1L, Some("x")), (1L, Some("y")),
      (2L, None)
    ).toDF("g", "f")
    val got = Survivorship.goldenRecord(df, "g", Seq("f"))
      .orderBy("g").collect()
    assert(got(0) == Row(1L, 4L, "x")) // nulls never outvote values
    assert(got(1) == Row(2L, 1L, null)) // all-null group survives as null
  }

  test("bcubed == hand-computed reference values") {
    // classic example: pred {1,2,3,4,5}{6,7}, truth {1,2,3}{4,5}{6,7}
    val assign = Seq(
      (1L, 10L, 100L), (2L, 10L, 100L), (3L, 10L, 100L),
      (4L, 10L, 200L), (5L, 10L, 200L),
      (6L, 20L, 300L), (7L, 20L, 300L)
    ).toDF("id", "pred", "truth")
    val r = graft.cluster.Evaluation.bcubed(assign, "pred", "truth")
      .collect()(0)
    // brute force per record: P_i = |C∩E|/|C|, R_i = |C∩E|/|E|
    // records 1-3: P=3/5 R=1; 4-5: P=2/5 R=1; 6-7: P=1 R=1
    val expP = (3 * 3.0 / 5 + 2 * 2.0 / 5 + 2 * 1.0) / 7
    val expR = 1.0
    assert(r.getAs[Long]("n") == 7L)
    assert(math.abs(r.getAs[Double]("b3_precision") - expP) < 1e-8)
    assert(math.abs(r.getAs[Double]("b3_recall") - expR) < 1e-8)
    val f1 = 2 * expP * expR / (expP + expR)
    assert(math.abs(r.getAs[Double]("b3_f1") - f1) < 1e-8)
  }

  test("bcubed is partitioning-invariant (exact fixed-point sums)") {
    val df = spark.range(500).select(col("id"),
      pmod(xxhash64(col("id")), lit(37)).as("pred"),
      pmod(xxhash64(col("id") + 7), lit(41)).as("truth"))
    val a = graft.cluster.Evaluation.bcubed(df.repartition(1), "pred", "truth")
      .collect()(0)
    val b = graft.cluster.Evaluation.bcubed(df.repartition(17), "pred", "truth")
      .collect()(0)
    assert(a == b) // bit-identical, including the integer sums
  }

  test("kAnonymityStats counts sub-k blocks and memberships per provider") {
    val blocked = Seq(
      (0, 1L, "a"), (0, 2L, "a"), (0, 3L, "a"),    // size-3 block
      (0, 4L, "b"),                                // size-1 (below k)
      (0, 4L, "b"),                                // dup membership row
      (1, 5L, "c"), (1, 6L, "c"),                  // size-2 (below k=3)
      (1, 7L, "d"), (1, 8L, "d"), (1, 9L, "d")
    ).toDF("dp", "entity_id", "block_key")
    val r = graft.ingest.Blocking.kAnonymityStats(blocked, k = 3)
      .orderBy("dp").collect()
    assert(r(0).getAs[Long]("n_blocks") == 2L)
    assert(r(0).getAs[Long]("n_memberships") == 4L) // dup row counted once
    assert(r(0).getAs[Long]("blocks_below_k") == 1L)
    assert(r(0).getAs[Long]("memberships_below_k") == 1L)
    assert(r(0).getAs[Long]("min_block_size") == 1L)
    assert(r(1).getAs[Long]("blocks_below_k") == 1L)
    assert(r(1).getAs[Long]("memberships_below_k") == 2L)
    assert(r(1).getAs[Long]("min_block_size") == 2L)
  }

  test("TruthDiscovery.resolve == local integer fixed-point reimplementation") {
    // 5 sources, 3 objects; o1/o2 make src 0,1 reliable and 3 sloppy,
    // o3 is a pure trust-weighted tie broken by val; one duplicate claim
    val claims = Seq(
      (0L, "o1", "a"), (1L, "o1", "a"), (2L, "o1", "a"),
      (3L, "o1", "b"), (4L, "o1", "b"),
      (0L, "o2", "x"), (1L, "o2", "x"), (4L, "o2", "x"), (3L, "o2", "y"),
      (0L, "o3", "m"), (1L, "o3", "k"),
      (0L, "o1", "a")) // duplicate row must collapse
    val got = graft.cluster.TruthDiscovery.resolve(
        claims.toDF("src", "obj", "val"), "src", "obj", "val")
      .collect()
      .map(r => (r.getAs[String]("obj"), r.getAs[String]("val"),
        r.getAs[Long]("conf"), r.getAs[Long]("n_votes"))).toSet

    def local(rounds: Int, scale: Long) = {
      val c = claims.distinct
      var trust = c.map(_._1).distinct.map(_ -> scale / 2).toMap
      var confN = Map.empty[(String, String), (Long, Long)]
      for (_ <- 1 to rounds) {
        val conf = c.groupBy(x => (x._2, x._3)).map { case (k, cs) =>
          k -> (cs.map(x => trust(x._1)).sum, cs.size.toLong) }
        val tot = conf.groupBy(_._1._1)
          .map { case (o, m) => o -> m.values.map(_._1).sum }
        confN = conf.map { case ((o, v), (cf, n)) =>
          (o, v) -> ((BigInt(cf) * scale / tot(o)).toLong, n) }
        trust = c.groupBy(_._1).map { case (s, cs) =>
          s -> cs.map(x => confN((x._2, x._3))._1).sum / cs.size }
      }
      confN.groupBy(_._1._1).map { case (o, m) =>
        val ((_, v), (cf, n)) = m.minBy { case ((_, v), (cf, _)) => (-cf, v) }
        (o, v, cf, n)
      }.toSet
    }
    val want = local(2, 1000000L)
    assert(got == want, s"got=$got want=$want")
    // the reliable majority won o1/o2; the o3 tie broke to the smaller val
    assert(got.exists(r => r._1 == "o1" && r._2 == "a" && r._4 == 3L))
    assert(got.exists(r => r._1 == "o2" && r._2 == "x"))
    assert(got.exists(r => r._1 == "o3" && r._2 == "k"))
  }

  test("greedyBlockingScheme: marginal-coverage greedy with name tie-break") {
    // truth: rec n (dp0) matches rec 100+n (dp1), n = 1..4
    // p_a blocks {1,2} x {101,102}  -> true {1-101, 2-102}, 2 false
    // p_b blocks {2,3} x {102,103}  -> true {2-102, 3-103}
    // p_c blocks {3,4} x {103,104}  -> true {3-103, 4-104}
    // round 1: three-way tie at 2 -> p_a by name; round 2: p_c adds 2
    // (p_b only 1); round 3: p_b adds 0 (saturated) but still emits
    val rows = Seq(
      (0, 1L, 1L, "x", "", ""), (0, 2L, 2L, "x", "y", ""),
      (0, 3L, 3L, "", "y", "z"), (0, 4L, 4L, "", "", "z"),
      (0, 5L, 9L, "", "", ""), // empty keys everywhere: no memberships
      (1, 101L, 1L, "x", "", ""), (1, 102L, 2L, "x", "y", ""),
      (1, 103L, 3L, "", "y", "z"), (1, 104L, 4L, "", "", "z"))
      .toDF("dp", "rec", "truth", "ka", "kb", "kc")
    val got = Blocking.greedyBlockingScheme(rows, "dp", "rec", "truth",
        Seq("p_a" -> col("ka"), "p_b" -> col("kb"), "p_c" -> col("kc")),
        rounds = 3)
      .orderBy("round")
      .collect()
      .map(r => (r.getAs[Int]("round"), r.getAs[String]("pred"),
        r.getAs[Long]("new_true"), r.getAs[Long]("cum_true"),
        r.getAs[Long]("cand_pairs")))
    assert(got.toSeq == Seq(
      (1, "p_a", 2L, 2L, 4L),
      (2, "p_c", 2L, 4L, 4L),
      (3, "p_b", 0L, 4L, 4L)))
  }

  test("dpBlockSizes: geometric noise == md5 trailing-ones recompute, clamped") {
    // many keys so both noise signs appear and the clamp fires at n=1
    val blocked = (0 until 400).map { i =>
      (i % 2, i.toLong, s"blk${i % 100}")
    }.toDF("dp", "entity_id", "block_key")
    val got = Blocking.dpBlockSizes(blocked).collect()
      .map(r => (r.getAs[Int]("dp"), r.getAs[String]("block_key")) ->
        (r.getAs[Long]("n"), r.getAs[Long]("noise"),
          r.getAs[Long]("n_released"))).toMap
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def trailOnes(w: Long) =
      (1 to 32).count(j => (w & ((1L << j) - 1)) == ((1L << j) - 1)).toLong
    val sizes = (0 until 400).map(i => (i % 2, s"blk${i % 100}"))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got.keySet == sizes.keySet)
    var negSeen = false; var posSeen = false
    sizes.foreach { case ((dp, key), n) =>
      val h = md5hex(s"24301:$dp:$key")
      val g1 = trailOnes(java.lang.Long.parseLong(h.substring(0, 8), 16))
      val g2 = trailOnes(java.lang.Long.parseLong(h.substring(8, 16), 16))
      val noise = g1 - g2
      if (noise < 0) negSeen = true
      if (noise > 0) posSeen = true
      assert(got((dp, key)) == ((n, noise, math.max(n + noise, 0L))),
        s"release mismatch at ($dp,$key)")
    }
    assert(negSeen && posSeen, "two-sided noise never fired one side")
    // determinism: second run is identical
    val again = Blocking.dpBlockSizes(blocked).collect()
      .map(r => (r.getAs[Int]("dp"), r.getAs[String]("block_key")) ->
        (r.getAs[Long]("n"), r.getAs[Long]("noise"),
          r.getAs[Long]("n_released"))).toMap
    assert(again == got)
  }

  test("tfidfCosinePairs == brute-force fixed-point cosine") {
    val docsDf = Seq(
      (1L, "rare1 rare2 common"),
      (2L, "rare1 rare2 common"),
      (3L, "rare3 common"),
      (4L, "common stop stop")
    ).toDF("doc_id", "text")
    val got = graft.textops.TextOps
      .tfidfCosinePairs(docsDf, "doc_id", "text", minSim = 0.0)
      .orderBy("id0", "id1")
      .select("id0", "id1", "dot", "cos")
      .as[(Long, Long, Long, Double)].collect()

    // brute force with the identical integer arithmetic
    val texts = Map(1L -> "rare1 rare2 common", 2L -> "rare1 rare2 common",
      3L -> "rare3 common", 4L -> "common stop stop")
    val tf = texts.map { case (i, t) =>
      i -> t.split(" ").groupBy(identity).map { case (w, o) => w -> o.length.toLong } }
    val dfm = tf.values.flatMap(_.keys).groupBy(identity).map { case (t, o) => t -> o.size.toLong }
    val nDocs = 4L
    def w(i: Long): Map[String, Long] =
      tf(i).map { case (t, f) => t -> f * ((nDocs * 1000L) / dfm(t)) }
    val ids = texts.keys.toSeq.sorted
    val want = (for {
      a <- ids; b <- ids; if a < b
      wa = w(a); wb = w(b)
      shared = wa.keySet intersect wb.keySet
      if shared.nonEmpty
    } yield {
      val dot = shared.toSeq.map(t => wa(t) * wb(t)).sum
      val na = math.sqrt(wa.values.map(x => x * x).sum.toDouble)
      val nb = math.sqrt(wb.values.map(x => x * x).sum.toDouble)
      (a, b, dot, dot / (na * nb))
    }).sortBy(t => (t._1, t._2))
    assert(got.toSeq == want)
    // identical docs score exactly 1.0; df cap never drops these terms
    assert(got.find(t => t._1 == 1L && t._2 == 2L).get._4 == 1.0)
  }

  test("randIndex == brute-force pair enumeration") {
    val assign = Seq(
      (1L, 10L, 100L), (2L, 10L, 100L), (3L, 10L, 100L),
      (4L, 10L, 200L), (5L, 10L, 200L),
      (6L, 20L, 300L), (7L, 20L, 300L)
    )
    val r = graft.cluster.Evaluation
      .randIndex(assign.toDF("id", "pred", "truth"), "pred", "truth")
      .collect()(0)
    // brute force over all 21 pairs
    var same = 0L; var diff = 0L
    for (i <- assign.indices; j <- i + 1 until assign.size) {
      val (_, ci, ei) = assign(i); val (_, cj, ej) = assign(j)
      if (ci == cj && ei == ej) same += 1
      if (ci != cj && ei != ej) diff += 1
    }
    assert(r.getAs[Long]("pairs_total") == 21L)
    assert(r.getAs[Long]("agree_same") == same)
    assert(r.getAs[Long]("agree_diff") == diff)
    assert(math.abs(r.getAs[Double]("rand_index") -
      (same + diff).toDouble / 21) < 1e-12)
  }

  test("clusterChurn classifies splits, merges, stable, and dropouts") {
    // old: {1,2,3} {4,5} {6} {7,8};  new: {1,2} {3} {4,5,6} {7,8}
    val old = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 2L), (5L, 2L),
      (6L, 3L), (7L, 4L), (8L, 4L)).toDF("id", "c")
    val neu = Seq((1L, 11L), (2L, 11L), (3L, 12L), (4L, 13L), (5L, 13L),
      (6L, 13L), (7L, 14L), (8L, 14L)).toDF("id", "c")
    val r = graft.cluster.Evaluation.clusterChurn(old, neu, "id", "c")
      .collect()(0)
    assert(r.getAs[Long]("n_records") == 8L)
    assert(r.getAs[Long]("n_clusters_old") == 4L)
    assert(r.getAs[Long]("n_clusters_new") == 4L)
    assert(r.getAs[Long]("n_split") == 1L)   // {1,2,3} -> {1,2}+{3}
    assert(r.getAs[Long]("n_merged") == 1L)  // {4,5}+{6} -> {4,5,6}
    assert(r.getAs[Long]("n_stable") == 1L)  // {7,8}
    // a record present on one side only becomes churn, not a crash
    val r2 = graft.cluster.Evaluation
      .clusterChurn(old, neu.where(col("id") =!= 8L), "id", "c")
      .collect()(0)
    assert(r2.getAs[Long]("n_records") == 8L)
    assert(r2.getAs[Long]("n_stable") == 0L) // {7,8} split by the dropout
  }

  test("Triangles.perNode == brute-force enumeration") {
    // K4 on 1-4 (4 triangles, 3 per node) + pendant 5 + triangle 6-7-8
    val edges = Seq(
      (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
      (4, 5),
      (6, 7), (7, 8), (8, 6),
      (2, 1), (3, 3) // dup reversed edge + self loop: ignored
    ).toDF("src", "dst")
    val got = Triangles.perNode(edges).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 5L -> 0L,
      6L -> 1L, 7L -> 1L, 8L -> 1L))
  }

  test("Triangles.perNode partitioning-invariant on a random graph") {
    val edges = spark.range(600).select(
      pmod(xxhash64(col("id")), lit(40)).as("src"),
      pmod(xxhash64(col("id") + 1000), lit(40)).as("dst"))
    val a = Triangles.perNode(edges.repartition(1))
      .as[(Long, Long)].collect().toMap
    val b = Triangles.perNode(edges.repartition(11))
      .as[(Long, Long)].collect().toMap
    assert(a == b && a.values.sum > 0)

    // brute force on the collected edge set
    val und = edges.select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .where(col("u") =!= col("v")).distinct()
      .as[(Long, Long)].collect().toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2))
    val want = nodes.map { n =>
      n -> und.toSeq.map { case (u, v) =>
        if (u != n && v != n && und.contains((math.min(u, n), math.max(u, n)))
          && und.contains((math.min(v, n), math.max(v, n)))) 1L else 0L
      }.sum
    }.toMap
    assert(a == want)
  }
}
