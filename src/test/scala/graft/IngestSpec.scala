package graft

import org.apache.spark.sql.functions._
import graft.core.{Blake2b256, BitOps, LinkConfig}
import graft.ingest._
import graft.link.{Linker, Pipeline}
import graft.cluster.Solver

class Blake2bSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("BLAKE2b-256 matches hashlib vectors") {
    assert(Blake2b256.hashHex(Array.emptyByteArray) ==
      "0e5751c026e543b2e8ab2eb06099daa1d1e5df47778f7787faab45cdf12fe3a8")
    assert(Blake2b256.hashName("abc") ==
      "bddd813c634239723171ef3fee98579b94964e3bb1cb3e427262c8c068d52319")
    assert(Blake2b256.hashName("1") ==
      "92cdf578c47085a5992256f0dcf97d0b19f1f1c9de4d5fe30c3ace6191b6e5db")
    assert(Blake2b256.hashName("The quick brown fox jumps over the lazy dog") ==
      "01718cec35cd3d796dd00020e0bfecb473ad23457d063b75eff29c0ffa2e58a9")
    // multi-block input (>128 bytes) exercises the streaming compress path
    assert(Blake2b256.hashHex(Array.tabulate[Byte](256)(_.toByte)) ==
      "39a7eb9fedc19aabc83425c6755dd90e6f9d0c804964a1f4aaeea3b9fb599835")
    // 64-hex output parity with reference block-name hashing
    assert(Blake2b256.hashName("block-42").length == 64)
  }
}

class TextExtractSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("golden extraction cases (frozen spec)") {
    assert(TextExtract.extract("<html><body><p>hello world</p></body></html>")
      == "hello world")
    assert(TextExtract.extract(
      "<head><script>var x='<p>no</p>';</script><style>a{}</style></head><b>yes</b>")
      == "yes")
    assert(TextExtract.extract("a<!-- comment -->b") == "ab") // comments vanish
    assert(TextExtract.extract("x &amp; y &lt;z&gt; &quot;q&quot; &#39;s&#39; &nbsp;!")
      == "x & y <z> \"q\" 's' !")
    assert(TextExtract.extract("&#72;&#105; &#x21;") == "Hi !")
    assert(TextExtract.extract("  a\n\t b\r\n c  ") == "a b c")
    assert(TextExtract.extract("") == "")
    assert(TextExtract.extract("<ScRiPt>boom</sCrIpT>ok") == "ok")
  }
}

class ClkEncoderSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("encoder is deterministic, 128 bytes, self-dice = 1") {
    val t = "jane doe 42 acacia avenue springfield"
    val a = ClkEncoder.encode(t)
    val b = ClkEncoder.encode(t)
    assert(a.length == 128)
    assert(a.sameElements(b))
    assert(BitOps.dice(a, b) == 1.0)
    assert(BitOps.popcount(a) > 0)
  }
  test("near-duplicates score high, different entities low") {
    val t1 = "jane doe 42 acacia avenue springfield extra content words here"
    val t2 = "jane doe 42 acaica avenue springfield extra content words here" // 1 swap
    val t3 = "zefir quorl 977 mulberry lane gotham other unrelated stuff entirely"
    val (a, b, c) = (ClkEncoder.encode(t1), ClkEncoder.encode(t2), ClkEncoder.encode(t3))
    assert(BitOps.dice(a, b) > 0.85, s"near-dup dice ${BitOps.dice(a, b)}")
    assert(BitOps.dice(a, c) < 0.6, s"distinct dice ${BitOps.dice(a, c)}")
  }
  test("empty text -> empty clk") {
    assert(BitOps.popcount(ClkEncoder.encode("")) == 0)
  }
  test("positionsDistinct == set bits of encode (the aux-dump contract)") {
    for (t <- Seq("jane doe 42 acacia avenue springfield",
        "zefir quorl 977 mulberry lane gotham", "a", "", "x y z 1 2 3")) {
      val clk = ClkEncoder.encode(t)
      val fromBytes = (0 until clk.length * 8)
        .filter(b => (clk(b >>> 3) & (1 << (b & 7))) != 0)
      assert(ClkEncoder.positionsDistinct(t).toSeq == fromBytes,
        s"positions mismatch for '$t'")
    }
  }
  test("blipFlips: deterministic, ~1/rate density, applyFlips is XOR involution") {
    val f1 = ClkEncoder.blipFlips(42L)
    val f2 = ClkEncoder.blipFlips(42L)
    assert(f1.sameElements(f2))
    assert(!f1.sameElements(ClkEncoder.blipFlips(43L)))
    // keyed-hash residue density: expect bits/8 ± a wide tolerance
    assert(f1.length > 1024 / 16 && f1.length < 1024 / 4, s"density ${f1.length}")
    assert(f1.toSeq == f1.toSeq.sorted && f1.distinct.length == f1.length)
    val clk = ClkEncoder.encode("jane doe 42 acacia avenue springfield")
    val hardened = ClkEncoder.applyFlips(clk, f1)
    assert(!hardened.sameElements(clk))
    assert(ClkEncoder.applyFlips(hardened, f1).sameElements(clk))
    // flipped-bit count == mask size (XOR flips exactly the mask positions)
    val hd = (0 until 1024).count(b =>
      ((clk(b >>> 3) ^ hardened(b >>> 3)) & (1 << (b & 7))) != 0)
    assert(hd == f1.length)
  }
  test("shinglePositions: union over a text's shingles == positionsDistinct") {
    for (t <- Seq("jane doe 42 acacia avenue springfield",
        "zefir quorl 977 mulberry lane gotham", "a", "x y z 1 2 3")) {
      val fromShingles = ClkEncoder.shingles(t).distinct
        .flatMap(s => ClkEncoder.shinglePositions(s)).distinct.sorted.toSeq
      assert(fromShingles == ClkEncoder.positionsDistinct(t).toSeq,
        s"per-shingle positions disagree for '$t'")
      // each shingle sets at most k distinct positions
      ClkEncoder.shingles(t).foreach(s =>
        assert(ClkEncoder.shinglePositions(s).length <= ClkEncoder.DefaultK))
    }
  }
  test("foldXor: bit q of fold == parity of positions ≡ q (mod 512)") {
    for (t <- Seq("jane doe 42 acacia avenue springfield",
        "zefir quorl 977 mulberry lane gotham", "a", "", "x y z 1 2 3")) {
      val f = ClkEncoder.foldXor(ClkEncoder.encode(t))
      assert(f.length == 64)
      val pos = ClkEncoder.positionsDistinct(t)
      val want = (0 until 512)
        .filter(q => pos.count(p => p % 512 == q) % 2 == 1)
      val bits = (0 until 512)
        .filter(b => (f(b >>> 3) & (1 << (b & 7))) != 0)
      assert(bits == want, s"fold parity mismatch for '$t'")
      assert(BitOps.popcount(f) == want.size)
    }
    // odd-length input refused
    intercept[IllegalArgumentException] {
      ClkEncoder.foldXor(Array[Byte](1, 2, 3))
    }
  }
}

class IngestSpec extends SparkSpec {

  test("per-row invariant: extract(html) == text byte-identically (2x1000 corpus)") {
    val pages = PagesSynth.pages(spark, Seq(1000, 1000), overlap = 0.75, noise = 0.05)
    assert(Ingest.extractMismatchCount(pages) == 0)
    assert(pages.count() == 2000)
  }

  test("overlap postcondition: |A∩B| = floor(min * overlap)") {
    import spark.implicits._
    val pages = PagesSynth.pages(spark, Seq(400, 300), overlap = 0.75)
    val byDp = pages.groupByKey(_.dp).mapGroups((dp, it) => (dp, it.map(_.truth_entity).toSet))
      .collect().toMap
    assert((byDp(0) intersect byDp(1)).size == math.floor(300 * 0.75).toInt)
  }

  test("LSH-blocked linkage on synthetic pages: F1 >= 0.99 and >=50x fewer comparisons") {
    import spark.implicits._
    val pages = PagesSynth.pages(spark, Seq(1000, 1000), overlap = 0.75, noise = 0.05)
      .cache()
    val blocked = Ingest.encodeAndBlock(pages).cache()
    val cfg = LinkConfig(threshold = 0.8)

    val comparisons = Linker.totalComparisons(blocked)
    assert(comparisons > 0 && comparisons * 50 < 1000L * 1000L,
      s"blocking too weak: $comparisons comparisons")

    val clusters = Solver.solve(Linker.scoreCandidates(blocked, cfg), cfg)
    val truth = pages.filter(_.dp == 0).map(p => (p.truth_entity, p.entity_id))
      .toDF("t", "rec0")
      .join(pages.filter(_.dp == 1).map(p => (p.truth_entity, p.entity_id)).toDF("t", "rec1"), "t")
      .select($"rec0", $"rec1")
    val f1 = Pipeline.pairwiseF1(clusters, truth)
    info(s"comparisons=$comparisons (full cross = 1e6), F1=$f1")
    assert(f1 >= 0.99, s"F1 $f1")
  }

  test("block stats and common blocks are consistent") {
    import spark.implicits._
    val pages = PagesSynth.pages(spark, Seq(200, 200), overlap = 0.5)
    val blocked = Ingest.encodeAndBlock(pages)
    val stats = Blocking.blockStats(blocked)
    // every record contributes exactly `bands` block rows
    assert(stats.agg(sum($"n")).head().getLong(0) == 400L * Blocking.DefaultBands)
    val common = Blocking.commonBlocks(blocked)
    assert(common.count() > 0)
    assert(common.where($"dp0" >= $"dp1").count() == 0)
    // all block keys are 64-hex (BLAKE2b-256 parity)
    assert(blocked.where(not(col("block_key").rlike("^[0-9a-f]{64}$"))).count() == 0)
  }

  test("LinkExtract: ordered out-edges, attrs tolerated, malformed skipped") {
    import spark.implicits._
    val pages = Seq(
      (1L, """<p>x</p><a href="https://a/1">one</a> mid """ +
        """<a href="https://a/2" rel="nofollow">two words</a>"""),
      // unclosed anchor and a non-anchor tag: no match
      (2L, """<a href="https://b/1">dangling <a name="x">none"""),
      // empty anchor text and empty href both extract as empty strings
      (3L, """<a href="">empty</a><a href="https://c/1"></a>"""),
      (4L, "no links at all"))
      .toDF("doc", "html")
    val got = graft.ingest.LinkExtract.links(pages, "doc", "html")
      .select($"src".as[Long], $"pos".as[Int], $"href".as[String],
        $"anchor".as[String])
      .collect().toSet
    val want = Set(
      (1L, 0, "https://a/1", "one"),
      (1L, 1, "https://a/2", "two words"),
      (3L, 0, "", "empty"),
      (3L, 1, "https://c/1", ""))
    assert(got == want)
  }

  test("anchorProfile: in-degree, distinct sources, dominant anchor") {
    import spark.implicits._
    val links = Seq(
      (1L, 0, "https://t/a", "alpha"),
      (1L, 1, "https://t/a", "alpha"),  // same src twice
      (2L, 0, "https://t/a", "beta"),
      (3L, 0, "https://t/a", "beta"),   // tie 2-2 -> lexicographically greater "beta"
      (2L, 1, "https://t/b", "only"))
      .toDF("src", "pos", "href", "anchor")
    val got = graft.ingest.LinkExtract.anchorProfile(links)
      .select($"href".as[String], $"in_degree".as[Long],
        $"n_sources".as[Long], $"top_anchor".as[String], $"top_cnt".as[Long])
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("https://t/a") == ((4L, 3L, "beta", 2L)))
    assert(got("https://t/b") == ((1L, 1L, "only", 1L)))
  }

  test("frontier: uncrawled targets only, referrer counts exact") {
    import spark.implicits._
    val links = Seq(
      (1L, "https://t/a"), (2L, "https://t/a"), (2L, "https://t/a"),
      (1L, "https://t/b"), (3L, "https://t/c"))
      .toDF("src", "href")
    val crawled = Seq("https://t/b").toDF("crawled_url")
    val got = graft.ingest.LinkExtract.frontier(links, crawled)
      .select($"href".as[String], $"in_degree".as[Long], $"n_referrers".as[Long])
      .collect().toSet
    assert(got == Set(("https://t/a", 3L, 2L), ("https://t/c", 1L, 1L)))
  }

  test("WarcIO: write -> read round-trip is exact, incl. CRLFs in payload") {
    import spark.implicits._
    val recs = Seq(
      ("https://x/1", "2026-01-01T00:00:00Z", "<html>plain</html>"),
      // Content-Length framing must preserve an interior double-CRLF
      ("https://x/2", "2026-01-01T00:00:01Z", "head\r\n\r\nbody"),
      ("https://x/3", "2026-01-01T00:00:02Z", ""))
      .toDF("url", "date", "payload")
    graft.ingest.WarcIO.writeWarc(recs, "/tmp/graft_warc_spec")
    val back = graft.ingest.WarcIO.readWarc(spark, "/tmp/graft_warc_spec")
      .select($"url".as[String], $"warc_type".as[String],
        $"warc_date".as[String], $"content_length".as[Int],
        $"payload".as[String])
      .collect().toSet
    val want = Seq(
      ("https://x/1", "2026-01-01T00:00:00Z", "<html>plain</html>"),
      ("https://x/2", "2026-01-01T00:00:01Z", "head\r\n\r\nbody"),
      ("https://x/3", "2026-01-01T00:00:02Z", ""))
      .map { case (u, d, p) => (u, "response", d, p.length, p) }.toSet
    assert(back == want)
    // record-aligned splits: a many-partition write still reads whole
    val big = spark.range(500).select(
      concat(lit("https://x/"), col("id")).as("url"),
      lit("2026-01-01T00:00:00Z").as("date"),
      concat(lit("<p>doc "), col("id"), lit("</p>")).as("payload"))
    graft.ingest.WarcIO.writeWarc(big.repartition(7), "/tmp/graft_warc_spec2")
    val n = graft.ingest.WarcIO.readWarc(spark, "/tmp/graft_warc_spec2")
      .where($"warc_type" === "response").count()
    assert(n == 500)
  }
}
