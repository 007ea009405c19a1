package graft.ingest

import org.apache.spark.sql.{Dataset, SparkSession}
import scala.util.Random

/** One synthetic Common-Crawl-style page (schema per
  * BASELINE.json.input_hint: url, warc_ts, html, text, lang; plus
  * bookkeeping columns for ground truth). */
case class Page(
    url: String,
    warc_ts: java.sql.Timestamp,
    html: Array[Byte],
    text: String,
    lang: String,
    dp: Int,
    entity_id: Long,
    truth_entity: Long)

/** Deterministic, seeded synthesizer for the `pages` corpus (FIXTURES.md
  * §B; no external data). Mirrors the reference generator's fixed-overlap
  * postcondition |A∩P| = floor(min(|A|,|P|) * overlap)
  * (`e2etests/util.py:72-128`, default overlap 0.75 at `:162-166`) and
  * febrl-style noisy duplicates. All randomness derives from
  * (seed, truth_entity, dp) — generation is pure per row, so the corpus is
  * identical at any parallelism and scale-out is `spark.range(n).map(f)`.
  *
  * Per-row invariant: `TextExtract.extract(html) == text` byte-identically
  * (asserted in IngestSpec for every generated row).
  */
object PagesSynth {

  private val Epoch = 1577836800L // 2020-01-01T00:00:00Z

  /** Deterministic pseudo-word vocabulary (consonant-vowel syllables). */
  private[ingest] def vocab(seed: Long, size: Int = 10000): Array[String] = {
    val cons = "bcdfghjklmnpqrstvwz"
    val vow = "aeiou"
    Array.tabulate(size) { j =>
      val r = new Random(seed * 1000003L + j)
      val syllables = 2 + r.nextInt(3)
      val sb = new StringBuilder
      (0 until syllables).foreach { _ =>
        sb.append(cons(r.nextInt(cons.length)))
        sb.append(vow(r.nextInt(vow.length)))
        if (r.nextInt(3) == 0) sb.append(cons(r.nextInt(cons.length)))
      }
      sb.toString
    }
  }

  /** Canonical token sequence of an entity: name-like + address-like +
    * content tokens (febrl feature mix, FIXTURES.md §B.1). */
  private def canonicalTokens(v: Array[String], truthEntity: Long): Array[String] = {
    val r = new Random(truthEntity * 2654435761L + 17)
    val name = Array(v(r.nextInt(500)), v(500 + r.nextInt(1000)))
    val addr = Array((1 + r.nextInt(999)).toString, v(1500 + r.nextInt(1000)),
      v(2500 + r.nextInt(100)))
    val content = Array.fill(20)(v(2600 + r.nextInt(v.length - 2600)))
    name ++ addr ++ content
  }

  /** Seeded per-copy noise: token drops and adjacent-char swaps
    * (febrl4-style near-duplicates). */
  private def noisy(tokens: Array[String], truthEntity: Long, dp: Int,
      noise: Double): Array[String] = {
    if (dp == 0 || noise <= 0) return tokens
    val r = new Random(truthEntity * 31L + dp * 7919L + 5)
    tokens.flatMap { t =>
      if (r.nextDouble() < noise) {
        r.nextInt(3) match {
          case 0 => Nil // drop token
          case 1 if t.length >= 2 => // swap adjacent chars
            val i = r.nextInt(t.length - 1)
            val c = t.toCharArray
            val tmp = c(i); c(i) = c(i + 1); c(i + 1) = tmp
            List(new String(c))
          case _ if t.nonEmpty => // duplicate a char
            val i = r.nextInt(t.length)
            List(t.substring(0, i + 1) + t.substring(i))
          case _ => List(t)
        }
      } else List(t)
    }
  }

  private def buildHtml(rowId: Long, dp: Int, tokens: Array[String]): String = {
    val mid = tokens.length / 2
    val (h1, h2) = tokens.splitAt(math.max(mid, 1))
    val body =
      if (h2.isEmpty) s"<p>${h1.mkString(" ")}</p>"
      else s"<p>${h1.mkString(" ")}</p>\n  <p>${h2.mkString(" ")}</p>"
    s"""<html><head><script type="text/javascript">var id=$rowId;</script><style>p{margin:0}</style></head>
<body><!-- dp=$dp -->
  $body
</body></html>"""
  }

  /** Generate the corpus: provider p has sizes(p) rows; provider p>0
    * shares its first floor(min(sizes(0),sizes(p))*overlap) entities with
    * provider 0 (noisy copies), the rest are unique to p. */
  def pages(spark: SparkSession, sizes: Seq[Int], overlap: Double = 0.75,
      noise: Double = 0.05, seed: Long = 42L): Dataset[Page] = {
    import spark.implicits._
    require(sizes.nonEmpty && sizes.forall(_ > 0))
    val offsets = sizes.scanLeft(0L)(_ + _).toArray
    val total = offsets.last
    val n0 = sizes.head
    val shared = sizes.map(np => math.floor(math.min(n0, np) * overlap).toLong).toArray
    val v = vocab(seed)
    val szs = sizes.toArray

    spark.range(total).map { rowId =>
      // locate provider
      var p = 0
      while (p + 1 < offsets.length && rowId >= offsets(p + 1)) p += 1
      val i = rowId - offsets(p)
      val truthEntity =
        if (p == 0 || i < shared(p)) i
        else 1000000000L * p + i
      val canon = canonicalTokens(v, truthEntity)
      val toks = noisy(canon, truthEntity, p, noise)
      val text = toks.mkString(" ")
      val html = buildHtml(rowId, p, toks)
      Page(
        url = s"https://example.org/dp$p/e$truthEntity/$i",
        warc_ts = new java.sql.Timestamp((Epoch + rowId) * 1000L),
        html = html.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        text = text,
        lang = "en",
        dp = p,
        entity_id = i,
        truth_entity = truthEntity)
    }
  }
}
