package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * token counting, quality scoring, heuristic language ID, document
  * fingerprinting. All built from codegen'd `functions._` except the
  * fingerprint (pure-Scala FNV-1a UDF; cold path).
  *
  * Design note: every function here is also expressible in ANSI SQL so the
  * driver's DuckDB oracle can replay it — except fingerprint64, which is
  * pinned by ScalaTest vectors instead.
  */
object TextOps {

  /** Whitespace token count (single-space-joined corpus). */
  def tokenCount(text: Column): Column =
    size(split(text, " ")).cast("long")

  /** Distinct-token count. */
  def distinctTokenCount(text: Column): Column =
    size(array_distinct(split(text, " "))).cast("long")

  /** GPT-2-style pre-tokenizer regex, ASCII-simplified: contraction
    * suffixes, space-prefixed letter runs, digit runs, punctuation runs,
    * whitespace runs. Leftmost-first alternation behaves identically in
    * Java regex (Spark) and RE2 (the DuckDB oracle) — verified on
    * contraction/mixed-alnum cases in TextOpsSpec. */
  val BpeTokenPattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s']+|\\s+"

  /** BPE-ish subword pre-token count — the token-count estimate an LLM
    * data pipeline budgets with (whitespace counts undercount punctuation
    * and contractions that BPE tokenizers split). */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeTokenPattern), lit(0))).cast("long")

  /** Quality scoring: token count, type-token ratio, mean token length —
    * the length/diversity heuristics of web-corpus quality filters. */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val toks = split(text, " ")
    val n = size(toks).cast("long")
    Seq(
      "n_tokens" -> n,
      "n_distinct" -> size(array_distinct(toks)).cast("long"),
      "type_token_ratio" -> round(size(array_distinct(toks)).cast("double") / n, 4),
      // mean token length = (chars - separators) / tokens
      "mean_token_len" -> round((length(text) - (n - 1)).cast("double") / n, 4)
    )
  }

  /** Stopword hits for heuristic language ID. */
  val EnStopwords: Seq[String] = Seq("the", "a", "of", "and", "to")

  /** Gopher quality-filter flags (Rae et al. 2021, "Scaling Language
    * Models" Appendix A — the MassiveWeb rule set), with the thresholds
    * parameterised for corpus register: word-count window, mean-word-
    * length window, distinct-stopword floor, duplicate-word ceiling.
    * Emits every per-rule boolean PLUS the conjunction, so a curation
    * run can report which rule rejected what instead of one opaque drop
    * count — the per-rule attrition is the tuning signal.
    *
    * All pure column algebra over one tokenize: map-side only, no
    * shuffle — at 100 TB this is a scan. The rule flags compare the
    * UNROUNDED doubles (the reported columns are display-rounded).
    *
    * @return (id, n_words, mean_word_len, n_stopwords, dup_frac,
    *         ok_words, ok_mean_len, ok_stopwords, ok_dup, pass). */
  def gopherRules(df: DataFrame, id: String, text: String,
      minWords: Long = 15L, maxWords: Long = 40L,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      minStopwords: Long = 2L, maxDupFrac: Double = 0.4): DataFrame = {
    val toks = split(col(text), " ")
    val n = size(toks).cast("long")
    val nd = size(array_distinct(toks)).cast("long")
    val meanLen = (length(col(text)) - (n - 1)).cast("double") / n
    val nStop = size(array_intersect(array_distinct(toks),
      array(EnStopwords.map(lit): _*))).cast("long")
    val dupFrac = (n - nd).cast("double") / n
    val okWords = n >= minWords && n <= maxWords
    val okMean = meanLen >= minMeanLen && meanLen <= maxMeanLen
    val okStop = nStop >= minStopwords
    val okDup = dupFrac <= maxDupFrac
    df.select(col(id), n.as("n_words"),
      round(meanLen, 4).as("mean_word_len"), nStop.as("n_stopwords"),
      round(dupFrac, 4).as("dup_frac"), okWords.as("ok_words"),
      okMean.as("ok_mean_len"), okStop.as("ok_stopwords"),
      okDup.as("ok_dup"),
      (okWords && okMean && okStop && okDup).as("pass"))
  }

  /** Heuristic language ID: fraction of tokens that are English stopwords;
    * >= 0.05 classifies "en", else "unk". (An n-gram frequency heuristic;
    * deterministic, SQL-replayable.) */
  def langIdColumns(text: Column): Seq[(String, Column)] = {
    val toks = split(text, " ")
    // one array pass: a token matches at most one stopword, so a single
    // membership filter equals the per-word count sum
    val hits = size(filter(toks, t => t.isInCollection(EnStopwords))).cast("long")
    val ratio = round(hits.cast("double") / size(toks), 4)
    Seq(
      "stopword_hits" -> hits,
      "stopword_ratio" -> ratio,
      "lang_pred" -> when(ratio >= 0.05, "en").otherwise("unk"))
  }

  /** Composite corpus cleaner — the canonical training-data pipeline
    * chain as ONE declarative plan: token-count window + type-token-ratio
    * floor (quality), stopword-ratio language gate, then exact dedup on a
    * prefix key (keeper = min id). Filters run BEFORE the dedup shuffle,
    * so only surviving rows are hashed — at 100 TB the quality/language
    * gates are a map-side scan and the only shuffle is the final
    * hash-aggregate. Output: (dup_key, keeper_id, group_size). */
  def cleanCorpus(df: DataFrame, id: String, text: String,
      minTokens: Long = 5, maxTokens: Long = 5000, minTtr: Double = 0.3,
      minStopRatio: Double = 0.05, dupKeyTokens: Int = 3): DataFrame = {
    val t = col(text)
    val toks = split(t, " ")
    val n = size(toks).cast("long")
    val ttr = round(size(array_distinct(toks)).cast("double") / n, 4)
    val stopRatio = round(
      size(filter(toks, w => w.isInCollection(EnStopwords))).cast("double") / n, 4)
    df.where(n.between(minTokens, maxTokens) && ttr >= minTtr &&
        stopRatio >= minStopRatio)
      .groupBy(concat_ws(" ", slice(toks, 1, dupKeyTokens)).as("dup_key"))
      .agg(min(col(id)).as("keeper_id"), count(lit(1)).as("group_size"))
  }

  /** Heaps-law vocabulary growth curve: cumulative distinct-token
    * (vocabulary) and total-token counts at fixed id-stride checkpoints
    * of the corpus read order — the sublinearity diagnostic corpus
    * builders sweep to spot template floods (vocabulary flatlines) and
    * boilerplate collapse. A token joins the vocabulary at the FIRST doc
    * (by id) containing it, so the whole curve is one explode + one
    * (token → min id) hash-agg + one checkpoint-grain agg; the running
    * sums ride a window over n_docs/step rows (checkpoint grain — a
    * metadata-scale window like compactionPlan's, never a token-level
    * one). Output: (docs_seen, vocab, total_tokens), docs_seen = the
    * exclusive id bound of each checkpoint. */
  def vocabGrowth(df: DataFrame, id: String, text: String,
      step: Int): DataFrame = {
    require(step > 0, s"step must be positive: $step")
    val toks = df.select(col(id).cast("long").as("__id"),
      explode(split(col(text), " ")).as("token"))
    val ckptOf = (c: String) => expr(s"($c DIV $step) * $step + $step")
    val newTypes = toks.groupBy("token").agg(min(col("__id")).as("first_id"))
      .groupBy(ckptOf("first_id").as("docs_seen"))
      .agg(count(lit(1)).as("new_types"))
    val tokCounts = toks.groupBy(ckptOf("__id").as("docs_seen"))
      .agg(count(lit(1)).as("n_tokens"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("docs_seen"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    tokCounts.join(newTypes, Seq("docs_seen"), "left")
      .select(col("docs_seen"),
        sum(coalesce(col("new_types"), lit(0L))).over(w).cast("long").as("vocab"),
        sum(col("n_tokens")).over(w).cast("long").as("total_tokens"))
  }

  /** Corpus-level unigram frequencies: (token, cnt, total). One explode +
    * one hash-aggregate; the tiny result broadcasts back for scoring. */
  def unigramFrequencies(df: DataFrame, text: String): DataFrame = {
    val tok = df.select(explode(split(col(text), " ")).as("token"))
    val counts = tok.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    counts.crossJoin(broadcast(counts.agg(sum(col("cnt")).as("total"))))
  }

  /** Unigram LM quality score (the CCNet-style perplexity filter at
    * reduced fidelity): mean log10 corpus probability of the document's
    * tokens. Fluent in-domain text scores high; gibberish and
    * out-of-vocabulary junk score low. Plan shape: explode -> broadcast
    * join with the frequency table -> per-doc agg — two shuffles total,
    * no UDF. Output: (id, n_tokens, mean_logprob). */
  def unigramLogProb(df: DataFrame, id: String, text: String): DataFrame = {
    val freqs = unigramFrequencies(df, text)
    val toks = df.select(col(id).as("__id"), explode(split(col(text), " ")).as("token"))
    toks.join(broadcast(freqs), Seq("token"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(log10(col("cnt").cast("double") / col("total"))), 6).as("mean_logprob"))
      .select(col("__id").as(id), col("n_tokens"), col("mean_logprob"))
  }

  /** Bigram LM quality score — one Markov order above
    * [[unigramLogProb]], the cheapest step toward the KenLM-style CCNet
    * perplexity filter: mean log10 of add-one-smoothed conditional
    * probabilities p(w2|w1) = (c(w1 w2) + 1) / (c(w1 ·) + V), with V the
    * corpus vocabulary size. Word-salad documents whose tokens are
    * individually common but never co-occur now score low, which the
    * unigram filter cannot see.
    *
    * Plan shape: bigrams come from zipping the token array with its own
    * tail (pure array exprs — no self-join on position), one hash agg
    * for bigram counts, one for context counts, a broadcast scalar for
    * V, then one join back to score; the bigram model table is joined,
    * not force-broadcast (it grows with the corpus — AQE broadcasts it
    * while it is small). Output: (id, n_bigrams, mean_logprob2). */
  def bigramLogProb(df: DataFrame, id: String, text: String): DataFrame = {
    val tk = split(col(text), " ")
    val pairs = df.select(col(id).as("__id"), tk.as("tk"))
      .where(size(col("tk")) >= 2)
      .select(col("__id"), explode(zip_with(
        slice(col("tk"), lit(1), size(col("tk")) - 1),
        slice(col("tk"), lit(2), size(col("tk")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("__id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val big = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val ctx = big.groupBy("w1").agg(sum(col("cb")).as("c1"))
    val vocab = df.select(explode(split(col(text), " ")).as("token"))
      .agg(countDistinct(col("token")).as("v"))
    val model = big.join(ctx, "w1").crossJoin(broadcast(vocab))
    pairs.join(model, Seq("w1", "w2"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(log10((col("cb") + 1).cast("double") /
          (col("c1") + col("v")))), 6).as("mean_logprob2"))
      .select(col("__id").as(id), col("n_bigrams"), col("mean_logprob2"))
  }

  /** Email pattern shared by the redactor and its oracle. Both patterns
    * are alternation-free with greedy quantifiers, so Java's
    * leftmost-first and RE2's leftmost-longest agree — the same
    * cross-engine constraint bpeTokenCount documents. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** US-style phone pattern (3-3-4 groups with -, . or space). */
  val PhoneRe = "\\d{3}[-. ]\\d{3}[-. ]\\d{4}"

  /** PII redaction (training-data hygiene): replace emails and phone
    * numbers with placeholder tokens, counting each kind. Counts are
    * taken on the ORIGINAL text (so the two are independent), then the
    * replacements apply email-first. Pure codegen regexp exprs — no
    * UDF, no shuffle. Output: (id, n_emails, n_phones, redacted). */
  def redactPii(df: DataFrame, id: String, text: String): DataFrame =
    df.select(col(id).cast("long").as("id"),
      regexp_count(col(text), lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(col(text), lit(PhoneRe)).cast("long").as("n_phones"),
      regexp_replace(regexp_replace(col(text), EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>").as("redacted"))

  /** Gopher/MassiveText-style repetition filters: documents dominated
    * by repeated fragments are low-quality training data. Per doc:
    *  - `dup_2gram_frac` = 1 - distinct/total word 2-grams (pure array
    *    exprs, no shuffle);
    *  - `top_token_frac` = occurrences of the most frequent token over
    *    n_tokens — computed via explode + two partial-aggregated
    *    groupBys (map-side combine), NOT an O(n_tokens^2) per-row
    *    expression, so 5000-token docs cost n, not n^2.
    * Output: (id, n_tokens, dup_2gram_frac, top_token_frac). */
  def repetitionScores(df: DataFrame, id: String, text: String): DataFrame = {
    val toks = split(col(text), " ")
    val grams = when(size(toks) >= 2,
      transform(sequence(lit(0), size(toks) - 2),
        i => array_join(slice(toks, i + lit(1), lit(2)), " ")))
      .otherwise(array().cast("array<string>"))
    val dupFrac = when(size(grams) > 0,
      round(lit(1.0) - size(array_distinct(grams)).cast("double") / size(grams), 4))
      .otherwise(lit(0.0))
    val base = df.select(col(id).cast("long").as("id"),
      size(toks).cast("long").as("n_tokens"), dupFrac.as("dup_2gram_frac"))
    val top = df.select(col(id).cast("long").as("id"), explode(toks).as("tok"))
      .groupBy("id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("id").agg(max(col("c")).as("maxc"))
    base.join(top, Seq("id"), "left")
      .select(col("id"), col("n_tokens"), col("dup_2gram_frac"),
        when(col("n_tokens") > 0,
          round(coalesce(col("maxc"), lit(0L)).cast("double") / col("n_tokens"), 4))
          .otherwise(lit(0.0)).as("top_token_frac"))
  }

  /** Benchmark decontamination (training-data hygiene): flag documents
    * sharing any word n-gram with a benchmark/eval set. The benchmark
    * gram set is tiny next to the corpus, so it broadcasts; the corpus
    * side explodes its n-grams and the broadcast hash join FILTERS them
    * map-side before any shuffle — at 100 TB the only shuffled rows are
    * the (rare) actual hits, then one small per-doc count. No UDFs: the
    * gram construction is transform/sequence/slice column exprs.
    * Output: one row per corpus doc (id, n_hits = distinct shared
    * n-grams, contaminated boolean). */
  def contamination(docs: DataFrame, id: String, text: String,
      bench: DataFrame, benchText: String, n: Int = 8): DataFrame = {
    require(n >= 1, s"n-gram order must be positive: $n")
    def grams(c: Column) = {
      val toks = split(c, " ")
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => array_join(slice(toks, i + lit(1), lit(n)), " ")))
        .otherwise(array().cast("array<string>"))
    }
    val bg = bench.select(explode(grams(col(benchText))).as("gram")).distinct()
    val hits = docs.select(col(id).as("id"), explode(grams(col(text))).as("gram"))
      .join(broadcast(bg), "gram") // map-side filter: only hits survive
      .select("id", "gram").distinct()
      .groupBy("id").agg(count(lit(1)).as("n_hits"))
    docs.select(col(id).cast("long").as("id"))
      .join(hits, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("contaminated", col("n_hits") > 0)
  }

  /** CCNet-style line-level (paragraph) dedup: drop lines whose corpus-wide
    * frequency exceeds `maxFreq` — boilerplate ("subscribe to our
    * newsletter", cookie banners) repeats across pages while content lines
    * don't (Wenzek et al., CCNet, arXiv:1911.00359 §3.1 dedups paragraphs
    * by a 64-bit hash the same way). Shape at 100 TB: one explode, one
    * hash-aggregate on the 8-byte line key (map-side partial), one
    * big-big shuffle join back on that key, one per-doc agg — no
    * collects, no windows over the whole corpus. Keying by xxhash64 of
    * the trimmed line (not the string) keeps the shuffle payload fixed
    * width; a 64-bit collision can only spuriously DROP a unique line
    * (CCNet accepts the same tradeoff).
    * Output: (id, n_lines, n_kept, clean_text = surviving lines joined by
    * '\n' in original order). */
  def lineDedup(docs: DataFrame, id: String, text: String,
      maxFreq: Long = 1): DataFrame = {
    require(maxFreq >= 1, s"maxFreq must be positive: $maxFreq")
    val lines = docs.select(col(id).cast("long").as("id"),
        posexplode(split(col(text), "\n")).as(Seq("pos", "line")))
      .withColumn("key", xxhash64(trim(col("line"))))
    val freq = lines.groupBy("key").agg(count(lit(1)).as("cnt"))
    lines.join(freq, "key")
      .groupBy("id").agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("cnt") <= maxFreq, 1L).otherwise(0L)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(when(col("cnt") <= maxFreq,
            struct(col("pos"), col("line"))))),
          x => x.getField("line")), "\n").as("clean_text"))
  }

  /** Collocation mining: adjacent word pairs ranked by pointwise lift
    * c(xy)·N / (c(x)·c(y)) — the PMI association score with the log
    * dropped (log is monotone, so the RANKING is PMI's, and the raw ratio
    * stays exactly replayable in SQL — the same engine-portability trade
    * [[tfidfTopTerms]] makes; libm log differs across engines).
    *
    * Shape at 100 TB: one explode + hash agg for unigrams, one for
    * bigrams (both map-side partial), two shuffle joins on the word key,
    * a broadcast of the single total-count row, and a global top-k that
    * Spark plans as TakeOrderedAndProject (per-partition heaps + driver
    * merge of k rows — no global sort).
    * Output: (w1, w2, c_xy, c_x, c_y, lift), top k by (lift desc, w1, w2),
    * bigrams below minCount dropped before the joins. */
  def collocations(df: DataFrame, text: String, minCount: Long = 5,
      k: Int = 50): DataFrame = {
    val toks = df.select(split(col(text), " ").as("ts"))
    val uni = toks.select(explode(col("ts")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val total = uni.agg(sum(col("c")).cast("long").as("n"))
    val bi = toks.where(size(col("ts")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(ts)-1), " +
          "i -> struct(element_at(ts, i) AS w1, element_at(ts, i+1) AS w2))"))
        .as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_xy"))
      .where(col("c_xy") >= minCount)
    bi
      .join(uni.select(col("w").as("w1"), col("c").as("c_x")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c_y")), "w2")
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"), col("c_xy"), col("c_x"), col("c_y"),
        round(col("c_xy").cast("double") * col("n").cast("double") /
          (col("c_x").cast("double") * col("c_y").cast("double")), 6)
          .as("lift"))
      .orderBy(desc("lift"), col("w1"), col("w2"))
      .limit(k)
  }

  /** Per-group (domain/source) boilerplate removal: a line is boilerplate
    * within its group when it appears in ≥ max(minDocs, ceil(minFrac ·
    * group_docs)) DISTINCT documents of that group — the CCNet-style
    * "paragraph appears on most pages of the domain" rule (headers,
    * footers, cookie banners), as opposed to [[lineDedup]]'s corpus-global
    * frequency cut.
    *
    * Shape at 100 TB: one explode, one (group, line-hash, doc) distinct +
    * hash agg for the per-group doc frequency, a BROADCAST of the one-row-
    * per-group size table, one shuffle join back on the 8-byte line key,
    * one per-doc agg. Lines ride the shuffles as xxhash64 keys (fixed
    * width); as in [[lineDedup]], a 64-bit collision can only spuriously
    * DROP a unique line.
    * Output: (id, n_lines, n_kept, clean_text = surviving lines joined by
    * '\n' in original order; empty when everything was boilerplate). */
  def boilerplateStrip(docs: DataFrame, id: String, text: String,
      group: Column, minFrac: Double, minDocs: Long = 2): DataFrame = {
    require(minFrac > 0 && minFrac <= 1, s"minFrac out of (0,1]: $minFrac")
    val base = docs.select(col(id).cast("long").as("id"), group.as("grp"),
      col(text).as("t"))
    val lines = base.select(col("id"), col("grp"),
        posexplode(split(col("t"), "\n")).as(Seq("pos", "line")))
      .withColumn("key", xxhash64(trim(col("line"))))
    val groupSizes = base.groupBy("grp").agg(count(lit(1)).as("n_docs"))
    val docFreq = lines.select("grp", "key", "id").distinct()
      .groupBy("grp", "key").agg(count(lit(1)).as("doc_hits"))
    val boiler = docFreq
      .join(broadcast(groupSizes), "grp")
      .where(col("doc_hits") >=
        greatest(lit(minDocs), ceil(lit(minFrac) * col("n_docs"))))
      .select(col("grp"), col("key"), lit(true).as("is_boiler"))
    lines.join(boiler, Seq("grp", "key"), "left")
      .groupBy("id").agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("is_boiler").isNull, 1L).otherwise(0L)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(when(col("is_boiler").isNull,
            struct(col("pos"), col("line"))))),
          x => x.getField("line")), "\n").as("clean_text"))
  }

  /** Top-k characteristic terms per document by tf-idf, with idf as the
    * raw rarity ratio n_docs/df instead of log(n_docs/df) — the ranking
    * is identical (log is monotone) and the ratio form keeps the score
    * exactly replayable in SQL (libm log implementations differ across
    * engines; integer division to double doesn't). Shape at 100 TB: one
    * explode, one (doc,term) agg, one term agg (both map-side partial),
    * a broadcast of the single global-count row, and a per-doc window —
    * partitioned by doc id, so no global sort.
    * Ties break lexicographically; output (id, term, tf, df, score, rank). */
  def tfidfTopTerms(docs: DataFrame, id: String, text: String,
      k: Int = 3): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    val tf = docs.select(col(id).cast("long").as("id"),
        explode(split(col(text), " ")).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df_, "term")
      .crossJoin(broadcast(n))
      .withColumn("score", col("tf") * (col("n_docs") / col("df")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(desc("score"), asc("term"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("id", "term", "tf", "df", "score", "rank")
  }

  /** Token-distribution Shannon entropy per document — the diversity /
    * repetition quality signal (template spam and keyword stuffing sit
    * at low entropy even when the token SET looks rich):
    * H = log2(n) − Σ tf·log2(tf) / n over the token frequencies.
    * Doubles rounded to 6 (the accepted unigram-logprob FP pattern —
    * libm log2 over small integer tf values agrees across engines).
    * Scale shape: one (doc, token) hash agg + one per-doc agg, both
    * map-side combined; no windows, no joins. */
  def tokenEntropy(docs: DataFrame, id: String, text: String): DataFrame = {
    val tf = docs.select(col(id).cast("long").as("id"),
        explode(split(col(text), " ")).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    tf.groupBy("id")
      .agg(sum(col("tf")).as("n_tokens"),
        sum(col("tf") * log2(col("tf"))).as("s"))
      .select(col("id"), col("n_tokens"),
        round(log2(col("n_tokens")) - col("s") / col("n_tokens"), 6)
          .as("entropy"))
  }

  /** BM25 top-k retrieval for a fixed query term set — the ranked-search
    * readout over the corpus (find the documents most about a topic; the
    * retrieval side of contamination checks and eval-set curation).
    * Okapi BM25 with k1 = 6/5, b = 3/4 carried as EXACT RATIONALS: the
    * tf saturation term clears all division by cross-multiplying through
    * 20·total_len·n_docs —
    *
    *   tfpart = tf·(k1+1) / (tf + k1·(1−b + b·len/avgdl))
    *          = 44·tf·TL / (20·TL·tf + 6·TL + 18·len·N)   exactly,
    *
    * and the idf uses the RATIO form (2N−2df+1)/(2df+1) (= the classic
    * (N−df+0.5)/(df+0.5) with the log dropped) in fixed point — the same
    * deliberate monotone-per-term substitution as [[tfidfTopTerms]]:
    * libm log is not bit-stable across engines, and the ratio keeps each
    * term's contribution exactly replayable. NOTE this changes the
    * common/rare BALANCE across summed terms vs log-idf BM25 (rare terms
    * weigh relatively more); it is this engine's documented exact-
    * arithmetic variant, not a claim of score-identical Okapi.
    *
    * All integer arithmetic; the idf·tf·TL numerator AND the
    * denominator's tf·TL / len·N products are widened to decimal(38,0)
    * (HUGEINT in a SQL replay) before the floored divide, so neither
    * side can wrap Long at web-scale corpus lengths.
    * Scale shape: tf rows are filtered to the query's terms BEFORE any
    * join (a query of q terms touches q·N rows, not the corpus × vocab),
    * stats ride one broadcast 1-row table, df per query term another
    * broadcast; deterministic top-k = TakeOrderedAndProject on
    * (score desc, id). */
  def bm25TopK(docs: DataFrame, id: String, text: String,
      queryTerms: Seq[String], k: Int = 20,
      scale: Long = 1000000L): DataFrame = {
    require(queryTerms.nonEmpty && k >= 1)
    val toks = docs.select(col(id).cast("long").as("id"),
      split(col(text), " ").as("ts"))
    val lens = toks.select(col("id"), size(col("ts")).cast("long").as("len"))
    val tfq = toks
      .select(col("id"), size(col("ts")).cast("long").as("len"),
        explode(col("ts")).as("term"))
      .where(col("term").isin(queryTerms: _*))
      .groupBy("id", "len", "term").agg(count(lit(1)).as("tf"))
    val dfq = tfq.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = lens.agg(count(lit(1)).as("n_docs"),
      sum(col("len")).as("tl"))
    tfq.join(broadcast(dfq), "term").crossJoin(broadcast(stats))
      .withColumn("idf",
        expr(s"(${scale}L * (2 * n_docs - 2 * df + 1)) DIV (2 * df + 1)"))
      .withColumn("contrib",
        expr("""CAST(idf AS DECIMAL(38,0)) * (44 * CAST(tf AS DECIMAL(38,0)) * tl)
                DIV (20 * CAST(tl AS DECIMAL(38,0)) * tf + 6 * tl
                     + 18 * CAST(len AS DECIMAL(38,0)) * n_docs)"""))
      .groupBy("id").agg(sum(col("contrib")).as("bm25"))
      .orderBy(col("bm25").desc, col("id"))
      .limit(k)
  }

  /** TF-IDF-weighted cosine pair scoring — the vector-space ER scorer
    * (Cohen's WHIRL / soft TF-IDF lineage): pairs score high when they
    * share RARE terms, so "the of and" overlap stops producing false
    * candidates that plain Jaccard/Dice accept. Pairs are generated by
    * the inverted-index join itself (shared term ⇒ candidate), with a
    * df cap dropping stopword-grade terms first — the cap is what
    * bounds per-term fan-out at corpus scale (a term in d docs yields
    * d²/2 pair rows; df ≤ cap makes the worst term cap²/2).
    *
    * Determinism discipline: term weights are FIXED-POINT longs —
    * w = tf · ((n_docs · scale) DIV df) — so pair dot products and
    * per-doc norms are integer sums (bit-stable at any partitioning,
    * exactly replayable in SQL); doubles appear only in the final
    * cos = dot / (√·√) per pair, computed from those exact integers
    * (IEEE sqrt/division are correctly rounded — engine-identical).
    *
    * Overflow bound: |dot| < shared_terms · (tf·n_docs·scale/df)² — at
    * the default scale 1000, safe through ~10⁸ docs with tf ≤ 100;
    * shrink scale for larger corpora.
    *
    * Scale shape: two hash aggs (tf, df), a broadcast single-row count,
    * the term-keyed pair join (bare ids + weights), one pair agg, one
    * broadcast-able norm join. No windows, no collects.
    *
    * @return (id0, id1, dot, norm0, norm1, cos) for pairs with
    *         cos ≥ minSim sharing ≥ 1 kept term. */
  def tfidfCosinePairs(docs: DataFrame, id: String, text: String,
      minSim: Double, maxDf: Long = 1000L,
      scale: Long = 1000L): DataFrame = {
    val tf = docs.select(col(id).cast("long").as("id"),
        explode(split(col(text), " ")).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .where(col("df") <= maxDf)
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val weighted = tf.join(df_, "term").crossJoin(broadcast(n))
      .select(col("id"), col("term"),
        (col("tf") * expr(s"(n_docs * ${scale}L) DIV df")).as("w"))
    val norms = weighted.groupBy("id")
      .agg(sum(col("w") * col("w")).as("norm_sq"))
    val pairs = weighted.select(col("term"), col("id").as("id0"),
        col("w").as("w0"))
      .join(weighted.select(col("term"), col("id").as("id1"),
        col("w").as("w1")), "term")
      .where(col("id0") < col("id1"))
      .groupBy("id0", "id1").agg(sum(col("w0") * col("w1")).as("dot"))
    pairs
      .join(norms.select(col("id").as("id0"), col("norm_sq").as("n0")), "id0")
      .join(norms.select(col("id").as("id1"), col("norm_sq").as("n1")), "id1")
      .select(col("id0"), col("id1"), col("dot"),
        sqrt(col("n0").cast("double")).as("norm0"),
        sqrt(col("n1").cast("double")).as("norm1"),
        (col("dot").cast("double")
          / (sqrt(col("n0").cast("double"))
             * sqrt(col("n1").cast("double")))).as("cos"))
      .where(col("cos") >= minSim)
  }

  /** Deterministic stratified sampling: the k rows with the smallest
    * seeded hash per stratum — a uniform without-replacement sample
    * that is reproducible at any parallelism and needs no RNG state
    * (hash-order sampling; the per-language/per-source quota draw of a
    * corpus-curation pipeline). Ties break on id. Output:
    * (stratum, id, h, sample_rank).
    *
    * Scale shape: one shuffle keyed by stratum (the window partition);
    * with very few strata at extreme row counts, swap the window for a
    * per-partition bottom-k + merge (the aggregated form) — at normal
    * stratum cardinality the hash-partitioned window never sorts more
    * than one stratum per task. The hash is codegen xxhash64 (not a
    * UDF); its determinism is gated by TextOpsSpec, the quota/ordering
    * semantics by the driver oracle replaying the dumped hashes. */
  def stratifiedSample(df: DataFrame, id: String, stratum: Column, k: Int,
      seed: Long = 42L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("stratum")).orderBy(col("h"), col("id"))
    df.select(stratum.as("stratum"), col(id).cast("long").as("id"))
      .withColumn("h", xxhash64(lit(seed), col("id")))
      .withColumn("sample_rank", row_number().over(w))
      .where(col("sample_rank") <= k)
  }

  /** Deterministic contrastive negative sampling: for every anchor row,
    * the k pool rows with the smallest xxhash64(seed, anchor, candidate)
    * among candidates that are not the anchor and do NOT share its group
    * key (positives excluded — same dup-group documents must never be
    * served as negatives). Hash-order sampling over PAIRS: the
    * [[stratifiedSample]] rule lifted to (anchor, candidate), so the
    * draw is uniform-ish, without replacement, and bit-reproducible at
    * any parallelism with no RNG state.
    *
    * Scale shape: the anchor batch is broadcast (training batches are
    * bounded — hundreds to thousands of anchors), so the pool side never
    * shuffles for candidate generation; the only wide op is the per-
    * anchor top-k window, hash-partitioned on anchor. For anchor sets
    * too big to broadcast, run in batches — the draw for an anchor
    * depends only on (seed, anchor, candidate), so batching never
    * changes a result.
    *
    * Output: (anchor_id, cand_id, rank, h). */
  def negativeSample(pool: DataFrame, id: String, group: Column,
      anchorIds: DataFrame, k: Int, seed: Long = 42L): DataFrame = {
    val p = pool.select(col(id).cast("long").as("cand_id"), group.as("__g"))
    val a = pool.join(anchorIds, col(id) === col("anchor_id"))
      .select(col("anchor_id").cast("long").as("anchor_id"), group.as("__ag"))
    val cand = p.join(broadcast(a),
        col("cand_id") =!= col("anchor_id") && col("__g") =!= col("__ag"))
      .withColumn("h", xxhash64(lit(seed), col("anchor_id"), col("cand_id")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("anchor_id")).orderBy(col("h"), col("cand_id"))
    cand.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("anchor_id", "cand_id", "rank", "h")
  }

  /** Deterministic weighted corpus mixing: keep each row with a
    * per-stratum probability (the domain/language re-weighting step of a
    * training-data pipeline — downsample over-represented strata to
    * target proportions). The keep decision is
    * `md5(seed:id) hex prefix < threshold(weight)` — a pure column
    * predicate with NO rand(): reproducible at any parallelism, on
    * re-runs, and in any engine with md5 (fixed-width lowercase hex
    * compares lexicographically == numerically, so the driver oracle is
    * a plain CASE WHEN string comparison). Weight 1.0 keeps everything;
    * weight 0.0 drops the stratum. Map-side filter — no shuffle at all.
    */
  def mixSample(df: DataFrame, id: String, stratum: Column,
      weights: Map[String, Double], defaultWeight: Double = 1.0,
      seed: String = "mix"): DataFrame = {
    val u = substring(
      md5(concat_ws(":", lit(seed), col(id).cast("string")).cast("binary")),
      1, 8)
    def keep(w: Double): Column =
      if (w >= 1.0) lit(true)
      else if (w <= 0.0) lit(false)
      else u < lit(f"${math.floor(w * 4294967296.0).toLong}%08x")
    val cond = weights.toSeq.sortBy(_._1).foldLeft(keep(defaultWeight)) {
      case (els, (k, w)) => when(stratum === k, keep(w)).otherwise(els)
    }
    df.where(cond)
  }

  /** Inverted index over whitespace tokens: per token, document
    * frequency, total term frequency, and the first `sampleDocs` doc ids
    * as a CSV posting sample. `minDf` prunes the hapax tail.
    *
    * Scale shape: the posting sample is bounded BEFORE aggregation — a
    * row_number window over the distinct (token, doc) pairs keeps ≤
    * `sampleDocs` rows per token, so no unbounded collect_list ever
    * materializes a hot token's full posting list (the classic OOM of
    * naive index builds). Three hash-shuffles total (distinct, window,
    * agg), all keyed by token. */
  def invertedIndex(df: DataFrame, id: String, text: String,
      minDf: Long = 2L, sampleDocs: Int = 10): DataFrame = {
    val toks = df.select(col(id).cast("long").as("doc"),
      explode(split(col(text), " ")).as("token"))
    val counts = toks.groupBy("token")
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc")).as("df"))
      .where(col("df") >= minDf)
    val td = toks.select("token", "doc").distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("token")).orderBy(col("doc"))
    val sample = td.withColumn("rn", row_number().over(w))
      .where(col("rn") <= sampleDocs)
      .groupBy("token")
      // sort the ≤sampleDocs collected ids, then render — deterministic
      // whatever order the agg receives rows in
      .agg(array_join(transform(sort_array(collect_list(col("doc"))),
        _.cast("string")), ",").as("sample_docs"))
    counts.join(sample, "token")
      .select(col("token"), col("df"), col("tf"), col("sample_docs"))
  }

  /** 64-bit FNV-1a document fingerprint over UTF-8 bytes (pure,
    * deterministic; pinned by test vectors — not SQL-replayable). */
  def fingerprint64(text: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  val fingerprintUdf = udf((t: String) => fingerprint64(if (t == null) "" else t))

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every
    * document by how target-like its hashed unigram bag is — the
    * mean log10 likelihood ratio between a target LM and the raw-corpus
    * LM, both add-one-smoothed over a B-bucket hashed vocabulary. The
    * hashing is the whole trick: both models are fixed B-row tables no
    * matter how large the corpus vocabulary grows, so the model join
    * broadcasts at any scale. Positive weight = more target-like than
    * the corpus average; selection/resampling is the caller's cut.
    *
    * Plan shape: one explode + bucket projection (the md5-derived
    * 60-bit hash [[graft.rel.Sketches.hash60]] both engines compute
    * identically), TWO bounded hash-aggs to ≤ B rows (raw + target
    * counts), one broadcast model join, one per-doc agg. Doubles enter
    * only in the final log10 mean, rounded to 6 places — the same
    * cross-engine convention as [[unigramLogProb]].
    *
    * @param isTarget row predicate defining the target distribution
    *                 (e.g. `col("lang") === "en"`).
    * @return (id, n_tokens, dsir_weight). */
  def dsirWeights(df: DataFrame, id: String, text: String,
      isTarget: Column, buckets: Int = 1024): DataFrame = {
    require(buckets >= 2 && buckets <= (1 << 20), "buckets in [2, 2^20]")
    val toks = df
      .select(col(id).as("__id"), isTarget.as("__t"),
        explode(split(col(text), " ")).as("token"))
      .withColumn("b",
        pmod(graft.rel.Sketches.hash60(col("token")), lit(buckets.toLong)))
    val rawC = toks.groupBy("b").agg(count(lit(1)).as("c_r"))
    val tgtC = toks.where(col("__t")).groupBy("b")
      .agg(count(lit(1)).as("c_t"))
    val model = rawC.join(tgtC, Seq("b"), "left").na.fill(0L, Seq("c_t"))
      .crossJoin(broadcast(toks.agg(
        count(lit(1)).as("n_r"),
        sum(when(col("__t"), 1L).otherwise(0L)).cast("long").as("n_t"))))
      .withColumn("logratio",
        log10((col("c_t") + 1).cast("double") /
          (col("n_t") + buckets).cast("double")) -
          log10((col("c_r") + 1).cast("double") /
            (col("n_r") + buckets).cast("double")))
      .select("b", "logratio")
    toks.join(broadcast(model), Seq("b"))
      .groupBy("__id")
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(col("logratio")), 6).as("dsir_weight"))
      .select(col("__id").as(id), col("n_tokens"), col("dsir_weight"))
  }
}
