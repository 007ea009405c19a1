package graft

import org.apache.spark.sql.functions._
import graft.ann.{Ann, Pq}

/** Product-quantization ANN: the distributed index build + ADC search
  * must equal a from-scratch local reimplementation bit-for-bit (the
  * whole path is integer arithmetic, so exact equality — not tolerance —
  * is the contract), stay bit-identical under repartitioning, and rank
  * usefully vs the exact integer L2 ordering. */
class PqSpec extends SparkSpec {
  private lazy val embeddings =
    spark.read.parquet(s"$sfTiny/embeddings.parquet").cache()

  private val NumSub = 8
  private val SubDim = 8
  private val Ksub = 16
  private val Iters = 2
  private val K = 5

  private def d2(a: Array[Int], b: Array[Int]): Long = {
    var s = 0L
    var i = 0
    while (i < a.length) { val d = (a(i) - b(i)).toLong; s += d * d; i += 1 }
    s
  }

  /** Local PQ over the operator's own global quantizer output (the
    * quantization formula itself is exercised against DuckDB by the
    * q_ann_pq_topk oracle, which re-derives codes + ADC from the uv
    * dump). Returns (codes, topk). */
  private def localPq(uv: Map[Long, Array[Int]], queryIds: Seq[Long])
      : (Map[(Long, Int), Long], Set[(Long, Long, Long, Long)]) = {
    def sub(v: Array[Int], m: Int): Array[Int] =
      v.slice(m * SubDim, (m + 1) * SubDim)
    val books: IndexedSeq[Map[Long, Array[Int]]] = (0 until NumSub).map { m =>
      var cents: Map[Long, Array[Int]] =
        uv.keys.toSeq.sorted.take(Ksub).map(id => id -> sub(uv(id), m)).toMap
      for (_ <- 1 to Iters) {
        val assign = uv.map { case (id, v) =>
          id -> cents.toSeq.map { case (c, cv) => (d2(sub(v, m), cv), c) }.min._2
        }
        cents = cents.map { case (cid, old) =>
          val members = assign.collect { case (id, c) if c == cid => sub(uv(id), m) }
          cid -> (if (members.isEmpty) old
                  else Array.tabulate(SubDim)(i =>
                    (members.map(_(i).toLong).sum / members.size).toInt))
        }
      }
      cents
    }
    val codes: Map[(Long, Int), Long] = (for {
      id <- uv.keys.toSeq; m <- 0 until NumSub
    } yield (id, m) ->
      books(m).toSeq.map { case (c, cv) => (d2(sub(uv(id), m), cv), c) }.min._2
    ).toMap
    val topk = queryIds.flatMap { q =>
      val dists = uv.keys.toSeq.filter(_ != q).map { n =>
        val ad = (0 until NumSub).map { m =>
          d2(sub(uv(q), m), books(m)(codes((n, m))))
        }.sum
        (ad, n)
      }.sorted.take(K)
      dists.zipWithIndex.map { case ((ad, n), i) => (q, n, (i + 1).toLong, ad) }
    }.toSet
    (codes, topk)
  }

  test("PQ codes + ADC top-k == local reimplementation, exactly") {
    import spark.implicits._
    val uvDf = Pq.quantizeGlobal(embeddings, "vec_id", "embedding").cache()
    val uv: Map[Long, Array[Int]] = uvDf
      .select($"vid".as[Long], $"uv".as[Seq[Int]])
      .collect().map { case (id, v) => id -> v.toArray }.toMap
    assert(uv.values.forall(_.forall(x => x >= 0 && x <= 254)),
      "shifted domain must be [0,254]")
    val queryIds = uv.keys.filter(_ < 10).toSeq.sorted
    val (wantCodes, wantTopk) = localPq(uv, queryIds)

    val book = Pq.train(uvDf, NumSub, SubDim, Ksub, Iters)
    val gotCodes = Pq.codes(uvDf, book, NumSub, SubDim)
      .select($"vid".as[Long], $"m".as[Int], $"code".as[Long])
      .collect().map { case (v, m, c) => (v, m) -> c }.toMap
    assert(gotCodes == wantCodes)
    assert(gotCodes.values.toSet.size > 1, "degenerate codebook")

    val q = spark.createDataset(queryIds).toDF("query_id")
    val got = Pq.adcTopK(uvDf, book, Pq.codes(uvDf, book, NumSub, SubDim),
        q, K, NumSub, SubDim)
      .select($"query_id".as[Long], $"neighbor_id".as[Long],
        $"rank".as[Long], $"adist".as[Long])
      .collect().toSet
    assert(got == wantTopk)
  }

  test("PQ search is bit-identical under repartitioning") {
    import spark.implicits._
    val q = spark.range(10).select(col("id").as("query_id"))
    def run(df: org.apache.spark.sql.DataFrame) =
      Pq.pqTopK(df, "vec_id", "embedding", q, K, NumSub, Ksub, Iters)
        .select($"query_id".as[Long], $"neighbor_id".as[Long],
          $"rank".as[Long], $"adist".as[Long])
        .collect().toSet
    assert(run(embeddings) == run(embeddings.repartition(13)))
  }

  test("PQ ranking is a useful approximation of exact integer L2") {
    import spark.implicits._
    val uvDf = Pq.quantizeGlobal(embeddings, "vec_id", "embedding").cache()
    val uv: Map[Long, Array[Int]] = uvDf
      .select($"vid".as[Long], $"uv".as[Seq[Int]])
      .collect().map { case (id, v) => id -> v.toArray }.toMap
    val queryIds = uv.keys.filter(_ < 10).toSeq.sorted
    val exact: Map[Long, Set[Long]] = queryIds.map { qid =>
      qid -> uv.keys.toSeq.filter(_ != qid)
        .map(n => (d2(uv(qid), uv(n)), n)).sorted.take(K).map(_._2).toSet
    }.toMap
    val q = spark.createDataset(queryIds).toDF("query_id")
    val got = Pq.pqTopK(embeddings, "vec_id", "embedding", q, K,
        NumSub, Ksub, Iters)
      .select($"query_id".as[Long], $"neighbor_id".as[Long])
      .collect().groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val recall = queryIds.map(qid =>
      (got.getOrElse(qid, Set.empty) intersect exact(qid)).size).sum.toDouble /
      (K * queryIds.size)
    info(s"PQ recall@$K vs exact integer L2 = $recall")
    assert(recall >= 0.3, s"recall collapsed: $recall")
  }
}
