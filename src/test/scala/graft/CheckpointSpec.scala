package graft

import org.apache.spark.sql.functions._
import graft.core.LinkConfig
import graft.ingest.PagesSynth
import graft.io.Checkpoint
import graft.jobs.LinkJob
import java.nio.file.Files

class CheckpointSpec extends SparkSpec {

  test("stage commit, resume skip, lineage rows, invalidation cascade") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-ckpt").toString
    val pages = PagesSynth.pages(spark, Seq(300, 300), overlap = 0.75)
    val cfg = LinkConfig(threshold = 0.8)

    val clusters1 = LinkJob.run(spark, pages, cfg, root).cache()
    val n1 = clusters1.count()
    assert(n1 > 0)
    LinkJob.Stages.foreach { s =>
      assert(Checkpoint.isCommitted(spark, root, s), s"stage $s not committed")
      val mf = Checkpoint.readManifest(spark, root, s).get
      assert(mf.contains(s""""stage":"$s""""))
    }
    // edges manifest carries the north-rule counters
    val edgesMf = Checkpoint.readManifest(spark, root, "edges").get
    assert(edgesMf.contains("pairs_generated") && edgesMf.contains("edges_kept"))

    // lineage has >=1 row per stage with positive rows
    val lin = Checkpoint.lineage(spark, root)
    val stages = lin.select($"stage").distinct().as[String].collect().toSet
    assert(LinkJob.Stages.toSet.subsetOf(stages))
    assert(lin.where($"rows_out" <= 0).count() == 0)

    // resume: a second run touches nothing (manifests unchanged) and
    // returns identical clusters
    val mtimes = LinkJob.Stages.map(s =>
      s -> Files.getLastModifiedTime(java.nio.file.Paths.get(s"$root/$s/_MANIFEST.json")))
    val clusters2 = LinkJob.run(spark, pages, cfg, root)
    assert(clusters2.count() == n1)
    mtimes.foreach { case (s, t) =>
      val t2 = Files.getLastModifiedTime(java.nio.file.Paths.get(s"$root/$s/_MANIFEST.json"))
      assert(t2 == t, s"stage $s was recomputed on resume")
    }

    // kill mid-run: drop the edges stage -> rerun recomputes edges AND
    // downstream clusters, but NOT the upstream blocked stage
    val blockedT = Files.getLastModifiedTime(java.nio.file.Paths.get(s"$root/blocked/_MANIFEST.json"))
    Checkpoint.invalidate(spark, root, "edges")
    val clusters3 = LinkJob.run(spark, pages, cfg, root).cache()
    assert(clusters3.count() == n1)
    assert(Files.getLastModifiedTime(java.nio.file.Paths.get(s"$root/blocked/_MANIFEST.json")) == blockedT)
    val set1 = clusters1.select($"clusterId".as[Long], $"dp".as[Int], $"entityId".as[Long]).collect().toSet
    val set3 = clusters3.select($"clusterId".as[Long], $"dp".as[Int], $"entityId".as[Long]).collect().toSet
    assert(set1 == set3)
  }

  test("concurrent writers: one computes, the other resumes its commit") {
    val root = Files.createTempDirectory("graft-ckpt3").toString
    val computes = new java.util.concurrent.atomic.AtomicInteger(0)
    def work() = Checkpoint.stage(spark, root, "race", lockWaitMs = 30000) {
      computes.incrementAndGet()
      Thread.sleep(1500) // hold the lock long enough for the race to bite
      spark.range(7).toDF("v")
    }
    import scala.concurrent._
    import scala.concurrent.duration._
    import ExecutionContext.Implicits.global
    val f1 = Future(work())
    Thread.sleep(300) // writer 1 must grab the lock first
    val f2 = Future(work())
    val (r1, r2) = (Await.result(f1, 120.seconds), Await.result(f2, 120.seconds))
    assert(computes.get() == 1, "compute must run exactly once under the lock")
    assert(Seq(r1, r2).count(_.resumed) == 1)
    assert(r1.df.count() == 7 && r2.df.count() == 7)
  }

  test("held lock without a commit fails cleanly after the wait") {
    val root = Files.createTempDirectory("graft-ckpt4").toString
    // a foreign writer holds the lock and never commits
    val lockDir = java.nio.file.Paths.get(s"$root/_locks")
    Files.createDirectories(lockDir)
    Files.writeString(lockDir.resolve("stuck.lock"), s"""{"pid":0,"ts":${System.currentTimeMillis()}}""")
    val e = intercept[IllegalStateException] {
      Checkpoint.stage(spark, root, "stuck", lockWaitMs = 800) {
        spark.range(1).toDF("v")
      }
    }
    assert(e.getMessage.contains("writer lock"))
  }

  test("stolen lock aborts the commit instead of blessing mixed output") {
    val root = Files.createTempDirectory("graft-ckpt5").toString
    val lockFile = java.nio.file.Paths.get(s"$root/_locks/theft.lock")
    val e = intercept[IllegalStateException] {
      Checkpoint.stage(spark, root, "theft") {
        // mid-compute, a competing writer presumes us crashed and steals
        // the lock (delete + re-create with its own attempt id)
        Files.delete(lockFile)
        Files.writeString(lockFile,
          s"""{"pid":0,"attempt":"thief","ts":${System.currentTimeMillis()}}""")
        spark.range(3).toDF("v")
      }
    }
    assert(e.getMessage.contains("lock lost"))
    assert(!Checkpoint.isCommitted(spark, root, "theft"),
      "a writer that lost its lock must never commit a manifest")
    // the thief's lock must survive our release (ownership-checked delete)
    assert(Files.readString(lockFile).contains("thief"))
    // the victim's staged files never reached the stage dir (publication
    // is rename-only) and its attempt dir was cleaned up on abort
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$root/theft")),
      "aborted attempt leaked files into the stage directory")
    val attempts = new java.io.File(s"$root/_attempts")
    assert(!attempts.exists() || attempts.listFiles().isEmpty,
      "aborted attempt left staged garbage in _attempts")
  }

  test("publish is rename-only: stage dir appears complete with manifest; staging cleaned") {
    val root = Files.createTempDirectory("graft-ckpt7").toString
    val r = Checkpoint.stage(spark, root, "st_pub") { spark.range(5).toDF("v") }
    assert(!r.resumed && r.rows == 5)
    val names = new java.io.File(s"$root/st_pub").listFiles().map(_.getName).toSet
    assert(names.contains("_MANIFEST.json"), names.toString)
    assert(names.exists(_.endsWith(".parquet")), names.toString)
    val attempts = new java.io.File(s"$root/_attempts")
    assert(!attempts.exists() || attempts.listFiles().isEmpty,
      "successful publish left its attempt dir behind")
    // lineage written post-publish
    assert(spark.read.parquet(s"$root/_lineage/stage=st_pub").count() > 0)
  }

  test("heartbeat keeps a slow compute's lock mtime fresh") {
    val root = Files.createTempDirectory("graft-ckpt6").toString
    val lockFile = java.nio.file.Paths.get(s"$root/_locks/slow.lock")
    @volatile var mtimeAtStart = 0L
    @volatile var mtimeMidCompute = 0L
    val r = Checkpoint.stage(spark, root, "slow", heartbeatMs = 100) {
      mtimeAtStart = Files.getLastModifiedTime(lockFile).toMillis
      Thread.sleep(1200) // several heartbeat periods
      mtimeMidCompute = Files.getLastModifiedTime(lockFile).toMillis
      spark.range(2).toDF("v")
    }
    assert(!r.resumed && r.rows == 2)
    // the heartbeat must advance the lock mtime while the compute sleeps —
    // a waiting writer's staleness clock keeps resetting, so a live holder
    // is never presumed crashed no matter how long the compute runs
    assert(mtimeMidCompute > mtimeAtStart,
      s"lock mtime never advanced ($mtimeAtStart -> $mtimeMidCompute)")
  }

  test("aborted write (no manifest) is recomputed, not served") {
    val root = Files.createTempDirectory("graft-ckpt2").toString
    import spark.implicits._
    // simulate a crash: data dir exists, garbage content, no manifest
    val dir = java.nio.file.Paths.get(s"$root/stage_x")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("garbage.txt"), "partial write")
    val r = Checkpoint.stage(spark, root.toString, "stage_x") {
      spark.range(10).toDF("v")
    }
    assert(!r.resumed && r.rows == 10)
    val r2 = Checkpoint.stage(spark, root.toString, "stage_x") {
      fail("must not recompute a committed stage"); null
    }
    assert(r2.resumed && r2.df.count() == 10)
  }
}
