package graft

import graft.core.LinkConfig
import graft.ingest.PagesSynth
import graft.jobs.LinkJob
import java.nio.file.Files

/** A4 guardrails: runs abort when candidate pairs exceed the configured
  * caps (`settings.py:111-112`, enforced `comparing.py:363-372`,
  * `solver.py:29-34`). */
class GuardrailSpec extends SparkSpec {
  test("run fails fast when scored pairs exceed the cap") {
    val root = Files.createTempDirectory("graft-guard").toString
    val pages = PagesSynth.pages(spark, Seq(200, 200), overlap = 0.9)
    val cfg = LinkConfig(threshold = 0.5, maxScoredPairs = 10L, maxSolverPairs = 10L)
    val e = intercept[IllegalArgumentException] {
      LinkJob.run(spark, pages, cfg, root)
    }
    assert(e.getMessage.contains("exceeds cap"))
  }
}
