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

  test("expressions are null-safe and SQL-registered") {
    import spark.implicits._
    graft.expr.registerAll(spark)
    val df = Seq((Some(Array[Byte](1, 2)), Option.empty[Array[Byte]]))
      .toDF("a", "b")
    val r = df.selectExpr("popcount(a)", "dice(a, b)").collect()(0)
    assert(r.getInt(0) == 2)
    assert(r.isNullAt(1))
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
