package graft.io

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.core.{ClusterMember, Edge}

/** S6: result sinks in the reference's wire shapes
  * (`views/run/results.py:41-112`, groups schema
  * `api_def/openapi.yaml:737-754`):
  *  - groups: one JSON row per cluster, `{"group": [[dsIdx, rowIdx], ...]}`
  *    with members ordered, singletons omitted (never produced anyway);
  *  - similarity scores: the scored-pair stream, globally ordered by
  *    descending similarity (the reference keeps its merged file sorted);
  *  - permutations/mask: dense arrays per provider (Permutation.toDenseList).
  *
  * Exports are Spark writes — distributed until the final file sink; the
  * scores export keeps a global sort only because the reference's wire
  * format demands one.
  */
object Export {

  /** Clusters -> groups rows: (cluster_id, group: array<array<bigint>>). */
  def groupsFrame(clusters: Dataset[ClusterMember]): DataFrame = {
    val spark = clusters.sparkSession
    import spark.implicits._
    clusters.toDF("cluster_id", "dp", "entity_id")
      .groupBy($"cluster_id")
      .agg(sort_array(collect_list(array($"dp".cast("long"), $"entity_id"))).as("group"))
  }

  /** Write groups as JSON lines ({"group": [[dp, rec], ...]}). */
  def writeGroupsJson(clusters: Dataset[ClusterMember], path: String): Unit =
    groupsFrame(clusters).select(to_json(struct(col("group"))).as("value"))
      .write.mode("overwrite").text(path)

  /** Scores in wire order: sim desc, then indices (reference merge order). */
  def scoresFrame(edges: Dataset[Edge]): DataFrame =
    edges.toDF().orderBy(desc("sim"), col("dp0"), col("rec0"), col("dp1"), col("rec1"))

  def writeScoresJson(edges: Dataset[Edge], path: String): Unit =
    scoresFrame(edges)
      .select(to_json(struct(col("sim"), col("dp0"), col("rec0"), col("dp1"), col("rec1"))).as("value"))
      .write.mode("overwrite").text(path)
}
