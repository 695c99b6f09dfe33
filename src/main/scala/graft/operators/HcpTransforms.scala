package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Transforms._

/** The nine reference transforms (reference `data/transform/` templates),
  * re-expressed as declarative Spark plans over a DataFrame of HCP-shaped
  * documents (schema [[graft.model.Schemas.hcpDocument]], one row per source
  * document).
  *
  * Where the Go templates iterate row-at-a-time (`range .buckets`), these
  * compile to `Generate explode` + projections that Catalyst prunes down to
  * exactly the referenced nested fields — on a wide real-world document the
  * scan reads only the five leaf columns a template touches.
  */
object HcpTransforms {

  private def buckets(doc: DataFrame): DataFrame =
    explodeArray(doc, "buckets", "b")

  /** `transform_bucket.json.tmpl:5-10` — bucket nodes. */
  def bucketNodes(doc: DataFrame): DataFrame =
    buckets(doc).select(
      col("b.id").as("external_id"),
      col("b.name").as("name"),
      col("b.`created-at`").as("created_at"),
      col("b.`updated-at`").as("updated_at"),
      col("b.resource_name").as("resource_name"))

  /** `transform_organization.json.tmpl:5` — org nodes (emitted per bucket in
    * the reference; MERGE collapses them — SURVEY T13). */
  def orgNodes(doc: DataFrame): DataFrame =
    dedupByKey(buckets(doc).select(
      col("b.location.organization_id").as("external_id")))

  /** `transform_project.json.tmpl:5` — project nodes. */
  def projectNodes(doc: DataFrame): DataFrame =
    dedupByKey(buckets(doc).select(
      col("b.location.project_id").as("external_id")))

  /** `transform_version.json.tmpl:4-6` — version nodes; `latest` is a
    * constant string column in the reference (T5). */
  def versionNodes(doc: DataFrame): DataFrame =
    buckets(doc).select(
      col("b.latest_version.id").as("external_id"),
      col("b.latest_version.name").as("name"),
      lit("true").as("latest"))

  /** `transform_build.json.tmpl:2-8` — build nodes: two-level correlated
    * flatten (T2). */
  def buildNodes(doc: DataFrame): DataFrame =
    buckets(doc)
      .select(explode(col("b.latest_version.builds")).as("bl"))
      .select(
        col("bl.id").as("external_id"),
        col("bl.created_at").as("created_at"),
        col("bl.updated_at").as("updated_at"))

  /** `transform_org_project_R.json.tmpl:5-6` — org→project edges. */
  def orgProjectEdges(doc: DataFrame): DataFrame =
    edgePairs(buckets(doc),
      col("b.location.organization_id"), col("b.location.project_id"))
      .dropDuplicates()

  /** `transform_project_bucket_R.json.tmpl:5-6` — project→bucket edges. */
  def projectBucketEdges(doc: DataFrame): DataFrame =
    edgePairs(buckets(doc), col("b.location.project_id"), col("b.id"))

  /** `transform_bucket_version_R.json.tmpl:4-5` — bucket→version edges. */
  def bucketVersionEdges(doc: DataFrame): DataFrame =
    edgePairs(buckets(doc), col("b.id"), col("b.latest_version.id"))

  /** `transform_version_build_R.json.tmpl:6-7` — version→build edges: the
    * exploded parent's key stays in scope alongside each exploded child
    * (correlated flatten, T2/T6). */
  def versionBuildEdges(doc: DataFrame): DataFrame =
    buckets(doc)
      .select(col("b.latest_version.id").as("vid"),
        explode(col("b.latest_version.builds")).as("bl"))
      .select(col("vid").cast("string").as("a_id"),
        col("bl.id").cast("string").as("b_id"))
}
