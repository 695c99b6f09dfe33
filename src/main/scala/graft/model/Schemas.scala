package graft.model

import org.apache.spark.sql.types._

/** Fixed schemas for the engine.
  *
  * The reference (srahul3/ig-etl-sync) is schema-less at runtime — each
  * record batch is `[]map[string]interface{}` whose columns are whatever the
  * template emitted (reference `main.go:180`, SURVEY §1.3). The engine pins
  * those implicit schemas as explicit [[StructType]]s so Catalyst can prune
  * columns and push filters all the way into the source scan — at 100 TB the
  * difference between reading 5 columns and reading the whole document is the
  * whole game.
  */
object Schemas {

  /** HCP-Packer-shaped source document, the reference's sole input shape.
    * Inferred from the union of fields read by all nine templates under
    * reference `data/transform/` (`.json.tmpl` files; FIXTURES.md §A).
    *
    * Used with PERMISSIVE JSON parsing: extra source fields are dropped by
    * the projection (column pruning), missing fields come back null — same
    * tolerance the Go templates have.
    */
  val build: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("created_at", StringType),
    StructField("updated_at", StringType)))

  val latestVersion: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("builds", ArrayType(build))))

  val location: StructType = StructType(Seq(
    StructField("organization_id", StringType),
    StructField("project_id", StringType)))

  val bucket: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("created-at", StringType),
    StructField("updated-at", StringType),
    StructField("resource_name", StringType),
    StructField("location", location),
    StructField("latest_version", latestVersion)))

  /** Root document: `{"buckets": [...]}` (reference
    * `transform_bucket.json.tmpl:2`). */
  val hcpDocument: StructType = StructType(Seq(
    StructField("buckets", ArrayType(bucket))))

  /** Every template-emitted value is a string in the reference (values are
    * interpolated into quoted JSON literals — SURVEY §1.2), so node/edge
    * property columns are StringType. */

  /** Node batch: mandatory key + label-specific properties. The key column
    * name matches the reference's mandatory `external_id` property
    * (reference `internal/store/neo4j.go:87`). */
  val externalId = "external_id"

  /** Edge batch schema: `(a_id, b_id)` external-id pair (reference
    * `internal/store/neo4j.go:90`). */
  val edge: StructType = StructType(Seq(
    StructField("a_id", StringType, nullable = false),
    StructField("b_id", StringType, nullable = false)))

  /** Keyed snapshot state: one row per live key with its change-detection
    * hash — the engine's columnar form of the reference's in-memory
    * `integration → function → external_id → [crc32]` map (reference
    * `internal/recon/recon.go:13`). `integration`/`function` become the
    * snapshot table's identity (directory), not data columns, so the state
    * scan for one operator never touches another operator's keys.
    */
  val state: StructType = StructType(Seq(
    StructField(externalId, StringType, nullable = false),
    StructField("hash", LongType, nullable = false)))

  /** Delete delta rows carry only the key (reference
    * `internal/recon/recon.go:95`). */
  val deleteRecord: StructType = StructType(Seq(
    StructField(externalId, StringType, nullable = false)))
}
