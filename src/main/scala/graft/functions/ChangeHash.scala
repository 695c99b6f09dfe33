package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-detection hash: the engine's column form of the reference's
  * `GetCRC32` (reference `internal/recon/recon.go:133-156`, SURVEY F1-F3).
  *
  * Semantics preserved exactly:
  *  - hash input = first non-empty of `updated_at`, `updated-at`, `index`
  *    (empty string counts as absent — the `!= ""` guards at
  *    `recon.go:135-141`);
  *  - fallback = canonical JSON of the whole record, with keys sorted
  *    alphabetically (Go `json.Marshal` over a map sorts keys,
  *    `recon.go:148-152`);
  *  - checksum = CRC32 with the CRC32-Q table (`recon.go:32`), see
  *    [[Crc32Q]].
  *
  * Everything is a single Catalyst column expression — fully codegen'd,
  * evaluated per-row inside the scan stage, no shuffle, no UDF. At 100 TB
  * this is the property that matters: change detection costs one pass over
  * the batch, fused into whatever stage produces it.
  */
object ChangeHash {

  /** `NULLIF(col, '')` — reference treats empty string as absent. */
  private def nonEmpty(c: Column): Column = nullif(c, lit(""))

  /** Canonical JSON of the given columns: alphabetical key order matches Go
    * `json.Marshal` map-key sorting (`recon.go:148-152`), and null fields
    * are emitted as `"key":null` like Go does (Spark's default would omit
    * them). NOT byte-identical to the reference for every input: Go's
    * encoder additionally HTML-escapes `<`, `>`, `&` inside strings (to
    * `\\u003c` / `\\u003e` / `\\u0026`), which we deliberately don't
    * reproduce — the hash is
    * self-consistent within this engine, but migrating stored state from
    * the reference requires a full re-hash of fallback-hashed records. */
  def canonicalJson(df: DataFrame, cols: Seq[String]): Column =
    to_json(struct(cols.sorted.map(col): _*),
      Map("ignoreNullFields" -> "false"))

  def canonicalJson(df: DataFrame): Column = canonicalJson(df, df.columns.toSeq)

  /** The F2 precedence chain over whichever of the three token columns exist
    * in this batch's schema, falling back to canonical whole-record JSON. */
  def hashToken(df: DataFrame): Column = {
    val candidates = Seq("updated_at", "updated-at", "index")
      .filter(df.columns.contains)
      .map(n => nonEmpty(col(n).cast("string")))
    val fallback = canonicalJson(df)
    coalesce(candidates :+ fallback: _*)
  }

  /** Full change hash: CRC32-Q over the selected token (UTF-8 bytes). */
  def changeHash(df: DataFrame): Column = Crc32Q(hashToken(df))
}
