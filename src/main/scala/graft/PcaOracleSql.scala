package graft

/** DuckDB-SQL replay of [[graft.operators.Similarity.pcaPower]] — the
  * integer fixed-point power iteration, stage by stage, which is what
  * converts `pca_power` from rows-only to oracle-exact (the round-8
  * verdict's last convertible entry).
  *
  * Exactness rests on the same contracts the engine documents:
  *  - coordinates quantize to micros with `round(x·10⁶)` — HALF_UP in
  *    both engines — so every later sum/product is exact 64-bit integer
  *    arithmetic (order-independent, unlike FP folds). The column must
  *    be CAST to DOUBLE before the multiply: DuckDB evaluates
  *    FLOAT·INTEGER in FLOAT (133/32000 fixture values off by one
  *    micro), while Spark's `cast("double") * 1e6` is double;
  *  - all divisions are integer TRUNCATION TOWARD ZERO: DuckDB's `//`
  *    on integers and Scala's `/` on Long/BigInt agree (verified
  *    including negatives: −7 // 2 = −3 in both);
  *  - the Rayleigh quotient runs in HUGEINT, twinning the engine's
  *    BigInt (numerator ~10³⁶ at the fixture — far inside HUGEINT);
  *  - the iteration is a CHAIN of MATERIALIZED CTE stages carrying only
  *    (i, v) — the XxhOracleSql discipline; un-materialized CTEs would
  *    re-inline the whole prefix per reference.
  */
object PcaOracleSql {

  /** The full oracle query for `pca_power` over the `embeddings` table
    * (`vec_id`, `embedding`), `iters` power-iteration rounds — defaulted
    * to the engine's own [[graft.operators.Similarity.PcaIters]] so the
    * two cannot drift. */
  def pcaPowerSql(
      iters: Int = graft.operators.Similarity.PcaIters): String = {
    val header =
      """WITH e1 AS MATERIALIZED (
        |  SELECT vec_id, p - 1 AS i,
        |    CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT) AS xm
        |  FROM (SELECT vec_id, unnest(embedding) AS x,
        |          unnest(range(1, len(embedding) + 1)) AS p
        |        FROM embeddings)),
        |sx AS MATERIALIZED (SELECT i, SUM(xm) AS sx FROM e1 GROUP BY i),
        |nn AS (SELECT COUNT(*) AS n FROM embeddings),
        |cm AS MATERIALIZED (
        |  SELECT s.i AS i, s.j AS j,
        |    (SELECT n FROM nn) * s.sxx - si.sx * sj.sx AS c
        |  FROM (SELECT a.i AS i, b.i AS j, SUM(a.xm * b.xm) AS sxx
        |        FROM e1 a JOIN e1 b USING (vec_id) GROUP BY 1, 2) s
        |  JOIN sx si ON si.i = s.i JOIN sx sj ON sj.i = s.j),
        |sc AS (SELECT GREATEST(CAST(1 AS BIGINT), MAX(abs(c)) // 1000000) AS s FROM cm),
        |cp AS MATERIALIZED (SELECT i, j, c // (SELECT s FROM sc) AS cp FROM cm),
        |v0 AS MATERIALIZED (SELECT DISTINCT i, CAST(100000 AS BIGINT) AS v FROM e1)""".stripMargin
    val steps = (0 until iters).map { t =>
      s"""a${t + 1} AS MATERIALIZED (
         |  SELECT cp.i AS i, SUM(cp.cp * v$t.v) AS av
         |  FROM cp JOIN v$t ON v$t.i = cp.j GROUP BY 1),
         |v${t + 1} AS MATERIALIZED (
         |  SELECT a${t + 1}.i AS i,
         |    CASE WHEN (SELECT MAX(abs(av)) FROM a${t + 1}) = 0 THEN v$t.v
         |         ELSE (a${t + 1}.av * 100000) // (SELECT MAX(abs(av)) FROM a${t + 1})
         |    END AS v
         |  FROM a${t + 1} JOIN v$t ON v$t.i = a${t + 1}.i)""".stripMargin
    }.mkString(",\n")
    val vf = s"v$iters"
    val footer =
      s"""pk AS (SELECT v FROM $vf ORDER BY abs(v) DESC, i ASC LIMIT 1),
         |fl AS (SELECT CASE WHEN (SELECT v FROM pk) < 0
         |                   THEN CAST(-1 AS BIGINT) ELSE CAST(1 AS BIGINT) END AS f),
         |ray AS (SELECT
         |    (SELECT SUM(CAST(va.v AS HUGEINT) * CAST(cm.c AS HUGEINT)
         |                * CAST(vb.v AS HUGEINT))
         |     FROM cm JOIN $vf va ON va.i = cm.i
         |             JOIN $vf vb ON vb.i = cm.j) AS num,
         |    (SELECT SUM(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)) FROM $vf)
         |      * (SELECT CAST(n AS HUGEINT) * CAST(n AS HUGEINT) FROM nn)
         |      * CAST(1000000000000 AS HUGEINT) AS den)
         |SELECT CAST(v.i AS INTEGER) AS dim,
         |  CAST((SELECT f FROM fl) * v.v * 10 AS BIGINT) AS loading_micro,
         |  CAST((SELECT (num * 1000000) // den FROM ray) AS BIGINT) AS eigval_micro
         |FROM $vf v""".stripMargin
    s"$header,\n$steps,\n$footer"
  }
}
