package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column ↔ Catalyst-Expression converters.
  *
  * Spark 4 unified [[Column]] around `ColumnNode`, hiding the classic
  * expression accessors behind `private[sql]`. Extension libraries that
  * define native Catalyst expressions (we do: `graft.functions.Crc32Q`)
  * need exactly these two conversions, so this one-file shim lives in the
  * `org.apache.spark.sql` package to regain access. No Spark internals are
  * modified.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** `localCheckpoint()` that DROPS the origin plan's estimated statistics.
    *
    * `Dataset.localCheckpoint` wraps the materialized RDD in a
    * [[execution.LogicalRDD]] carrying `originStats` — the size estimate
    * of the plan it replaced, which for a join is the PRODUCT of its
    * children's estimates. An iterative algorithm that self-joins its own
    * checkpointed state (pointer-jumping connected components, Borůvka
    * contraction) therefore SQUARES the carried `sizeInBytes` every
    * round: the estimate is a `BigInt` whose digit count doubles per
    * iteration, and by ~iteration 20 the driver hangs inside
    * `BigInteger.multiply` (Karatsuba/Toom-Cook on million-digit numbers)
    * while merely *constructing* the next checkpoint. Re-wrapping the
    * already-materialized RDD with `originStats = None` resets the
    * estimate to the session default each round — the fixpoint state is
    * shuffle-joined anyway, so no broadcast decision is lost. */
  def localCheckpointFreshStats(df: Dataset[Row]): Dataset[Row] = {
    val ck = df.localCheckpoint()
    ck.queryExecution.analyzed match {
      case lr: execution.LogicalRDD =>
        val session = ck.sparkSession.asInstanceOf[classic.SparkSession]
        classic.Dataset.ofRows(session,
          new execution.LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning,
            lr.outputOrdering, lr.isStreaming, lr.stream)(session, None, None))
      case _ => ck
    }
  }
}
