package graft.state

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Hash-bucketed, manifest-versioned parquet table: the vanilla-Spark
  * answer to "a 1% delta must not rewrite a 100 TB table".
  *
  * Layout:
  *   base/data/<commit-uuid>/__gbucket=<i>/part-*.parquet   bucket data dirs
  *   base/manifest-<counter>-<uuid>                          manifest files
  *
  * A manifest is a text file mapping every bucket id to the commit-uuid
  * whose data dir currently holds that bucket. Commit = (1) write data
  * dirs for the TOUCHED buckets only, (2) atomically create one new
  * manifest that re-points those buckets and carries every other bucket
  * forward unchanged. Readers resolve the highest-counter manifest — one
  * atomic snapshot, same pointer discipline as [[AtomicTable]] (and the
  * same HDFS/local `createNewFile` filesystem contract; object stores need
  * a real table format instead — this class is its minimal shape: data
  * files + manifest + atomic pointer swap is exactly the Iceberg/Delta
  * commit model).
  *
  * Cost model: merge of a delta touching b of n buckets reads and rewrites
  * only those b buckets' rows; untouched buckets are carried by reference.
  * Bucket routing is `pmod(xxhash64(key), n)` — deterministic, so the same
  * key always lands in the same bucket and a keyed delta prunes exactly.
  *
  * Concurrency: commits are optimistic — each claims its target counter
  * with an exclusive file create before writing anything, so of two
  * racing writers exactly one publishes and the other fails loudly with
  * "concurrent commit detected" (re-read + retry), never a silent lost
  * update. A claim left by a crashed writer goes stale after
  * `claimTtlMillis` (no manifest at its counter) and is swept by the
  * next committer.
  *
  * GC keeps data dirs referenced by the current AND previous manifest
  * (straggling readers get one full commit cycle, as in [[AtomicTable]]);
  * anything older or never-referenced (crashed commits) is deleted
  * best-effort on the next commit.
  */
class ManifestedTable(spark: SparkSession, base: String, nBuckets: Int,
    claimTtlMillis: Long = 15 * 60 * 1000L) {
  require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")

  final val BucketCol = "__gbucket"

  private def fs: FileSystem =
    new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val ManifestRe = "manifest-([0-9]{12})-.+".r

  /** Bucket id of a (possibly composite) key. Routing is
    * `pmod(xxhash64(keyCols…), n)` — deterministic in the key tuple, so an
    * edge table keyed `(a_id, b_id)` routes a pair delta to exactly the
    * buckets its pairs live in, same as a single-key node table. */
  def bucketOf(keyCols: Column*): Column =
    pmod(xxhash64(keyCols: _*), lit(nBuckets.toLong))

  /** (counter, path) of the newest committed manifest. */
  private def currentManifest(f: FileSystem): Option[(Long, Path)] = {
    val b = new Path(base)
    if (!f.exists(b)) return None
    val ms = f.listStatus(b).iterator.map(_.getPath).collect {
      case p if ManifestRe.findFirstMatchIn(p.getName).isDefined =>
        (ManifestRe.findFirstMatchIn(p.getName).get.group(1).toLong, p)
    }.toSeq
    if (ms.isEmpty) None else Some(ms.maxBy(_._1))
  }

  /** bucket id → commit uuid. Missing entries = bucket never written. */
  private def readManifest(f: FileSystem, p: Path): Map[Int, String] = {
    val in = f.open(p)
    val txt = try {
      new String(org.apache.commons.io.IOUtils.toByteArray(in),
        StandardCharsets.UTF_8)
    } finally in.close()
    txt.linesIterator.filter(_.nonEmpty).map { line =>
      val Array(b, uuid) = line.split("\t", 2)
      b.toInt -> uuid
    }.toMap
  }

  private def bucketDir(uuid: String, bucket: Int): Path =
    new Path(base, s"data/$uuid/$BucketCol=$bucket")

  def exists: Boolean = currentManifest(fs).isDefined

  private def readBuckets(entries: Map[Int, String],
      schema: StructType): DataFrame = {
    val paths = entries.toSeq.sortBy(_._1)
      .map { case (b, uuid) => bucketDir(uuid, b).toString }
    if (paths.isEmpty) {
      if (schema == null) spark.emptyDataFrame
      else spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    } else {
      val r = if (schema != null) spark.read.schema(schema) else spark.read
      r.parquet(paths: _*)
    }
  }

  /** Full-table read of the committed snapshot. */
  def read(schema: StructType): DataFrame = currentManifest(fs) match {
    case Some((_, p)) => readBuckets(readManifest(fs, p), schema)
    case None if schema == null => spark.emptyDataFrame
    case None => spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
  }

  /** Read ONLY the given buckets of the committed snapshot. */
  def readBucketSubset(buckets: Set[Int], schema: StructType): DataFrame =
    currentManifest(fs) match {
      case Some((_, p)) =>
        readBuckets(readManifest(fs, p).filter(e => buckets(e._1)), schema)
      case None if schema == null => spark.emptyDataFrame
      case None => spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    }

  /** Single-key convenience overload of the composite-key commit. */
  def commitBuckets(rows: DataFrame, keyCol: String,
      touched: Set[Int]): Unit =
    commitBuckets(rows, Seq(keyCol), touched)

  /** Commit `rows` as the new content of exactly the buckets in
    * `touched` — rows MUST all route to those buckets (they are written
    * partitioned by [[bucketOf]] of `keyCols`). Every other bucket is
    * carried forward by reference. */
  def commitBuckets(rows: DataFrame, keyCols: Seq[String],
      touched: Set[Int]): Unit = {
    val f = fs
    val prev = currentManifest(f)
    val prevMap = prev.map { case (_, p) => readManifest(f, p) }
      .getOrElse(Map.empty)
    val ctr = prev.map(_._1 + 1).getOrElse(1L)
    val uuid = java.util.UUID.randomUUID().toString

    // Optimistic concurrency (the Iceberg commit model): claim this
    // counter with an exclusive create BEFORE paying for the data write.
    // Two writers racing the same base counter would otherwise both
    // publish counter+1 manifests and one writer's buckets would be
    // silently dropped at read time (maxBy tie). With the claim, the
    // loser fails loudly — and cheaply — here, and can re-read + retry.
    // (POSIX rename overwrites, so rename alone cannot be the claim;
    // create with overwrite=false is the same exclusivity contract
    // AtomicTable's pointer swap relies on.)
    val claim = new Path(base, f".claim-$ctr%012d")
    f.mkdirs(new Path(base))
    def tryClaim(): Boolean =
      try { f.create(claim, false).close(); true }
      catch { case _: java.io.IOException => false }
    if (!tryClaim()) {
      // Crash recovery: a writer that claimed, then died before publishing
      // its manifest, must not block this counter forever. A claim is
      // stale when no manifest with its counter exists AND it is older
      // than the TTL (a live racer's claim is fresh — the TTL bounds how
      // long a commit may take, not how long a lock lives).
      val manifestExists = f.listStatus(new Path(base))
        .exists(_.getPath.getName.startsWith(f"manifest-$ctr%012d"))
      val age = try System.currentTimeMillis() -
        f.getFileStatus(claim).getModificationTime
      catch { case _: java.io.IOException => -1L }
      val recovered = !manifestExists && age > claimTtlMillis && {
        (try f.delete(claim, false) catch { case _: Exception => false }) &&
          tryClaim()
      }
      if (!recovered) throw new java.io.IOException(
        s"concurrent commit detected for $base at counter $ctr — " +
          "another writer claimed this version; re-read and retry")
    }

    rows.withColumn(BucketCol, bucketOf(keyCols.map(col): _*))
      .repartition(col(BucketCol))
      .write.mode(SaveMode.Overwrite).partitionBy(BucketCol)
      .parquet(new Path(base, s"data/$uuid").toString)

    // contract check: rows routing OUTSIDE `touched` would be written to
    // dirs the manifest never points at — silent data loss. Fail loudly.
    val writtenDirs = f.listStatus(new Path(base, s"data/$uuid"))
      .map(_.getPath.getName).filter(_.startsWith(s"$BucketCol="))
      .map(_.stripPrefix(s"$BucketCol=").toInt).toSet
    val stray = writtenDirs -- touched
    require(stray.isEmpty,
      s"commitBuckets: rows routed to untouched buckets $stray — " +
        "the touched set must cover every key's bucket")
    // empty touched buckets get no dir from partitionBy — they simply drop
    // out of the manifest (bucket has zero rows now).
    val written = touched.filter(writtenDirs.contains)
    val newMap = (prevMap -- touched) ++ written.map(_ -> uuid)
    val body = newMap.toSeq.sortBy(_._1)
      .map { case (b, u) => s"$b\t$u" }.mkString("\n")
    // write manifest body to a temp name, then atomically rename into
    // place: a bare create-then-write would let a concurrent reader (or a
    // crash) observe a truncated manifest. File rename is atomic on the
    // HDFS/local filesystems this class targets.
    val mpath = new Path(base, f"manifest-$ctr%012d-$uuid")
    val tmp = new Path(base, s".tmp-manifest-$uuid")
    val out = f.create(tmp, true)
    try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
    require(f.rename(tmp, mpath), s"manifest rename failed: $tmp -> $mpath")

    // GC: keep commit-uuids referenced by this and the previous manifest.
    val keep = newMap.values.toSet ++ prevMap.values.toSet
    val dataRoot = new Path(base, "data")
    if (f.exists(dataRoot)) f.listStatus(dataRoot).foreach { st =>
      if (!keep.contains(st.getPath.getName)) {
        try f.delete(st.getPath, true) catch { case _: Exception => }
      }
    }
    // drop manifests older than the previous one, settled claims, and tmp
    // files left by crashed commits (ours was just renamed away, so any
    // .tmp-manifest-* still present is an orphan)
    f.listStatus(new Path(base)).foreach { st =>
      st.getPath.getName match {
        case ManifestRe(c) if c.toLong < ctr - 1 =>
          try f.delete(st.getPath, true) catch { case _: Exception => }
        case n if n.startsWith(".tmp-manifest-") =>
          try f.delete(st.getPath, true) catch { case _: Exception => }
        case n if n.startsWith(".claim-") &&
            n.stripPrefix(".claim-").toLong < ctr =>
          try f.delete(st.getPath, true) catch { case _: Exception => }
        case _ =>
      }
    }
  }

  /** Full rewrite (all buckets touched) — for bootstrap loads. */
  def commitAll(rows: DataFrame, keyCols: String*): Unit =
    commitBuckets(rows, keyCols, (0 until nBuckets).toSet)
}
