package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed merge-on-read versioning for the streaming-IVM maintained
  * table (round-10 verdict #3). The round-9 maintainers rewrote the
  * FULL table per micro-batch (`tableRoot/v$id` wholesale) — at 100 TB
  * that single write is the scale-killer the rollup delta algebra
  * already avoids. Here the table is hash-partitioned into `nBuckets`
  * key buckets and each batch commits ONLY the buckets containing
  * affected keys:
  *
  *  - a commit writes `root/v$id/__bucket=b/` for exactly the affected
  *    buckets (`partitionBy` on the derived bucket column — one write
  *    job regardless of how many buckets a batch touches) plus a
  *    `_buckets` manifest naming them, so a bucket whose entire
  *    content was DELETED is still claimed by the commit (no
  *    partition dir ⇒ empty, not "fall through to a stale version");
  *  - the CURRENT table is assembled per bucket from the NEWEST
  *    version claiming that bucket, falling back to the immutable
  *    base snapshot for buckets never claimed — merge-on-read, the
  *    same contract a lake table format's partition-level upsert
  *    gives;
  *  - untouched buckets' files are never opened, let alone rewritten —
  *    byte-identical across a batch (spec-asserted by checksum in
  *    StreamingSinksSpec).
  *
  * At scale `nBuckets` grows with the table (buckets ≈ files you are
  * willing to rewrite per commit); the fixture default 8 keeps the
  * local version tree readable. The bucket function is Spark's
  * deterministic murmur3 `hash`, so assignment is stable across
  * sessions and both maintainers. The manifest is written AFTER the
  * parquet commit — a crash in between leaves an unclaimed (invisible)
  * version, never a half-visible one.
  */
object BucketedTable {

  val defaultBuckets = 8

  /** Stable key→bucket assignment (murmur3, non-negative). */
  def bucketOf(key: String, nBuckets: Int = defaultBuckets): org.apache.spark.sql.Column =
    pmod(hash(col(key)), lit(nBuckets))

  /** Version directories under `root`, ascending by id. */
  private def versions(root: String): Seq[(Long, java.io.File)] =
    (new java.io.File(root).listFiles() match {
      case null => Array.empty[java.io.File]
      case fs => fs.filter(f => f.isDirectory && f.getName.startsWith("v"))
    }).map(f => (f.getName.drop(1).toLong, f)).sortBy(_._1).toSeq

  private def manifestAt(vdir: java.io.File): Option[Seq[Int]] = {
    val m = new java.io.File(vdir, "_buckets")
    if (!m.isFile) None
    else Some(new String(
        java.nio.file.Files.readAllBytes(m.toPath), "UTF-8")
      .split("\n").iterator.map(_.trim).filter(_.nonEmpty)
      .map(_.toInt).toSeq)
  }

  /** For each bucket, the newest version CLAIMING it (via manifest);
    * the value is the bucket's partition path, or None when the claim
    * is an empty bucket (all rows deleted). Versions without a
    * manifest are unclaimed — invisible, per the crash contract. */
  private def latestBucketState(root: String): Map[Int, Option[String]] = {
    val claimed = scala.collection.mutable.Map.empty[Int, Option[String]]
    versions(root).reverse.foreach { case (_, vdir) =>
      manifestAt(vdir).foreach(_.foreach { b =>
        if (!claimed.contains(b)) {
          val part = new java.io.File(vdir, s"__bucket=$b")
          claimed(b) = if (part.isDirectory) Some(part.getPath) else None
        }
      })
    }
    claimed.toMap
  }

  /** Assemble the current table: newest written state per bucket ∪ the
    * base snapshot for buckets never claimed. Reading the `__bucket=b`
    * leaf directories directly drops the partition column, so the
    * result has exactly the snapshot's columns. */
  def current(spark: SparkSession, root: String, snapshot: DataFrame,
      key: String, nBuckets: Int = defaultBuckets): DataFrame = {
    val claimed = latestBucketState(root)
    val unwritten = (0 until nBuckets).filterNot(claimed.contains)
    val paths = claimed.values.flatten.toSeq
    val fromSnap =
      if (unwritten.size == nBuckets) Some(snapshot)
      else if (unwritten.isEmpty) None
      else Some(snapshot.filter(
        bucketOf(key, nBuckets).isin(unwritten: _*)))
    val fromFiles =
      if (paths.isEmpty) None
      else Some(spark.read.parquet(paths: _*)
        .select(snapshot.columns.map(col): _*))
    (fromSnap, fromFiles) match {
      case (Some(a), Some(b)) => a.unionByName(b)
      case (Some(a), None) => a
      case (None, Some(b)) => b
      case (None, None) => snapshot.limit(0) // every bucket claimed-empty
    }
  }

  /** Rows of `table` falling in the buckets of any `affectedKeys` key —
    * the only rows a commit must rewrite. The bucket-id frame is at
    * most `nBuckets` rows, so the semi join broadcasts. */
  def affectedBucketRows(table: DataFrame, affectedKeys: DataFrame,
      key: String, nBuckets: Int = defaultBuckets): DataFrame = {
    val affB = affectedKeys
      .select(bucketOf(key, nBuckets).as("__bucket")).distinct()
    table.withColumn("__bucket", bucketOf(key, nBuckets))
      .join(broadcast(affB), Seq("__bucket"), "left_semi")
      .drop("__bucket")
  }

  /** Commit version `id`: write `content` (the affected buckets' FULL
    * new content) partitioned by bucket, then claim exactly the
    * buckets of `affectedKeys` in the manifest — including buckets
    * `content` has no rows for (deleted-empty). Buckets not claimed
    * are untouched on disk. The id collect is ≤ `nBuckets` ints of
    * orchestration metadata, never row data. */
  def commit(root: String, id: Long, content: DataFrame,
      affectedKeys: DataFrame, key: String,
      nBuckets: Int = defaultBuckets): Unit = {
    val ids = affectedKeys
      .select(bucketOf(key, nBuckets).as("__bucket")).distinct()
      .collect().map(_.getInt(0)).sorted
    content.withColumn("__bucket", bucketOf(key, nBuckets))
      .write.mode("overwrite").partitionBy("__bucket")
      .parquet(s"$root/v$id")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/v$id", "_buckets"),
      ids.mkString("", "\n", "\n").getBytes("UTF-8"))
    ()
  }
}
