package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Sources & sinks beyond the fixture parquet (SURVEY.md §2.2
  * "Scans/sources/sinks"): CSV and JSON readers/writers, in-memory
  * relations, partitioned parquet output, and the O18-style bulk
  * writeback (the reference's per-row commit protocol generalized to a
  * partition-overwrite MERGE).
  */
object Sources {

  /** CSV round-trip: header + explicit schema on read (schema inference
    * would scan twice — never at 100 TB).
    */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String,
              schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** JSON-lines round-trip (schema explicit, same reasoning). */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def readJson(spark: SparkSession, path: String,
               schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC round-trip: the other columnar format Spark ships natively
    * (vectorized reader, predicate pushdown like parquet).
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Whole-line text source: one string column `value` per line — the
    * raw-corpus ingestion path before any parsing.
    */
  def readText(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** In-memory relation from driver-side rows (small dimension / lookup
    * tables only — this materializes on the driver by construction).
    */
  def inMemory[T : org.apache.spark.sql.Encoder](
      spark: SparkSession, rows: Seq[T]): DataFrame =
    spark.createDataset(rows).toDF()

  /** Partitioned parquet sink: one directory per partition value —
    * the layout that makes partition PRUNING work on re-read (filters
    * on the partition column never touch non-matching files).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(path)

  /** Bucketed table write: co-locates (and pre-sorts) rows by the join
    * key so equi-joins between tables bucketed the same way need NO
    * shuffle at read time — the bucketing metadata lives in the catalog
    * and Catalyst drops the Exchange. The 100 TB pattern for fact-fact
    * joins that repeat across workloads.
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, keys: String*): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** O18 — bulk writeback: apply a keyed update set to a stored table
    * (the reference's row-commit protocol, OBP.js:554-621, as a batch
    * MERGE). Reads the target, left-joins the updates on the key, and
    * rewrites with the updated column — the update set is broadcast, so
    * the target is scanned exactly once and never shuffled. Parquet has
    * no in-place update; the rewrite goes to a staging dir then
    * replaces the target (the transactional-table pattern without a
    * table format).
    */
  def mergeColumnUpdate(spark: SparkSession, targetPath: String,
                        updates: DataFrame, key: String, column: String): Long = {
    val target = spark.read.parquet(targetPath)
    val upd = updates.select(col(key), col(column).as("__newval"))
    val merged = target.join(broadcast(upd), Seq(key), "left")
      .withColumn(column, coalesce(col("__newval"), col(column)))
      .drop("__newval")
    val staging = targetPath.stripSuffix("/") + ".staging"
    merged.write.mode(SaveMode.Overwrite).parquet(staging)
    // swap staging into place
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(staging), spark.sparkContext.hadoopConfiguration)
    val tgt = new org.apache.hadoop.fs.Path(targetPath)
    fs.delete(tgt, true)
    fs.rename(new org.apache.hadoop.fs.Path(staging), tgt)
    spark.read.parquet(targetPath).count()
  }

  /** Full-row MERGE (upsert): updates replace matching keys, new keys
    * insert, untouched rows survive — target ⟕̸ updates (anti) ∪
    * updates, the rewrite every table format's MERGE INTO lowers to
    * when there's no deletion-vector path. The anti-join broadcasts the
    * update set, so the target scans once; the staging-dir swap gives
    * the same no-partial-visibility contract as `mergeColumnUpdate`.
    */
  def upsert(spark: SparkSession, targetPath: String,
             updates: DataFrame, key: String): Long = {
    val target = spark.read.parquet(targetPath)
    val merged = target
      .join(broadcast(updates.select(col(key))), Seq(key), "left_anti")
      .unionByName(updates.select(target.columns.map(col): _*))
    val staging = targetPath.stripSuffix("/") + ".staging"
    merged.write.mode(SaveMode.Overwrite).parquet(staging)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(staging), spark.sparkContext.hadoopConfiguration)
    val tgt = new org.apache.hadoop.fs.Path(targetPath)
    fs.delete(tgt, true)
    fs.rename(new org.apache.hadoop.fs.Path(staging), tgt)
    spark.read.parquet(targetPath).count()
  }

  /** Small-file compaction: rewrite a directory into ⌈rows/target⌉
    * files. Streaming sinks and per-batch upserts accumulate small
    * files; at scale the fix is a periodic coalesced rewrite sized by
    * row count (a proxy for bytes when row width is stable), not a
    * bigger write — readers pay per-file open cost and the driver pays
    * per-file planning cost until compaction runs.
    */
  def compact(spark: SparkSession, path: String, rowsPerFile: Long): Long = {
    val df = spark.read.parquet(path)
    val n = df.count()
    val files = math.max(1L, (n + rowsPerFile - 1) / rowsPerFile).toInt
    val staging = path.stripSuffix("/") + ".staging"
    df.repartition(files).write.mode(SaveMode.Overwrite).parquet(staging)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(staging), spark.sparkContext.hadoopConfiguration)
    val tgt = new org.apache.hadoop.fs.Path(path)
    fs.delete(tgt, true)
    fs.rename(new org.apache.hadoop.fs.Path(staging), tgt)
    files.toLong
  }
}
