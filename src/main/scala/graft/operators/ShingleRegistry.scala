package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Persisted shingle registry — the incremental-ingest dedup artifact
  * (the [[IvfIndex]] pattern applied to text): everything ingested so
  * far (md5-ordered batches 0..6 of the corpus) contributes its distinct
  * 3-gram shingles to a warehouse table BUCKETED by shingle, and each
  * NEW batch is scored against that registry without recomputing
  * history. This is the production shape of corpus-growth dedup (the
  * novelty-curve row `text_ngram_novelty_rate` computes the whole curve
  * in one job; real ingestion has the history on disk and only the new
  * batch in hand).
  *
  * Scale notes (100 TB): the registry is the HUGE side (all history);
  * bucketing it by shingle means the probe join shuffles only the new
  * batch — the registry side reads co-partitioned with ZERO Exchange
  * (PlanSpec asserts exactly one shingle-keyed Exchange in the probe
  * plan). Freshness follows the PlanCache (path, size, mtime) rule
  * persisted beside the table; a new session re-registers catalog
  * metadata only.
  */
object ShingleRegistry {

  val NBuckets = 16

  /** md5-derived deterministic ingest batch of a document — the
    * `text_ngram_novelty_rate` rule, shared so registry and probe agree.
    */
  def batchOf(docIdCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(docIdCol.cast("string")), 1, 4), 16, 10).cast("long") % 8

  // Slug + stable hash of the RAW dir (the Scd2Dim rule): the readable
  // part alone collides distinct corpus paths that normalize alike.
  private def tag(dir: String): String = {
    val slug = dir.replaceAll("[^A-Za-z0-9]+", "_").replaceAll("^_|_$", "")
    val h = Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(dir))
    s"${slug}_$h"
  }

  def registryTable(dir: String): String = s"graft_shingle_registry_${tag(dir)}"

  private def fingerprint(dir: String): String = {
    val f = new java.io.File(s"$dir/documents.parquet")
    s"${f.getAbsolutePath}|${f.length}|${f.lastModified}"
  }

  private def warehouseDir(spark: SparkSession): java.io.File = {
    val w = spark.conf.get("spark.sql.warehouse.dir")
    if (w.startsWith("file:")) new java.io.File(new java.net.URI(w).getPath)
    else new java.io.File(w)
  }

  private def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rmTree)
    f.delete(): Unit
  }

  /** Find-or-build the persisted registry of batches 0..6: one row per
    * distinct historical shingle with the batch that first shipped it.
    */
  def ensure(spark: SparkSession, dir: String): DataFrame = synchronized {
    val name = registryTable(dir)
    val fp = fingerprint(dir)
    val wh = warehouseDir(spark)
    val loc = new java.io.File(wh, name)
    val metaFile = new java.io.File(wh, s"$name.fingerprint")
    val onDisk = metaFile.isFile && loc.isDirectory &&
      Files.readString(metaFile.toPath).trim == fp
    if (onDisk && !spark.catalog.tableExists(name)) {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      spark.sql(
        s"""CREATE TABLE $name (shingle STRING, first_batch BIGINT)
           |USING PARQUET
           |CLUSTERED BY (shingle) SORTED BY (shingle) INTO $NBuckets BUCKETS
           |LOCATION '${loc.toURI}'""".stripMargin)
    } else if (!onDisk) {
      val docs = Tables.documents(spark, dir)
      val hist = docs.filter(batchOf(col("doc_id")) < 7)
      val reg = TextOps.shingles(hist)
        .withColumn("batch", batchOf(col("doc_id")))
        .groupBy(col("shingle"))
        .agg(min(col("batch")).as("first_batch"))
      spark.sql(s"DROP TABLE IF EXISTS $name")
      Files.deleteIfExists(metaFile.toPath)
      rmTree(loc)
      reg
        .repartition(NBuckets, col("shingle"))
        .write
        .bucketBy(NBuckets, "shingle")
        .sortBy("shingle")
        .option("path", loc.getAbsolutePath)
        .saveAsTable(name)
      Files.writeString(metaFile.toPath, fp): Unit
    }
    spark.table(name)
  }

  def upsertedTable(dir: String): String = s"graft_shingle_reg2_${tag(dir)}"

  /** Clone the given registry frame into catalog table `name` (bucketed
    * identically) — the seed step for a new registry GENERATION, shared
    * by [[ensureUpserted]] and the StreamingSpec stream-maintained
    * registry drive.
    */
  def seedGeneration(spark: SparkSession, reg: DataFrame, name: String,
      loc: java.io.File): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    rmTree(loc)
    reg
      .repartition(NBuckets, col("shingle"))
      .write
      .bucketBy(NBuckets, "shingle")
      .sortBy("shingle")
      .option("path", loc.getAbsolutePath)
      .saveAsTable(name)
  }

  /** ONE idempotent upsert of a delivered document micro-batch into the
    * registry generation `name`: shingle the batch, anti-join the LIVE
    * table (merge-hinted — the registry side reads co-partitioned from
    * its buckets, no Exchange), and APPEND the novel survivors as
    * correctly-bucketed files tagged `first_batch = ingestBatch`.
    * Replays are no-ops BY CONSTRUCTION — a replayed delivery's novel
    * shingles are already in the table, so the anti-join drops them —
    * which is exactly the idempotence the at-least-once foreachBatch
    * contract requires. Micro-batch boundaries don't matter either: a
    * shingle shipped by two deliveries is appended by the first and
    * anti-joined away by the second, so the final state equals the
    * one-shot batch upsert.
    */
  def upsertBatch(docs: DataFrame, name: String, ingestBatch: Long): Unit = {
    val spark = docs.sparkSession
    TextOps.shingles(docs)
      .select(col("shingle")).distinct()
      .join(spark.table(name).select(col("shingle")).hint("merge"),
        Seq("shingle"), "left_anti")
      .select(col("shingle"), lit(ingestBatch).as("first_batch"))
      .repartition(NBuckets, col("shingle"))
      .write
      .mode("append")
      .bucketBy(NBuckets, "shingle")
      .sortBy("shingle")
      .saveAsTable(name)
  }

  /** Find-or-build the POST-UPSERT registry generation: the daily-ingest
    * cycle's second half. After batch 7 is scored against history
    * ([[TextOps.dedupIncrementalRegistry]]), its NOVEL shingles are
    * appended into the registry with `first_batch = 7` so tomorrow's
    * batch scores against an 0..7 history.
    *
    * Scale notes (100 TB): the upsert itself scans ONLY the new batch —
    * shingle it, anti-join the bucketed registry (merge-hinted; no
    * Exchange on the registry side), and APPEND the survivors as
    * correctly-bucketed files (`mode("append").bucketBy` adds per-bucket
    * files; history is never rewritten). The v1→v2 generation clone below
    * exists ONLY because the scoring row's oracle needs v1 frozen at
    * batches 0..6 — a production registry upserts in place and the clone
    * disappears. Freshness follows the same (path, size, mtime)
    * fingerprint rule as v1, which also makes the declared row
    * deterministic under re-runs: the second execution finds the artifact
    * built and serves it metadata-only.
    */
  def ensureUpserted(spark: SparkSession, dir: String): DataFrame = synchronized {
    val name = upsertedTable(dir)
    val fp = fingerprint(dir)
    val wh = warehouseDir(spark)
    val loc = new java.io.File(wh, name)
    val metaFile = new java.io.File(wh, s"$name.fingerprint")
    val onDisk = metaFile.isFile && loc.isDirectory &&
      Files.readString(metaFile.toPath).trim == fp
    if (onDisk && !spark.catalog.tableExists(name)) {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      spark.sql(
        s"""CREATE TABLE $name (shingle STRING, first_batch BIGINT)
           |USING PARQUET
           |CLUSTERED BY (shingle) SORTED BY (shingle) INTO $NBuckets BUCKETS
           |LOCATION '${loc.toURI}'""".stripMargin)
    } else if (!onDisk) {
      val reg = ensure(spark, dir)
      Files.deleteIfExists(metaFile.toPath)
      seedGeneration(spark, reg, name, loc)
      // THE upsert: new batch only, anti-joined against the (bucketed)
      // registry — shared verbatim with the StreamingSpec foreachBatch
      // drive ([[upsertBatch]]), delivered here as one whole batch
      upsertBatch(
        Tables.documents(spark, dir).filter(batchOf(col("doc_id")) === 7),
        name, ingestBatch = 7L)
      Files.writeString(metaFile.toPath, fp): Unit
    }
    spark.table(name)
  }
}
