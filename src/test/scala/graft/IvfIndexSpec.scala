package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Persisted-IVF-index lifecycle (VERDICT r7 #6): build exactly once,
  * serve from the on-disk artifacts, re-register metadata-only in a
  * "new session" (catalog emptied), and rebuild when the corpus file
  * changes — the cross-job freshness contract PlanCache provides
  * in-session, extended to disk.
  */
class IvfIndexSpec extends SparkSpecBase {

  private def warehouse = new java.io.File("/tmp/graft_scratch/warehouse")

  /** (fileName → mtime) of the table directory's data files. */
  private def mtimes(table: String): Map[String, Long] = {
    val d = new java.io.File(warehouse, table)
    Option(d.listFiles()).toSeq.flatten
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified).toMap
  }

  test("build once; repeat ensure and catalog-dropped ensure never rewrite data") {
    val idxName = operators.IvfIndex.indexTable(sfDir)
    val cbName = operators.IvfIndex.codebookTable(sfDir)
    val (idx, cb) = operators.IvfIndex.ensure(spark, sfDir)
    val n = idx.count()
    val cells = cb.count()
    assert(n == Tables.embeddings(spark, sfDir).count(),
      "index must hold every corpus vector exactly once")
    assert(cells == math.ceil(math.sqrt(n.toDouble)).toLong,
      s"codebook must have ceil(sqrt(n)) cells, got $cells for n=$n")
    val built = mtimes(idxName)
    assert(built.nonEmpty, "bucketed index wrote no data files")

    // same session, second ensure: pure lookup
    operators.IvfIndex.ensure(spark, sfDir)
    assert(mtimes(idxName) == built, "repeat ensure must not rewrite the index")

    // "new session": catalog entries gone, data still on disk → DDL-only
    spark.sql(s"DROP TABLE $idxName")
    spark.sql(s"DROP TABLE $cbName")
    val (idx2, _) = operators.IvfIndex.ensure(spark, sfDir)
    assert(mtimes(idxName) == built,
      "catalog re-registration must be metadata-only (data files rewritten)")
    assert(idx2.count() == n)
    // and the re-registered table is still bucketed metadata-wise
    val ddl = spark.sql(s"SHOW CREATE TABLE $idxName").head().getString(0)
    assert(ddl.contains("CLUSTERED BY") && ddl.contains(s"${operators.IvfIndex.NBuckets} BUCKETS"),
      s"re-registered table lost its bucketing spec:\n$ddl")
  }

  test("residual-PQ artifacts: codes equal the in-plan re-derivation, codebook is full") {
    import org.apache.spark.sql.functions._
    val (idx, ivfCb) = operators.IvfIndex.ensure(spark, sfDir)
    val (codes, pqrCb) = operators.IvfIndex.ensurePqResidual(spark, sfDir)
    // full codebook: every (sub, cid) slot present exactly once (Lloyd
    // empty-cell carry keeps the count invariant across rounds)
    assert(pqrCb.count() == operators.VectorOps.PqrM.toLong * operators.VectorOps.PqrK,
      "residual codebook must hold PqrM * PqrK centroids")
    assert(pqrCb.select("sub", "cid").distinct().count() == pqrCb.count(),
      "(sub, cid) must be unique in the residual codebook")
    // persisted codes must EQUAL a from-scratch in-plan encode over the
    // same index + codebook — the artifacts faithfully capture the build
    val resid = operators.VectorOps.withResiduals(idx, ivfCb)
      .select(col("vec_id"), col("cell"), col("remb").as("emb"))
    val replay = operators.VectorOps
      .withPqStructs(resid, pqrCb.select(col("sub"), col("cid"), col("cv")),
        operators.VectorOps.PqrM, operators.VectorOps.PqrW)
      .select(col("vec_id"), col("cell"),
        expr("transform(pq, x -> CAST(x.cid AS BIGINT))").as("codes"))
    val a = codes.select(col("vec_id"), col("cell"), col("codes"))
      .collect().map(_.toString).sorted.toSeq
    val b = replay.collect().map(_.toString).sorted.toSeq
    assert(a == b, "persisted residual codes diverge from the in-plan encode")
  }

  test("rewritten corpus at the same path invalidates and rebuilds") {
    val dir = Files.createTempDirectory("graft_ivf_stale").toString
    def copyCorpus(): Path = Files.copy(
      Paths.get(s"$sfDir/embeddings.parquet"),
      Paths.get(s"$dir/embeddings.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    copyCorpus()
    val idxName = operators.IvfIndex.indexTable(dir)
    val (idx1, _) = operators.IvfIndex.ensure(spark, dir)
    val n1 = idx1.count()
    val built = mtimes(idxName)
    // regenerate the corpus in place: same path, fresh mtime
    copyCorpus()
    Paths.get(s"$dir/embeddings.parquet").toFile.setLastModified(System.currentTimeMillis() + 2000)
    spark.catalog.refreshByPath(dir)
    val (idx2, _) = operators.IvfIndex.ensure(spark, dir)
    assert(idx2.count() == n1)
    assert(mtimes(idxName) != built,
      "stale fingerprint must trigger a rebuild (data files unchanged)")
  }
}
