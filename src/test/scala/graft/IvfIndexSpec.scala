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

  test("incremental add: base files byte-untouched, appended = base + batch, replay is a no-op") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val baseName = operators.IvfIndex.baseIndexTable(sfDir)
    val appName = operators.IvfIndex.appendedIndexTable(sfDir)

    val (baseIdx, baseCb) = operators.IvfIndex.ensureBase(spark, sfDir)
    val nBase = baseIdx.count()
    val baseFiles = mtimes(baseName)
    assert(baseFiles.nonEmpty, "base index wrote no data files")
    // the base slice excludes the batch entirely
    assert(baseIdx.filter(operators.IvfIndex.isAppendBatch($"vec_id")).count() == 0,
      "base generation must not contain batch rows")

    val (appIdx, _) = operators.IvfIndex.ensureAppended(spark, sfDir)
    val appFiles = mtimes(appName)
    val nBatch = Tables.embeddings(spark, sfDir)
      .filter(operators.IvfIndex.isAppendBatch($"vec_id")).count()
    // 1. base generation byte-untouched by the append
    assert(mtimes(baseName) == baseFiles,
      "append rewrote base-generation files")
    // 2. appended = base ∪ batch exactly, ids disjoint
    assert(appIdx.count() == nBase + nBatch,
      "appended index must hold base + batch rows")
    assert(appIdx.select($"vec_id").distinct().count() == nBase + nBatch,
      "appended index duplicated a vec_id")
    assert(appIdx.filter(operators.IvfIndex.isAppendBatch($"vec_id")).count() == nBatch,
      "appended index must hold every batch row")
    // 3. appended rows sit in the cell the row-local assignment picks
    //    against the UNCHANGED base codebook
    val expect = operators.IvfIndex.appendAssigned(spark, sfDir, baseCb)
      .select($"vec_id", $"cell").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = appIdx.filter(operators.IvfIndex.isAppendBatch($"vec_id"))
      .select($"vec_id", $"cell").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect, "appended rows landed in the wrong cells")
    // 4. the append added files next to the clone's (never rewrote them)
    assert(appFiles.size > operators.IvfIndex.NBuckets.min(baseFiles.size),
      s"append should add files beyond the clone's (got ${appFiles.size})")
    // 5. replay: same session ensure is a pure lookup; catalog-dropped
    //    re-ensure is metadata-only — no data file moves either way
    operators.IvfIndex.ensureAppended(spark, sfDir)
    assert(mtimes(appName) == appFiles, "replayed append rewrote data files")
    spark.sql(s"DROP TABLE $appName")
    val (again, _) = operators.IvfIndex.ensureAppended(spark, sfDir)
    assert(mtimes(appName) == appFiles,
      "catalog re-registration of the appended table must be metadata-only")
    assert(again.count() == nBase + nBatch)

    // 6. codes-table half: base codes untouched, appended codes cover
    //    the union, batch codes equal a from-scratch encode
    val baseCodesName = operators.IvfIndex.pqrBaseCodesTable(sfDir)
    val (baseCodes, rcb) = operators.IvfIndex.ensurePqrBase(spark, sfDir)
    val baseCodeFiles = mtimes(baseCodesName)
    val (appCodes, _) = operators.IvfIndex.ensurePqrAppended(spark, sfDir)
    assert(mtimes(baseCodesName) == baseCodeFiles,
      "codes append rewrote base-generation code files")
    assert(appCodes.count() == nBase + nBatch,
      "appended codes must cover base + batch rows")
    val batchResid = operators.VectorOps.withResiduals(
        operators.IvfIndex.appendAssigned(spark, sfDir, baseCb), baseCb)
      .select(col("vec_id"), col("cell"), col("remb").as("emb"))
    val expectCodes = operators.VectorOps
      .withPqStructs(batchResid, rcb.select(col("sub"), col("cid"), col("cv")),
        operators.VectorOps.PqrM, operators.VectorOps.PqrW)
      .select(col("vec_id"), col("cell"),
        expr("transform(pq, x -> CAST(x.cid AS BIGINT))").as("codes"))
      .collect().map(_.toString).sorted.toSeq
    val gotCodes = appCodes.filter(operators.IvfIndex.isAppendBatch(col("vec_id")))
      .select(col("vec_id"), col("cell"), col("codes"))
      .collect().map(_.toString).sorted.toSeq
    assert(gotCodes == expectCodes,
      "appended codes diverge from the from-scratch batch encode")
  }

  test("generation-2 rebalance: writes forward, gen-1 untouched, moves only split-cell members") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val g1IdxName = operators.IvfIndex.indexTable(sfDir)
    val (idx1, cb1) = operators.IvfIndex.ensure(spark, sfDir)
    val g1Built = mtimes(g1IdxName)
    val (over, asg) = operators.VectorOps.splitPlan(spark, idx1, cb1)
    val splitCells = over.select("cell").collect().map(_.getLong(0)).toSet
    assert(splitCells.nonEmpty, "fixture must have at least one overloaded cell")

    val (idx2, cb2) = operators.IvfIndex.ensureRebalanced(spark, sfDir)

    // maintenance writes FORWARD: generation 1 is never modified
    assert(mtimes(g1IdxName) == g1Built,
      "applying the rebalance must not rewrite generation-1 data files")
    assert(idx2.count() == idx1.count(),
      "generation 2 must hold every corpus vector exactly once")

    // reassignment touches ONLY split-cell members — and exactly the
    // side-1 ones (side 0 keeps its cell id)
    val movedRows = idx1.select($"vec_id", $"cell".as("c1"))
      .join(idx2.select($"vec_id", $"cell".as("c2")), Seq("vec_id"))
      .filter($"c1" =!= $"c2")
      .collect()
    val side1 = asg.filter($"side" === 1L)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(movedRows.nonEmpty, "a split must move its side-1 members")
    assert(movedRows.forall(r => splitCells.contains(r.getAs[Long]("c1"))),
      "a member of an UNSPLIT cell changed cells")
    assert(movedRows.map(_.getAs[Long]("vec_id")).toSet == side1,
      "moved set must equal the plan's side-1 members exactly")

    // codebook: side 0 reuses each split id, side 1 adds one fresh id;
    // unsplit centroids are bit-identical between generations
    assert(cb2.count() == cb1.count() + splitCells.size,
      "generation 2 must add exactly one centroid per split cell")
    val unsplitDrift = cb1.filter(!$"cell".isin(splitCells.toSeq: _*))
      .select($"cell", $"cvec".as("v1"), $"cnrm".as("n1"))
      .join(cb2.select($"cell", $"cvec".as("v2"), $"cnrm".as("n2")), Seq("cell"))
      .filter($"v1" =!= $"v2" || $"n1" =!= $"n2")
      .count()
    assert(unsplitDrift == 0, "unsplit centroids must pass through verbatim")

    // serve impact is CONFINED to split geometry: the nearest-cell probe
    // of a query can change only when the old probe was a split cell or
    // the new probe is a split-geometry cell (side-0 id or fresh side-1
    // id) — unsplit centroids are unchanged, so any other flip would
    // reorder two identical similarities
    val newIds = cb2.select("cell").collect().map(_.getLong(0)).toSet --
      cb1.select("cell").collect().map(_.getLong(0)).toSet
    def probes(cb: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
      val q = operators.VectorOps.withNorm(spark, sfDir)
        .filter($"vec_id" % 10 === 7)
        .select($"vec_id".cast("long").as("q_id"), $"emb".as("q_emb"), $"nrm".as("q_nrm"))
      q.crossJoin(broadcast(cb))
        .withColumn("csim", round(
          graft.functions.GraftFunctions.dot($"q_emb", $"cvec") / ($"q_nrm" * $"cnrm"), 6))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy($"q_id").orderBy($"csim".desc, $"cell")))
        .filter($"rn" === 1)
        .select($"q_id", $"cell")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val p1 = probes(cb1)
    val p2 = probes(cb2)
    val flips = p1.keys.filter(k => p1(k) != p2(k))
    assert(flips.forall(k =>
      splitCells.contains(p1(k)) || splitCells.contains(p2(k)) || newIds.contains(p2(k))),
      s"a probe flipped between two UNSPLIT cells: ${flips.map(k => (k, p1(k), p2(k)))}")

    // read-side policy: freshest generation on disk wins. Sibling
    // suites may have built a LATER generation for sfDir in the shared
    // warehouse (DeterminismSpec executes vec_ivf_generation_chain), so
    // assert the policy outcome — some generation ≥ 2, never gen-1 —
    // rather than pinning the ordinal
    val (srvIdx, _) = operators.IvfIndex.serveLatest(spark, sfDir)
    assert(srvIdx.inputFiles.head.contains("graft_ivf_index_g"),
      "serveLatest must read an applied generation once a current rebalance exists")
  }

  test("incremental residual-code refresh: copies unsplit codes verbatim, re-encodes only split geometry") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val (_, cb1) = operators.IvfIndex.ensure(spark, sfDir)
    val (codes1, _) = operators.IvfIndex.ensurePqResidual(spark, sfDir)
    val (idx2, cb2) = operators.IvfIndex.ensureRebalanced(spark, sfDir)
    val codes1Name = operators.IvfIndex.pqrCodesTable(sfDir)
    val g1Built = mtimes(codes1Name)

    val (codes2, _) = operators.IvfIndex.ensurePqrG2(spark, sfDir)

    assert(mtimes(codes1Name) == g1Built,
      "refresh must not rewrite the generation-1 codes files")
    assert(codes2.count() == codes1.count(),
      "gen-2 codes must hold every corpus vector exactly once")

    // split-geometry cells, the same way the build derives them
    val cb1Cells = cb1.select("cell").collect().map(_.getLong(0)).toSet
    val changed = cb2.select($"cell", $"cvec")
      .join(cb1.select($"cell", $"cvec".as("cvec1")), Seq("cell"), "left")
      .filter($"cvec1".isNull || $"cvec1" =!= $"cvec")
      .select("cell").collect().map(_.getLong(0)).toSet
    assert(changed.nonEmpty, "fixture must have split cells to refresh")

    // rows OUTSIDE split geometry: identical (vec_id, cell, codes) to gen-1
    val keep1 = codes1.filter(!$"cell".isin(changed.toSeq: _*))
      .collect().map(_.toString).sorted.toSeq
    val keep2 = codes2.filter(!$"cell".isin(changed.toSeq: _*))
      .collect().map(_.toString).sorted.toSeq
    assert(keep1 == keep2, "unsplit rows' codes must copy verbatim")

    // rows INSIDE split geometry: exactly the gen-2 members of those
    // cells, re-encoded against the gen-2 centroids with the gen-1
    // residual codebook — verify against a from-scratch in-plan encode
    val (_, rcb) = operators.IvfIndex.ensurePqResidual(spark, sfDir)
    val expect = operators.VectorOps.withPqStructs(
        operators.VectorOps.withResiduals(
            idx2.filter($"cell".isin(changed.toSeq: _*)), cb2)
          .select($"vec_id", $"cell", $"remb".as("emb")),
        rcb, operators.VectorOps.PqrM, operators.VectorOps.PqrW)
      .select($"vec_id", $"cell",
        expr("transform(pq, x -> CAST(x.cid AS BIGINT))").as("codes"))
      .collect().map(_.toString).sorted.toSeq
    val got = codes2.filter($"cell".isin(changed.toSeq: _*))
      .collect().map(_.toString).sorted.toSeq
    assert(got == expect, "refreshed codes diverge from the gen-2 re-encode")
  }

  test("serveLatest serves generation 1 until a rebalance is applied") {
    val dir = Files.createTempDirectory("graft_ivf_g2").toString
    Files.copy(
      Paths.get(s"$sfDir/embeddings.parquet"),
      Paths.get(s"$dir/embeddings.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    operators.IvfIndex.ensure(spark, dir)
    val (beforeIdx, _) = operators.IvfIndex.serveLatest(spark, dir)
    assert(beforeIdx.inputFiles.head.contains(operators.IvfIndex.indexTable(dir)),
      "with no applied rebalance on disk, serveLatest must read generation 1")
    operators.IvfIndex.ensureRebalanced(spark, dir)
    val (afterIdx, _) = operators.IvfIndex.serveLatest(spark, dir)
    assert(afterIdx.inputFiles.head.contains(operators.IvfIndex.indexG2Table(dir)),
      "after the apply, serveLatest must read generation 2")
  }

  test("no-op rebalance publishes generation 2 as metadata over generation-1 files") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ivf_noop").toString
    // 16 vectors in 4 tight orthogonal clusters at vec_ids {4j..4j+3}:
    // the stride seeds (0, 4, 8, 12) hit one cluster each, Lloyd keeps
    // the 4/4/4/4 balance, and no cell passes the 4·n_cell·nlist > 5·N
    // overload gate — the sf1 scale probe's case, miniaturized
    val rows = for (j <- 0 until 4; i <- 0 until 4) yield {
      val emb = Array.fill(64)(0.0f)
      emb(16 * j) = 1.0f
      if (i > 0) emb(16 * j + i) = 0.01f * i
      (4L * j + i, emb.toSeq, j)
    }
    rows.toDF("vec_id", "embedding", "label")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"),
        $"label".cast("int").as("label"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val (idx1, cb1) = operators.IvfIndex.ensure(spark, dir)
    val (over, _) = operators.VectorOps.splitPlan(spark, idx1, cb1)
    assert(over.isEmpty, "fixture must produce a balanced index (empty split plan)")
    val g1Built = mtimes(operators.IvfIndex.indexTable(dir))

    val (idx2, cb2) = operators.IvfIndex.ensureRebalanced(spark, dir)
    assert(!new java.io.File(warehouse, operators.IvfIndex.indexG2Table(dir)).exists(),
      "a no-op apply must not copy the index (at 100 TB that copy is the bug)")
    assert(idx2.inputFiles.head.contains(operators.IvfIndex.indexTable(dir)),
      "gen-2 table must read the generation-1 files")
    assert(idx2.count() == 16 && cb2.count() == cb1.count())
    assert(mtimes(operators.IvfIndex.indexTable(dir)) == g1Built,
      "generation-1 files must stay untouched")

    val (codes2, _) = operators.IvfIndex.ensurePqrG2(spark, dir)
    assert(!new java.io.File(warehouse, operators.IvfIndex.pqrCodesG2Table(dir)).exists(),
      "a no-op refresh must not copy the codes")
    assert(codes2.inputFiles.head.contains(operators.IvfIndex.pqrCodesTable(dir)),
      "gen-2 codes table must read the generation-1 codes files")

    val (srv, _) = operators.IvfIndex.serveLatest(spark, dir)
    assert(srv.inputFiles.head.contains(operators.IvfIndex.indexTable(dir)),
      "serveLatest must treat the published no-op generation as freshest")
  }

  test("tombstone delete: index untouched, serve excludes, compaction drops exactly the dead") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val idxName = operators.IvfIndex.indexTable(sfDir)
    val (idx, _) = operators.IvfIndex.ensure(spark, sfDir)
    val n = idx.count()
    val g1Files = mtimes(idxName)

    val ts = operators.IvfIndex.ensureTombstones(spark, sfDir)
    val deleted = ts.select($"vec_id").collect().map(_.getLong(0)).toSet
    // 1. tombstones = exactly the delete rule's rows; index untouched
    val expected = idx.filter(operators.IvfIndex.isDeleted($"vec_id"))
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    assert(deleted == expected, "tombstone table must hold exactly the delete batch")
    assert(deleted.nonEmpty, "fixture must contain deleted rows")
    assert(mtimes(idxName) == g1Files, "landing tombstones rewrote index files")

    // 2. the filtered serve path never surfaces a deleted id, and the
    //    exclusion BITES: wherever the unfiltered serve row returned a
    //    deleted id, the filtered row returns something else
    val unfiltered = operators.VectorOps.vecAnnIvfServe.fn(spark, sfDir)
    val filtered = operators.VectorOps.vecAnnIvfServeTombstoned.fn(spark, sfDir)
    val filteredIds = filtered.select($"vec_id").collect().map(_.getLong(0)).toSet
    assert(filteredIds.intersect(deleted).isEmpty,
      "tombstoned ids surfaced on the filtered serve path")
    val unfilteredHitDeleted = unfiltered
      .filter($"vec_id".isin(deleted.toSeq: _*)).count()
    if (unfilteredHitDeleted > 0)
      assert(unfiltered.collect().map(_.toString).toSet !=
        filtered.collect().map(_.toString).toSet,
        "a deleted top hit must change the filtered answer")

    // 3. compaction: live rows only, gen-1 + tombstones byte-untouched,
    //    replay is a pure lookup
    val tsFiles = mtimes(operators.IvfIndex.tombstoneTable(sfDir))
    val (cidx, _) = operators.IvfIndex.ensureCompacted(spark, sfDir)
    assert(cidx.count() == n - deleted.size,
      "compacted generation must hold exactly the live rows")
    assert(cidx.filter(operators.IvfIndex.isDeleted($"vec_id")).count() == 0,
      "compacted generation still holds deleted rows")
    assert(mtimes(idxName) == g1Files, "compaction rewrote gen-1 files")
    assert(mtimes(operators.IvfIndex.tombstoneTable(sfDir)) == tsFiles,
      "compaction rewrote the tombstone table")
    val cFiles = mtimes(operators.IvfIndex.compactedIndexTable(sfDir))
    operators.IvfIndex.ensureCompacted(spark, sfDir)
    assert(mtimes(operators.IvfIndex.compactedIndexTable(sfDir)) == cFiles,
      "repeat compaction must not rewrite data files")
  }

  test("generation chain: apply-2 splits a cell CREATED by apply-1, serveLatest picks gen-3") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ivf_chain").toString
    // 16 vectors, nlist = 4, stride seeds at ids {0, 4, 8, 12}. Cluster
    // A (10 members around e0, ids 0,1,2,3,5,6,7,9,10,11) holds three
    // tight sub-clusters at angles 0 / 0.2 / 0.4 rad; B/C/D are
    // orthogonal pairs seeded by ids 4/8/12. Gen-1 overload gate
    // (n_cell·nlist·4 > 5·N ⇔ n_cell ≥ 6 here) fires on A alone;
    // apply-1's 2-means (seeds = ids 0, 1) puts {0,2,3,9} on side 0 and
    // {1,5,6,7,10,11} on the NEW cell; at gen-2 (nlist 5, gate ≥ 5) that
    // new 6-member cell — created by apply-1 — is the only overload, and
    // apply-2's seeds (ids 1, 5) split it {1,6,7} / {5,10,11}.
    def vec(axis: Int, theta: Double, noiseDim: Int, noise: Double): Seq[Float] = {
      val a = Array.fill(64)(0.0f)
      a(axis) = math.cos(theta).toFloat
      if (theta != 0.0) a(axis + 1) = math.sin(theta).toFloat
      if (noise != 0.0) a(noiseDim) = noise.toFloat
      a.toSeq
    }
    val rows: Seq[(Long, Seq[Float], Int)] = Seq(
      (0L, vec(0, 0.0, 2, 0.0), 0), (2L, vec(0, 0.0, 2, 0.01), 0),
      (3L, vec(0, 0.0, 3, 0.01), 0), (9L, vec(0, 0.0, 2, 0.02), 0),
      (1L, vec(0, 0.2, 2, 0.0), 0), (6L, vec(0, 0.2, 2, 0.01), 0),
      (7L, vec(0, 0.2, 3, 0.01), 0),
      (5L, vec(0, 0.4, 2, 0.0), 0), (10L, vec(0, 0.4, 2, 0.01), 0),
      (11L, vec(0, 0.4, 3, 0.01), 0),
      (4L, vec(16, 0.0, 17, 0.0), 1), (13L, vec(16, 0.0, 17, 0.01), 1),
      (8L, vec(32, 0.0, 33, 0.0), 2), (14L, vec(32, 0.0, 33, 0.01), 2),
      (12L, vec(48, 0.0, 49, 0.0), 3), (15L, vec(48, 0.0, 49, 0.01), 3))
    rows.toDF("vec_id", "embedding", "label")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"),
        $"label".cast("int").as("label"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    def cells(cb: org.apache.spark.sql.DataFrame): Set[Long] =
      cb.select($"cell").collect().map(_.getLong(0)).toSet
    def members(idx: org.apache.spark.sql.DataFrame, cell: Long): Set[Long] =
      idx.filter($"cell" === cell).select($"vec_id").collect().map(_.getLong(0)).toSet

    val (idx1, cb1) = operators.IvfIndex.ensure(spark, dir)
    assert(cb1.count() == 4, "gen-1 must train 4 cells")
    val g1Files = mtimes(operators.IvfIndex.indexTable(dir))

    val (idx2, cb2) = operators.IvfIndex.ensureGen(spark, dir, 2)
    val created2 = cells(cb2) -- cells(cb1)
    assert(created2.size == 1, s"apply-1 must create exactly one cell, got $created2")
    val a1 = created2.head
    assert(members(idx2, a1) == Set(1L, 5L, 6L, 7L, 10L, 11L),
      "apply-1 side-1 members wrong")
    val g2Files = mtimes(operators.IvfIndex.indexGenTable(dir, 2))

    val (idx3, cb3) = operators.IvfIndex.ensureGen(spark, dir, 3)
    val created3 = cells(cb3) -- cells(cb2)
    assert(created3.size == 1, s"apply-2 must create exactly one cell, got $created3")
    val a2 = created3.head
    // apply-2 split THE CELL APPLY-1 CREATED: side 0 keeps its id
    assert(members(idx3, a1) == Set(1L, 6L, 7L),
      "apply-2 side-0 must keep the apply-1 cell id with the near-seed half")
    assert(members(idx3, a2) == Set(5L, 10L, 11L),
      "apply-2 side-1 members wrong")
    assert(idx3.count() == 16 && cb3.count() == 6)

    // older generations byte-untouched; serve picks the chain head
    assert(mtimes(operators.IvfIndex.indexTable(dir)) == g1Files,
      "apply-2 touched generation-1 files")
    assert(mtimes(operators.IvfIndex.indexGenTable(dir, 2)) == g2Files,
      "apply-2 touched generation-2 files")
    val (srv, _) = operators.IvfIndex.serveLatest(spark, dir)
    assert(srv.inputFiles.head.contains(operators.IvfIndex.indexGenTable(dir, 3)),
      "serveLatest must serve generation 3")
  }

  test("a noop marker whose aliased gen-1 data is gone triggers a rebuild, not registration over nothing") {
    import spark.implicits._
    // same balanced fixture as the noop test: 4 tight orthogonal
    // clusters, empty split plan → gen-2 publishes as a noop marker
    val dir = Files.createTempDirectory("graft_ivf_noopgone").toString
    val rows = for (j <- 0 until 4; i <- 0 until 4) yield {
      val emb = Array.fill(64)(0.0f)
      emb(16 * j) = 1.0f
      if (i > 0) emb(16 * j + i) = 0.01f * i
      (4L * j + i, emb.toSeq, j)
    }
    rows.toDF("vec_id", "embedding", "label")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"),
        $"label".cast("int").as("label"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    operators.IvfIndex.ensureRebalanced(spark, dir)
    val g2Meta = new java.io.File(warehouse,
      s"${operators.IvfIndex.indexG2Table(dir)}.fingerprint")
    assert(g2Meta.isFile && Files.readString(g2Meta.toPath).endsWith("|noop"),
      "fixture must publish generation 2 as a noop marker")

    // externally remove the gen-1 data the marker aliases (and the
    // catalog entries, as a new JVM would lack them)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rm)
      f.delete(): Unit
    }
    for (t <- Seq(operators.IvfIndex.indexTable(dir),
                  operators.IvfIndex.codebookTable(dir),
                  operators.IvfIndex.indexG2Table(dir),
                  operators.IvfIndex.codebookG2Table(dir))) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      rm(new java.io.File(warehouse, t))
    }
    Files.deleteIfExists(java.nio.file.Paths.get(warehouse.getPath,
      s"${operators.IvfIndex.indexTable(dir)}.fingerprint"))
    // the r10-ADVICE guard: the surviving noop marker must NOT be
    // trusted — ensureRebalanced rebuilds gen-1 and re-derives gen-2
    val (idx2, cb2) = operators.IvfIndex.ensureRebalanced(spark, dir)
    assert(idx2.count() == 16 && cb2.count() == 4,
      "rebuild after aliased-data loss must serve the full corpus")
    assert(new java.io.File(warehouse, operators.IvfIndex.indexTable(dir)).isDirectory,
      "gen-1 data must be rebuilt, not assumed")
    val (srv, _) = operators.IvfIndex.serveLatest(spark, dir)
    assert(srv.count() == 16, "serveLatest must serve after the rebuild")
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
    // the downstream generation rides the same corpus fingerprint
    operators.IvfIndex.ensureRebalanced(spark, dir)
    val g2Name = operators.IvfIndex.indexG2Table(dir)
    val g2Built = mtimes(g2Name)
    // regenerate the corpus in place: same path, fresh mtime
    copyCorpus()
    Paths.get(s"$dir/embeddings.parquet").toFile.setLastModified(System.currentTimeMillis() + 2000)
    spark.catalog.refreshByPath(dir)
    val (idx2, _) = operators.IvfIndex.ensure(spark, dir)
    assert(idx2.count() == n1)
    assert(mtimes(idxName) != built,
      "stale fingerprint must trigger a rebuild (data files unchanged)")
    // generation 2's fingerprint embeds generation 1's, so the applied
    // rebalance must rebuild with it — serving a gen-2 built over the
    // OLD corpus against the new gen-1 would be the silent-staleness bug
    val (idx2g2, _) = operators.IvfIndex.ensureRebalanced(spark, dir)
    assert(idx2g2.count() == n1)
    assert(mtimes(g2Name) != g2Built,
      "corpus rewrite must invalidate the applied rebalance too")
  }

  test("serveFreshestApp: appended generation when current, base fallback when its marker is retired") {
    import org.apache.spark.sql.functions._
    val (appIdx, _) = operators.IvfIndex.ensureAppended(spark, sfDir)
    val appN = appIdx.count()
    val (baseIdx, _) = operators.IvfIndex.ensureBase(spark, sfDir)
    val baseN = baseIdx.count()
    assert(appN > baseN, "appended generation must hold base + batch")
    // freshest = appended while its fingerprint chain is current
    val (srv1, _) = operators.IvfIndex.serveFreshestApp(spark, sfDir)
    assert(srv1.count() == appN, "serveFreshestApp must pick the appended generation")
    assert(srv1.filter(operators.IvfIndex.isAppendBatch(col("vec_id"))).count() > 0,
      "appended rows must be live in the served generation")
    // retire the appended marker (move aside, not delete — restored below
    // so the shared artifacts never rebuild): resolution must fall back
    // to the base generation, not fail and not rebuild anything
    val marker = new java.io.File(warehouse,
      s"${operators.IvfIndex.appendedIndexTable(sfDir)}.fingerprint")
    val aside = new java.io.File(marker.getParentFile, marker.getName + ".aside")
    val appBuilt = mtimes(operators.IvfIndex.appendedIndexTable(sfDir))
    val baseBuilt = mtimes(operators.IvfIndex.baseIndexTable(sfDir))
    assert(marker.renameTo(aside), "could not retire the appended marker")
    try {
      val (srv2, _) = operators.IvfIndex.serveFreshestApp(spark, sfDir)
      assert(srv2.count() == baseN,
        "with the appended marker retired, serveFreshestApp must fall back to base")
      assert(srv2.filter(operators.IvfIndex.isAppendBatch(col("vec_id"))).count() == 0,
        "base fallback must not contain batch rows")
    } finally {
      assert(aside.renameTo(marker), "could not restore the appended marker")
    }
    // restored marker: appended serves again, nothing was rewritten
    val (srv3, _) = operators.IvfIndex.serveFreshestApp(spark, sfDir)
    assert(srv3.count() == appN)
    assert(mtimes(operators.IvfIndex.appendedIndexTable(sfDir)) == appBuilt &&
      mtimes(operators.IvfIndex.baseIndexTable(sfDir)) == baseBuilt,
      "generation resolution must be metadata-only — no data rewrite")
  }

  test("append-family tombstones: deleted base rows only, index files untouched") {
    import org.apache.spark.sql.functions._
    val (appIdx, _) = operators.IvfIndex.ensureAppended(spark, sfDir)
    val appBuilt = mtimes(operators.IvfIndex.appendedIndexTable(sfDir))
    val ts = operators.IvfIndex.ensureTombstonesApp(spark, sfDir)
    // exactly the ≡9 rows of the appended generation, with their cells
    val expected = appIdx.filter(operators.IvfIndex.isDeleted(col("vec_id")))
      .select(col("vec_id"), col("cell"))
    assert(ts.count() == expected.count() && ts.count() > 0)
    assert(ts.exceptAll(expected).isEmpty && expected.exceptAll(ts).isEmpty,
      "tombstones must be exactly the deleted rows' (vec_id, cell)")
    assert(ts.filter(operators.IvfIndex.isAppendBatch(col("vec_id"))).count() == 0,
      "the delete batch (mod 9) is disjoint from the append batch (mod 3)")
    assert(mtimes(operators.IvfIndex.appendedIndexTable(sfDir)) == appBuilt,
      "tombstone build must leave the index files byte-untouched")
  }

  test("spilled multi-assignment index: SpillK distinct cells per vector, crank 1 = primary, no rewrite on re-ensure") {
    import org.apache.spark.sql.functions._
    val idxName = operators.IvfIndex.spillIndexTable(sfDir)
    val (sidx, scb) = operators.IvfIndex.ensureSpilled(spark, sfDir)
    val n = Tables.embeddings(spark, sfDir).count()
    val k = operators.IvfIndex.SpillK
    assert(sidx.count() == k * n,
      s"spilled index must hold every vector exactly SpillK=$k times")
    assert(scb.count() ==
      operators.IvfIndex.SpillFactor * math.ceil(math.sqrt(n.toDouble)).toLong,
      "spilled codebook must have SpillFactor * ceil(sqrt(n)) cells")
    // every vector: exactly SpillK rows, all in DISTINCT cells, with
    // crank values 1..SpillK
    val per = sidx.groupBy(col("vec_id"))
      .agg(count(lit(1)).as("rows"),
        countDistinct(col("cell")).as("cells"),
        sort_array(collect_list(col("crank"))).as("cranks"))
    assert(per.filter(col("rows") =!= k || col("cells") =!= k).count() == 0,
      "every vector must spill into SpillK distinct cells")
    assert(per.filter(col("cranks") =!= typedLit((1 to k).map(_.toLong))).count() == 0,
      "crank must enumerate 1..SpillK per vector")
    // crank-1 rows ARE the single-assignment argmax against the same
    // codebook (the spilled primary equals what keep=1 would assign)
    val primary = sidx.filter(col("crank") === 1).select(col("vec_id"), col("cell"))
    val single = operators.VectorOps.withNearestCells(
        operators.VectorOps.withNorm(spark, sfDir), scb, keep = 1, rounded = true)
      .select(col("vec_id").cast("long").as("vec_id"), col("cell"))
    assert(primary.exceptAll(single).isEmpty && single.exceptAll(primary).isEmpty,
      "crank-1 rows must equal the keep=1 assignment")
    // repeat ensure: pure lookup, no data rewrite
    val built = mtimes(idxName)
    operators.IvfIndex.ensureSpilled(spark, sfDir)
    assert(mtimes(idxName) == built, "repeat ensureSpilled must not rewrite data")
  }
}
