package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}
import org.apache.spark.sql.SaveMode

/** SURVEY.md §2.1.A — scans, sources, sinks.
  *
  * Roundtrip queries write to a scratch dir (overwrite mode, fixed path
  * per query name) and read back — exercising the writer+reader paths of
  * each format; the DuckDB oracle reads the ORIGINAL parquet table, so a
  * pass proves the roundtrip lossless.
  *
  * Scale notes (100 TB): all writers here shard by partition (no
  * coalesce before write); `sink_parquet_partitioned` produces
  * directory-partitioned layout (`o_year=1995/...`) — the layout that
  * enables partition pruning on read, which the read-back side exercises
  * via the `o_year` filter (only matching directories are listed).
  * The JDBC sink runs against in-JVM embedded Derby (the only DB driver
  * shipped in /opt/spark/jars); on a cluster the same code points at a
  * remote DB with `numPartitions`/`partitionColumn` for parallel writes.
  */
object Sources extends QueryModule {

  // process-unique scratch root: concurrent Verify/Bench invocations
  // (driver + local dev runs) must never clobber each other's sinks
  private val scratchRoot =
    s"/tmp/graft_scratch/p${ProcessHandle.current().pid()}"
  private def scratch(name: String) = s"$scratchRoot/$name"

  val scanParquetPushdown = Q(
    "scan_parquet_pushdown",
    (spark, dir) => {
      import spark.implicits._
      Tables
        .lineitem(spark, dir)
        .select($"l_orderkey", $"l_linenumber", $"l_shipdate", $"l_discount", $"l_quantity")
        .where(
          $"l_shipdate" >= lit("1996-01-01").cast("timestamp_ntz") &&
            $"l_shipdate" < lit("1997-01-01").cast("timestamp_ntz") &&
            $"l_discount".between(0.05, 0.07))
        .orderBy($"l_orderkey", $"l_linenumber")
    },
    Some("""
      SELECT l_orderkey, l_linenumber, l_shipdate, l_discount, l_quantity
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount BETWEEN 0.05 AND 0.07
      ORDER BY l_orderkey, l_linenumber
    """.stripMargin.trim))

  val scanCsvRoundtrip = Q(
    "scan_csv_roundtrip",
    (spark, dir) => {
      import spark.implicits._
      val nation = Tables.nation(spark, dir)
      val path = scratch("csv_nation")
      // disable whitespace trimming on BOTH sides: the CSV writer and
      // reader default ignore(Leading|Trailing)WhiteSpace=true, which
      // silently corrupts space-padded fields (caught by RoundtripLawsSpec)
      nation.write.mode(SaveMode.Overwrite).option("header", "true")
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false").csv(path)
      spark.read
        .schema(nation.schema)
        .option("header", "true")
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .csv(path)
        .select($"n_nationkey", $"n_name", $"n_regionkey")
        .orderBy($"n_nationkey")
    },
    Some("""
      SELECT n_nationkey, n_name, n_regionkey
      FROM nation ORDER BY n_nationkey
    """.stripMargin.trim))

  val scanJsonRoundtrip = Q(
    "scan_json_roundtrip",
    (spark, dir) => {
      import spark.implicits._
      val region = Tables.region(spark, dir)
      val path = scratch("json_region")
      region.write.mode(SaveMode.Overwrite).json(path)
      spark.read
        .schema(region.schema)
        .json(path)
        .select($"r_regionkey", $"r_name")
        .orderBy($"r_regionkey")
    },
    Some("""
      SELECT r_regionkey, r_name
      FROM region ORDER BY r_regionkey
    """.stripMargin.trim))

  val sinkParquetPartitioned = Q(
    "sink_parquet_partitioned",
    (spark, dir) => {
      import spark.implicits._
      val path = scratch("parquet_orders_by_year")
      Tables
        .orders(spark, dir)
        .withColumn("o_year", year($"o_orderdate"))
        // write ONLY the columns the read-back consumes: the partition-
        // pruning proof is about directory layout, not row width, and a
        // full-width rewrite of orders was pure bench-clock ballast
        .select($"o_custkey", $"o_year")
        .write.mode(SaveMode.Overwrite)
        .partitionBy("o_year")
        .parquet(path)
      spark.read
        .parquet(path)
        .where($"o_year" >= 1996)   // partition pruning: only o_year>=1996 dirs are scanned
        .groupBy($"o_year".cast(LongType).as("o_year"))
        .agg(count(lit(1)).as("n_orders"), countDistinct($"o_custkey").as("n_custs"))
        .orderBy($"o_year")
    },
    Some("""
      SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
        COUNT(*) AS n_orders,
        COUNT(DISTINCT o_custkey) AS n_custs
      FROM orders
      WHERE YEAR(o_orderdate) >= 1996
      GROUP BY 1 ORDER BY o_year
    """.stripMargin.trim))

  /** Real JDBC sink+source against embedded Derby (the only JDBC driver
    * in /opt/spark/jars). Strings become VARCHAR(n): Derby needs explicit
    * lengths, supplied via createTableColumnTypes.
    */
  val sinkJdbcRoundtrip = Q(
    "sink_jdbc_roundtrip",
    (spark, dir) => {
      import spark.implicits._
      val url = s"jdbc:derby:$scratchRoot/derby_db;create=true"
      val props = new java.util.Properties()
      props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      Tables
        .supplier(spark, dir)
        .select($"s_suppkey", $"s_name", $"s_nationkey", $"s_acctbal")
        .write.mode(SaveMode.Overwrite)
        .option("createTableColumnTypes", "s_name VARCHAR(64)")
        .jdbc(url, "supplier_sink", props)
      // partitioned read-back: 4 parallel JDBC partitions split on the
      // key range — the cluster-scale read path (each executor opens its
      // own connection for its stride)
      spark.read
        .jdbc(url, "supplier_sink",
          columnName = "s_suppkey", lowerBound = 0L, upperBound = 10000L,
          numPartitions = 4, connectionProperties = props)
        .orderBy($"s_suppkey")
    },
    Some("""
      SELECT s_suppkey, s_name, s_nationkey, s_acctbal
      FROM supplier ORDER BY s_suppkey
    """.stripMargin.trim))

  /** ORC roundtrip (the other columnar format Spark ships natively —
    * /opt/spark/jars has orc-core; there is no spark-avro connector in
    * this image, so Avro is out of scope). Write path exercises ORC's
    * writer with predicate-pushdown-capable layout; read-back filters on
    * c_mktsegment to exercise ORC searchable-argument pushdown.
    */
  val scanOrcRoundtrip = Q(
    "scan_orc_roundtrip",
    (spark, dir) => {
      import spark.implicits._
      val customer = Tables.customer(spark, dir)
      val path = scratch("orc_customer")
      customer.write.mode(SaveMode.Overwrite).orc(path)
      spark.read
        .orc(path)
        .where($"c_mktsegment" === "BUILDING")
        .select($"c_custkey", $"c_name", $"c_mktsegment", $"c_nationkey")
        .orderBy($"c_custkey")
    },
    Some("""
      SELECT c_custkey, c_name, c_mktsegment, c_nationkey
      FROM customer WHERE c_mktsegment = 'BUILDING'
      ORDER BY c_custkey
    """.stripMargin.trim))

  /** Schema evolution on read: generation v=1 was written without
    * o_totalprice, v=2 with it; `mergeSchema` unifies the footers and
    * back-fills nulls — the lakehouse add-a-column pattern. The
    * aggregate proves both the merged schema (non-null counts differ per
    * generation) and partition discovery (v comes from the directory
    * name). At 100 TB mergeSchema's footer scan is the cost to watch —
    * pay it once and pin the merged schema in the catalog.
    */
  val scanParquetSchemaEvolution = Q(
    "scan_parquet_schema_evolution",
    (spark, dir) => {
      import spark.implicits._
      val path = scratch("parquet_orders_evolving")
      val orders = Tables.orders(spark, dir)
      orders.select($"o_orderkey", $"o_custkey")
        .write.mode(SaveMode.Overwrite).parquet(s"$path/v=1")
      orders.select($"o_orderkey", $"o_custkey",
          graft.Tables.dec($"o_totalprice").as("o_totalprice"))
        .write.mode(SaveMode.Overwrite).parquet(s"$path/v=2")
      spark.read.option("mergeSchema", "true").parquet(path)
        .groupBy($"v".cast("long").as("v"))
        .agg(
          count(lit(1)).as("n"),
          count($"o_totalprice").as("n_price"),
          sum($"o_totalprice").as("sum_price"))
        .orderBy($"v")
    },
    Some("""
      SELECT CAST(1 AS BIGINT) AS v, COUNT(*) AS n,
        0 AS n_price, CAST(NULL AS DOUBLE) AS sum_price
      FROM orders
      UNION ALL
      SELECT 2, COUNT(*), COUNT(*),
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      FROM orders
      ORDER BY v
    """.stripMargin.trim))

  /** Range-clustered data layout (z-order-lite): orders are bucketed by
    * an md5 hash of the key (engine-stable, partitioning-independent —
    * the `sample_hash_split` discipline) and written sorted by
    * o_orderdate within each bucket, split into bounded files. The
    * read-back side then PROVES the layout from the real files via
    * `input_file_name`: within a bucket, file min/max date ranges must
    * be disjoint (each bucket is written by one task in sorted order, so
    * sequential file chunks are range-disjoint). Declared output =
    * per-bucket stats + the provable file count + an overlap-violation
    * count that must be 0.
    *
    * Scale notes (100 TB): this is the layout that makes a date-range
    * scan skip files by footer min/max instead of reading them —
    * clustering is THE cheap substitute for an index at warehouse
    * scale. One shuffle (repartition on the bucket value so each bucket
    * is one task's sorted run); `maxRecordsPerFile` bounds file size,
    * so file count per bucket is exactly ceil(rows/cap) — stated by the
    * oracle, not hoped for.
    */
  val sortClusteredWriteStats = Q(
    "sort_clustered_write_stats",
    (spark, dir) => {
      import spark.implicits._
      val runId = java.util.UUID.randomUUID.toString.replace("-", "").take(12)
      val path = scratch(s"clustered_orders_$runId")
      val bucket = (conv(substring(md5($"o_orderkey".cast("string")), 1, 4), 16, 10)
        .cast("long") % 8).as("bucket")
      Tables.orders(spark, dir)
        // recent-years slice: the per-bucket sorted-run / file-split
        // proof is volume-independent, so writing the whole history only
        // inflated the bench clock (same trim discipline as
        // etl_compact_small_files)
        .where($"o_orderdate" >= "1996-01-01")
        .select(bucket, $"o_orderkey", $"o_orderdate")
        .repartition($"bucket")
        .sortWithinPartitions($"bucket", $"o_orderdate", $"o_orderkey")
        .write.mode(SaveMode.Overwrite)
        .option("maxRecordsPerFile", "2000")
        .partitionBy("bucket")
        .parquet(path)
      val perFile = spark.read.parquet(path)
        .groupBy($"bucket".cast(LongType).as("bucket"), input_file_name().as("f"))
        .agg(count(lit(1)).as("n"), min($"o_orderdate").as("f_min"),
          max($"o_orderdate").as("f_max"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"bucket").orderBy($"f_min", $"f")
      perFile
        .withColumn("prev_max", lag($"f_max", 1).over(w))
        .groupBy($"bucket")
        .agg(
          sum($"n").as("n_rows"),
          count(lit(1)).as("n_files"),
          min($"f_min").as("min_date"),
          max($"f_max").as("max_date"),
          // STRICT overlap only: maxRecordsPerFile splits at arbitrary
          // record boundaries, so a date straddling a split legally
          // yields f_min == prev_max (touching, not disorder) — at
          // sf0.1 (~8 rows/date, 2000-row caps) that happens at nearly
          // every split; f_min < prev_max is what a sorted run forbids
          sum(when($"prev_max".isNotNull && $"f_min" < $"prev_max", 1L)
            .otherwise(0L)).as("overlap_violations"))
        .orderBy($"bucket")
    },
    Some("""
      SELECT
        CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4) AS INTEGER) % 8 AS bucket,
        COUNT(*) AS n_rows,
        CAST(CEIL(COUNT(*) / 2000.0) AS BIGINT) AS n_files,
        MIN(o_orderdate) AS min_date,
        MAX(o_orderdate) AS max_date,
        CAST(0 AS BIGINT) AS overlap_violations
      FROM orders
      WHERE o_orderdate >= '1996-01-01'
      GROUP BY 1 ORDER BY bucket
    """.stripMargin.trim))

  /** Plain-text source/sink — the rawest corpus interchange format (one
    * document per line; the corpus has no embedded newlines, asserted by
    * the digest matching). Line files carry no row order, so the
    * declared output is an ORDER-INVARIANT digest: line count, byte
    * mass, distinct-md5 count — equal iff the roundtrip was lossless.
    *
    * Scale notes (100 TB): text write/read shards per partition like
    * every other format here; the digest agg is one map-side-combinable
    * pass (count/sum) plus one distinct on the 16-byte hash.
    */
  val scanTextRoundtrip = Q(
    "scan_text_roundtrip",
    (spark, dir) => {
      import spark.implicits._
      val runId = java.util.UUID.randomUUID.toString.replace("-", "").take(12)
      val path = scratch(s"text_docs_$runId")
      Tables.documents(spark, dir)
        .select($"text")
        .write.mode(SaveMode.Overwrite).text(path)
      spark.read.text(path)
        .agg(
          count(lit(1)).as("n_lines"),
          sum(length($"value")).cast(LongType).as("sum_chars"),
          countDistinct(md5($"value")).as("n_distinct"))
        .orderBy($"n_lines")
    },
    Some("""
      SELECT COUNT(*) AS n_lines,
        CAST(SUM(LENGTH(text)) AS BIGINT) AS sum_chars,
        COUNT(DISTINCT md5(text)) AS n_distinct
      FROM documents
    """.stripMargin.trim))

  /** Raw-binary ingestion via the `binaryFile` source — the multimodal
    * on-ramp: images/audio/video arrive as opaque blobs, and this is the
    * reader that turns them into rows for the decode stages
    * (`graft.multimodal.MediaPipeline`). The src0 documents are packed
    * into ≤32 CONTAINER `.bin` files of length-prefixed records
    * ([doc_id:i64][len:i32][payload]) — the WebDataset/tar-shard
    * pattern: blob stores and DFS listings choke on millions of tiny
    * files, so production multimodal corpora ship as record-packed
    * shards (VERDICT r6 #4; one file per doc wrote 6k files at sf0.1).
    * Written by a `foreachPartition` sidecar writer (executor-side, one
    * container per bucket-partition, no driver loop), read back with
    * `binaryFile`, records re-parsed, and the declared output is the
    * order-invariant PER-DOC digest (doc count, byte mass, distinct
    * payload-md5) the oracle derives from the source rows — equal iff
    * the pack→scan→unpack roundtrip was lossless.
    *
    * Scale notes (100 TB): `binaryFile` lists and reads shards in
    * parallel across executors; shard count scales with the writing
    * stage's partitions (corpus/32 docs per shard here, a size-targeted
    * repartition in production); the digest agg never shuffles content —
    * md5 reduces each record map-side to 32 bytes.
    */
  val scanBinaryfileIngest = Q(
    "scan_binaryfile_ingest",
    (spark, dir) => {
      import spark.implicits._
      val runId = java.util.UUID.randomUUID.toString.replace("-", "").take(12)
      val path = scratch(s"binfiles_$runId")
      // Sidecar corpus written through the Hadoop FileSystem API so on
      // a real cluster the .bin shards land on the shared/dfs filesystem
      // the subsequent binaryFile scan lists — a java.nio write would
      // scatter them across executor-local disks (correct only in
      // local mode). Hadoop's Configuration is not serializable, so the
      // driver's conf ships as a plain Map and is rebuilt per partition.
      val confMap: Map[String, String] = {
        val it = spark.sparkContext.hadoopConfiguration.iterator()
        val b = Map.newBuilder[String, String]
        while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
        b.result()
      }
      val hp = new org.apache.hadoop.fs.Path(path)
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(hp)
      Tables.documents(spark, dir)
        .where($"source" === "src0")
        .select($"doc_id", $"text")
        .repartition(32, pmod($"doc_id", lit(32)))
        .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
          if (it.hasNext) {
            val pid = org.apache.spark.TaskContext.getPartitionId()
            val hc = new org.apache.hadoop.conf.Configuration(false)
            confMap.foreach { case (k, v) => hc.set(k, v) }
            val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(hc)
            val out = fs.create(
              new org.apache.hadoop.fs.Path(path, f"shard_$pid%05d.bin"), true)
            try it.foreach { r =>
              val payload =
                r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8)
              val head = java.nio.ByteBuffer.allocate(12)
              head.putLong(r.getLong(0)).putInt(payload.length)
              out.write(head.array())
              out.write(payload)
            } finally out.close()
          }
        }
      spark.read.format("binaryFile").load(s"$path/*.bin")
        .select($"content")
        .as[Array[Byte]]
        .flatMap { bytes =>
          val buf = java.nio.ByteBuffer.wrap(bytes)
          Iterator.continually {
            if (buf.remaining() >= 12) {
              val id = buf.getLong
              val payload = new Array[Byte](buf.getInt)
              buf.get(payload)
              Some((id, payload))
            } else None
          }.takeWhile(_.isDefined).map(_.get)
        }
        .toDF("doc_id", "payload")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(length($"payload")).cast(LongType).as("sum_bytes"),
          countDistinct(md5($"payload")).as("n_distinct"))
        .orderBy($"n_docs")
    },
    Some("""
      SELECT COUNT(*) AS n_docs,
        CAST(SUM(octet_length(encode(text))) AS BIGINT) AS sum_bytes,
        COUNT(DISTINCT md5(text)) AS n_distinct
      FROM documents WHERE source = 'src0'
    """.stripMargin.trim))

  /** TRUE 2-D z-order clustering — the multi-dimensional data-skipping
    * layout (the mechanism behind Delta/Iceberg OPTIMIZE ZORDER): the
    * year index (0..7, 3 bits) and an md5 customer bucket (0..7,
    * 3 bits) are bit-INTERLEAVED into a 6-bit z-value, computed with
    * pure div/mod arithmetic so both engines derive identical values.
    * `repartitionByRange(z)` + in-partition sort means every written
    * file covers a narrow, globally DISJOINT z-range — so a predicate
    * on EITHER dimension prunes most files by footer min/max, which
    * 1-D clustering (`sort_clustered_write_stats`) can only do for its
    * single sort key.
    *
    * The read-back side proves the property from the real files:
    * per-file z min/max via `input_file_name`, globally sorted, overlap
    * count must be 0 (in-partition: sorted sequential chunks; across
    * partitions: range partitioning is disjoint by construction).
    * Declared output = per-z-octant stats + that violation count; the
    * octant row counts and dim bounds are pure functions of the data,
    * which the oracle recomputes.
    */
  val sortZorder2dStats = Q(
    "sort_zorder_2d_stats",
    (spark, dir) => {
      import spark.implicits._
      val runId = java.util.UUID.randomUUID.toString.replace("-", "").take(12)
      val path = scratch(s"zorder_orders_$runId")
      val a = (year($"o_orderdate") - 1995).cast("long") // 0..7 in this corpus
      val b = conv(substring(md5($"o_custkey".cast("string")), 1, 4), 16, 10)
        .cast("long") % 8
      // interleave 3 bits of each: z = Σ a_i·2^(2i+1) + b_i·2^(2i)
      def bit(c: org.apache.spark.sql.Column, i: Int) = (c / (1L << i)).cast("long") % 2
      val z = (0 to 2).map(i =>
        bit(a, i) * (1L << (2 * i + 1)) + bit(b, i) * (1L << (2 * i)))
        .reduce(_ + _)
      Tables.orders(spark, dir)
        // deterministic half-volume slice by orderkey md5 parity: keeps
        // the full year × cust-bucket z-domain (unlike a date filter,
        // which would collapse octants) while halving the write cost the
        // bench re-pays every run; both engines compute the same md5
        .where(conv(substring(md5($"o_orderkey".cast("string")), 1, 4), 16, 10)
          .cast("long") % 2 === 0)
        .select(z.as("z"), a.as("year_idx"), b.as("cust_bucket"), $"o_orderkey")
        .repartitionByRange(8, $"z")
        .sortWithinPartitions($"z", $"o_orderkey")
        .write.mode(SaveMode.Overwrite)
        .option("maxRecordsPerFile", "4000")
        .parquet(path)
      val back = spark.read.parquet(path)
      val perFile = back
        .groupBy(input_file_name().as("f"))
        .agg(min($"z").as("f_min"), max($"z").as("f_max"))
      val wf = org.apache.spark.sql.expressions.Window.orderBy($"f_min", $"f")
      val violations = perFile
        .withColumn("prev_max", lag($"f_max", 1).over(wf))
        // strict: coarse z values (0..63, thousands of rows each) split
        // across file caps and range-partition edges share a boundary z
        // — f_min == prev_max is a legal touching range, not disorder
        .agg(sum(when($"prev_max".isNotNull && $"f_min" < $"prev_max", 1L)
          .otherwise(0L)).as("overlap_violations"))
      back
        .groupBy(($"z" / 8).cast("long").as("z_octant"))
        .agg(
          count(lit(1)).as("n_rows"),
          min($"year_idx").as("min_year_idx"), max($"year_idx").as("max_year_idx"),
          min($"cust_bucket").as("min_cust_bucket"),
          max($"cust_bucket").as("max_cust_bucket"))
        // 1-row broadcast frame, not a driver-side head(): the audit
        // stays one lazy distributed plan
        .crossJoin(broadcast(violations))
        .orderBy($"z_octant")
    },
    Some("""
      WITH zed AS (
        SELECT
          (CAST(year(o_orderdate) - 1995 AS BIGINT) % 2) * 2
            + (CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 4) AS BIGINT) % 8 % 2) * 1
            + ((CAST(year(o_orderdate) - 1995 AS BIGINT) // 2) % 2) * 8
            + ((CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 4) AS BIGINT) % 8 // 2) % 2) * 4
            + ((CAST(year(o_orderdate) - 1995 AS BIGINT) // 4) % 2) * 32
            + ((CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 4) AS BIGINT) % 8 // 4) % 2) * 16
            AS z,
          CAST(year(o_orderdate) - 1995 AS BIGINT) AS year_idx,
          CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 4) AS BIGINT) % 8 AS cust_bucket
        FROM orders
        WHERE CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4) AS BIGINT) % 2 = 0
      )
      SELECT z // 8 AS z_octant,
        COUNT(*) AS n_rows,
        MIN(year_idx) AS min_year_idx, MAX(year_idx) AS max_year_idx,
        MIN(cust_bucket) AS min_cust_bucket, MAX(cust_bucket) AS max_cust_bucket,
        CAST(0 AS BIGINT) AS overlap_violations
      FROM zed
      GROUP BY 1 ORDER BY z_octant
    """.stripMargin.trim))

  /** Malformed-record QUARANTINE on CSV ingest — the dirty-feed
    * discipline every production loader needs: rows that fail the
    * schema land in `columnNameOfCorruptRecord` under PERMISSIVE mode
    * instead of killing the job (FAILFAST) or vanishing (DROPMALFORMED,
    * which silently under-counts). The feed is constructed
    * deterministically from orders — every 50th order's price field is
    * replaced by a non-numeric token — so the quarantine counts and the
    * clean-row reconciliation total are pure functions of the source
    * the oracle recomputes.
    *
    * Scale notes (100 TB): PERMISSIVE parsing is per-row map-side work
    * on the parallel CSV scan; the audit is one map-side-combinable
    * aggregate. No shuffle of raw lines.
    */
  val scanCsvQuarantine = Q(
    "scan_csv_quarantine",
    (spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.types.{DoubleType => DT, StringType, StructField, StructType}
      val runId = java.util.UUID.randomUUID.toString.replace("-", "").take(12)
      val path = scratch(s"csv_quarantine_$runId")
      Tables.orders(spark, dir)
        .select(concat_ws(",",
          $"o_orderkey",
          $"o_custkey",
          when($"o_orderkey" % 50 === 0, lit("CORRUPT"))
            .otherwise($"o_totalprice".cast(DecimalType(18, 2)).cast("string")))
          .as("line"))
        .write.mode(SaveMode.Overwrite).text(path)
      val schema = StructType(Seq(
        StructField("k", LongType), StructField("ck", LongType),
        StructField("price", DT), StructField("_bad", StringType)))
      spark.read
        .schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .csv(path)
        .agg(
          count(lit(1)).as("n_rows"),
          count($"_bad").as("n_quarantined"),
          count(when($"_bad".isNull, 1)).as("n_clean"),
          sum(when($"_bad".isNull, $"price".cast(DecimalType(18, 2))))
            .as("clean_price_total"))
        .orderBy($"n_rows")
    },
    Some("""
      SELECT COUNT(*) AS n_rows,
        COUNT(CASE WHEN o_orderkey % 50 = 0 THEN 1 END) AS n_quarantined,
        COUNT(CASE WHEN o_orderkey % 50 <> 0 THEN 1 END) AS n_clean,
        CAST(SUM(CASE WHEN o_orderkey % 50 <> 0
          THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS clean_price_total
      FROM orders
    """.stripMargin.trim))

  def qs: Seq[Q] = Seq(
    scanParquetPushdown, scanCsvRoundtrip, scanJsonRoundtrip,
    sinkParquetPartitioned, sinkJdbcRoundtrip, scanOrcRoundtrip,
    scanParquetSchemaEvolution, sortClusteredWriteStats, scanTextRoundtrip,
    scanBinaryfileIngest, sortZorder2dStats, scanCsvQuarantine)
}
