package graft

/** The parity gate's precondition (SURVEY.md §2.0 rule 2): every declared
  * query must produce IDENTICAL ordered output regardless of
  * partitioning. Runs each query under two different shuffle-partition
  * settings and compares collected rows — catching nondeterministic
  * keepers, unordered output, and raw-double aggregation drift at
  * sf0.001 cost.
  */
class DeterminismSpec extends SparkSpecBase {

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name is partition-count invariant") {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      val a = fn(spark, sfDir).collect().map(_.toString).toSeq
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = fn(spark, sfDir).collect().map(_.toString).toSeq
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      assert(a == b, s"$name output differs across partitionings")
      assert(a.nonEmpty || Set("join_left_anti", "set_except",
        "dedup_embedding_cosine", "text_jaccard_simpairs", "text_minhash_lsh")
        .contains(name), s"$name returned zero rows at sf0.001")
    }
  }
}
