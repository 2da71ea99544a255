package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage decomposition for the simhash/hamming near-dup family — the
  * evidence behind SCALING.md's "output-bound, not detection-bound" claim
  * for the pair-grain queries on adversarial replica-clique corpora.
  *
  * For each flavor (the registered md5 bit-vote signature of `q_simhash`
  * and the arithmetic signature of `q_hamming_neardup`) this times the
  * DETECTION stages separately from pair emission:
  *
  *   1. t_sig_sec — build the per-document signature and aggregate it to
  *      signature grain (forces the full 63-vote aggregation for the
  *      simhash flavor; the whole "detection" cost of a replica clique,
  *      since identical texts take identical votes).
  *   2. t_cand_sec — run the Manku 20-table blocked candidate join over
  *      the DISTINCT-signature frame and count the Hamming ≤ 3 signature
  *      pairs (detection's join stage, at the grain the bounded-report
  *      queries publish).
  *   3. pair_rows — the EXACT doc-grain pair-report cardinality, derived
  *      arithmetically from the signature multiplicities (Σ C(m,2) intra-
  *      signature + Σ m_a·m_b over near-signature pairs) without running
  *      the doc-grain join: what `q_simhash`/`q_hamming_neardup` would
  *      have to emit.
  *   4. t_pairs_sec — optionally (SPARK_GRAFT_DECOMPOSE_FULL=
  *      "hamming,simhash" or "1" for both) actually run the doc-grain
  *      pair emission to the noop sink, uncapped, so the wall split
  *      detection-vs-emission is measured, not inferred. Check pair_rows
  *      first: on a saturated corpus the emission IS the answer volume.
  *
  * Prints one JSON line per flavor. Session config mirrors graft.Bench.
  */
object SimhashDecompose {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val full: Set[String] = sys.env.get("SPARK_GRAFT_DECOMPOSE_FULL") match {
      case Some("1") => Set("hamming", "simhash")
      case Some(s) => s.split(",").map(_.trim).filter(_.nonEmpty).toSet
      case None => Set.empty
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-simhash-decompose")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    /** Per-document (doc_id, simhash) of q_hamming_neardup — the shared
      * arithmetic fixture signature. */
    def hammingSig: DataFrame =
      Tables.documents(spark, sfDir)
        .select(col("doc_id"),
          operators.DedupOps.arithmeticSimhash.as("simhash"))

    def decompose(flavor: String, sigOf: => DataFrame): Unit = {
      // 1) signature build + rollup to signature grain
      val (sigG, tSig) = time {
        val g = sigOf.groupBy("simhash").agg(count(lit(1)).as("m")).cache()
        g.count() // materialize: the detection aggregation runs HERE
        g
      }
      val Seq(nDocs, nSigs) = sigG
        .agg(coalesce(sum(col("m")), lit(0L)), count(lit(1)))
        .head().toSeq.map(_.toString.toLong)
      // 2) Manku-blocked candidate join over DISTINCT signatures
      val (pairsAndCount, tCand) = time {
        val p = operators.DedupOps.hammingPairsScaledUnsorted(
          sigG.select(col("simhash").as("doc_id"), col("simhash"))).cache()
        (p, p.count()) // one job: materializes the cache AND is the count
      }
      val (sigPairs, nSigPairs) = pairsAndCount
      // 3) exact doc-grain pair cardinality, arithmetically
      // m*(m-1) is even; halve on the driver (SQL `/` is fractional);
      // coalesce: sum over an empty rollup is null, not 0
      val intra = sigG.agg(coalesce(sum(col("m") * (col("m") - 1)), lit(0L)))
        .head().getLong(0) / 2
      val m = sigG.select(col("simhash"), col("m"))
      val cross = sigPairs
        .join(m.withColumnRenamed("simhash", "doc_a")
          .withColumnRenamed("m", "ma"), Seq("doc_a"))
        .join(m.withColumnRenamed("simhash", "doc_b")
          .withColumnRenamed("m", "mb"), Seq("doc_b"))
        .agg(coalesce(sum(col("ma") * col("mb")), lit(0L))).head().getLong(0)
      val pairRows = intra + cross
      // 4) optional measured doc-grain emission
      val tPairs = if (!full(flavor)) -1.0 else {
        val q = flavor match {
          case "simhash" => operators.DedupOps.simhashPairs(spark, sfDir)
          case _         => operators.DedupOps.hammingNearDup(spark, sfDir)
        }
        time(q.write.format("noop").mode("overwrite").save())._2
      }
      spark.catalog.clearCache()
      def f(v: Double) =
        String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
      println(s"""{"metric":"simhash_decompose","flavor":"$flavor"""" +
        s""","n_docs":$nDocs,"n_sigs":$nSigs,"n_sig_pairs":$nSigPairs""" +
        s""","pair_rows":$pairRows,"t_sig_sec":${f(tSig)}""" +
        s""","t_cand_sec":${f(tCand)},"t_pairs_sec":${f(tPairs)}""" +
        s""","sf":"$sfDir"}""")
      System.out.flush()
    }

    decompose("hamming", hammingSig)
    decompose("simhash",
      operators.DedupOps.simhashPortableSig(spark, sfDir))
    spark.stop()
  }
}
