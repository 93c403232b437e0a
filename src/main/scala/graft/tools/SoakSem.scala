package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale soak for SEMANTIC dedup (graft.ops.Dedup.semanticDedup), §12
  * protocol (fresh JVM, scaled corpus with planted structure, one JSON
  * line per scale with seconds + correctness observables):
  *
  *  - corpus scaling: copy i of the embeddings table CIRCULARLY
  *    ROTATES each vector's dimensions by i, so copies of the same
  *    base vector are NOT mutual near-dups (a rotated random vector
  *    decorrelates; measured max cross-copy cosine stays ~base-level)
  *    while the per-copy geometry is preserved exactly.
  *
  *  - planted structure: per copy, 5 EXACT duplicates of that copy's
  *    first 5 vectors under fresh ids. An exact duplicate has cosine
  *    1.0 with its source and the identical cosine profile against
  *    every centroid (tie-break included), so it lands in the same
  *    k-means cell BY CONSTRUCTION — the soak asserts n_dropped =
  *    5·scale exactly, and that every drop's witness is its source id.
  *
  *  - the scale KNOB under test: cluster count k grows with the
  *    corpus (k = 8·scale, the k ≈ √n production rule) so per-cell
  *    population stays ~constant and the within-cell pair space —
  *    the quadratic term SemDeDup exists to bound — grows ~LINEARLY.
  *    Emitted per scale: candidate pair count Σ|cell|·(|cell|−1)/2.
  *
  * Usage: runMain graft.tools.SoakSem [scale ...] (default 1 5 10;
  * SPARK_GRAFT_SF_DIR selects the base dir, default sf0.1).
  */
object SoakSem {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val scales = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(1, 5, 10)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .repartition(cpus.toInt)
      .localCheckpoint(true)
    val dims = base.select(size(col("embedding"))).head().getInt(0)

    for (scale <- scales) {
      // copy i rotates dims by i (injective geometry shift per copy)
      val copies = (0 until scale).map { i =>
        val rot = i % dims
        val e =
          if (rot == 0) col("embedding")
          else concat(
            expr(s"slice(embedding, ${rot + 1}, ${dims - rot})"),
            expr(s"slice(embedding, 1, $rot)"))
        base.select((col("vec_id") + i * 1000000L).as("vec_id"),
          e.as("embedding"))
      }.reduce(_ unionByName _)
      // planted exact duplicates: 5 per copy under fresh larger ids
      val planted = (0 until scale).map { i =>
        val rot = i % dims
        val e =
          if (rot == 0) col("embedding")
          else concat(
            expr(s"slice(embedding, ${rot + 1}, ${dims - rot})"),
            expr(s"slice(embedding, 1, $rot)"))
        base.filter(col("vec_id") < 5)
          .select((col("vec_id") + i * 1000000L + 900000L).as("vec_id"),
            e.as("embedding"))
      }.reduce(_ unionByName _)
      val corpus = copies.unionByName(planted).localCheckpoint(true)
      val k = 8 * scale

      val (obs, sec) = timed {
        val out = graft.ops.Dedup.semanticDedup(corpus, k, 1, 0.95)
          .localCheckpoint(true)
        val dropped = out.filter(col("kept") === 0L)
        val nDropped = dropped.count()
        // every drop's witness must be its planted source
        val wrongWitness = dropped.filter(
          col("dup_of") =!= col("vec_id") - 900000L).count()
        // within-cell candidate pair volume (the bounded quadratic)
        val cand = out.groupBy("cell").agg(count(lit(1)).as("c"))
          .agg(sum(expr("(c * (c - 1)) div 2"))).head().getLong(0)
        (nDropped, wrongWitness, cand)
      }
      val n = corpus.count()
      val ok = obs._1 == 5L * scale && obs._2 == 0L
      println(s"""{"op":"sem_dedup","scale":$scale,"sec":${
        String.format(java.util.Locale.ROOT, "%.2f", Double.box(sec))
      },"n_rows":$n,"k":$k,"n_dropped":${obs._1},"expected_dropped":${
        5L * scale},"wrong_witness":${obs._2},"cand_pairs":${obs._3},"ok":$ok}""")
      Console.flush()
      require(ok, s"planted observables violated at scale $scale")
    }
    spark.stop()
  }
}
