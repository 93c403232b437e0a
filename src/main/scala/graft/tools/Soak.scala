package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic SCALE SOAK of the heaviest operators (not a gate): self-
  * unions the sf0.1 tables to N× with planted skew and measures wall
  * time, so the 100 TB "scale shape" arguments become measured curves
  * and the skew defenses provably ENGAGE:
  *
  *  - documents ×N, each copy token-marked (copy i SUFFIXES every token
  *    with `xI` — an injective per-copy token renaming, so within-copy
  *    Jaccard relations are identical to the base corpus, cross-copy
  *    shingle Jaccard is 0, and near-dup structure replicates ~linearly.
  *    NOT an interleaved marker token: that makes every other shingle a
  *    single-content-token pattern `cI X cI` shared by every doc in the
  *    copy containing X, which collapses MinHash buckets per copy into
  *    thousands-deep hot spots and a quadratic pair space — measured:
  *    47M candidates at 25×, 74 GB of shuffle, disk-full at 50×. That
  *    failure mode is now also DEFENDED in the operator itself
  *    (lshCandidates maxBucket), but the soak measures the honest
  *    uncapped pipeline on a structure-preserving corpus);
  *  - a planted BOILERPLATE near-dup chain of diameter 64 (65 sliding-
  *    window docs over a synthetic token stream, consecutive Jaccard
  *    ≈ 0.90) — pointer-doubling clustering must close it in ~log₂ 64
  *    rounds, and the fixed-hop form provably cannot;
  *  - embeddings ×N as EXACT copies — the degenerate hot-bucket shape
  *    the near-dup bucket cap defends against (the cap-drop log line
  *    must appear);
  *  - events ×N with a planted hot key (1% of rows user 424242) for the
  *    salted join.
  *
  * Usage: runMain graft.tools.Soak [scale ...]  (default: 1 10 50;
  * SPARK_GRAFT_SF_DIR selects the base dir, default sf0.1). Prints one
  * JSON line per (op, scale) with seconds + op-specific observables.
  */
object Soak {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val scales = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(1, 10, 50)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def emit(op: String, scale: Int, sec: Double, extra: (String, Long)*)
        : Unit = {
      val e = extra.map { case (k, v) => s""","$k":$v""" }.mkString
      // Locale.ROOT: the f-interpolator honors the default locale, and a
      // comma decimal separator would break the JSON (the same bug class
      // Bench.f3 defends against)
      val secs = String.format(java.util.Locale.ROOT, "%.2f",
        Double.box(sec))
      val line = s"""{"op":"$op","scale":$scale,"sec":$secs$e}"""
      println(line)
      Console.flush()
    }
    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val emb0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    // only the two key columns are named, so the scan never touches
    // `ts` (whose physical type varies across driver generations)
    val events0 = spark.read
      .schema("event_id BIGINT, user_id BIGINT")
      .parquet(s"$sfDir/events.parquet")
      .select("event_id", "user_id")

    /** copy i: ids offset, every token suffixed with `xI` (injective
      * renaming: copies share no shingles, within-copy near-dup
      * structure is exactly the base corpus's — see the object doc).
      */
    def scaledDocs(n: Int): DataFrame =
      (0 until n).map { i =>
        docs0.select((col("doc_id") + i * 10000000L).as("doc_id"),
          regexp_replace(col("text"), "([A-Za-z0-9]+)", "$1" + s"x$i")
            .as("text"))
      }.reduce(_ unionByName _)

    /** Diameter-64 near-dup chain: doc k = tokens [10k, 10k+200) of a
      * synthetic stream; consecutive docs share 190/210 ≈ 0.90 Jaccard,
      * k and k+2 only ≈ 0.82 — still caught; the chain's ENDS are
      * unrelated, so only propagation can label it one cluster.
      */
    val chain = spark.range(0, 65)
      .select((col("id") + 900000000L).as("doc_id"),
        expr("concat_ws(' ', transform(sequence(id * 10, id * 10 + 199), " +
          "j -> concat('tk', cast(j as string))))").as("text"))

    for (scale <- scales) {
      val sd = scaledDocs(scale).unionByName(chain)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val (nDocs, _) = timed(sd.count()) // materialize the input once

      // --- MinHash-LSH near-dup pipeline (shingle → sign → band →
      // bucket join → exact verify). The plan form is LAZY: the count
      // inside the timed block is what materializes the pipeline; the
      // cleanup drops the cached shingle table once pairs are cached,
      // so later scales don't run under this scale's cache residue.
      val (lshResult, lshCleanup) = graft.ops.Dedup.minhashLshPlan(
        sd, 3, 8, 4, 0.5)
      val pairs = lshResult
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val (nPairs, lshSec) = timed(pairs.count())
      lshCleanup()
      emit("d_lsh_neardup", scale, lshSec, "n_docs" -> nDocs,
        "n_pairs" -> nPairs)

      // --- pointer-doubling clustering over the discovered pairs (the
      // planted chain's diameter-64 component rides along)
      val ((cl, rounds), clSec) = timed {
        val (c, r) = graft.ops.Dedup.clustersWithRounds(
          pairs.select("doc_a", "doc_b"))
        (c.count(), r)
      }
      val chainClusters = cl // count of labeled nodes
      emit("d_neardup_clusters", scale, clSec, "n_labeled" -> chainClusters,
        "rounds" -> rounds.toLong)
      pairs.unpersist()
      sd.unpersist()

      // --- embedding near-dup pairs with EXACT copies (hot-bucket skew;
      // maxBucket narrowed so the cap demonstrably engages at 10×/50×)
      val se = (0 until scale).map { i =>
        emb0.select((col("vec_id") + i * 10000000L).as("vec_id"),
          col("embedding"))
      }.reduce(_ unionByName _)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nVecs = se.count()
      val (nNd, ndSec) = timed {
        graft.ops.Similarity.cosineNearDupPairsLsh(se, 0.45,
          maxBucket = 256, dims = 64).count()
      }
      emit("sim_neardup_pairs", scale, ndSec, "n_vecs" -> nVecs,
        "n_pairs" -> nNd)

      // --- IVFADC: full train (coarse quantizer + codebooks) + search
      val (nIvf, ivfSec) = timed {
        val cells = graft.ops.Similarity.kmeansCells(se, 8, 2)
        val (books, asg) = graft.ops.Pq.train(se, 64, 4, 8, 2)
        graft.ops.Pq.ivfAdcTopK(se.filter(col("vec_id") < 5), books, asg,
          cells, 64, 4, 2, 5).count()
      }
      emit("sim_ivfpq_topk", scale, ivfSec, "n_vecs" -> nVecs,
        "n_out" -> nIvf)
      se.unpersist()

      // --- salted skew join: events ×N, 1% of probe rows funneled onto
      // one hot user; per-user build side joined without a hot partition
      val pe = (0 until scale).map { i =>
        events0.select((col("event_id") + i * 10000000L).as("event_id"),
          when(col("event_id") % 100 === 0, 424242L)
            .otherwise(col("user_id")).as("user_id"))
      }.reduce(_ unionByName _)
      val dim = pe.select("user_id").distinct()
        .withColumn("seg", pmod(col("user_id"), lit(7L)))
      val (nJ, jSec) = timed {
        graft.ops.Skew.saltedJoin(pe, dim, Seq("user_id"),
          col("event_id"), 32).count()
      }
      emit("j_salted_join", scale, jSec, "n_probe" -> nJ)

      // --- substring-level exact dup with ONE boilerplate window shared
      // CORPUS-WIDE: every 10th doc (across all copies — the bp tokens
      // carry no copy suffix) ends with the same 25-token block, so its
      // 20-token windows form single aggregate groups with ~n/10
      // occurrences each. The defense claim under test: a hot window is
      // one GROUP (never a join blowup), so time must stay ~linear while
      // the hot groups grow linearly.
      val boiler = (1 to 25).map(j => s"bp$j").mkString(" ")
      val sdd = scaledDocs(scale)
        .withColumn("text", when(col("doc_id") % 10 === 0,
          concat(col("text"), lit(" " + boiler))).otherwise(col("text")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nSubIn = sdd.count()
      val (nSub, subSec) = timed {
        graft.ops.Dedup.substringDupStats(sdd, 20).count()
      }
      emit("d_substring_dup", scale, subSec, "n_docs" -> nSubIn,
        "n_docs_dup" -> nSub)
      sdd.unpersist()

      // --- fuzzy join with a HOT q-gram: every target name ends with
      // the same " zzzz" tail, so its trigrams are the most common in
      // the corpus at every scale — rarest-prefix blocking must keep
      // them OUT of prefixes (no candidate flood) while recall at the
      // edit bound holds. (This soak caught the previous absolute
      // df-cap design dropping EVERY gram at 10× — n_matches was 0.)
      val part0 = spark.read.parquet(s"$sfDir/part.parquet")
        .select("p_partkey", "p_name")
      val targets = (0 until scale).map { i =>
        part0.select((col("p_partkey") + i * 10000000L).as("t_key"),
          concat(col("p_name"), lit(s" v$i zzzz")).as("t_name"))
      }.reduce(_ unionByName _)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nTargets = targets.count()
      val probes = part0.filter(col("p_partkey") < 500)
        .select(col("p_partkey").as("q_key"),
          concat(substring(col("p_name"), 1, 2),
            expr("substring(p_name, 4)"), lit(" v0 zzzz")).as("q_name"))
      val nHotGrams = graft.ops.Fuzzy.grams(targets, "t_key", "t_name", 3)
        .groupBy("gram").agg(count(lit(1)).as("df"))
        .filter(col("df") > 1000).count()
      val (nFz, fzSec) = timed {
        graft.ops.Fuzzy.fuzzyJoin(probes, "q_key", "q_name",
          targets, "t_key", "t_name", maxDist = 1).count()
      }
      emit("j_fuzzy_names", scale, fzSec, "n_targets" -> nTargets,
        "n_matches" -> nFz, "n_hot_grams" -> nHotGrams)
      targets.unpersist()

      // --- degree-oriented triangle counting with a PLANTED degree-10⁴
      // hub: star edges into one node plus a closing path through its
      // neighborhood (9,999 hub triangles), over ×scale pseudo-random
      // base copies. Orientation points every hub edge INTO the hub, so
      // the hub generates ZERO wedges — naive pivoting there would be
      // 5·10⁷ wedges; time must track the base-copy count, not the hub.
      val nNodes = 20000L
      val baseEdges = (0 until scale).map { i =>
        spark.range(0, 200000).select(
          (pmod(col("id") * 2654435761L, lit(nNodes)) +
            i * 10000000L).as("src"),
          (pmod(col("id") * 40503L + 7L, lit(nNodes)) +
            i * 10000000L).as("dst"))
      }.reduce(_ unionByName _)
      val hubDeg = 10000L
      val hubEdges = spark.range(0, hubDeg)
        .select(lit(999999999L).as("src"), (col("id") + 5000000L).as("dst"))
      val closing = spark.range(0, hubDeg - 1)
        .select((col("id") + 5000000L).as("src"),
          (col("id") + 5000001L).as("dst"))
      val edges = baseEdges.unionByName(hubEdges).unionByName(closing)
      val (nTri, triSec) = timed {
        graft.ops.Graph.triangleCount(edges).head().getLong(0)
      }
      emit("g_triangles", scale, triSec, "triangles" -> nTri,
        "hub_degree" -> hubDeg)
    }
    spark.stop()
  }
}
