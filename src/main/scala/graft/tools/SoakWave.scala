package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale soak for the round-8 wave-4 operators, same §12 protocol as
  * [[Soak]] (fresh JVM, self-unioned sf0.1 corpus with planted
  * structure, one JSON line per (op, scale) with seconds +
  * correctness observables):
  *
  *  - BPE merge learning: the injective per-copy token renaming makes
  *    the word VOCABULARY grow ~31·scale, so the per-round pair-count
  *    aggregate input grows too — the claim under test is that the one
  *    corpus-wide word-count aggregate dominates and the 8 training
  *    rounds ride the vocab-size table, i.e. time tracks corpus bytes,
  *    not rounds × corpus;
  *  - heavy hitters: a corpus-wide planted token on every 3rd doc must
  *    be found with its EXACT count at every scale while the key
  *    universe grows ~linearly — the defense is that the exact-count
  *    shuffle carries only sampled candidates, never the universe;
  *  - BM25: corpus-scale retrieval (explode + per-doc aggregate + 1-row
  *    stats frame) — time must track tokens scanned;
  *  - sample quantiles: bottom-k sampling over lineitem ×N — copies
  *    preserve the value distribution, so the median ESTIMATE must be
  *    ~scale-invariant while the scan grows; k stays 2000 everywhere.
  *
  * Usage: runMain graft.tools.SoakWave [scale ...] (default 1 10 50;
  * SPARK_GRAFT_SF_DIR selects the base dir, default sf0.1).
  */
object SoakWave {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val scales = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(1, 10, 50)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def emit(op: String, scale: Int, sec: Double, extra: (String, Long)*)
        : Unit = {
      val e = extra.map { case (k, v) => s""","$k":$v""" }.mkString
      val secs = String.format(java.util.Locale.ROOT, "%.2f",
        Double.box(sec))
      println(s"""{"op":"$op","scale":$scale,"sec":$secs$e}""")
      Console.flush()
    }
    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    // injective per-copy token renaming, as in Soak.scaledDocs: copies
    // share no tokens, so the vocabulary grows with the corpus
    def scaledDocs(n: Int): DataFrame =
      (0 until n).map { i =>
        docs0.select((col("doc_id") + i * 10000000L).as("doc_id"),
          regexp_replace(col("text"), "([A-Za-z0-9]+)", "$1" + s"x$i")
            .as("text"))
      }.reduce(_ unionByName _)
    val li0 = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_extendedprice")

    for (scale <- scales) {
      val sd = scaledDocs(scale)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nDocs = sd.count()

      // --- BPE merge learning (8 rounds)
      val ((nMerges, topCnt), bpeSec) = timed {
        val m = graft.ops.Bpe.learnMerges(sd, 8).collect()
        (m.length.toLong, m.map(_.getLong(3)).max)
      }
      emit("m_bpe_merges", scale, bpeSec, "n_docs" -> nDocs,
        "n_merges" -> nMerges, "top_merge_cnt" -> topCnt)

      // --- heavy hitters with a planted corpus-wide token: 'grafthot'
      // on every 3rd doc (~6‰ of occurrences at every scale); base
      // tokens dilute below 5‰ past ~7× — the planted key must remain,
      // with its exact count, while the universe grows.
      val hh = sd.withColumn("text",
        when(col("doc_id") % 3 === 0,
          concat(col("text"), lit(" grafthot"))).otherwise(col("text")))
      val tk = hh.select(col("doc_id"),
        posexplode(expr(graft.ops.Hashing.tokensSql)).as(Seq("pos", "tok")))
      val nUniverse = tk.select("tok").distinct().count()
      val (hits, hhSec) = timed {
        graft.ops.Sampling.heavyHitters(tk, "tok",
          concat(col("doc_id").cast("string"), lit(":"),
            col("pos").cast("string")), 5, 8, 10L).collect()
      }
      val hotCnt = hits.find(_.getString(0) == "grafthot")
        .map(_.getLong(1)).getOrElse(-1L)
      emit("a_heavy_hitters", scale, hhSec, "n_universe" -> nUniverse,
        "n_hitters" -> hits.length.toLong, "hot_cnt" -> hotCnt)

      // --- BM25 over the scaled corpus (copy-0 terms; the cost is the
      // corpus-wide token explode + per-doc aggregate either way)
      val (nTop, bmSec) = timed {
        graft.ops.TextModels.bm25TopK(sd,
          Seq("hashx0", "joinx0", "streamx0"), 10).collect().length.toLong
      }
      emit("m_bm25_topk", scale, bmSec, "n_docs" -> nDocs, "n_top" -> nTop)
      sd.unpersist()

      // --- sample quantiles over lineitem ×scale: same distribution at
      // every scale ⇒ the median estimate must be ~invariant
      val sli = (0 until scale).map { i =>
        li0.select((col("l_orderkey") + i * 100000000L).as("k1"),
          col("l_linenumber").as("k2"), col("l_extendedprice").as("v"))
      }.reduce(_ unionByName _)
      val (medCents, sqSec) = timed {
        val r = graft.ops.Rank.sampleQuantiles(sli, "v",
          concat(col("k1").cast("string"), lit(":"),
            col("k2").cast("string")),
          Seq(asc("k1"), asc("k2")), 2000, Seq(0.5)).collect()(0)
        (r.getDouble(1) * 100).round
      }
      emit("a_sample_quantiles", scale, sqSec, "median_cents" -> medCents)

      // --- iterative graph ops over ×scale Erdős–Rényi-ish copies:
      // 20 k nodes, 200 k xxhash64-random edges per copy (avg degree
      // ~20, so the 8-core retains ~all of each copy — Poisson(20)
      // puts <1 % of nodes under degree 8), copies node-disjoint.
      // NOTE: a multiply-mod generator (as in Soak's triangle base)
      // would be WRONG here — (a·i mod n, b·i mod n) is a function of
      // i mod n, so 200 k rows collapse to 20 k distinct degree-2
      // edges and the whole graph peels away, making the core
      // observable vacuous. xxhash64 endpoints give genuinely
      // independent-ish edges. Both ops cut lineage per round with
      // localCheckpoint — the claim under test is that time is
      // rounds × (join + aggregate) and tracks edge count, with no
      // plan-size blowup at any scale.
      val nNodes = 20000L
      val baseEdges = (0 until scale).map { i =>
        spark.range(0, 200000).select(
          (pmod(xxhash64(col("id"), lit(i)), lit(nNodes)) +
            i * 10000000L).as("src"),
          (pmod(xxhash64(col("id") + 777L, lit(i + 999)), lit(nNodes)) +
            i * 10000000L).as("dst"))
      }.reduce(_ unionByName _)
      // planted 64-node path: every interior node has degree 2 < k,
      // so the whole path must vanish from the 8-core while the dense
      // base survives (n_path_in_core must be 0, n_core must be large)
      val path = spark.range(0, 64)
        .select((col("id") + 800000000L).as("src"),
          (col("id") + 800000001L).as("dst"))
      val ge = baseEdges.unionByName(path)
      val (coreObs, kcSec) = timed {
        graft.ops.Graph.kCore(ge, 8, 8).agg(
          count(lit(1)).as("n"),
          sum(when(col("node") >= 800000000L, 1L).otherwise(0L)).as("path"))
          .head()
      }
      emit("g_kcore", scale, kcSec, "n_core" -> coreObs.getLong(0),
        "n_path_in_core" -> coreObs.getLong(1))
      val (nComm, lpSec) = timed {
        graft.ops.Graph.labelPropagation(ge, 4)
          .select("lbl").distinct().count()
      }
      emit("g_label_prop", scale, lpSec, "n_communities" -> nComm)

      // --- bounded multi-source BFS from the path head + copy-0 node
      // 0: the planted path is a closed-form observable (exactly
      // rounds+1 = 9 path nodes reached, dist i at node head+i); the
      // dense side floods ~all of copy 0 and NOTHING of the
      // node-disjoint other copies, so n_reached is ~scale-invariant
      // while the per-round adjacency join scans scale× the edges —
      // the claim under test is time tracks edge volume, reach does
      // not, and lineage stays flat (localCheckpoint per round).
      val bfsSrcs = spark.range(0, 2)
        .select(when(col("id") === 0, 800000000L).otherwise(0L)
          .as("node"))
      val (bfsObs, bfsSec) = timed {
        graft.ops.Graph.bfsDistances(ge, bfsSrcs, 8).agg(
          count(lit(1)).as("n"),
          sum(when(col("node") >= 800000000L, 1L).otherwise(0L))
            .as("pathn"),
          max(col("dist")).as("maxd")).head()
      }
      emit("g_bfs_dist", scale, bfsSec,
        "n_reached" -> bfsObs.getLong(0),
        "n_path_reached" -> bfsObs.getLong(1),
        "max_dist" -> bfsObs.getLong(2))
    }
    spark.stop()
  }
}
