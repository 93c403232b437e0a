package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale soak for the round-9 text-model additions whose scale story
  * was analytic-only (VERDICT r9 item 7), same §12 protocol as
  * [[Soak]]/[[SoakWave]] (fresh JVM, self-unioned sf0.1 docs with
  * planted structure, one JSON line per (op, scale) with seconds +
  * correctness observables asserted in-harness):
  *
  *  - χ² term selection (`m_chi2_terms` / TextModels.chi2Terms): a
  *    planted token appended to EVERY doc of one label (and only
  *    those) is perfectly label-associated, so it must carry the
  *    MAXIMAL χ² at every scale with n_docs exactly ×scale (an
  *    organic label-covering token can tie the maximum, so the claim
  *    is on the χ² value, not the alphabetic tie-broken rank) — while the
  *    injective per-copy renaming grows the vocabulary (the grid's
  *    row count) ×scale. Claim under test: cost rides the |vocab| ×
  *    |labels| aggregate, no quadratic step appears.
  *
  *  - sparse TF-IDF neighbors (`m_tfidf_neighbors` /
  *    TextModels.tfidfNeighbors): the quadratic hazard is the
  *    per-term self-join (a df-D term emits D²/2 pairs); the df band
  *    (minDf, maxDf] is the pruning knob. Planted AT the boundary:
  *    per copy, token `warm{i}` lands in exactly maxDf docs (kept —
  *    the worst survivor) and `hot{i}` in maxDf+1 docs (pruned).
  *    Because copies share no tokens, the exact candidate volume
  *    Σ df·(df−1)/2 over surviving terms is ×scale BY CONSTRUCTION —
  *    asserted, so a band-filter regression (hot terms leaking into
  *    the index) breaks the harness, not just the wall clock. One
  *    planted near-dup pair per copy (10 shared copy-local tokens,
  *    cosine exactly 1.0) must all surface in the top-k.
  *
  * Usage: runMain graft.tools.SoakText [scale ...] (default 1 10 50;
  * SPARK_GRAFT_SF_DIR selects the base dir, default sf0.1).
  */
object SoakText {
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

    def emit(op: String, scale: Int, sec: Double, extra: (String, String)*)
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
      .select("doc_id", "text", "lang")
    val maxDf = 40L
    var candBase = -1L // scale-1 candidate volume, the ×scale baseline

    for (scale <- scales) {
      // injective per-copy token renaming (the Soak convention):
      // copies share no organic tokens, so per-copy term statistics
      // are scale-invariant and corpus-wide ones are exactly ×scale
      def copy(i: Int): DataFrame =
        docs0.select((col("doc_id") + i * 10000000L).as("doc_id"),
          regexp_replace(col("text"), "([A-Za-z0-9]+)", "$1" + s"x$i")
            .as("text"),
          col("lang"))

      // --- χ²: append ' zchi' to every doc of ONE label (all copies
      // share the token — its label association stays perfect while
      // N grows, so χ² grows with N and the term stays top-1)
      val lbl = docs0.groupBy("lang").count()
        .orderBy(desc("count"), asc("lang")).head().getString(0)
      val chiDocs = (0 until scale).map(copy).reduce(_ unionByName _)
        .withColumn("text",
          when(col("lang") === lbl, concat(col("text"), lit(" zchi")))
            .otherwise(col("text")))
      val nLbl = docs0.filter(col("lang") === lbl).count() * scale
      // an organic token perfectly confined to (and covering) one
      // label would TIE the planted term's maximal χ² = N, and the
      // (χ² desc, term asc) tie-break is alphabetic — so the planted
      // claim is "maximal χ², exact df", not literally rank 1
      val ((topChi, plantedRow), chiSec) = timed {
        val r = graft.ops.TextModels.chi2Terms(chiDocs, "lang", 5)
          .collect()
        (r.head.getDouble(2),
          r.find(_.getString(0) == "zchi")
            .map(x => (x.getLong(1), x.getDouble(2))))
      }
      emit("m_chi2_terms", scale, chiSec,
        "n_label_docs" -> nLbl.toString,
        "top_chi2" -> topChi.toString,
        "planted_docs" -> plantedRow.map(_._1).getOrElse(-1L).toString)
      assert(plantedRow.exists { case (nd, c) =>
        nd == nLbl && c == topChi },
        s"planted χ² term broke at $scale: $plantedRow vs " +
          s"($nLbl, $topChi)")

      // --- TF-IDF neighbors: per copy, plant warm{i} in exactly maxDf
      // docs (kept, the widest surviving term), hot{i} in maxDf+1
      // (pruned at the boundary), and one near-dup pair (10 shared
      // copy-local df-2 tokens; minDf = 1 keeps them in the band → cosine exactly 1.0)
      val nbrDocs = (0 until scale).map { i =>
        val c = copy(i).drop("lang")
          .withColumn("__r", row_number().over(
            org.apache.spark.sql.expressions.Window.orderBy("doc_id")))
          .withColumn("text",
            when(col("__r") <= maxDf,
              concat(col("text"), lit(s" warm$i")))
              .otherwise(col("text")))
          .withColumn("text",
            when(col("__r") <= maxDf + 1,
              concat(col("text"), lit(s" hot$i")))
              .otherwise(col("text")))
          .drop("__r")
        // NEGATIVE planted ids: the warm plant makes every doc whose
        // only band-surviving term is warm{i} a cosine-1.0 clique
        // member (hundreds of ties per copy), and the (cosine desc,
        // doc_a asc) tie-break would sort big planted ids LAST —
        // negative ids sort the planted pairs first instead, so a
        // small top-k provably contains all of them
        val pairText = (1 to 10).map(t => s"pair${i}tok$t").mkString(" ")
        c.unionByName(Seq(
          (-(2L + i * 10000000L), pairText),
          (-(1L + i * 10000000L), pairText))
          .toDF(spark)("doc_id", "text"))
      }.reduce(_ unionByName _)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nDocs = nbrDocs.count()

      // exact candidate volume Σ df·(df−1)/2 over the surviving band —
      // the same tf→df derivation the operator runs, asserted ×scale
      val tf = nbrDocs.select(col("doc_id"),
          explode(expr(graft.ops.Hashing.tokensSql)).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
        .filter(col("df") > 1 && col("df") <= maxDf)
      val (bandRow, candSec) = timed {
        dfreq.agg(
          sum(expr("df * (df - 1) div 2")).as("cands"),
          max(col("df")).as("max_df"),
          sum(when(col("tok").rlike("^warm[0-9]+$"), 1L).otherwise(0L))
            .as("n_warm"),
          sum(when(col("tok").rlike("^hot[0-9]+$"), 1L).otherwise(0L))
            .as("n_hot")).head()
      }
      val (cands, seenMaxDf, nWarm, nHot) = (bandRow.getLong(0),
        bandRow.getLong(1), bandRow.getLong(2), bandRow.getLong(3))
      assert(nWarm == scale && nHot == 0L && seenMaxDf == maxDf,
        s"df-band boundary broke at $scale: warm=$nWarm hot=$nHot " +
          s"maxdf=$seenMaxDf")
      if (candBase < 0) candBase = cands / scale
      assert(cands == candBase * scale,
        s"candidate volume not ×scale at $scale: $cands vs " +
          s"${candBase * scale}")

      val (planted, nbrSec) = timed {
        graft.ops.TextModels
          .tfidfNeighbors(nbrDocs, k = 50 + 2 * scale, minDf = 1,
            maxDf = maxDf)
          .filter(col("doc_a") < 0 &&
            col("doc_b") === col("doc_a") + 1L)
          .collect()
      }
      emit("m_tfidf_neighbors", scale, nbrSec,
        "n_docs" -> nDocs.toString, "candidates" -> cands.toString,
        "cand_agg_sec" -> String.format(java.util.Locale.ROOT, "%.2f",
          Double.box(candSec)),
        "n_planted_pairs" -> planted.length.toString)
      assert(planted.length == scale &&
        planted.forall(_.getDouble(2) == 1.0),
        s"planted cosine-1 pairs broke at $scale: ${planted.length}")
      nbrDocs.unpersist(blocking = true)

      // --- substring removal (Dedup.substringRemove): 200 synthetic
      // docs per copy, each 30 copy-and-doc-unique tokens followed by
      // ONE corpus-shared 20-token boilerplate block. Unique prefixes
      // make every boundary-crossing window unique, so each planted
      // doc carries EXACTLY one duplicated window (the block) — the
      // global keeper (smallest doc_id) keeps its block with
      // n_removed == 0, every other planted doc loses exactly the 20
      // block tokens. The organic ×scale corpus rides along for
      // realistic cost.
      val boiler = (1 to 20).map(t => s"boiler$t").mkString(" ")
      val plantedSr = (0 until scale).flatMap { i =>
        (0 until 200).map { j =>
          val uniq = (1 to 30).map(t => s"u${i}d${j}t$t").mkString(" ")
          (500000000L + i * 10000000L + j, s"$uniq $boiler")
        }
      }
      val srDocs = ((0 until scale).map(i => copy(i).drop("lang")) :+
        spark.createDataFrame(plantedSr).toDF("doc_id", "text"))
        .reduce(_ unionByName _)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nSrDocs = srDocs.count()
      val ((srKeepers, srCut, srOther), srSec) = timed {
        val r = graft.ops.Dedup.substringRemove(srDocs, 20)
          .filter(col("doc_id") >= 500000000L)
          .agg(
            sum(when(col("n_removed") === 0L, 1L).otherwise(0L)),
            sum(when(col("n_removed") === 20L, 1L).otherwise(0L)),
            sum(when(col("n_removed") =!= 0L && col("n_removed") =!= 20L,
              1L).otherwise(0L))).head()
        (r.getLong(0), r.getLong(1), r.getLong(2))
      }
      emit("d_substring_remove", scale, srSec,
        "n_docs" -> nSrDocs.toString,
        "keepers" -> srKeepers.toString, "cut_exact" -> srCut.toString,
        "other" -> srOther.toString)
      assert(srKeepers == 1L && srCut == 200L * scale - 1 &&
        srOther == 0L,
        s"planted substring removal broke at $scale: keepers=" +
          s"$srKeepers cut=$srCut other=$srOther")
      srDocs.unpersist(blocking = true)
    }
    spark.stop()
  }

  /** Local Seq→DF helper (the implicit toDF needs the session in scope). */
  private implicit class SeqDf(rows: Seq[(Long, String)]) {
    def toDF(s: SparkSession)(c1: String, c2: String): DataFrame =
      s.createDataFrame(rows).toDF(c1, c2)
  }
}
