package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale soak for the round-9 insights wave, same §12 protocol as
  * [[Soak]]/[[SoakWave]] (fresh JVM, self-unioned sf0.1 data with
  * planted structure, one JSON line per (op, scale)):
  *
  *  - basket rules: baskets ×scale with a PLANTED pair (two synthetic
  *    items appended to every 7th basket) — the rule must surface with
  *    confidence exactly 1.0 and n_both = the planted basket count at
  *    every scale, while the pair volume stays ≤ Σ min(|basket|, cap)²
  *    (the cap claim under test);
  *  - item CF: customer×item ×scale with two planted items given to
  *    every 5th customer — identical user sets ⟹ cosine exactly 1.0
  *    and mutual rank-1 at every scale; the planted ids are NEGATIVE
  *    so the smallest-15 history cap always retains them (regular
  *    category ids are 0..199 and would evict anything larger);
  *  - prefix-filtered Jaccard: injectively-renamed doc copies (no
  *    cross-copy shingles) with ONE planted near-dup pair per copy —
  *    output must be exactly `scale` pairs, and time must track corpus
  *    size ~linearly because per-shingle df stays FLAT as the corpus
  *    grows (the prefix join's scale claim; a df-capped blocker makes
  *    the same claim only by discarding hot shingles);
  *  - equi-depth histogram: lineitem ×scale through the two-phase
  *    ordinal — bucket sizes must be exactly ⌊N/k⌋/⌈N/k⌉ (NTILE) at
  *    every scale, no one-task sort anywhere;
  *  - Kaplan–Meier: user-id-offset event copies preserve each user's
  *    lifetime ⟹ the survival value at the first lifetime must be
  *    IDENTICAL at every scale while at-risk counts grow ×scale.
  *
  * Usage: runMain graft.tools.SoakInsights [scale ...] (default
  * 1 10 50; SPARK_GRAFT_SF_DIR selects the base dir, default sf0.1).
  */
object SoakInsights {
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

    // (scale, t0_at_risk, t0_survival) of the first KM leg — the
    // baseline the later scales' planted observables are asserted
    // against.
    var kmBase: Option[(Int, Long, Double)] = None
    var mkBase: Option[Seq[(String, Double, Double, Double)]] = None

    val li0 = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val ev0 = graft.queries.Tables.events(spark, sfDir)
      .select("user_id", "ts_us")
    val evFull0 = graft.queries.Tables.events(spark, sfDir)
      .select("user_id", "event_id", "event_type", "ts_us")

    for (scale <- scales) {

      // --- basket rules: plant items 9001+9002 in every 7th basket
      val baskets = (0 until scale).map { i =>
        li0.select((col("l_orderkey") + i * 100000000L).as("basket"),
          (col("l_partkey") % 100).as("item"))
      }.reduce(_ unionByName _)
      val planted = baskets.where(col("basket") % 7 === 0)
        .select("basket").distinct()
      val plantRows = planted.select(col("basket"), lit(9001L).as("item"))
        .unionByName(planted.select(col("basket"), lit(9002L).as("item")))
      val withPlant = baskets.unionByName(plantRows)
      val nPlanted = planted.count()
      val ((ruleBoth, ruleConf), brSec) = timed {
        val r = graft.ops.Market.basketRules(withPlant, "basket", "item",
          minPairCount = 2L, maxBasket = 64, k = 5000)
          .where(col("antecedent") === 9001L &&
            col("consequent") === 9002L).collect()
        (r.headOption.map(_.getLong(2)).getOrElse(-1L),
          r.headOption.map(_.getDouble(4)).getOrElse(-1.0))
      }
      emit("m_basket_rules", scale, brSec,
        "n_planted" -> nPlanted.toString, "rule_both" -> ruleBoth.toString,
        "rule_conf" -> ruleConf.toString)
      assert(ruleBoth == nPlanted && ruleConf == 1.0,
        s"planted rule broke at $scale: both=$ruleBoth conf=$ruleConf")

      // --- item CF: plant items -1/-2 for every 5th customer
      val orders0 = spark.read.parquet(s"$sfDir/orders.parquet")
      val ui = (0 until scale).map { i =>
        li0.join(orders0, col("l_orderkey") === col("o_orderkey"))
          .select((col("o_custkey") + i * 100000000L).as("u"),
            (col("l_partkey") % 200).as("i"))
      }.reduce(_ unionByName _)
      val plantedU = ui.where(col("u") % 5 === 0).select("u").distinct()
      val uiPlant = ui.unionByName(
        plantedU.select(col("u"), lit(-1L).as("i")).unionByName(
          plantedU.select(col("u"), lit(-2L).as("i"))))
      val (cfTop, cfSec) = timed {
        graft.ops.Market.itemNeighbors(uiPlant, "u", "i",
          maxPerUser = 15, k = 3)
          .where(col("item") === -1L && col("rank") === 1).collect()
          .headOption.map(r => (r.getLong(1), r.getDouble(3)))
          .getOrElse((-1L, -1.0))
      }
      emit("rec_item_neighbors", scale, cfSec,
        "top_neighbor" -> cfTop._1.toString,
        "top_cosine" -> cfTop._2.toString)
      assert(cfTop == ((-2L, 1.0)),
        s"planted CF neighbor broke at $scale: $cfTop")

      // --- prefix Jaccard: injective rename per copy + 1 planted
      // near-dup pair per copy (J = 6/8 = 0.75 by construction:
      // 9-token texts differing in the last token → 7 shingles each,
      // 6 shared)
      val base = "qq ww ee rr tt yy uu ii oo"
      val sd = (0 until scale).map { i =>
        docs0.select((col("doc_id") + i * 10000000L).as("doc_id"),
          regexp_replace(col("text"), "([A-Za-z0-9]+)", "$1" + s"x$i")
            .as("text"))
          .unionByName(Seq(
            (9000001L + i * 10000000L, base.replace(" ", s"z$i ") + s"z$i"),
            (9000002L + i * 10000000L,
              (base.substring(0, base.length - 2) + "pp")
                .replace(" ", s"z$i ") + s"z$i"))
            .toDF(spark)("doc_id", "text"))
      }.reduce(_ unionByName _)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nDocs = sd.count()
      val (pairs, pjSec) = timed {
        graft.ops.Dedup.jaccardPrefixPairs(sd, 3, 0.5)
          .where(col("doc_a") % 10000000L === 9000001L).collect()
      }
      emit("d_jaccard_exact_prefix", scale, pjSec,
        "n_docs" -> nDocs.toString, "n_planted_pairs" -> pairs.length.toString)
      assert(pairs.length == scale,
        s"planted near-dup pairs broke at $scale: ${pairs.length}")
      sd.unpersist(blocking = true)

      // --- equi-depth histogram on lineitem ×scale
      val sli = (0 until scale).map { i =>
        li0.select((col("l_orderkey") + i * 100000000L).as("k1"),
          col("l_linenumber").as("k2"), col("l_extendedprice").as("v"))
      }.reduce(_ unionByName _)
      val nRows = sli.count()
      val ((nBuckets, maxN, minN), edSec) = timed {
        val b = graft.ops.Rank.equiDepthHistogram(sli, "v",
          Seq(col("k1"), col("k2")), k = 10).collect()
        (b.length, b.map(_.getLong(1)).max, b.map(_.getLong(1)).min)
      }
      emit("a_histogram_equidepth", scale, edSec,
        "n_rows" -> nRows.toString, "max_bucket" -> maxN.toString,
        "min_bucket" -> minN.toString)
      assert(nBuckets == 10 && maxN - minN <= 1 &&
        maxN == (nRows + 9) / 10,
        s"NTILE sizes broke at $scale: buckets=$nBuckets max=$maxN min=$minN")

      // --- Kaplan–Meier: user-offset copies preserve lifetimes
      val sev = (0 until scale).map { i =>
        ev0.select((col("user_id") + i * 100000000L).as("user_id"),
          col("ts_us"))
      }.reduce(_ unionByName _)
      val (kmFirst, kmSec) = timed {
        graft.ops.Survival.kaplanMeier(sev, 604800000000L, 2)
          .orderBy("t").collect().head
      }
      emit("e_survival_km", scale, kmSec,
        "t0_at_risk" -> kmFirst.getLong(1).toString,
        "t0_survival" -> kmFirst.getDouble(4).toString)
      // Planted observables asserted in-harness like every other leg
      // (ADVICE r9): lifetimes are scale-invariant by construction, so
      // first-step survival must be IDENTICAL at every scale while the
      // at-risk population grows exactly ×scale (normalized against
      // the first scale run, which need not be 1).
      kmBase match {
        case None => kmBase = Some((scale, kmFirst.getLong(1),
          kmFirst.getDouble(4)))
        case Some((s0, atRisk0, surv0)) =>
          assert(kmFirst.getDouble(4) == surv0,
            s"KM survival not scale-invariant at $scale: " +
              s"${kmFirst.getDouble(4)} vs baseline $surv0")
          assert(kmFirst.getLong(1) * s0 == atRisk0 * scale,
            s"KM at-risk not ×scale at $scale: ${kmFirst.getLong(1)} " +
              s"vs baseline $atRisk0 at scale $s0")
      }

      // --- Markov attribution: user-offset copies preserve every
      // journey, so each edge (w, ow) scales uniformly and cancels in
      // the (p·w) div ow rational — the WHOLE output (p_conv, removal
      // effects, shares) must be bit-identical at every scale. (The
      // BIGINT exactness bound p·w < 2⁶³ holds to w ≈ 9·10⁶ per edge;
      // the 50× leg stays well under it on sf0.1.)
      val sevm = (0 until scale).map { i =>
        evFull0.select((col("user_id") + i * 100000000L).as("user_id"),
          (col("event_id") + i * 1000000000L).as("event_id"),
          col("event_type"), col("ts_us"))
      }.reduce(_ unionByName _)
      val (mkRows, mkSec) = timed {
        graft.ops.EventAnalytics.markovAttribution(sevm, "purchase")
          .collect().map(r => (r.getString(0), r.getDouble(1),
            r.getDouble(3), r.getDouble(4))).toSeq
      }
      emit("e_attribution_markov", scale, mkSec,
        "n_channels" -> mkRows.length.toString,
        "p_conv_full" -> mkRows.head._2.toString)
      mkBase match {
        case None => mkBase = Some(mkRows)
        case Some(base) =>
          assert(mkRows == base,
            s"Markov effects not scale-invariant at $scale:\n" +
              s"$mkRows\nvs baseline\n$base")
      }
    }
    spark.stop()
  }

  /** Local Seq→DF helper (the implicit toDF needs the session in scope). */
  private implicit class SeqDf(rows: Seq[(Long, String)]) {
    def toDF(s: SparkSession)(c1: String, c2: String): DataFrame =
      s.createDataFrame(rows).toDF(c1, c2)
  }
}
