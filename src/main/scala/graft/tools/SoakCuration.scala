package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale soak for the round-11 curation additions (VERDICT r11 item 6)
  * — the §12 protocol (fresh JVM, self-unioned sf0.1 docs with planted
  * structure, one JSON line per (op, scale) with seconds + correctness
  * observables asserted in-harness, non-zero exit on violation):
  *
  *  - token-budget cut (`o18_token_budget` / Pack.tokenBudgetSelect):
  *    per copy one PLANTED doc (score 2.0 — strictly above every
  *    organic score, which is built < 1) of exactly 1000 tokens; the
  *    budget scale·1000 − 500 therefore selects exactly the first
  *    scale − 1 planted docs and cuts ON the planted boundary: at
  *    every scale the harness knows n_selected, tokens_selected, and
  *    the exact (cutoff_score, cutoff_doc_id) — and at scale 1
  *    NOTHING fits, exercising the r12 empty-selection fix (one
  *    summary row, null cutoffs), which the r11 advice showed the
  *    oracle could never catch (identical shape both engines).
  *
  *  - proportional source interleave (`o19_source_interleave` /
  *    Sampling.sourceInterleave): the midpoint rule makes prefix
  *    proportions EXACT math, not approximation — for any threshold
  *    t, a source with n_s docs must land exactly
  *    ⌊n_s·t + 1/2⌋ of them at pos ≤ t. Asserted at t = 1/4 and
  *    t = 1/2 for every source at every scale, plus |pos set| = n_s
  *    (the grid is injective per source). Also the r12 scale-shape
  *    claim: the per-source ordinal now derives from ONE
  *    range-partitioned two-phase global ordinal (few-source corpora
  *    made Window.partitionBy(source) a per-source single-task sort).
  *
  *  - train-fitted LM filter (`t_lm_filter` /
  *    TextAnalysis.lmQualityFilter): per copy one PLANTED junk doc of
  *    8 tokens that occur NOWHERE in the train split (organic tokens
  *    are injectively renamed to end in `x{copy}`; junk tokens end in
  *    a letter — disjoint by construction), with a doc_id CHOSEN onto
  *    the held-out side of the md5 split. Every junk token is OOV, so
  *    the doc's mean NLL must equal the theoretical maximum
  *    round(ln(N_train + V_train), 6) EXACTLY, sit ≥ every organic
  *    held-out doc's NLL, and read keep = false — the planted-outlier
  *    NLL-ordering observable.
  *
  * Usage: runMain graft.tools.SoakCuration [scale ...]
  * (default 1 10 50; SPARK_GRAFT_SF_DIR selects the base, sf0.1).
  */
object SoakCuration {

  /** JVM twin of Hashing.md5Long (conv(substring(md5(x),1,15),16,10))
    * — used to pre-pick planted doc_ids onto the held-out split.
    */
  private def md5Long(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

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
    import spark.implicits._

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
      .select("doc_id", "text", "source", "n_chars")
    val nDocs0 = docs0.count()
    val plantBase = 9000000000L

    for (scale <- scales) {
      def copyIds(df: DataFrame, i: Int): DataFrame =
        df.withColumn("doc_id", col("doc_id") + lit(i * 10000000L))

      // ---------- o18: token-budget cut on a planted boundary ----------
      val organicCounts = (0 until scale).map(i => copyIds(docs0, i))
        .reduce(_ unionByName _)
        .select(col("doc_id"), col("n_chars").as("n_tokens"),
          // organic scores strictly below the planted 2.0
          (pmod(col("doc_id"), lit(1000L)).cast("double") / 1000.0)
            .as("score"))
      val planted = (0 until scale)
        .map(i => (plantBase + i, 1000L, 2.0)).toSeq
        .toDF("doc_id", "n_tokens", "score")
      val budget = scale.toLong * 1000L - 500L
      val (row18, s18) = timed {
        graft.ops.Pack.tokenBudgetSelect(
          organicCounts.unionByName(planted), "doc_id", "n_tokens",
          "score", budget).collect().head
      }
      val expSel = (scale - 1).toLong
      assert(row18.getLong(3) == expSel,
        s"o18 n_selected ${row18.getLong(3)} != $expSel")
      assert(row18.getLong(4) == expSel * 1000L,
        s"o18 tokens_selected ${row18.getLong(4)}")
      if (scale == 1) {
        assert(row18.isNullAt(5) && row18.isNullAt(6),
          "o18 empty selection must read null cutoffs (r12 fix)")
      } else {
        assert(row18.getDouble(5) == 2.0,
          s"o18 cutoff_score ${row18.getDouble(5)}")
        assert(row18.getLong(6) == plantBase + scale - 2,
          s"o18 cutoff_doc_id ${row18.getLong(6)}")
      }
      emit("o18_token_budget", scale, s18,
        "n_docs" -> row18.getLong(0).toString,
        "n_selected" -> row18.getLong(3).toString)

      // ---------- o19: exact prefix proportions per source ----------
      val docsN = (0 until scale).map(i => copyIds(docs0, i))
        .reduce(_ unionByName _)
      val (check19, s19) = timed {
        val il = graft.ops.Sampling.sourceInterleave(
          docsN, "doc_id", "source")
        il.groupBy("source").agg(
          count(lit(1)).as("ns"),
          countDistinct(col("pos")).as("nd"),
          sum(when(col("pos") <= 0.25, 1L).otherwise(0L)).as("q1"),
          sum(when(col("pos") <= 0.5, 1L).otherwise(0L)).as("q2"))
          .collect()
      }
      assert(check19.nonEmpty, "o19 no sources")
      check19.foreach { r =>
        val ns = r.getLong(1)
        assert(r.getLong(2) == ns,
          s"o19 ${r.getString(0)}: pos grid not injective")
        assert(r.getLong(3) == ns / 4 + (if (ns % 4 >= 2) 1L else 0L),
          s"o19 ${r.getString(0)}: q1 ${r.getLong(3)} ns=$ns")
        assert(r.getLong(4) == (ns + 1) / 2,
          s"o19 ${r.getString(0)}: q2 ${r.getLong(4)} ns=$ns")
      }
      emit("o19_source_interleave", scale, s19,
        "n_sources" -> check19.length.toString,
        "rows" -> check19.map(_.getLong(1)).sum.toString)

      // ---------- t_lm_filter: planted all-OOV junk docs ----------
      // organic copies: injective token rename (suffix x{i}) so train
      // statistics stay per-copy; junk tokens end in a letter — can
      // never collide with a renamed organic token
      val renamed = (0 until scale).map(i =>
        copyIds(docs0, i).select(col("doc_id"),
          regexp_replace(col("text"), "([A-Za-z0-9]+)", "$1x" + i)
            .as("text"))).reduce(_ unionByName _)
      val junkIds = (0 until scale).map { i =>
        Iterator.from(0).map(k => plantBase + i * 1000L + k)
          .find(id => md5Long(s"lmsplit:$id") % 5 == 0).get
      }
      val junk = junkIds.zipWithIndex.map { case (id, i) =>
        (id, ('a' to 'h').map(c => s"qqjunk$i$c").mkString(" "))
      }.toDF("doc_id", "text")
      val corpus = renamed.unionByName(junk)
      val (res, sLm) = timed {
        val out = graft.ops.TextAnalysis.lmQualityFilter(corpus)
          .localCheckpoint(true)
        val junkRows = out.filter(col("doc_id") >= plantBase)
          .collect().sortBy(_.getLong(0))
        val maxOrganic = out.filter(col("doc_id") < plantBase)
          .agg(max(col("mean_nll"))).head().getDouble(0)
        (junkRows, maxOrganic)
      }
      val (junkRows, maxOrganic) = res
      // theoretical OOV ceiling: recompute (N, V) with the engine's
      // own split predicate and tokenization
      graft.ops.Hashing.ensureRegistered(corpus)
      val statsRow = corpus
        .filter(graft.ops.Hashing.md5Long(concat(lit("lmsplit:"),
          col("doc_id").cast("string"))) % 5 =!= 0)
        .select(explode(expr(graft.ops.Hashing.tokensSql)).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("c"))
        .agg(sum(col("c")).as("N"), count(lit(1)).as("V")).head()
      val ceiling = BigDecimal(math.log(
        (statsRow.getLong(0) + statsRow.getLong(1)).toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(junkRows.length == scale,
        s"t_lm_filter planted ${junkRows.length} != $scale junk rows")
      junkRows.foreach { r =>
        assert(r.getLong(1) == 8L, s"junk n_tokens ${r.getLong(1)}")
        assert(r.getDouble(2) == ceiling,
          s"junk nll ${r.getDouble(2)} != ceiling $ceiling")
        assert(!r.getBoolean(3), "junk doc must not be kept")
      }
      assert(junkRows.forall(_.getDouble(2) >= maxOrganic),
        s"junk nll below an organic doc ($maxOrganic)")
      emit("t_lm_filter", scale, sLm,
        "ceiling_nll" -> ceiling.toString,
        "max_organic_nll" -> maxOrganic.toString)

      // ---------- d_line_dedup: total-strike observable ----------
      // UNRENAMED copies: at scale ≥ 2 every non-blank line occurs in
      // ≥ scale distinct docs, so lineDedup(maxDocs = 1) must strike
      // ALL of them — each doc's survivors are EXACTLY its
      // whitespace-only lines, doc by doc (the all-struck reassembly
      // path the r12 gate exercises only on 8 organic pairs). At
      // scale 1 the organic corpus passes through the same assertion
      // via the independently-computed expectation.
      val corpusLd = (0 until scale).map(i => copyIds(docs0, i))
        .reduce(_ unionByName _).select("doc_id", "text")
      val (mismLd, sLd) = timed {
        val out = graft.ops.Dedup.lineDedup(corpusLd, 1)
        val expect = corpusLd.select(col("doc_id"),
          expr("size(filter(split(text, '\n'), " +
            "l -> length(trim(l)) = 0))").cast("long").as("n_blank"),
          expr("size(split(text, '\n'))").cast("long").as("n_all"))
        if (scale >= 2)
          out.join(expect, "doc_id")
            .filter(col("n_kept") =!= col("n_blank") ||
              col("n_dropped") =!= col("n_all") - col("n_blank"))
            .count()
        else out.filter(col("n_dropped") < 0).count() // shape-only leg
      }
      assert(mismLd == 0L, s"d_line_dedup: $mismLd docs violated the " +
        "blank-lines-only survivor expectation")
      emit("d_line_dedup", scale, sLd,
        "rows" -> (scale.toLong * nDocs0).toString)
    }
    spark.stop()
    println("""{"soak":"curation","status":"ok"}""")
  }
}
