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
  * Round-13 legs (VERDICT r12 item 5):
  *
  *  - cross-run incremental near-dup (`d_incremental_neardup` /
  *    Dedup.appendBandIndex + nearDupAgainstIndex): scale prior
  *    batches APPEND to one parquet band index, a renamed increment
  *    carries ONE planted doc copied verbatim from the smallest
  *    shingle-able prior doc — is_dup, first_prior_match (exact) and
  *    n_prior_matches ≥ scale asserted.
  *
  *  - perplexity buckets (`t_ppl_buckets` / TextAnalysis.pplBuckets):
  *    three planted frequency classes sized K+1 / K / K−1
  *    (K = 500·scale — sized against the DECIMAL(20,10) ceil-rank cut
  *    convention, see the leg comment) pin the EXACT tercile manifest
  *    (per-bucket doc/token counts, class-NLL ordering, boundary docs
  *    exactly ON cut_head/cut_middle), plus a conservation leg over
  *    the organic self-union.
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

      // ---------- d_incremental_neardup: per-run APPEND + planted dup --
      // `scale` prior batches (unrenamed copies) each APPEND their band
      // keys to ONE parquet index (batch 0 overwrites) — the r13
      // appendBandIndex seam soaked at scale — then a renamed-token
      // increment (organically non-colliding) carrying ONE PLANTED doc
      // whose text is copied verbatim from the smallest shingle-able
      // prior doc_id joins the reloaded index. Identical text ⇒
      // identical shingle set ⇒ identical signature/bands, so the
      // planted doc MUST collide with every copy of its source:
      // is_dup = 1, first_prior_match = that smallest doc_id EXACTLY
      // (no smaller id can collide — docs under 3 tokens produce no
      // band keys at all), n_prior_matches ≥ scale (all copies).
      val shingleable = docs0
        .filter(size(expr(graft.ops.Hashing.tokensSql)) >= 3)
      val chosenId = shingleable.agg(min(col("doc_id"))).head().getLong(0)
      val chosenText = docs0.filter(col("doc_id") === chosenId)
        .head().getAs[String]("text")
      val nShingleable = shingleable.count()
      val incPlantId = 9800000000L
      val inc = copyIds(docs0, scale).select(col("doc_id"),
          regexp_replace(col("text"), "([A-Za-z0-9]+)", "$1y").as("text"))
        .unionByName(
          Seq((incPlantId, chosenText)).toDF("doc_id", "text"))
      val idxPath = graft.queries.Scratch.dir("graft_soak_appidx") + "/idx"
      val (resInc, sInc) = timed {
        (0 until scale).foreach { i =>
          graft.ops.Dedup.appendBandIndex(
            copyIds(docs0, i).select("doc_id", "text"), idxPath,
            overwrite = i == 0)
        }
        val out = graft.ops.Dedup.nearDupAgainstIndex(
          inc, spark.read.parquet(idxPath)).localCheckpoint(true)
        val n = out.count()
        val planted = out.filter(col("doc_id") === incPlantId).collect()
        (n, planted)
      }
      assert(resInc._1 == nShingleable + 1,
        s"d_incremental rows ${resInc._1} != ${nShingleable + 1} " +
          "(every shingle-able increment doc must report exactly once)")
      val pRow = {
        assert(resInc._2.length == 1, "planted increment doc missing")
        resInc._2.head
      }
      assert(pRow.getLong(1) == 1L, "planted doc must read is_dup = 1")
      assert(pRow.getLong(2) == chosenId,
        s"planted first_prior_match ${pRow.getLong(2)} != $chosenId")
      assert(pRow.getLong(3) >= scale.toLong,
        s"planted n_prior_matches ${pRow.getLong(3)} < $scale copies")
      emit("d_incremental_neardup", scale, sInc,
        "index_rows_batches" -> scale.toString,
        "increment_rows" -> resInc._1.toString,
        "planted_prior_matches" -> pRow.getLong(3).toString)

      // ---------- t_ppl_buckets: exact tercile manifest + boundary ----
      // Exactness leg: three PLANTED frequency classes — every doc in
      // a class is the SAME single token repeated (50× / 10× / 2×),
      // so all of a class's docs share ONE round-6 mean NLL and the
      // class token counts force nll(head) < nll(middle) < nll(tail).
      // Class sizes are K+1 / K / K−1 (n = 3K), chosen against the
      // op's exact-cut convention — rank ceil(q·n) with q held at
      // DECIMAL(20,10), so q = 1/3 rounds DOWN to …3333 (rank K:
      // inside the K+1-doc head class) and q = 2/3 rounds UP to …6667
      // (rank 2K+1: the LAST middle doc, since head+middle = 2K+1) —
      // so both cuts land ON a known class score and the tied-scores-
      // land-together rule pins the whole manifest to the digit:
      // head K+1 docs / middle K / tail K−1, cut_head == head score,
      // cut_middle == middle score. (Symmetric K/K/K classes are the
      // counterexample: the 2/3 cut then lands on the first TAIL doc
      // and the tail bucket vanishes into middle — the convention is
      // the spec, the soak asserts it.)
      val K = 500 * scale
      val gdocs = Seq(("head", 50, 0L, K + 1), ("middle", 10, 1L, K),
          ("tail", 2, 2L, K - 1))
        .flatMap { case (g, reps, go, sz) =>
          (0 until sz).map(j => (9500000000L + go * 10000000L + j,
            Seq.fill(reps)(s"qq${g}tok").mkString(" ")))
        }.toDF("doc_id", "text")
      val (rowsPpl, sPpl) = timed {
        graft.ops.TextAnalysis.pplBuckets(gdocs).collect()
      }
      assert(rowsPpl.length == 3, s"t_ppl_buckets ${rowsPpl.length} rows")
      val byB = rowsPpl.map(r => r.getString(0) -> r).toMap
      for ((g, reps, sz) <- Seq(("head", 50L, K + 1L),
          ("middle", 10L, K.toLong), ("tail", 2L, K - 1L))) {
        assert(byB(g).getLong(1) == sz,
          s"t_ppl $g n_docs ${byB(g).getLong(1)} != $sz")
        assert(byB(g).getLong(2) == reps * sz,
          s"t_ppl $g n_tokens ${byB(g).getLong(2)} != ${reps * sz}")
      }
      val (mh, mm, mt) = (byB("head").getDouble(3),
        byB("middle").getDouble(3), byB("tail").getDouble(3))
      assert(mh < mm && mm < mt,
        s"t_ppl class NLLs not ordered: $mh $mm $mt")
      assert(byB("head").getDouble(4) == mh,
        s"t_ppl cut_head ${byB("head").getDouble(4)} != head score $mh")
      assert(byB("head").getDouble(5) == mm,
        s"t_ppl cut_middle ${byB("head").getDouble(5)} != middle " +
          s"score $mm")
      // Conservation leg at organic scale: self-unioned renamed copies
      // — every tokenizable doc lands in exactly one bucket.
      val corpusPpl = (0 until scale).map(i =>
        copyIds(docs0, i).select(col("doc_id"),
          regexp_replace(col("text"), "([A-Za-z0-9]+)", "$1x" + i)
            .as("text"))).reduce(_ unionByName _)
      val nTokenizable = corpusPpl
        .filter(size(expr(graft.ops.Hashing.tokensSql)) >= 1).count()
      val (rowsOrg, sOrg) = timed {
        graft.ops.TextAnalysis.pplBuckets(corpusPpl).collect()
      }
      assert(rowsOrg.map(_.getLong(1)).sum == nTokenizable,
        s"t_ppl organic n_docs ${rowsOrg.map(_.getLong(1)).sum} != " +
          s"$nTokenizable tokenizable docs")
      emit("t_ppl_buckets", scale, sPpl + sOrg,
        "planted_docs" -> (3 * K).toString,
        "organic_docs" -> nTokenizable.toString,
        "cut_head" -> mh.toString, "cut_middle" -> mm.toString)

      // ---------- t_gopher_rules: rule-boundary plants at scale ----
      // (VERDICT r13 item 5.) Five PLANTED docs sit exactly ON or one
      // step OFF the Gopher thresholds, so every per-rule boolean and
      // the keep conjunction is pinned to the digit while the rule
      // battery chews `scale` self-unioned organic copies:
      //  - w50: exactly 50 words (25 'the' + 25 'and') — word-count
      //    lower bound, mean word length exactly 3.0 (rule-2 lower
      //    bound) AND exactly 2 distinct required stops (rule-7
      //    bound): a triple-boundary KEEP
      //  - w49: the 49-word twin — fails ONLY r_word_count
      //  - stop1: 25 'the' + 25 'cat' — 1 distinct stop, fails ONLY
      //    r_stops
      //  - bul9: 9 of 10 nonblank lines bulleted — bullet_line_frac
      //    exactly 0.9 (rule-4 bound), KEEP
      //  - bul10: all 10 bulleted — 1.0, fails ONLY r_bullets
      val bline = "- that have word word word word"
      val pline = "that have word word word word"
      val gPlants = Seq(
        (9900000000L, (Seq.fill(25)("the") ++ Seq.fill(25)("and"))
          .mkString(" ")),
        (9900000001L, (Seq.fill(25)("the") ++ Seq.fill(24)("and"))
          .mkString(" ")),
        (9900000002L, (Seq.fill(25)("the") ++ Seq.fill(25)("cat"))
          .mkString(" ")),
        (9900000003L, (Seq.fill(9)(bline) :+ pline).mkString("\n")),
        (9900000004L, Seq.fill(10)(bline).mkString("\n")))
        .toDF("doc_id", "text")
      val gCorpus = (0 until scale).map(i => copyIds(docs0, i))
        .reduce(_ unionByName _).select("doc_id", "text")
        .unionByName(gPlants)
      val nGopherIn = nDocs0 * scale + 5
      val (gRes, sGopher) = timed {
        val out = graft.ops.TextAnalysis.gopherRules(gCorpus)
          .localCheckpoint(true)
        val n = out.count()
        val planted = out.filter(col("doc_id") >= 9900000000L)
          .collect().map(r => r.getLong(0) -> r).toMap
        (n, planted)
      }
      assert(gRes._1 == nGopherIn,
        s"t_gopher rows ${gRes._1} != $nGopherIn (narrow map must " +
          "conserve docs)")
      def gCheck(id: Long, nWords: Long, meanLen: Double,
          bulletFrac: Double, stops: Long, expect: Map[String, Boolean])
          : Unit = {
        val r = gRes._2(id)
        assert(r.getAs[Long]("n_words") == nWords,
          s"doc $id n_words ${r.getAs[Long]("n_words")} != $nWords")
        assert(r.getAs[Double]("mean_word_len") == meanLen,
          s"doc $id mean_word_len ${r.getAs[Double]("mean_word_len")}")
        assert(r.getAs[Double]("bullet_line_frac") == bulletFrac,
          s"doc $id bullet_frac ${r.getAs[Double]("bullet_line_frac")}")
        assert(r.getAs[Long]("n_required_stops") == stops,
          s"doc $id stops ${r.getAs[Long]("n_required_stops")}")
        expect.foreach { case (c, v) =>
          assert(r.getAs[Boolean](c) == v, s"doc $id $c != $v")
        }
      }
      val allPass = Seq("r_word_count", "r_word_len", "r_symbol",
        "r_bullets", "r_ellipsis", "r_alpha", "r_stops", "keep")
        .map(_ -> true).toMap
      gCheck(9900000000L, 50L, 3.0, 0.0, 2L, allPass)
      gCheck(9900000001L, 49L, 3.0, 0.0, 2L,
        allPass + ("r_word_count" -> false) + ("keep" -> false))
      gCheck(9900000002L, 50L, 3.0, 0.0, 1L,
        allPass + ("r_stops" -> false) + ("keep" -> false))
      // bul9: 69 words (9 bullets + 60 alpha), 249 non-ws chars ->
      // mean 249/69 = 3.608696; alpha 60/69 = 0.869565 >= 0.8
      gCheck(9900000003L, 69L, 3.608696, 0.9, 2L, allPass)
      gCheck(9900000004L, 70L, 3.571429, 1.0, 2L,
        allPass + ("r_bullets" -> false) + ("keep" -> false))
      emit("t_gopher_rules", scale, sGopher,
        "docs" -> nGopherIn.toString,
        "planted_boundary_docs" -> "5")

      // ---------- sim_pq_append: persisted ANN index + increment ----
      // (VERDICT r14 item 5 — the d_incremental_neardup economics in
      // embedding space, soaked.) `scale` identical-embedding copies
      // of the base vectors train ONE persisted PQ index
      // (AnnIndex.savePq); an increment carrying one more copy of the
      // corpus plus ONE PLANTED vector copied VERBATIM from the
      // smallest base vec_id is appended through the sidecar-validated
      // appendPqIncrement (encode against the SAVED codebooks, no
      // retrain); the reloaded index then serves the planted
      // embedding as a query. Exact observables:
      //  - codes parquet row count = (scale + 1) · n_base + 1 (append
      //    holds exactly both batches);
      //  - the planted vector's reloaded codes EQUAL its source's
      //    (verbatim copy ⇒ identical subvectors ⇒ identical argmin
      //    cells — byte-exact quantization);
      //  - ADC top-k: every one of the scale + 1 identical copies of
      //    the source reports adist EQUAL to rank 1's adist — the
      //    per-subspace argmin bound makes that the global minimum,
      //    so no vector can rank strictly above any copy;
      //  - fail-fast: an append with foreign (m, k) THROWS.
      val embBase = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select("vec_id", "embedding")
      val nEmb = embBase.count()
      def copyVecs(i: Int): DataFrame = embBase
        .withColumn("vec_id", col("vec_id") + lit(i * 10000000L))
      val annPlantId = 9700000000L
      val chosenVec = embBase.agg(min(col("vec_id"))).head().getLong(0)
      val chosenEmb = embBase.filter(col("vec_id") === chosenVec)
        .head().getAs[scala.collection.Seq[Float]]("embedding").toSeq
      val annPath = graft.queries.Scratch.dir("graft_soak_annidx") + "/idx"
      val dims = 64; val mSub = 4; val kCells = 8; val itersPq = 2
      val (annRes, sAnn) = timed {
        val trainCorpus = (0 until scale).map(copyVecs)
          .reduce(_ unionByName _)
        val (books, asg) =
          graft.ops.Pq.train(trainCorpus, dims, mSub, kCells, itersPq)
        graft.ops.AnnIndex.savePq(books, graft.ops.Pq.encode(asg),
          annPath, dims, mSub, kCells, itersPq)
        val incr = copyVecs(scale).unionByName(
          Seq((annPlantId, chosenEmb)).toDF("vec_id", "embedding"))
        graft.ops.AnnIndex.appendPqIncrement(incr, annPath,
          dims, mSub, kCells, itersPq)
        val (b2, a2) = graft.ops.AnnIndex.loadPq(spark, annPath,
          dims, mSub, kCells, itersPq)
        val codesDf = spark.read.parquet(s"$annPath/codes")
        val nCodes = codesDf.count()
        val codePair = codesDf
          .filter(col("vec_id").isin(annPlantId, chosenVec))
          .collect().map(r => r.getLong(0) ->
            r.getAs[scala.collection.Seq[Long]]("codes").toList).toMap
        // other vectors may share the source's exact code word (m·k
        // gives 4096 combos) and tie at the minimum adist — size k to
        // hold EVERY tied candidate so the tie-break can never crowd
        // a copy out of the returned window
        val nTied = codesDf.filter(col("codes") ===
          array(codePair(chosenVec).map(lit): _*)).count().toInt
        val topk = graft.ops.Pq.adcTopKCodes(
          Seq((annPlantId, chosenEmb)).toDF("vec_id", "embedding"),
          b2, a2, dims, mSub, nTied + 5).collect()
          .sortBy(_.getAs[Int]("rank"))
        (nCodes, codePair, topk)
      }
      val (nCodes, codePair, topk) = annRes
      assert(nCodes == (scale + 1).toLong * nEmb + 1L,
        s"sim_pq_append codes $nCodes != ${(scale + 1) * nEmb + 1}")
      assert(codePair(annPlantId) == codePair(chosenVec),
        s"planted codes ${codePair(annPlantId)} != source " +
          s"${codePair(chosenVec)} — verbatim copy must quantize " +
          "identically against the persisted codebooks")
      val copyIdsExpected = (0 to scale)
        .map(i => chosenVec + i * 10000000L).toSet
      val minAdist = topk.head.getAs[Double]("adist")
      val copyRows = topk.filter(r =>
        copyIdsExpected(r.getAs[Long]("neighbor_id")))
      assert(copyRows.length == scale + 1,
        s"sim_pq_append top-k holds ${copyRows.length} of " +
          s"${scale + 1} identical copies")
      copyRows.foreach { r =>
        assert(r.getAs[Double]("adist") == minAdist,
          s"copy ${r.getAs[Long]("neighbor_id")} adist " +
            s"${r.getAs[Double]("adist")} != min $minAdist")
      }
      val annThrew =
        try {
          graft.ops.AnnIndex.appendPqIncrement(copyVecs(scale + 1),
            annPath, dims, mSub, kCells + 8, itersPq)
          false
        } catch { case _: IllegalArgumentException => true }
      assert(annThrew, "sim_pq_append: foreign-parameter append must " +
        "fail fast on the _graft_ann_params sidecar")
      emit("sim_pq_append", scale, sAnn,
        "index_vectors" -> nCodes.toString,
        "copies_at_min_adist" -> copyRows.length.toString)
    }
    spark.stop()
    println("""{"soak":"curation","status":"ok"}""")
  }
}
