package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale soak for the round-8/9 record-linkage operators, same §12
  * protocol as [[Soak]]/[[SoakWave]] (fresh JVM, scaled corpus with
  * planted structure, one JSON line per (op, scale) with seconds +
  * correctness observables):
  *
  *  - entity resolution (segment blocking): the part-name corpus is
  *    scaled by injective per-copy TOKEN renaming (copy i appends
  *    `x{i}` to every token), so the DISTINCT-name universe grows
  *    ~linearly with scale while names across copies share no aligned
  *    segment — the claim under test is that segment-blocking
  *    candidate counts grow ~LINEARLY in corpus size (the prefix-gram
  *    scheme this replaced grew quadratically at fixed gram
  *    vocabulary: 35.2 M pairs from 21 k records). Planted per copy:
  *    a duplicate FAMILY around one hot name (3 single-char deletions
  *    + 3 substitutions at base-letter positions — every member
  *    shares nearly every gram with every other, the worst case for
  *    gram blocking) that must resolve into ONE entity PER COPY
  *    (n_family_entities = scale), plus the full record-level
  *    duplicate mass (every name repeats across ~300 records) that
  *    dedup-first must keep out of the blocking universe entirely.
  *
  *  - SCD2 + temporal as-of join: per copy, 2 000 entities × 5
  *    versions at deterministic timestamps (version v live over
  *    [v·1000, (v+1)·1000)) plus ONE HOT entity with 10 000 versions;
  *    facts probe t = v·1000 + 500, so the version each fact must
  *    resolve to is closed-form — n_mismatch must be 0 at every
  *    scale. The claim under test: the as-of union+window shape is
  *    one sort per key (hot key = 2·10⁴-row sort), never the per-key
  *    |facts|×|versions| blowup (10⁸ pairs on the hot key) an
  *    interval-containment join would pay.
  *
  * Usage: runMain graft.tools.SoakEr [scale ...] (default 1 10 50;
  * SPARK_GRAFT_SF_DIR selects the base dir, default sf0.1).
  */
object SoakEr {
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

    val part0 = spark.read.parquet(s"$sfDir/part.parquet")
      .select(col("p_partkey").as("rec_id"), col("p_name").as("name"))

    for (scale <- scales) {
      // ---------------- entity resolution ----------------
      // copies with injectively renamed tokens; the planted family per
      // copy deletes char p (p = 3..26) of the copy's first name
      val records = (0 until scale).map { i =>
        part0.select((col("rec_id") + i * 100000000L).as("rec_id"),
          regexp_replace(col("name"), "([a-z0-9]+)", "$1" + s"x$i")
            .as("name"))
      }.reduce(_ unionByName _)
      val familySeed = (0 until scale).map { i =>
        part0.filter(col("rec_id") === 1)
          .select((lit(i * 100000000L + 90000000L)).as("rec_id"),
            regexp_replace(col("name"), "([a-z0-9]+)", "$1" + s"x$i")
              .as("name"))
      }.reduce(_ unionByName _)
      // variants edit only positions 1..3 — base letters of the first
      // word (every color word has >= 3 chars), never the copy suffix:
      // edits at suffix positions would create GENUINE distance-1
      // pairs across copies (e.g. 'redx0…'→'red0…' vs 'redx1…'→
      // 'red1…' substitute in 1) and the per-copy families would
      // correctly merge into one giant entity, destroying the
      // one-family-per-copy observable (measured: exactly that
      // happened with edits at positions 3..26)
      val delVars = familySeed.crossJoin(
          spark.range(1, 4).select(col("id").as("p")))
        .select((col("rec_id") + col("p")).as("rec_id"),
          concat(expr("substring(name, 1, cast(p as int) - 1)"),
            expr("substring(name, cast(p as int) + 1)")).as("name"))
      val subVars = familySeed.crossJoin(
          spark.range(1, 4).select(col("id").as("p")))
        .select((col("rec_id") + col("p") + 10L).as("rec_id"),
          concat(expr("substring(name, 1, cast(p as int) - 1)"),
            lit("q"),
            expr("substring(name, cast(p as int) + 1)")).as("name"))
      val family = delVars.unionByName(subVars)
      val all = records.unionByName(familySeed).unionByName(family)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nRecords = all.count()
      val names = all.select("name").distinct()
      val nNames = names.count()

      // blocking-cost observable: distinct candidate pairs (includes
      // the n_names identity self-pairs) — must grow ~linearly
      val (nCands, candSec) = timed {
        graft.ops.Fuzzy.candidatePairs(names, "name", names, "name", 1)
          .count()
      }
      // full resolve + planted-family check. The family component in
      // copy i holds part 1's record (key i·10⁸+1 — the component
      // MINIMUM, hence its entity_id), every record sharing part 1's
      // renamed name, the seed (exact-same name), and the 24 deletion
      // variants — so each copy must yield exactly one entity labeled
      // i·10⁸+1 with ≥ 26 members.
      val ((nEntities, nFamEntities, famMin), resSec) = timed {
        val ent = graft.ops.EntityResolution
          .resolve(all, "rec_id", "name", 1)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val n = ent.count()
        val famRows = ent
          .filter(col("entity_id") % 100000000L === 1L)
          .agg(count(lit(1)).as("n_fam"),
            min("n_members").as("min_members"))
          .head()
        ent.unpersist()
        (n, famRows.getLong(0),
          if (famRows.isNullAt(1)) -1L else famRows.getLong(1))
      }
      emit("pipe_entity_resolution", scale, resSec,
        "n_records" -> nRecords, "n_names" -> nNames,
        "n_cands" -> nCands, "cand_ms" -> (candSec * 1000).round,
        "n_entities" -> nEntities, "n_family_entities" -> nFamEntities,
        "family_members_min" -> famMin)
      all.unpersist()

      // ---------------- SCD2 + temporal as-of join ----------------
      val nEnt = 2000L
      val verPerEnt = 5L
      val hotVersions = 10000L
      val changes = (0 until scale).map { i =>
        val off = i * 1000000L
        val cold = spark.range(0, nEnt * verPerEnt).select(
          (col("id") % nEnt + off).as("entity_id"),
          (expr(s"(id div $nEnt) + 1") * 1000L).as("ts"),
          (col("id") + 10L).as("change_id"),
          expr(s"(id div $nEnt) + 1").as("payload"))
        val hot = spark.range(1, hotVersions + 1).select(
          lit(off + 999999L).as("entity_id"),
          (col("id") * 1000L).as("ts"),
          (col("id") + 50000000L).as("change_id"),
          col("id").as("payload"))
        cold.unionByName(hot)
      }.reduce(_ unionByName _)
      val facts = (0 until scale).map { i =>
        val off = i * 1000000L
        val coldF = spark.range(0, nEnt * verPerEnt).select(
          (col("id") + 1000000000L).as("fact_id"),
          (col("id") % nEnt + off).as("entity_id"),
          (expr(s"(id div $nEnt) + 1") * 1000L + 500L).as("ts"),
          expr(s"(id div $nEnt) + 1").as("expect_version"))
        val hotF = spark.range(1, hotVersions + 1).select(
          (col("id") + 2000000000L).as("fact_id"),
          lit(off + 999999L).as("entity_id"),
          (col("id") * 1000L + 500L).as("ts"),
          col("id").as("expect_version"))
        coldF.unionByName(hotF)
      }.reduce(_ unionByName _)
      val ((nJoined, nMismatch), scdSec) = timed {
        val dim = graft.ops.Scd.scd2(changes, "entity_id", "ts",
            "change_id")
          .select(col("entity_id"), col("ts"), col("change_id"),
            col("version"), col("payload").as("dim_payload"))
        val joined = graft.ops.AsOf.asofJoin(
          facts, dim, "entity_id", "ts", "change_id",
          Seq("version", "dim_payload"))
        val r = joined.agg(count(lit(1)).as("n"),
          sum(when(col("version").isNull ||
            col("version") =!= col("expect_version"), 1L)
            .otherwise(0L)).as("bad")).head()
        (r.getLong(0), r.getLong(1))
      }
      emit("j_scd2_dimension", scale, scdSec,
        "n_changes" -> (scale * (nEnt * verPerEnt + hotVersions)),
        "n_facts" -> nJoined, "n_mismatch" -> nMismatch)
    }
    spark.stop()
  }
}
