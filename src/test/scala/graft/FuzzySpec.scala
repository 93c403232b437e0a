package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Fuzzy

/** Fuzzy blocked join (ops/Fuzzy): recall at the edit bound, verify
  * exactness, and the blocking-scheme matrix — both schemes ("segment"
  * PassJoin partitions, "prefix" rarest-gram filtering) × both corpus
  * shapes (gram-diverse, every-gram-common), which must return
  * identical match sets above the prefix scheme's min-length bound.
  */
class FuzzySpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.session
  private val schemes = Seq("segment", "prefix")

  private def df(cols: (String, String), rows: (Long, String)*) = {
    val s = spark; import s.implicits._
    rows.toDF(cols._1, cols._2)
  }

  test("one-edit variants match; unrelated strings do not (both schemes)") {
    val probes = df(("q_key", "q_name"),
      1L -> "jon smith inc", 2L -> "acme corporation", 3L -> "zzz qqq vvv")
    val targets = df(("t_key", "t_name"),
      10L -> "john smith inc", 20L -> "acme corporation",
      30L -> "completely different")
    for (b <- schemes) {
      val out = Fuzzy.fuzzyJoin(probes, "q_key", "q_name",
          targets, "t_key", "t_name", maxDist = 1, blocking = b)
        .select("q_key", "t_key").collect().map(r => (r.getLong(0),
          r.getLong(1))).toSet
      assert(out === Set(1L -> 10L, 2L -> 20L), s"scheme=$b")
    }
  }

  test("dist column is the exact levenshtein distance (both schemes)") {
    val probes = df(("q_key", "q_name"), 1L -> "kitten house")
    val targets = df(("t_key", "t_name"), 10L -> "sitten house")
    for (b <- schemes) {
      val out = Fuzzy.fuzzyJoin(probes, "q_key", "q_name",
        targets, "t_key", "t_name", maxDist = 2, blocking = b).collect()
      assert(out.length === 1, s"scheme=$b")
      assert(out.head.getAs[Long]("dist") === 1L, s"scheme=$b")
    }
  }

  test("prefix filtering blocks on rarest grams; hot grams don't " +
      "flood and the true match still blocks") {
    val hotTail = (1 to 30).map(i => i.toLong -> s"unique$i common tail")
    val probes = df(("q_key", "q_name"), 100L -> "unique7x common tail")
    val targets = df(("t_key", "t_name"), hotTail: _*)
    // every gram of " common tail" has df 30; the probe's 4-gram prefix
    // is its rare "unique7x" grams, which block exactly the true match
    val out = Fuzzy.fuzzyJoin(probes, "q_key", "q_name",
        targets, "t_key", "t_name", maxDist = 1, blocking = "prefix")
      .select("t_key").collect().map(_.getLong(0)).toSet
    assert(out === Set(7L))
  }

  test("recall survives a corpus where EVERY gram is common, and the " +
      "two schemes return IDENTICAL match sets on it") {
    // 40 names permuting the same 5 words: every trigram has high df,
    // so any fixed df cap would drop all grams and return nothing; the
    // low-gram-diversity regime is also where prefix blocking's
    // candidate COUNT degenerates while segment blocking's stays
    // match-bounded — but the returned match set must be the same
    val ws = Array("azure", "rose", "mint", "plum", "sand")
    val names = (0 until 40).map { i =>
      i.toLong -> Seq(ws(i % 5), ws((i / 5) % 5), ws((i + 2) % 5))
        .mkString(" ")
    }
    val targets = df(("t_key", "t_name"), names: _*)
    val corrupted = names.head._2.patch(2, "", 1) // delete 3rd char
    val probes = df(("q_key", "q_name"), 100L -> corrupted)
    val sets = schemes.map { b =>
      b -> Fuzzy.fuzzyJoin(probes, "q_key", "q_name",
          targets, "t_key", "t_name", maxDist = 1, blocking = b)
        .select("t_key").collect().map(_.getLong(0)).toSet
    }.toMap
    for (b <- schemes)
      assert(sets(b).contains(0L), s"true match lost under $b")
    assert(sets("segment") === sets("prefix"),
      s"schemes disagree: $sets")
  }

  test("short strings: segment blocking is recall-exact below the " +
      "prefix scheme's q·(e+1) min-length bound") {
    val probes = df(("q_key", "q_name"), 1L -> "ab")
    val targets = df(("t_key", "t_name"), 10L -> "ab", 20L -> "ax")
    // prefix: "ab" and "ax" share no trigram — documented recall miss
    val pre = Fuzzy.fuzzyJoin(probes, "q_key", "q_name",
        targets, "t_key", "t_name", maxDist = 1, blocking = "prefix")
      .select("t_key").collect().map(_.getLong(0)).toSet
    assert(pre === Set(10L))
    // segment: pigeonhole holds at every length — both matches found
    val seg = Fuzzy.fuzzyJoin(probes, "q_key", "q_name",
        targets, "t_key", "t_name", maxDist = 1, blocking = "segment")
      .select("t_key").collect().map(_.getLong(0)).toSet
    assert(seg === Set(10L, 20L))
  }

  test("segment blocking is exact against brute force at maxDist=2 " +
      "(multi-segment path: insertions, deletions, substitutions)") {
    val base = Seq("goldenrod lavender spring", "midnight plum chiffon",
      "azure sand mint rose", "ab", "a", "xyz", "goldenrod lavender sprint")
    val targets = df(("t_key", "t_name"),
      base.zipWithIndex.map { case (n, i) => (i + 10L) -> n }: _*)
    val probes = df(("q_key", "q_name"),
      1L -> "goldenrod lavender spring",       // exact
      2L -> "goldenrd lavender spring",        // 1 deletion
      3L -> "goldenrod lavunder sprung",       // 2 substitutions
      4L -> "xgoldenrod lavender springy",     // 2 insertions (ends)
      5L -> "b",                               // short, dist 1 to "a"/"ab"
      6L -> "completely unrelated words here")
    val e = 2
    val got = Fuzzy.fuzzyJoin(probes, "q_key", "q_name",
        targets, "t_key", "t_name", maxDist = e, blocking = "segment")
      .select("q_key", "t_key")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      (qn, qk) <- probes.collect().map(r => (r.getString(1), r.getLong(0)))
      (tn, tk) <- targets.collect().map(r => (r.getString(1), r.getLong(0)))
      if org.apache.commons.text.similarity.LevenshteinDistance
        .getDefaultInstance.apply(qn, tn) <= e
    } yield (qk, tk)).toSet
    assert(got === want)
  }

  test("same-named columns on both sides (record linkage) work") {
    val probes = df(("id", "name"), 1L -> "jon smith inc")
    val targets = df(("id", "name"), 10L -> "john smith inc")
    val out = Fuzzy.fuzzyJoin(probes, "id", "name",
      targets, "id", "name", maxDist = 1).collect()
    assert(out.length === 1)
    val row = out.head
    assert(row.getAs[Long]("id") === 1L)
    assert(row.getAs[Long]("id_target") === 10L)
    assert(row.getAs[String]("name") === "jon smith inc")
    assert(row.getAs[String]("name_target") === "john smith inc")
  }

  test("unknown blocking scheme is rejected") {
    val probes = df(("q_key", "q_name"), 1L -> "a")
    intercept[IllegalArgumentException] {
      Fuzzy.fuzzyJoin(probes, "q_key", "q_name",
        probes, "q_key", "q_name", 1, blocking = "bogus")
    }
  }

  test("plan contains no nested-loop or cartesian join (both schemes)") {
    val probes = df(("q_key", "q_name"), 1L -> "jon smith inc")
    val targets = df(("t_key", "t_name"), 10L -> "john smith inc")
    for (b <- schemes) {
      val plan = Fuzzy.fuzzyJoin(probes, "q_key", "q_name",
          targets, "t_key", "t_name", 1, blocking = b)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"scheme=$b")
      assert(!plan.contains("CartesianProduct"), s"scheme=$b")
    }
  }
}
