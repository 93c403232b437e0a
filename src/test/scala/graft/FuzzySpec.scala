package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Fuzzy

/** Fuzzy q-gram-blocked join (ops/Fuzzy): blocking recall at the edit
  * bound, verify exactness, df-cap behavior, and short-string safety.
  */
class FuzzySpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.session

  private def df(cols: (String, String), rows: (Long, String)*) = {
    val s = spark; import s.implicits._
    rows.toDF(cols._1, cols._2)
  }

  test("one-edit variants match; unrelated strings do not") {
    val probes = df(("q_key", "q_name"),
      1L -> "jon smith inc", 2L -> "acme corporation", 3L -> "zzz qqq vvv")
    val targets = df(("t_key", "t_name"),
      10L -> "john smith inc", 20L -> "acme corporation",
      30L -> "completely different")
    val out = Fuzzy.fuzzyJoin(probes, "q_key", "q_name",
        targets, "t_key", "t_name", maxDist = 1)
      .select("q_key", "t_key").collect().map(r => (r.getLong(0),
        r.getLong(1))).toSet
    assert(out === Set(1L -> 10L, 2L -> 20L))
  }

  test("dist column is the exact levenshtein distance") {
    val probes = df(("q_key", "q_name"), 1L -> "kitten house")
    val targets = df(("t_key", "t_name"), 10L -> "sitten house")
    val out = Fuzzy.fuzzyJoin(probes, "q_key", "q_name",
      targets, "t_key", "t_name", maxDist = 2).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("dist") === 1L)
  }

  test("prefix filtering blocks on rarest grams; hot grams don't " +
      "flood and the true match still blocks") {
    val hotTail = (1 to 30).map(i => i.toLong -> s"unique$i common tail")
    val probes = df(("q_key", "q_name"), 100L -> "unique7x common tail")
    val targets = df(("t_key", "t_name"), hotTail: _*)
    // every gram of " common tail" has df 30; the probe's 4-gram prefix
    // is its rare "unique7x" grams, which block exactly the true match
    val out = Fuzzy.fuzzyJoin(probes, "q_key", "q_name",
        targets, "t_key", "t_name", maxDist = 1)
      .select("t_key").collect().map(_.getLong(0)).toSet
    assert(out === Set(7L))
  }

  test("recall survives a corpus where EVERY gram is common " +
      "(the absolute-df-cap failure mode)") {
    // 40 names permuting the same 5 words: every trigram has high df,
    // so any fixed df cap would drop all grams and return nothing; the
    // rarest-prefix scheme must still find the one-edit match
    val ws = Array("azure", "rose", "mint", "plum", "sand")
    val names = (0 until 40).map { i =>
      i.toLong -> Seq(ws(i % 5), ws((i / 5) % 5), ws((i + 2) % 5))
        .mkString(" ")
    }
    val targets = df(("t_key", "t_name"), names: _*)
    val corrupted = names.head._2.patch(2, "", 1) // delete 3rd char
    val probes = df(("q_key", "q_name"), 100L -> corrupted)
    val out = Fuzzy.fuzzyJoin(probes, "q_key", "q_name",
        targets, "t_key", "t_name", maxDist = 1)
      .select("t_key").collect().map(_.getLong(0)).toSet
    assert(out.contains(0L), s"true match lost; got $out")
  }

  test("strings shorter than q are handled (whole string as one gram)") {
    val probes = df(("q_key", "q_name"), 1L -> "ab")
    val targets = df(("t_key", "t_name"), 10L -> "ab", 20L -> "ax")
    val out = Fuzzy.fuzzyJoin(probes, "q_key", "q_name",
        targets, "t_key", "t_name", maxDist = 1)
      .select("t_key").collect().map(_.getLong(0)).toSet
    // "ab" blocks with "ab" (same gram); "ax" shares no gram — blocking
    // admits a recall miss below min-length q·(e+1), documented
    assert(out === Set(10L))
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

  test("plan contains no nested-loop or cartesian join") {
    val probes = df(("q_key", "q_name"), 1L -> "jon smith inc")
    val targets = df(("t_key", "t_name"), 10L -> "john smith inc")
    val plan = Fuzzy.fuzzyJoin(probes, "q_key", "q_name",
      targets, "t_key", "t_name", 1).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }
}
