package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Hashing
import graft.functions.BloomSketch

/** Bloom-filter aggregate (graft_bloom): bit parity with a Scala
  * reference, OR-merge idempotence under repartitioning, exact
  * membership semantics of the probe expression (no false negatives;
  * false positives deterministic), and loud failure on contract
  * violations.
  */
class BloomSketchSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.session
  private val m = 1024
  private val k = 3

  /** Scala reference: same double hashing, same 63-bit word layout. */
  private def refBloom(hashes: Seq[Long]): Array[Long] = {
    val words = new Array[Long]((m + 62) / 63)
    for (h <- hashes; i <- 0 until k) {
      val bit = (((h % m) + i * (1L + (h / m) % (m - 1))) % m).toInt
      words(bit / 63) |= 1L << (bit % 63)
    }
    words
  }

  private def md5Hash(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
  }

  test("aggregate matches the Scala reference, any partitioning") {
    val s = spark; import s.implicits._
    val keys = (1 to 500).map(i => s"key$i")
    val df = keys.toDF("v")
    Hashing.ensureRegistered(df)
    for (parts <- Seq(1, 7)) {
      val got = df.repartition(parts)
        .select(expr(Hashing.md5LongSql("v")).as("h"))
        .agg(expr(s"graft_bloom(h, $m, $k)")).head().getSeq[Long](0)
      assert(got === refBloom(keys.map(md5Hash)).toSeq)
    }
  }

  test("merge is idempotent: doubling the input changes nothing") {
    val s = spark; import s.implicits._
    val keys = (1 to 200).map(i => s"dup$i")
    val once = keys.toDF("v")
    Hashing.ensureRegistered(once)
    def bloomOf(df: org.apache.spark.sql.DataFrame) =
      df.select(expr(Hashing.md5LongSql("v")).as("h"))
        .agg(expr(s"graft_bloom(h, $m, $k)")).head().getSeq[Long](0)
    assert(bloomOf(once) === bloomOf(once.unionAll(once)))
  }

  test("probe: no false negatives; non-members mostly rejected with " +
      "deterministic false positives") {
    val s = spark; import s.implicits._
    val members = (1 to 300).map(i => s"in$i")
    val df = members.toDF("v")
    Hashing.ensureRegistered(df)
    val bloom = df.select(expr(Hashing.md5LongSql("v")).as("h"))
      .agg(expr(s"graft_bloom(h, $m, $k)").as("bloom"))
    def probe(keys: Seq[String]) =
      keys.toDF("v").crossJoin(broadcast(bloom))
        .select(col("v"), expr(BloomSketch.mightContainSql(
          "bloom", Hashing.md5LongSql("v"), m, k)).as("hit"))
        .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    // every member must hit (a Bloom filter has NO false negatives)
    assert(probe(members).values.forall(identity))
    // non-members: the FP outcome must equal the Scala reference's
    val out = (1 to 300).map(i => s"out$i")
    val ref = refBloom(members.map(md5Hash))
    def refHit(key: String): Boolean = {
      val h = md5Hash(key)
      (0 until k).forall { i =>
        val bit = (((h % m) + i * (1L + (h / m) % (m - 1))) % m).toInt
        (ref(bit / 63) & (1L << (bit % 63))) != 0
      }
    }
    val got = probe(out)
    assert(out.forall(key => got(key) == refHit(key)))
    // and with m=1024 bits over 300*3 insertions, most must miss
    assert(got.values.count(identity) < out.size / 2)
  }

  test("out-of-range hash and bad m/k fail loudly") {
    val s = spark; import s.implicits._
    val df = Seq("1").toDF("v")
    Hashing.ensureRegistered(df)
    assertThrows[Exception] {
      df.select(lit(-1L).as("h")).agg(expr(s"graft_bloom(h, $m, $k)"))
        .head()
    }
    assertThrows[Exception] {
      df.select(lit(1L << 60).as("h")).agg(expr(s"graft_bloom(h, $m, $k)"))
        .head()
    }
    Seq(s"graft_bloom(cast(1 as bigint), 32, $k)", // m too small
        s"graft_bloom(cast(1 as bigint), $m, 0)", // k too small
        s"graft_bloom(cast(1 as bigint), $m, 17)", // k too large
        s"graft_bloom(v, $m, $k)") // non-BIGINT hash
      .foreach { bad =>
        assertThrows[Exception](df.select(expr(bad)).head())
      }
  }
}
