package graft

import org.scalatest.funsuite.AnyFunSuite

/** CATALOG.md (the user-facing operator catalog) must list every gate
  * query — a gate added without a catalog row fails here, so the
  * catalog cannot rot behind the gate surface.
  */
class CatalogSpec extends AnyFunSuite {
  test("every gate query has a CATALOG.md row") {
    val catalog = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("CATALOG.md")), "UTF-8")
    val missing = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(name => catalog.contains(s"`$name`"))
    assert(missing.isEmpty,
      s"gates missing from CATALOG.md: ${missing.mkString(", ")}")
  }
}
