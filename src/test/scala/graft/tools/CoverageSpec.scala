package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** COVERAGE.md drift guard: the committed coverage document must track the
  * live catalog in BOTH directions — a new `SparkEntry.queries` entry that
  * lands without documentation fails here, and so does a documented entry
  * name that no longer exists in the catalog (a rename or removal that
  * left the doc stale). No SparkSession needed: only the registry's keys
  * are read, never the query closures. */
class CoverageSpec extends AnyFunSuite {

  private lazy val coverage = {
    val p = java.nio.file.Paths.get("COVERAGE.md")
    assert(java.nio.file.Files.exists(p), "COVERAGE.md missing from repo root")
    new String(java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8)
  }

  private lazy val catalogNames = graft.SparkEntry.queries.keySet

  test("every catalog entry is documented in COVERAGE.md") {
    val missing = catalogNames.filterNot(coverage.contains).toSeq.sorted
    assert(missing.isEmpty,
      s"catalog entries missing from COVERAGE.md (add a row): " +
        missing.mkString(", "))
  }

  test("every entry-shaped name in COVERAGE.md still exists in the catalog") {
    // entry names are q/x + digits (+ optional letter suffix) + _slug;
    // prose shorthand like "x76 idiom" (no underscore) is not matched
    val entryPat = "\\b[qx]\\d{2,3}[a-z]?_[a-z0-9_]+\\b".r
    val documented = entryPat.findAllIn(coverage).toSet
    val stale = documented.filterNot(catalogNames.contains).toSeq.sorted
    assert(stale.isEmpty,
      s"COVERAGE.md references entries that are not in the catalog " +
        s"(renamed or removed?): " + stale.mkString(", "))
  }

  test("every oracleSql key names a catalog entry and vice-versa oracle coverage is declared") {
    val sqlKeys = graft.SparkEntry.oracleSql.keySet
    val orphanSql = sqlKeys.diff(catalogNames).toSeq.sorted
    assert(orphanSql.isEmpty,
      "oracleSql keys without a matching queries entry: " +
        orphanSql.mkString(", "))
  }
}
