package graft

import org.scalatest.funsuite.AnyFunSuite

/** Static lint over every DuckDB oracle (VERDICT r7 #2): DuckDB widens
  * `sum(<integer>)` to HUGEINT, which the driver's compare layer renders
  * as float64 ("1540.0") against Spark's int64 ("1540") — identical
  * values, mismatched hash. That class caused the r5 q91 and r7 q107 red
  * rows. The precise detector (DESCRIBE + HUGEINT/DECIMAL column scan)
  * lives in tools/oracle_check.py where DuckDB is available; this spec is
  * the in-suite tripwire: any NEW `sum(...) AS alias` in an oracle must
  * either be visibly widened/cast on the same line (CAST / round / floor
  * — all emit BIGINT-or-DOUBLE, never HUGEINT) or be reviewed and added
  * to the allowlist below with the reason it is safe.
  */
class OracleLintSpec extends AnyFunSuite {

  /** Reviewed-safe `sum(...) AS alias` occurrences: (query, alias) with
    * why DuckDB does NOT produce a HUGEINT/DECIMAL output column for it.
    */
  private val allowlisted: Set[(String, String)] = Set(
    // sum over DOUBLE operands stays DOUBLE
    ("q107_mixture_plan", "sw"),   // w is CAST(.. AS DOUBLE)
    ("q121_mixture_sample", "sw"), // same w as q107 (CAST(.. AS DOUBLE))
    ("q84_cte", "r"),            // l_extendedprice/l_discount are DOUBLE
    // integer sums confined to a CTE and consumed sign-only / cast later
    // — never an output column (DESCRIBE lint confirms)
    ("q42_dedup_simhash", "sm"),
    ("q45_simhash_hamming", "sm")
  )

  private val SumAs = """(?i)\bsum\s*\(.*?\bAS\s+(\w+)""".r

  test("every integer-aggregate oracle column is explicitly cast") {
    val bad = for {
      (name, sql) <- SparkEntry.oracleSql.toSeq
      line <- sql.split('\n')
      if line.matches("""(?i).*\bsum\s*\(.*""")
      if !line.toUpperCase.contains("CAST")
      if !line.toLowerCase.contains("round(")
      if !line.toLowerCase.contains("floor(")
      if !line.toUpperCase.contains(" OVER ")
      m <- SumAs.findFirstMatchIn(line)
      alias = m.group(1)
      if alias.toUpperCase != "DOUBLE" // CAST(sum .. AS DOUBLE) shapes
      if !allowlisted((name, alias))
    } yield s"$name: `${line.trim}` — bare sum() output column `$alias`"
    assert(bad.isEmpty,
      "uncast integer aggregates in oracle SQL (DuckDB HUGEINT renders " +
        "as float -> driver hash mismatch):\n" + bad.mkString("\n"))
  }

  test("list_aggregate 'sum' oracle columns are explicitly cast") {
    val bad = for {
      (name, sql) <- SparkEntry.oracleSql.toSeq
      line <- sql.split('\n')
      if line.contains("list_aggregate") && line.contains("'sum'")
      if !line.toUpperCase.contains("CAST")
    } yield s"$name: `${line.trim}`"
    assert(bad.isEmpty,
      "uncast list_aggregate('sum') oracle columns:\n" + bad.mkString("\n"))
  }
}
