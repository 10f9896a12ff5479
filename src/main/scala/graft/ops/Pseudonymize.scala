package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted-hash pseudonymization — the release-time governance twin of
  * [[KAnonymity]] and the purge path: replace direct identifiers with
  * deterministic pseudonyms so analytics and JOINS keep working on the
  * released data while the raw identifier never leaves the boundary.
  *
  *  - Deterministic per salt: the same subject gets the same pseudonym in
  *    EVERY table released under that salt — referential integrity
  *    survives pseudonymization (spec-pinned join equivalence).
  *  - Rotating the salt breaks linkage across releases (the
  *    re-identification containment GDPR-style pseudonymization asks
  *    for); dropping the salt is the destruction step.
  *  - Injective in practice: 16 hex chars = 64 bits, collision odds
  *    ~n²/2⁶⁵ (≈ 10⁻⁹ at a billion subjects); widen `hexLen` if that is
  *    not acceptable.
  *
  * Row-local codegen expression (one SHA-256 per row, zero shuffles) —
  * scoring a 100 TB release is a projection. Pair with a secret salt
  * from the deployment's secret store; a public salt is just obfuscation.
  */
object Pseudonymize {

  /** The pseudonym expression: first `hexLen` hex chars of
    * SHA-256("salt:key"). */
  def pseudonym(key: Column, salt: String, hexLen: Int = 16): Column = {
    require(hexLen >= 8 && hexLen <= 64, "hexLen must be in [8, 64]")
    substring(sha2(concat(lit(s"$salt:"), key.cast("string")), 256), 1, hexLen)
  }

  /** Replace `keyCol` with its pseudonym in place (same column name, so
    * downstream joins on the key column are untouched). */
  def table(df: DataFrame, keyCol: String, salt: String, hexLen: Int = 16): DataFrame =
    df.withColumn(keyCol, pseudonym(col(keyCol), salt, hexLen))
}
