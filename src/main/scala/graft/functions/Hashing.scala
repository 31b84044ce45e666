package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic, engine-portable hashing.
  *
  * Every hash here is defined so the EXACT same integer is computable in
  * ANSI-ish SQL on other engines (the DuckDB oracle): a 60-bit integer taken
  * from the md5 hex digest. That gives the dedup/LSH operators
  * (graft.text.TextOps) a cross-engine-verifiable hash, unlike
  * engine-internal `hash()`/`xxhash64`.
  *
  * All arithmetic stays below 2^63 (60-bit hash, modulus ~2^30, multipliers
  * < 2^17) so engines that raise on 64-bit overflow (DuckDB) agree with
  * engines that wrap (JVM).
  */
object Hashing {

  /** Modulus for universal-hash families: a large prime that keeps
    * `a * (h mod P) + b` comfortably inside Long range.
    */
  val P: Long = 1000000007L

  /** First 15 hex chars (60 bits) of md5 as a non-negative Long. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** [[hash60]] reduced mod [[P]] — input to universal hash families. */
  def hash60Mod(c: Column): Column = hash60(c) % P

  /** DuckDB SQL for [[hash60]] of expression `e`. */
  def hash60Sql(e: String): String =
    s"CAST(concat('0x', substr(md5($e), 1, 15)) AS BIGINT)"

  /** DuckDB SQL for [[hash60Mod]]. */
  def hash60ModSql(e: String): String = s"(${hash60Sql(e)} % $P)"

  /** Fixed universal-hash multipliers/offsets for MinHash signatures —
    * arbitrary but FROZEN constants; the DuckDB oracle embeds the same
    * numbers (SURVEY.md §7 north-star dedup).
    */
  val MinhashA: Seq[Long] = Seq(7L, 31L, 131L, 523L, 2003L, 8009L, 32003L, 104729L)
  val MinhashB: Seq[Long] = Seq(3L, 17L, 89L, 331L, 1409L, 5641L, 23011L, 90001L)
}
