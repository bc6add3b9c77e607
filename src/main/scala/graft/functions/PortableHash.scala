package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic hashing.
  *
  * The dedup/fingerprint operators need hash functions that an external
  * ANSI-SQL oracle (DuckDB) can reproduce bit-for-bit — `xxhash64` is
  * Spark-private, but `md5` is universal. A hex prefix of the md5 digest
  * reinterpreted as an integer gives a portable n-bit hash:
  *
  *   Spark:  CAST(conv(substring(md5(x), 1, k), 16, 10) AS BIGINT)
  *   DuckDB: CAST(concat('0x', substr(md5(x), 1, k)) AS BIGINT)
  *
  * k ≤ 15 hex chars keeps the value < 2^60, safely inside a signed long.
  * On top of the base hash, `affineFamily` derives cheap independent
  * hash functions h_i(x) = (a_i·H(x) + b_i) mod P (the classic universal
  * family) — one md5 per input, i arithmetic ops per family member.
  */
object PortableHash {

  /** Large Mersenne prime 2^31 − 1 used as the family modulus. */
  val P: Long = 2147483647L

  /** First `hexChars` hex chars of md5 as a positive long (4 bits each). */
  def md5Long(c: Column, hexChars: Int): Column = {
    require(hexChars >= 1 && hexChars <= 15, "1..15 hex chars fit a long")
    conv(substring(md5(c), 1, hexChars), 16, 10).cast("long")
  }

  /** 28-bit base hash: small enough that a_i·H never overflows a long. */
  def base28(c: Column): Column = md5Long(c, 7)

  /** Family parameters (a_i, b_i) for member i — pure arithmetic so the
    * oracle SQL can regenerate them from `i` alone. a_i·2^28 < 2^59.
    * The step constants are public so the native one-pass
    * `minhash_signature` expression derives the SAME family (one source
    * of truth — its parity spec would catch a desync, but it shouldn't
    * have to). */
  val FamilyAStep: Long = 1000003L
  val FamilyBStep: Long = 666019L
  def familyA(i: Int): Long = FamilyAStep * (i + 1)
  def familyB(i: Int): Long = FamilyBStep * (i + 1)

  /** h_i(base) = (a_i·base + b_i) mod P over a [[base28]] column. */
  def affineFamily(base: Column, i: Int): Column =
    pmod(lit(familyA(i)) * base + lit(familyB(i)), lit(P))
}
