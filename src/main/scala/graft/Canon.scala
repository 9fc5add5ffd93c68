package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Determinism layer (SURVEY §7.3) — the reason every oracle-checked
  * query hash-matches DuckDB bit-for-bit:
  *
  *  - `round()` differs between engines on halfway inputs (Spark uses
  *    BigDecimal HALF_UP on the exact binary value; DuckDB multiplies
  *    and uses the FPU rounding mode). The fixture's money columns are
  *    exactly 2dp, so products land ON 4/6-dp grid points and halfway
  *    cases are common, not rare. Fix: round manually as
  *    `floor(x*10^k + 0.5)/10^k` — pure IEEE ops, bit-identical in any
  *    engine given an identical input double.
  *  - double SUMS are order-dependent, and shuffle arrival order makes
  *    them nondeterministic across runs too. Fix: sum money in DECIMAL
  *    (exact, associative), cast the exact result to double at the end.
  *    Integer-valued doubles (l_quantity) sum exactly in binary and
  *    need no decimal detour.
  *
  * The same helpers keep results stable at cluster scale, where
  * partial-aggregation merge order is even less predictable.
  */
object Canon {
  /** Deterministic half-up rounding to `k` decimals; identical in any
    * IEEE-754 engine for identical input (unlike native round()). */
  def rk(c: Column, k: Int): Column = {
    val p = math.pow(10.0, k.toDouble)
    floor(c * p + 0.5) / p
  }
  def r4(c: Column): Column = rk(c, 4)

  /** Exact (associative, run-deterministic) sum of a `scale`-dp money
    * column, emitted as double. */
  def sumDec(c: Column, scale: Int): Column =
    sum(c.cast(DecimalType(28, scale))).cast("double")

  /** Timestamp → canonical string, second precision (oracle: strftime
    * '%Y-%m-%d %H:%M:%S'). Sidesteps parquet timestamp-encoding drift. */
  def tsStr(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Timestamp → canonical string with microseconds (oracle strftime
    * '%f' always prints 6 fraction digits). */
  def tsStrMicros(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")

  /** DuckDB-side spellings of the same idioms, for oracle SQL. */
  object sql {
    def rk(x: String, k: Int): String = {
      val p = "1" + ("0" * k)
      s"floor(($x)*$p + 0.5)/$p"
    }
    def r4(x: String): String = rk(x, 4)
    def sumDec(x: String, scale: Int): String =
      s"CAST(sum(CAST($x AS DECIMAL(28,$scale))) AS DOUBLE)"
    /** DuckDB spelling of Spark's `conv(substring(md5(s),1,15),16,10)`:
      * the first 15 hex chars of md5(`x`) as a 60-bit BIGINT (DuckDB
      * has no base-conv builtin, so the hex digits expand positionally;
      * `h` must be a column holding md5($x) — see the checksum keys). */
    def hex15ToLong(h: String): String = (1 to 15).map { i =>
      val p = math.pow(16.0, (15 - i).toDouble).toLong
      s"(strpos('0123456789abcdef', substr($h, $i, 1)) - 1) * $p"
    }.mkString("(", " + ", ")")
  }
}
