package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** THE cross-engine deterministic aggregate convention — single owner
  * of both the Column form and the DuckDB SQL text, so the two can
  * never drift apart (every operator module aggregates money/quantity
  * through these).
  *
  * Doubles summed in parallel are partition-order-dependent, so every
  * sum/avg:
  *   1. casts each row value to DOUBLE first — NEVER float→decimal
  *      directly: DuckDB's float→decimal scales in float32 and
  *      fabricates digits (e.g. 5100349.0f → 5100349.0304);
  *   2. casts to DECIMAL(18,4) (exact — source values carry ≤4 decimal
  *      digits) and SUMs in decimal: exact, associative, order-proof;
  *   3. casts the final scalar back to DOUBLE: one correctly-rounded
  *      conversion, identical in the JVM and DuckDB.
  * Averages divide the exact-decimal sum by the count in one IEEE
  * double division.
  */
object DecimalSums {

  val D: DecimalType = DecimalType(18, 4)

  /** Row value under the convention (double-first, then decimal). */
  def dec(c: Column): Column = c.cast(DoubleType).cast(D)

  /** Exact decimal sum surfaced as double. */
  def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)

  /** avg = exact-decimal sum / count of non-null inputs. */
  def davg(c: Column): Column =
    sum(dec(c)).cast(DoubleType) / count(c).cast(DoubleType)

  /** Wide-moment convention for Σx², Σxy-style sums whose row values
    * are PRODUCTS of (18,4) quantities: decimal(38,8) holds them
    * exactly and the sum stays order-proof. Combine moments in DOUBLE
    * (decimal×decimal at width 38 overflows DuckDB's multiply), and
    * convert each moment via [[asDouble]]. */
  val M: DecimalType = DecimalType(38, 8)

  def mdec(c: Column): Column = c.cast(DoubleType).cast(M)

  /** Decimal → double THROUGH A STRING. Once a decimal's unscaled value
    * passes 2^53, DuckDB's direct cast ((double)unscaled / 10^scale)
    * rounds twice and drifts an ulp from the JVM's conversion;
    * decimal→string is exact in both engines and string→double is
    * correctly rounded in both, so the hop makes the doubles
    * bit-identical. */
  def asDouble(c: Column): Column =
    c.cast(org.apache.spark.sql.types.StringType).cast(DoubleType)

  /** DuckDB text of [[dec]]. */
  def sqlDec(e: String): String =
    s"CAST(CAST(($e) AS DOUBLE) AS DECIMAL(18,4))"

  /** DuckDB text of [[mdec]]. */
  def sqlMdec(e: String): String =
    s"CAST(CAST(($e) AS DOUBLE) AS DECIMAL(38,8))"

  /** DuckDB text of [[asDouble]]. */
  def sqlAsDouble(e: String): String =
    s"CAST(CAST(($e) AS VARCHAR) AS DOUBLE)"

  /** DuckDB text of [[dsum]]. */
  def sqlDsum(e: String): String =
    s"CAST(SUM(${sqlDec(e)}) AS DOUBLE)"

  /** DuckDB text of [[davg]]. */
  def sqlDavg(e: String): String =
    s"CAST(SUM(${sqlDec(e)}) AS DOUBLE) / CAST(COUNT($e) AS DOUBLE)"
}
