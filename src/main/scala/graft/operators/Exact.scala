package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Oracle-exact numeric helpers.
  *
  * Double sums are order-dependent (Spark's shuffle order differs from
  * DuckDB's scan order), so any `sum(double)` can flip a hash compare in the
  * last ulps. Routing money math through DECIMAL(18,4) makes the sum exact
  * and bit-identical on both engines; the final cast back to double is exact
  * while |value| < 2^53 / 10^scale.
  */
object Exact {
  /** Exact sum: sum(cast(x as decimal(18,4))) cast back to double. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast("double")

  /** Exact-numerator average rounded to 6 dp (single double division). */
  def davg(c: Column): Column =
    round(sum(c.cast(DecimalType(18, 4))).cast("double") / count(lit(1)), 6)

  /** DuckDB-side equivalents, kept adjacent so they never drift. */
  def sqlDsum(x: String): String =
    s"CAST(SUM(CAST($x AS DECIMAL(18,4))) AS DOUBLE)"
  def sqlDavg(x: String): String =
    s"ROUND(CAST(SUM(CAST($x AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6)"
}
