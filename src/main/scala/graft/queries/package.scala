package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

package object queries {
  /** Epoch seconds as BIGINT. Parquet timestamps arrive as TIMESTAMP_NTZ
    * in Spark 4 (inferTimestampNTZ); with the session tz pinned to UTC the
    * NTZ→TZ cast is the identity, so this matches DuckDB's
    * `CAST(floor(epoch(ts)) AS BIGINT)` exactly.
    */
  def epochS(c: Column): Column = c.cast("timestamp").cast("long")

  /** Exact, order-independent sum of a 2-decimal double column, in cents.
    * round() on the double is IEEE-deterministic, so Spark and DuckDB
    * produce bit-identical BIGINTs regardless of aggregation order.
    */
  def sumCents(c: Column): Column = sum(round(c * 100).cast("long"))

  /** Exact order-independent sum of arbitrary doubles via DECIMAL(38,12);
    * cast back to double at the end. DuckDB analog:
    * `CAST(sum(CAST(x AS DECIMAL(38,12))) AS DOUBLE)`.
    */
  def sumExact(c: Column): Column =
    sum(c.cast("decimal(38,12)")).cast("double")
}
