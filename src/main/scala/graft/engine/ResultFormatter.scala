package graft.engine

import org.apache.spark.sql.DataFrame

/** The reference's sink: line 1 is the comma-space-joined header, then
  * one comma-space-joined row per line (printOutput at
  * /root/reference/sqlengine.py:237-241, header at :350/:361/:407);
  * "No Results Found" when the result is empty (:255-256).
  *
  * Collecting to the driver is the point here — this formatter exists for
  * the CLI tail of a query, after limits/aggregation, mirroring the
  * reference contract. It is not a data-scale sink (those are parquet
  * writes on the DataFrame itself).
  */
object ResultFormatter {

  def render(df: DataFrame): String = {
    val header = df.columns.mkString(", ")
    val rows = df.collect()
    if (rows.isEmpty) s"$header\nNo Results Found"
    else {
      val body = rows.map(_.toSeq.map {
        case null => "NULL"
        case v => v.toString
      }.mkString(", "))
      (header +: body).mkString("\n")
    }
  }
}
