package graft.engine

import scala.io.Source

import org.apache.spark.sql.types._

/** The reference's external catalog: `metadata.txt` blocks of
  * `<begin_table>` / table name / one attribute per line / `<end_table>`
  * (format parsed at /root/reference/sqlengine.py:72-90; spec in the
  * assignment PDF p.1 §Dataset.3). All columns are integers by mandate,
  * so every attribute maps to LongType.
  */
object Catalog {

  /** Parse a metadata.txt into table -> schema, preserving attribute
    * order (the reference keys projection and star expansion off it).
    */
  def parse(lines: Iterator[String]): Map[String, StructType] = {
    val out = scala.collection.mutable.LinkedHashMap[String, StructType]()
    var table: Option[String] = None
    var cols = Vector.empty[String]
    lines.map(_.trim).filter(_.nonEmpty).foreach {
      case "<begin_table>" => table = None; cols = Vector.empty
      case "<end_table>" =>
        table.foreach { t =>
          out(t) = StructType(cols.map(c => StructField(c, LongType)))
        }
      case line =>
        if (table.isEmpty) table = Some(line) else cols :+= line
    }
    out.toMap
  }

  def load(metadataPath: String): Map[String, StructType] = {
    val src = Source.fromFile(metadataPath)
    try parse(src.getLines()) finally src.close()
  }
}
