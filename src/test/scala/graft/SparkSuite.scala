package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession per suite (UTC, small shuffle width). */
trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSuite.session

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}

object SparkSuite {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** The reference's canonical 6-column fixture (FIXTURES.md §1,
  * /root/reference/test/conftest.py:57-128): UTF-8 text with an embedded
  * newline must survive every round-trip.
  */
object Fixture {
  final case class SrcRow(id: Int, value: Double, simple_text: String,
      utf8_text: String, day: java.sql.Date, date_time: java.sql.Timestamp)

  val rows: Seq[SrcRow] = Seq(
    SrcRow(1, 1.234, "text", "Öæ°\nz", java.sql.Date.valueOf("2018-12-07"),
      java.sql.Timestamp.valueOf("2018-12-07 13:01:59")),
    SrcRow(2, 2.234, "text", "Öæ°\nz", java.sql.Date.valueOf("2018-12-08"),
      java.sql.Timestamp.valueOf("2018-12-08 13:01:59")),
    SrcRow(3, 2.234, "text", "Öæ°\nz", java.sql.Date.valueOf("2018-12-09"),
      java.sql.Timestamp.valueOf("2018-12-09 13:01:59")))
}
