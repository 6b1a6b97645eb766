package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Excel

/** S4 + Excel sink: dependency-free XLSX round trip (zip-of-XML OOXML
  * subset the reference exercises: header row, string/number cells,
  * sheet-per-source workbooks). */
class ExcelSpec extends SparkTestBase {
  import spark.implicits._

  test("single-sheet round trip preserves values, nulls, and specials") {
    val path = Files.createTempDirectory("graft_xlsx").toString + "/t.xlsx"
    val df = Seq(
      ("doc & <1>", Some(42.5), "ok"),
      ("line\nbreak", None, "x\"y\""),
      ("plain", Some(-7.0), null)
    ).toDF("title", "score", "note")
    Excel.writeXlsx(df, path)
    val back = Excel.readXlsx(spark, path)
    assert(back.columns.toSeq === Seq("title", "score", "note", "__sheet"))
    val rows = back.orderBy("title").collect()
    assert(rows.length === 3)
    val byTitle = rows.map(r => r.getString(0) -> r).toMap
    assert(byTitle("doc & <1>").getString(1) === "42.5")
    assert(byTitle("doc & <1>").getString(2) === "ok")
    assert(byTitle("line\nbreak").isNullAt(1)) // null cell skipped -> null
    assert(byTitle("line\nbreak").getString(2) === "x\"y\"")
    assert(byTitle("plain").isNullAt(2))
    assert(rows.forall(_.getString(3) === "data"))
  }

  test("sheet-per-source workbook: sheetBy partitions rows, read-back " +
    "restores the partition column as __sheet") {
    val path = Files.createTempDirectory("graft_xlsx").toString + "/s.xlsx"
    val df = Seq(
      ("pubmed", "t1", 2021L), ("wos", "t2", 2022L),
      ("pubmed", "t3", 2023L), ("sciencedirect", "t4", 2024L)
    ).toDF("source_type", "title", "year")
    Excel.writeXlsx(df, path, sheetBy = Some("source_type"))
    val back = Excel.readXlsx(spark, path)
    // sheet column replaces the partition column (sheet ≙ partition)
    assert(back.columns.toSeq === Seq("title", "year", "__sheet"))
    val got = back.select(col("__sheet"), col("title"), col("year"))
      .as[(String, String, String)].collect().toSet
    assert(got === Set(
      ("pubmed", "t1", "2021"), ("pubmed", "t3", "2023"),
      ("wos", "t2", "2022"), ("sciencedirect", "t4", "2024")))
    // sheets sorted by name in the workbook
    assert(back.select("__sheet").distinct().as[String].collect().sorted
      === Array("pubmed", "sciencedirect", "wos"))
  }

  test("wosExcel loads a WOS-shaped workbook (pd.read_excel parity: " +
    "header row + string records)") {
    val path = Files.createTempDirectory("graft_xlsx").toString + "/w.xlsx"
    val df = Seq(
      ("Article Title A", "Smith, J", "10.1000/a1", "2021"),
      ("Article Title B", "Doe, A; Roe, B", "10.1000/b2", "2022")
    ).toDF("Article Title", "Authors", "DOI", "Publication Year")
    Excel.writeXlsx(df, path)
    val wos = Excel.wosExcel(spark, path)
    assert(wos.count() === 2)
    assert(wos.columns.toSeq ===
      Seq("Article Title", "Authors", "DOI", "Publication Year"))
    assert(wos.where(col("DOI") === "10.1000/a1").count() === 1)
  }

  test("row cap guards the driver-side collect") {
    val big = spark.range(0, 10).toDF("id") // tiny, but exercise the limit path
    val path = Files.createTempDirectory("graft_xlsx").toString + "/c.xlsx"
    Excel.writeXlsx(big, path) // well under cap: fine
    assert(Excel.readXlsx(spark, path).count() === 10)
  }
}
