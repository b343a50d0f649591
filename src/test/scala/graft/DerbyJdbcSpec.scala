package graft

import java.nio.file.Files
import java.sql.{DriverManager, Timestamp}

import graft.config.{ConfigLoader, Connections, TableRef}
import graft.stream.Sinks

/** The JDBC seam, exercised for real against embedded Derby (the one
  * database engine on the provided classpath): the S1 config scan
  * arrives via spark.read.format("jdbc") and the K1 record upsert
  * lands via executor-side batched UPDATE/INSERT — the two surfaces
  * the reference drives over ODBC (Prensas.py:93-112, 166-169,
  * 315-341). Against SQL Server / AS400 only the URL, driver, and
  * credentials in TableRef/connProps change. */
class DerbyJdbcSpec extends SparkSpec {
  import spark.implicits._

  private val driver = "org.apache.derby.jdbc.EmbeddedDriver"

  test("S1 config scan through spark.read jdbc → ipGroups") {
    val dir = Files.createTempDirectory("graft_derby_cfg").toString
    val url = s"jdbc:derby:$dir/db;create=true"
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate("CREATE TABLE tags (work_center VARCHAR(40), ip VARCHAR(20), " +
        "tag VARCHAR(60), address VARCHAR(20), block_len INT)")
      val ins = conn.prepareStatement("INSERT INTO tags VALUES (?, ?, ?, ?, ?)")
      Seq(
        ("PRENSA1", "10.0.0.1", "Contador LH", "D100", 1),
        ("PRENSA1", "10.0.0.1", "Número de parte LH", "D200", 3),
        ("PRENSA1", "10.0.0.1", "puerto", "1026", 1)
      ).foreach { case (wc, ip, tag, addr, len) =>
        ins.setString(1, wc); ins.setString(2, ip); ins.setString(3, tag)
        ins.setString(4, addr); ins.setInt(5, len); ins.executeUpdate()
      }
    } finally conn.close()

    val tags = Connections.tags(spark, TableRef("jdbc", url,
      Map("dbtable" -> "tags", "driver" -> driver)))
    val g = ConfigLoader.ipGroups(spark, tags).collect()
    assert(g.length == 1)
    val row = g.head
    assert(row.getAs[Int]("port") == 1026)
    assert(row.getSeq[String](row.fieldIndex("estaciones")).toSeq == Seq("PRENSA1"))
    assert(row.getSeq[String](row.fieldIndex("allAddresses")).toSeq ==
      Seq("D100", "D200", "D201", "D202"))
  }

  test("K1 record upsert over JDBC: newest version per key wins") {
    val dir = Files.createTempDirectory("graft_derby_up").toString
    val url = s"jdbc:derby:$dir/db;create=true"
    val conn = DriverManager.getConnection(url)
    try {
      conn.createStatement().executeUpdate("CREATE TABLE production_records (" +
        "record_id VARCHAR(80), produced BIGINT, status_id INT, ts TIMESTAMP)")
    } finally conn.close()

    def ts(s: String) = Timestamp.valueOf(s)
    val keys = Seq("record_id"); val version = Seq("ts")
    // batch 1: two inserts
    Sinks.upsertJdbc(Seq(
      ("r1", 10L, 7, ts("2024-03-05 09:00:00")),
      ("r2", 5L, 3, ts("2024-03-05 09:00:00"))
    ).toDF("record_id", "produced", "status_id", "ts"), url, "production_records", keys, version)
    // batch 2: r1 updated twice in-batch (newest must win) + r3 insert
    Sinks.upsertJdbc(Seq(
      ("r1", 15L, 7, ts("2024-03-05 09:00:05")),
      ("r1", 20L, 7, ts("2024-03-05 09:00:09")),
      ("r3", 1L, 3, ts("2024-03-05 09:00:07"))
    ).toDF("record_id", "produced", "status_id", "ts"), url, "production_records", keys, version)

    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "production_records").option("driver", driver)
      .load().select("record_id", "produced").as[(String, Long)].collect().sortBy(_._1)
    assert(back.toSeq == Seq(("r1", 20L), ("r2", 5L), ("r3", 1L)),
      s"unexpected table state: ${back.mkString(", ")}")
  }

  test("K1 upsert rolls back the whole partition batch on a constraint violation") {
    val dir = Files.createTempDirectory("graft_derby_rb").toString
    val url = s"jdbc:derby:$dir/db;create=true"
    val conn = DriverManager.getConnection(url)
    try {
      conn.createStatement().executeUpdate("CREATE TABLE production_records (" +
        "record_id VARCHAR(80), produced BIGINT CHECK (produced >= 0), " +
        "status_id INT, ts TIMESTAMP)")
    } finally conn.close()

    def ts(s: String) = Timestamp.valueOf(s)
    val keys = Seq("record_id"); val version = Seq("ts")
    Sinks.upsertJdbc(Seq(("r1", 10L, 7, ts("2024-03-05 09:00:00")))
      .toDF("record_id", "produced", "status_id", "ts"),
      url, "production_records", keys, version)
    // one partition carrying a valid UPDATE and a CHECK-violating INSERT:
    // the violation must fail the call AND take the already-executed
    // UPDATE down with it — not leave half the batch committed
    intercept[Exception] {
      Sinks.upsertJdbc(Seq(
        ("r1", 99L, 7, ts("2024-03-05 09:00:05")),
        ("r9", -5L, 3, ts("2024-03-05 09:00:06"))
      ).toDF("record_id", "produced", "status_id", "ts").coalesce(1),
        url, "production_records", keys, version)
    }
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "production_records").option("driver", driver)
      .load().select("record_id", "produced").as[(String, Long)].collect().sortBy(_._1)
    assert(back.toSeq == Seq(("r1", 10L)),
      s"rollback must leave the pre-batch state, got: ${back.mkString(", ")}")
  }
}
