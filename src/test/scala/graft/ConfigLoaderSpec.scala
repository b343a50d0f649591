package graft

import graft.config.ConfigLoader
import graft.model.TagConfig

/** Config-plane tests: A2 per-IP grouping with defaults + station/side
  * layout extraction (Prensas.py:172-208). */
class ConfigLoaderSpec extends SparkSpec {
  import spark.implicits._

  private val tagRows = Seq(
    TagConfig("PRENSA1", "10.0.0.1", "puerto", "2025", 1),
    TagConfig("PRENSA1", "10.0.0.1", "Serie PLC", "L", 1),
    TagConfig("PRENSA1", "10.0.0.1", "Contador LH", "D3100", 1),
    TagConfig("PRENSA1", "10.0.0.1", "Tiempo Ciclo LH", "D3101", 1),
    TagConfig("PRENSA1", "10.0.0.1", "Número de Parte LH", "D3200", 4),
    TagConfig("PRENSA2", "10.0.0.1", "Contador RH", "D4100", 1),
    TagConfig("PRENSA3", "10.0.0.2", "Contador LH", "D3100", 2))

  test("ipGroups: port/serie overrides, defaults, deduped expanded addresses") {
    val g = ConfigLoader.ipGroups(spark, tagRows.toDS()).orderBy("ip").collect()
    assert(g.length == 2)
    val ip1 = g(0)
    assert(ip1.getAs[Int]("port") == 2025)        // override (Prensas.py:189-190)
    assert(ip1.getAs[String]("serie") == "L")
    assert(ip1.getSeq[String](ip1.fieldIndex("estaciones")).toSeq == Seq("PRENSA1", "PRENSA2"))
    assert(ip1.getSeq[String](ip1.fieldIndex("allAddresses")).contains("D3203")) // block expanded
    val ip2 = g(1)
    assert(ip2.getAs[Int]("port") == 1025)        // default (Prensas.py:180-182)
    assert(ip2.getAs[String]("serie") == "Q")
    assert(ip2.getSeq[String](ip2.fieldIndex("allAddresses")).toSeq == Seq("D3100", "D3101"))
  }

  test("config hash changes only when the group config changes") {
    val h1 = ConfigLoader.ipGroups(spark, tagRows.toDS())
      .filter($"ip" === "10.0.0.1").select("configHash").as[String].collect().head
    val h1b = ConfigLoader.ipGroups(spark, tagRows.toDS())
      .filter($"ip" === "10.0.0.1").select("configHash").as[String].collect().head
    assert(h1 == h1b)
    val changed = tagRows.map(t =>
      if (t.tag == "puerto") t.copy(address = "3000") else t)
    val h2 = ConfigLoader.ipGroups(spark, changed.toDS())
      .filter($"ip" === "10.0.0.1").select("configHash").as[String].collect().head
    assert(h1 != h2)
  }

  test("stationSides: layout per (station, side); counter required") {
    val sides = ConfigLoader.stationSides(spark, tagRows.toDS())
      .sortBy(c => (c.station, c.side))
    assert(sides.map(c => (c.station, c.side)) ==
      Seq(("PRENSA1", "LH"), ("PRENSA2", "RH"), ("PRENSA3", "LH")))
    val p1 = sides.head
    assert(p1.counterAddr == "D3100" && p1.tiempoAddr.contains("D3101"))
    assert(p1.partAddrs == Seq("D3200", "D3201", "D3202", "D3203"))
  }
}
