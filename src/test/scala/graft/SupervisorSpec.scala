package graft

import scala.collection.mutable

import graft.stream.Supervisor

/** ST8 control-plane reconciliation (md5-diff start/restart/stop,
  * Prensas.py:861-947) + the liveness-restart improvement. */
class SupervisorSpec extends SparkSpec {

  private class Probe {
    val log = mutable.Buffer[String]()
    val dead = mutable.Set[Int]()
    private var nextId = 0
    val sup = new Supervisor[Int](
      start = (k, _) => { log += s"start:$k"; nextId += 1; nextId },
      stop = h => log += s"stop:$h",
      isAlive = h => !dead(h))
  }

  test("start new, restart changed, stop removed") {
    val p = new Probe
    assert(p.sup.reconcile(Map("ip1" -> "h1", "ip2" -> "h2"))._1.toSet == Set("ip1", "ip2"))
    // unchanged → no-op
    assert(p.sup.reconcile(Map("ip1" -> "h1", "ip2" -> "h2")) == ((Nil, Nil, Nil)))
    // ip2 config changed; ip1 removed; ip3 added
    val (st, re, sp) = p.sup.reconcile(Map("ip2" -> "h2b", "ip3" -> "h3"))
    assert(st == Seq("ip3") && re == Seq("ip2") && sp == Seq("ip1"))
    assert(p.sup.runningKeys == Set("ip2", "ip3"))
  }

  test("dead query restarted even with unchanged config (liveness fix)") {
    val p = new Probe
    p.sup.reconcile(Map("ip1" -> "h1"))
    p.dead += 1 // the first handle dies
    val (_, restarted, _) = p.sup.reconcile(Map("ip1" -> "h1"))
    assert(restarted == Seq("ip1"))
  }

  test("desired state reads through a Connections ref; hash reacts to config edits") {
    import graft.config.TableRef
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sup_cfg").toString
    def write(rows: Seq[(String, String, String, String, Int)]): Unit =
      rows.toDF("work_center", "ip", "tag", "address", "block_len")
        .write.mode("overwrite").parquet(s"$dir/tags")
    val base = Seq(
      ("PRENSA1", "10.0.0.1", "Contador LH", "D100", 1),
      ("PRENSA2", "10.0.0.2", "Contador LH", "D300", 1))
    write(base)
    val ref = TableRef("parquet", s"$dir/tags")
    val d1 = Supervisor.desiredFromConfig(spark, ref)
    assert(d1.keySet == Set("10.0.0.1", "10.0.0.2"))
    // an address edit on one group changes only that group's hash —
    // exactly the diff the reconcile loop keys restarts on
    write(base.updated(1, ("PRENSA2", "10.0.0.2", "Contador LH", "D999", 1)))
    val d2 = Supervisor.desiredFromConfig(spark, ref)
    assert(d2("10.0.0.1") == d1("10.0.0.1"))
    assert(d2("10.0.0.2") != d1("10.0.0.2"))
  }
}
