package graft.stream

import scala.collection.mutable

/** ST8 control plane (Prensas.py:835-947): reconcile running streaming
  * queries against the current config snapshot using per-group config
  * hashes (md5, F10) — start new groups, restart changed ones, stop
  * removed ones.
  *
  * Improvement over the reference (SURVEY §7.5): a group whose query
  * DIED is restarted on the next reconcile even if its config hash is
  * unchanged — the reference only restarts on config change
  * (liveness gap, Prensas.py:486-488).
  */
class Supervisor[H](start: (String, String) => H, stop: H => Unit,
    isAlive: H => Boolean = (_: H) => true) {

  private case class Running(hash: String, handle: H)
  private val running = mutable.Map[String, Running]()

  /** Reconcile against the desired (groupKey → configHash) snapshot.
    * Returns (started, restarted, stopped) group keys. */
  def reconcile(desired: Map[String, String]): (Seq[String], Seq[String], Seq[String]) = {
    val started = Seq.newBuilder[String]
    val restarted = Seq.newBuilder[String]
    val stopped = Seq.newBuilder[String]

    for ((key, r) <- running.toSeq if !desired.contains(key)) {
      stop(r.handle); running.remove(key); stopped += key
    }
    for ((key, hash) <- desired) running.get(key) match {
      case None =>
        running(key) = Running(hash, start(key, hash)); started += key
      case Some(r) if r.hash != hash =>
        stop(r.handle)
        running(key) = Running(hash, start(key, hash)); restarted += key
      case Some(r) if !isAlive(r.handle) => // liveness restart (our addition)
        running(key) = Running(hash, start(key, hash)); restarted += key
      case _ => ()
    }
    (started.result(), restarted.result(), stopped.result())
  }

  def runningKeys: Set[String] = running.keySet.toSet

  def shutdown(): Unit = {
    running.values.foreach(r => stop(r.handle))
    running.clear()
  }
}

object Supervisor {
  /** Desired-state snapshot for [[Supervisor.reconcile]]: ip →
    * configHash, read through any [[graft.config.Connections]] ref —
    * the parquet/csv fixture or the reference's JDBC config database
    * (Prensas.py:93-112 → 849 hash compare). The collect is
    * config-plane-sized (one row per PLC group), not data-sized. */
  def desiredFromConfig(spark: org.apache.spark.sql.SparkSession,
      ref: graft.config.TableRef): Map[String, String] =
    graft.config.ConfigLoader.ipGroups(spark, graft.config.Connections.tags(spark, ref))
      .select("ip", "configHash").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
}
