package graft.batch

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pointer-doubling ("pointer jumping") loop drivers — the distributed
  * answer to chain-walking shapes that a naive recursion schedules as
  * one join round PER HOP. Each round here substitutes every pointer
  * with its target's pointer, so the resolved depth DOUBLES per round
  * and a depth-D chain costs ceil(log2 D)+1 rounds of driver
  * scheduling instead of D. At 100 TB the driver round-trip is the
  * scarce resource (each round is a full shuffle barrier), which is
  * why both the streaming ledger's dup_of resolution
  * (stream/IngestDedup.resolveChains) and the recursive order-chain
  * walk (Relational.q37) ride this one engine.
  *
  * Reference anchor: the reference walks linked active-record chains
  * one ODBC round trip per hop (Prensas.py:285-331); this is the
  * scale-safe inversion of that loop.
  */
object PointerJump {

  /** Distributed list ranking: given one node per row with a
    * predecessor pointer (`ptrCol`, null at chain heads) and an
    * initial hop weight (`distCol`: 0 at heads, 1 elsewhere — or any
    * per-edge weight to accumulate), returns every node with `ptrCol`
    * resolved to null and `distCol` = total weight along the walk to
    * its head, plus the number of doubling rounds executed.
    *
    * Pointers may only reference ids present in the frame (within the
    * same `grp` keys); a dangling pointer is treated as a head. A
    * cycle never empties the non-null pointer set, so the loop fails
    * loudly at `maxRounds` (= depth 2^64 — unreachable by any real
    * chain) instead of spinning or silently self-pointing.
    */
  def rank(state: DataFrame, grp: Seq[String], idCol: String,
           ptrCol: String, distCol: String,
           maxRounds: Int = 64): (DataFrame, Int) = {
    var cur = state.localCheckpoint()
    var rounds = 0
    while (!cur.filter(col(ptrCol).isNotNull).isEmpty) {
      require(rounds < maxRounds,
        s"pointer-jump rank did not converge in $maxRounds rounds (cycle?)")
      val tgt = cur.select(
        grp.map(g => col(g).as(s"t_$g")) ++ Seq(
          col(idCol).as("t_id"), col(ptrCol).as("t_ptr"),
          col(distCol).as("t_dist")): _*)
      val cond = grp.map(g => cur(g) === tgt(s"t_$g"))
        .foldLeft(cur(ptrCol) === tgt("t_id"))(_ && _)
      cur = cur.join(tgt, cond, "left")
        .select(grp.map(cur(_)) ++ Seq(
          cur(idCol),
          tgt("t_ptr").as(ptrCol),
          (cur(distCol) + coalesce(tgt("t_dist"), lit(0L))).as(distCol)): _*)
        .localCheckpoint()
      rounds += 1
    }
    (cur, rounds)
  }

  /** Terminal-pointer resolution: follow `ptrCol` through the frame
    * until it names a row outside the frame or a row whose own pointer
    * is null — i.e. rewrite every pointer to the END of its chain,
    * keeping each row's `carry` columns untouched. This is the
    * streaming ledger's dup_of shape: a rejected doc may point at a
    * batch-mate that itself lost a later stage, and the ledger must
    * name the doc the USER can actually find.
    *
    * Cycles (corrupted input — the callers' chains are strictly
    * id-decreasing by construction) fail loudly: odd cycles never
    * reach the fixpoint, and even cycles collapse to self-pointing
    * rows in one round, which the post-loop guard rejects.
    */
  def resolveTerminal(state: DataFrame, idCol: String, ptrCol: String,
                      carry: Seq[String], what: String,
                      maxRounds: Int = 40): DataFrame = {
    var cur = state
    var done = false
    var rounds = 0
    while (!done && rounds < maxRounds) {
      val tgt = cur.select(col(idCol).as("t_id"), col(ptrCol).as("t_ptr"))
      val next = cur.join(tgt, cur(ptrCol) === tgt("t_id"), "left")
        .select(Seq(cur(idCol),
          coalesce(col("t_ptr"), cur(ptrCol)).as(ptrCol)) ++
          carry.map(cur(_)): _*)
        .localCheckpoint()
      done = next.select(col(idCol), col(ptrCol).as("new_p"))
        .join(cur.select(col(idCol), col(ptrCol).as("old_p")), idCol)
        .filter(!(col("new_p") <=> col("old_p"))).isEmpty
      cur = next
      rounds += 1
    }
    require(done, s"$what: chain resolution did not converge")
    require(cur.filter(col(ptrCol) === col(idCol)).isEmpty,
      s"$what: chain cycled (corrupted input)")
    cur
  }
}
