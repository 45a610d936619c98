package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Driver-side iterate-to-fixpoint combinator: the ONE place the engine
  * encodes the discipline every iterative operator needs (persist each
  * generation, truncate lineage on a cadence, keep exactly the last two
  * generations, one materializing action per round). Users:
  * [[Heroic.fixedPoint]] (R8 heroic-score iteration) and
  * [[graft.queries.TextOps.connectedComponents]] (q37 dup clusters);
  * the next iterative operator gets the discipline for free instead of
  * re-deriving it.
  *
  * Scale posture: each round is whatever plan `step` declares (the
  * combinator adds no shuffle of its own); the serial cost it does add
  * is exactly ONE action per round — `measure` doubles as the round's
  * materializing action AND the convergence check, so there is no
  * separate "did anything change" pass over the generation. On a
  * 1000-executor cluster every action is a full cluster barrier, so
  * rounds — not per-round bytes — are what the caller must minimize
  * (cf. the union-find pre-pass that keeps q37 at ~2 rounds).
  */
object Iterate {

  /** Last two generations (both still persisted — R8 emits the
    * second-to-last table) and the number of rounds executed. `prev` is
    * null only if zero rounds ran (maxRounds == 0). */
  final case class Fix(prev: DataFrame, cur: DataFrame, rounds: Int)

  /** Run `step` from `init` until `measure` reports convergence or
    * `maxRounds` is hit, then `extra` more rounds.
    *
    *  - `init` must already be persisted (or be cheap): round 1 reads it
    *    through both `step` and `measure`; it is unpersisted when
    *    generation 2 lands (the caller may also unpersist it later —
    *    double unpersist is a no-op).
    *  - every generation is persisted at `storage`; every
    *    `checkpointEvery`-th is an EAGER localCheckpoint instead, so the
    *    plan does not grow by one join per round and recomputation after
    *    block loss stays linear in rounds-since-checkpoint.
    *  - `measure(cur, next)` MUST run an action on `next` — it is the
    *    round's single materializing action — and returns whether the
    *    fixpoint is reached. It also runs on the `extra` rounds (verdict
    *    ignored) so side effects like an MSE trajectory stay uniform.
    */
  def loop(init: DataFrame, maxRounds: Long, extra: Int = 0, checkpointEvery: Int = 5,
      storage: StorageLevel = StorageLevel.MEMORY_AND_DISK)
      (step: (DataFrame, Int) => DataFrame)
      (measure: (DataFrame, DataFrame) => Boolean): Fix = {
    var prev: DataFrame = null
    var cur = init
    var it = 0
    var converged = false
    def round(): Boolean = {
      it += 1
      val next = step(cur, it)
      val cached =
        if (it % checkpointEvery == 0) next.localCheckpoint(true)
        else next.persist(storage)
      val done = measure(cur, cached)
      if (prev != null) prev.unpersist()
      prev = cur
      cur = cached
      done
    }
    while (!converged && it < maxRounds) converged = round()
    (0 until extra).foreach(_ => round())
    Fix(prev, cur, it)
  }
}
