package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Release valve for `localCheckpoint()` blocks.
  *
  * `Dataset.unpersist()` only talks to the cache manager, so the blocks
  * behind a local checkpoint (an eagerly persisted RDD wrapped in a
  * [[LogicalRDD]]) outlive the frame until the context dies. Iterative
  * operators that checkpoint per round (BPE training, connected
  * components) would otherwise accumulate one dead copy of their state
  * per round for the life of the session — `free` drops the blocks the
  * moment the next round's checkpoint has materialized.
  */
object Checkpoints {

  /** Drop the cached blocks behind a `localCheckpoint()`ed frame.
    * No-op on any frame that is not a bare checkpoint (the match is
    * deliberately narrow: freeing must never touch a frame that still
    * has lineage to recompute from). */
  def free(df: DataFrame): Unit = df.queryExecution.analyzed match {
    case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
    case _              => ()
  }
}
