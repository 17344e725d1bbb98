package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation — the §5 salting posture as a concrete operator.
  *
  * When to reach for it: Spark's AQE skew-join handling splits
  * oversized SHUFFLE PARTITIONS after the map stage and covers most
  * skewed sort-merge joins automatically. It cannot help when a single
  * JOIN KEY is hot enough that one key's rows must land in one task
  * anyway (AQE can split a partition, but a build-side hash bucket for
  * one key still concentrates), when the skewed side feeds a
  * co-partitioning the planner wants to preserve, or on engines/paths
  * where AQE is off. Salting splits the HOT KEY ITSELF: the skewed side
  * scatters each row into one of `salt` sub-keys, the other side
  * replicates `salt`-fold, and the join key becomes (key, salt) — a
  * hot key's rows spread across `salt` tasks at the cost of replicating
  * the non-skewed side.
  *
  * Cost model at 100 TB: replication multiplies the NON-skewed side's
  * shuffle volume by `salt`, so salt should be the smallest value that
  * levels the hot task (8–32 in practice) and the replicated side must
  * be the small one — if it were broadcast-sized you'd broadcast and
  * skew would be moot; salting covers the middle ground where the dim
  * side is too big to broadcast but far smaller than the fact side.
  *
  * The salt is DETERMINISTIC per row content. The tempting alternative
  * — `monotonically_increasing_id`, which spreads even exact-duplicate
  * rows — is a fault-recovery hazard at cluster scale: its value
  * depends on row position within a task, so a map task recomputed
  * after a shuffle-fetch failure can assign a row a different salt than
  * the one reducers already fetched, silently losing or duplicating
  * join rows in exactly the long-job regime salting targets. A
  * content-derived hash re-executes identically on any retry.
  *
  * Correctness (inner equi-join): every skewed-side row carries exactly
  * one salt s and joins the replica of its partner row tagged s, which
  * exists for all s in [0, salt) — a bijection with the unsalted join's
  * row pairs (spec-checked in SkewSpec, along with the partition-
  * balance effect the whole exercise exists for).
  */
object Skew {

  /** Inner equi-join on `key` with the LEFT side treated as skewed:
    * left rows scatter over `salt` sub-keys, the right side replicates
    * `salt`-fold. Output columns = the plain join's.
    *
    * `rowId` names the left-side columns the salt is hashed from —
    * pass a unique row identifier so EXACT-DUPLICATE rows of the hot
    * key spread too (the common skew case is one hot key repeated).
    * With the default (all left columns), identical rows share a salt:
    * still correct and deterministic, but a corpus of byte-identical
    * hot rows levels no further than its distinct-row count. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salt: Int, rowId: Seq[String] = Nil): DataFrame = {
    require(salt >= 2, "salt must be >= 2 to spread anything")
    val hashCols: Seq[Column] =
      if (rowId.nonEmpty) rowId.map(left(_)) else left.columns.toSeq.map(left(_))
    val l = left.withColumn("__graft_salt",
      pmod(xxhash64(hashCols: _*), lit(salt.toLong)))
    val r = right.withColumn("__graft_salt",
      explode(sequence(lit(0L), lit(salt.toLong - 1))))
    l.join(r, Seq(key, "__graft_salt")).drop("__graft_salt")
  }
}
