package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe equi-join by key salting.
  *
  * A shuffle join puts every row of one key in one task; a pathologically
  * hot key turns that task into the straggler that dominates the stage. AQE
  * skew-join splitting (on by default in Spark 4) handles most of this at
  * runtime — reach for explicit salting when a single key is so hot that
  * even split shuffle blocks overwhelm a task, or when the join sits under
  * an operator AQE won't re-plan.
  *
  * Mechanics: the left (big, skewed) side gets a deterministic salt in
  * [0, saltFactor) derived from a high-cardinality column; the right side
  * is replicated once per salt value. Join on (key, salt) spreads each hot
  * key over `saltFactor` tasks. Right-side cost: ×saltFactor rows — use for
  * dimension-sized right sides.
  */
object SaltedJoin {

  /** Inner equi-join `left.key = right.key`, left side salted by
    * `saltSource` (any left column with per-row variety, e.g. its PK). */
  def innerSalted(
      left: DataFrame,
      right: DataFrame,
      key: String,
      saltFactor: Int,
      saltSource: Column): DataFrame = {
    val salted = left.withColumn("__salt", pmod(hash(saltSource), lit(saltFactor)))
    val replicated = right.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
