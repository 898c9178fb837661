package graft.merge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental maintenance of a grouped COUNT/SUM view under keyed
  * change batches — the analytics layer the reference hands to the
  * warehouse, maintained here at CDC cost.
  *
  * A change batch touches a bounded key set, so the view delta is
  * computable from touched rows alone:
  *
  *   view' = view ⊖ agg(OLD images of touched keys)
  *                ⊕ agg(NEW images of touched keys)
  *
  * — O(touched keys) per batch, never a recompute over the table. Both
  * inputs already exist on the merge path ([[ChangeApply.applyLatest]]
  * semi-joins the same touched-key set), so maintenance piggybacks on
  * the work the merge does anyway. Groups whose count reaches zero drop
  * (a group dies when its last row deletes or updates away); groups
  * absent from the view appear (insert into a new group, or an update
  * moving a row across groups — both are just ⊖ from one group and
  * ⊕ into another).
  *
  * Sums stay in EXACT decimal until the caller casts out: float sums
  * would make "incremental" and "recompute" disagree in the last ulp
  * because they add in different orders; decimal addition is
  * associative, so incremental ≡ recompute EXACTLY — the driver oracle
  * recomputes from the merged table and must hash-match.
  */
object ViewMaintain {

  private val Dec = DecimalType(18, 4)

  /** The view definition: (`groupCol`, cnt, sum_value) over `rows`. */
  def viewOf(rows: DataFrame, groupCol: String, valueCol: String): DataFrame =
    rows.groupBy(col(groupCol)).agg(
      count(lit(1)).as("cnt"),
      sum(col(valueCol).cast(Dec)).as("sum_value"))

  /** One maintenance step. `oldTouched` = target rows whose key the
    * batch touches (pre-merge); `newTouched` = the batch's final
    * non-delete row images — exactly [[ChangeApply.applyLatest]]'s
    * upsert set. */
  def applyDelta(
      view: DataFrame,
      oldTouched: DataFrame,
      newTouched: DataFrame,
      groupCol: String,
      valueCol: String): DataFrame = {
    val minus = oldTouched.groupBy(col(groupCol)).agg(
      (-count(lit(1))).as("cnt"),
      (-sum(col(valueCol).cast(Dec))).as("sum_value"))
    view
      .unionByName(minus)
      .unionByName(viewOf(newTouched, groupCol, valueCol))
      .groupBy(col(groupCol))
      .agg(sum(col("cnt")).as("cnt"), sum(col("sum_value")).as("sum_value"))
      .filter(col("cnt") > 0)
  }
}
