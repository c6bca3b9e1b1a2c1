package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of join: for each event row, attach the latest state row with the
  * same key and `stateTime <= eventTime` (SURVEY.md §2.2 Q14).
  *
  * Spark has no native as-of join, and the naive formulation
  * (equi-join + time filter + row_number) explodes to |events| × |states
  * per key| intermediate rows. This operator instead uses the scalable
  * union-and-sort form: tag both sides, union them, and take a running
  * `last(state, ignoreNulls)` over a single (key, time) sort — one
  * shuffle, O(|events| + |states|) intermediate rows, and partition-local
  * window evaluation. At 100 TB this is the difference between a plan
  * that finishes and one that doesn't (per-key fanout never materializes).
  *
  * Tie semantics: a state at exactly eventTime matches (<=); among states
  * with equal time the greatest `stateTieBreak` wins.
  */
object AsOfJoin {

  def leftAsOf(
      events: DataFrame,
      eventKey: String, eventTime: String,
      states: DataFrame,
      stateKey: String, stateTime: String, stateTieBreak: String): DataFrame = {

    val evType = StructType(events.schema.fields)
    val stType = StructType(states.schema.fields)

    val evSide = events.select(
      col(eventKey).as("__k"),
      col(eventTime).cast("timestamp").as("__t"),
      lit(1).as("__side"),
      lit(Long.MaxValue).as("__tb"),
      struct(events.columns.map(col).toIndexedSeq: _*).as("__ev"),
      lit(null).cast(stType).as("__st"))

    val stSide = states.select(
      col(stateKey).as("__k"),
      col(stateTime).cast("timestamp").as("__t"),
      lit(0).as("__side"),
      col(stateTieBreak).cast("long").as("__tb"),
      lit(null).cast(evType).as("__ev"),
      struct(states.columns.map(col).toIndexedSeq: _*).as("__st"))

    // States sort before events at equal __t (side 0 < 1) so `<=`
    // matching holds; among equal-time states the max tiebreak is last.
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    evSide.unionByName(stSide)
      .withColumn("__match", last(col("__st"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__ev.*"), col("__match").as("asof"))
  }
}
