package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: attach to every left row the payload of the
  * latest right row with the same key and `right.ts <= left.ts` (left
  * rows with no prior right row keep null payload).
  *
  * The reference's DISTRIBUTE-BY-HASH linkage is exactly this shape
  * ("most recent preceding statement wins", `/root/reference/db2ice/
  * parser.py:263-274`); this operator generalizes it to keyed time
  * series — the trades/quotes join of market data, the
  * attach-latest-metadata join of training pipelines.
  *
  * Physical shape (the scalable formulation): tag both inputs with a
  * side marker, UNION them, and run ONE `last(payload, ignoreNulls)`
  * window over (key, ts, side) — a single hash-partition + sort per
  * key, no range-join explosion, no per-row probe. A sort-merge range
  * join would re-sort both sides and emit |L|·|matches| intermediate
  * rows; the union trick is linear in |L|+|R| and AQE-coalescible. At
  * 100 TB this is one shuffle of each input, the minimum any keyed
  * as-of can do.
  *
  * Determinism contract: the right side must be unique per (key, ts) —
  * dedup upstream (e.g. `max_by` per key+ts) — because ties between
  * right rows at identical (key, ts) have no defined winner. Right rows
  * sort BEFORE left rows at equal ts, so a right row at exactly
  * `left.ts` is matched (`<=`, DuckDB-ASOF-compatible).
  */
object AsOfJoin {

  /** @param left     rows to enrich (all its columns are preserved)
    * @param right    rows providing `payload` columns; must be unique
    *                 per (key, ts)
    * @param key      equi-join key column names (present in both)
    * @param leftTs   left ordering column name
    * @param rightTs  right ordering column name
    * @param payload  right column names to attach (null when no match)
    */
  def backward(left: DataFrame, right: DataFrame, key: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    require(payload.forall(p => !left.columns.contains(p)),
      s"payload columns ${payload.mkString(",")} must not collide with left columns")
    // The payload travels as ONE struct column so a single right row
    // wins atomically: per-column `last(..., ignoreNulls)` would skip a
    // matching right row whose payload VALUE is null (an older row
    // would win, diverging from ASOF semantics) and could stitch
    // different right rows together across payload columns. The struct
    // itself is null exactly on left rows, so ignoreNulls skips only
    // those; a right row with null payload fields still wins and its
    // nulls are preserved.
    val pStructType = right.select(struct(payload.map(col): _*).as("__p"))
      .schema("__p").dataType
    // Left branch: its own columns + a null payload struct.
    val l = left.withColumn("__side", lit(1))
      .withColumn("__ts", col(leftTs))
      .withColumn("__p", lit(null).cast(pStructType))
    // Right branch: key + ts + payload struct, null for every left column.
    val leftOnly = left.columns.filterNot(key.contains)
    val leftTypes = left.schema.fields.map(f => f.name -> f.dataType).toMap
    val r0 = right.select((key.map(col) :+ col(rightTs).as("__ts")) :+
      struct(payload.map(col): _*).as("__p"): _*)
      .withColumn("__side", lit(0))
    val r = leftOnly.foldLeft(r0) { (df, c) =>
      df.withColumn(c, lit(null).cast(leftTypes(c)))
    }
    val unioned = l.select(r.columns.map(col): _*).unionByName(r.select(r.columns.map(col): _*))
    // Right rows (side 0) sort before left rows at equal ts → `<=`.
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned.withColumn("__last_p",
      last(col("__p"), ignoreNulls = true).over(w))
    filled.filter(col("__side") === 1)
      .select(left.columns.map(col) ++
        payload.map(p => col(s"__last_p.$p").as(p)): _*)
  }
}
