package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared column helpers.
  *
  * Money/measure aggregation goes through decimal so results are exact and
  * therefore bit-identical between Spark and any oracle engine — a plain
  * double sum is order-dependent and engine-dependent. The input doubles are
  * 2-decimal by construction, so decimal(18,2) is lossless.
  */
package object functions {
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact sum of a 2-decimal money column, returned as double. */
  def moneySum(c: Column): Column = sum(dec2(c)).cast("double")

  /** Sorted, comma-joined collect — deterministic stand-in for the
    * reference's Cypher COLLECT()/COLLECT(DISTINCT) (SURVEY §2.4): arrays
    * hash fragilely across engines, strings don't. */
  def sortedList(c: Column): Column = array_join(sort_array(collect_list(c)), ",")
  def sortedSet(c: Column): Column  = array_join(sort_array(collect_set(c)), ",")

  /** Key builder — `{db}://{cluster}.{schema}/{tbl}` (reference:
    * databuilder/models/table_metadata.py:296-314). Plain Column function;
    * codegen'd via concat, no UDF. */
  def tableKey(db: Column, cluster: Column, schema: Column, tbl: Column): Column =
    concat(db, lit("://"), cluster, lit("."), schema, lit("/"), tbl)
}
