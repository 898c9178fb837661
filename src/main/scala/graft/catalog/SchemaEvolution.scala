package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}

import graft.types.{TableDefinition, TidbTypeMapper}

/** Applies a schema-evolution step to a materialized DataFrame — the D2
  * "column-diff → ALTER plan" operator family executed in-engine instead
  * of as warehouse ALTER statements.
  *
  * ADD/DROP/RENAME are metadata-cheap; MODIFY is a full-column cast
  * rewrite (the cost the reference punts to warehouses that support it,
  * SURVEY §7.4(3)). At scale this folds into the next merge's rewrite of
  * the same partitions, so it adds no extra pass.
  */
object SchemaEvolution {

  /** Evolve `df` (materialized as `prev`) to match `curr`. */
  def evolve(df: DataFrame, prev: TableDefinition, curr: TableDefinition): DataFrame = {
    var out = df
    val diffs = ColumnDiff.diff(prev.columns, curr.columns)
    diffs.foreach {
      case ColumnDiff.Diff(ColumnDiff.Rename, Some(p), Some(c)) =>
        out = out.withColumnRenamed(p.name, c.name)
      case ColumnDiff.Diff(ColumnDiff.Modify, Some(p), Some(c)) =>
        out = out.withColumn(c.name, col(p.name).cast(TidbTypeMapper.toSpark(c)))
      case ColumnDiff.Diff(ColumnDiff.Add, None, Some(c)) =>
        val default = c.default
          .map(v => lit(v).cast(TidbTypeMapper.toSpark(c)))
          .getOrElse(lit(null).cast(TidbTypeMapper.toSpark(c)))
        out = out.withColumn(c.name, default)
      case ColumnDiff.Diff(ColumnDiff.Drop, Some(p), None) =>
        out = out.drop(p.name)
      case _ => // Unchange
    }
    // project to the current column order
    out.select(curr.columns.map(c => col(c.name)): _*)
  }

  /** Fold a chain of definitions oldest→newest over the DataFrame. */
  def evolveChain(df: DataFrame, chain: Seq[TableDefinition]): DataFrame =
    chain.sliding(2).foldLeft(df) {
      case (acc, Seq(a, b)) => evolve(acc, a, b)
      case (acc, _) => acc
    }
}
