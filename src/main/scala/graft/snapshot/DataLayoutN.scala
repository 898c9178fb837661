package graft.snapshot

import java.nio.file.Paths

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** N-dimensional Z-order layout — [[DataLayout]] generalized past two
  * clustering columns (Delta's `OPTIMIZE ZORDER BY (a, b, c)` takes any
  * column list; so does this).
  *
  * Same architecture, D-ary: each dimension ranks into 16 bits against
  * its saved global [min, max], the D ranks interleave ROUND-ROBIN into
  * a D×16-bit z-value (bit i of rank d lands at position i·D + (D−1−d),
  * so every dimension contributes one bit per significance level and a
  * box query prunes on ANY subset of dimensions), the top `bucketBits`
  * pick the bucket directory, and pruning consults MEASURED per-bucket
  * min/max stats — never the curve — so rank approximation can only
  * cost locality, not rows. D×16 must fit a long ⇒ D ≤ 4; beyond that,
  * widen Bits down per dimension (curve resolution, not correctness).
  *
  * Scale notes are [[DataLayout]]'s verbatim: one O(1) normalization
  * agg, a pure per-row bit-interleave projection, one repartition, a
  * ≤2^bucketBits-row stats table, and partition-filter pruning at the
  * scan. Appends reuse the saved curve constants and widen stats
  * BEFORE landing data (stats may be looser than data — opens an extra
  * bucket; never the reverse — which would lose rows).
  */
object DataLayoutN {

  val ZBucketCol: String = DataLayout.ZBucketCol
  private val Bits = 16

  final case class MetaN(cols: Seq[String], bucketBits: Int,
      mins: Seq[Long], maxs: Seq[Long])

  private def rank16(c: Column, mn: Long, mx: Long): Column =
    DataLayout.rank16(c, mn, mx) // one rank definition for every curve

  /** Round-robin interleave of D 16-bit ranks into a D×16-bit z-value
    * — D×16 flat shift/mask/or terms, no allocation, no UDF. */
  private def interleaveN(ranks: Seq[Column]): Column = {
    val d = ranks.length
    ranks.zipWithIndex.flatMap { case (r, dim) =>
      (0 until Bits).map { i =>
        // bit i of rank `dim` → z bit i*D + (D-1-dim)
        shiftleft(r.bitwiseAND(lit(1L << i)), i * (d - 1) + (d - 1 - dim))
      }
    }.reduce(_ bitwiseOR _)
  }

  private def bucketExpr(m: MetaN): Column = {
    val ranks = m.cols.zip(m.mins.zip(m.maxs)).map { case (c, (mn, mx)) =>
      rank16(col(c).cast("long"), mn, mx)
    }
    shiftrightunsigned(interleaveN(ranks), m.cols.length * Bits - m.bucketBits)
      .cast("int")
  }

  private def dataDir(dir: String) = Paths.get(dir, "data").toString
  private def statsDir(dir: String) = Paths.get(dir, "stats").toString
  private def metaPath(dir: String) = Paths.get(dir, "_zorder_meta_n")

  // one field per line (like DataLayout's meta) — column names may
  // contain spaces, so a space-delimited row format would mis-parse
  private def writeMeta(dir: String, m: MetaN): Unit = {
    java.nio.file.Files.createDirectories(Paths.get(dir))
    val body = m.bucketBits.toString +: m.cols.indices.flatMap(i =>
      Seq(m.cols(i), m.mins(i).toString, m.maxs(i).toString))
    java.nio.file.Files.writeString(metaPath(dir), body.mkString("", "\n", "\n"))
  }

  def readMeta(dir: String): MetaN = {
    val ls = java.nio.file.Files.readString(metaPath(dir)).split("\n").toSeq
    val dims = ls.tail.grouped(3).toSeq
    MetaN(dims.map(_(0)), ls.head.toInt, dims.map(_(1).toLong), dims.map(_(2).toLong))
  }

  private def mnCol(i: Int) = s"mn$i"
  private def mxCol(i: Int) = s"mx$i"

  private def statsAgg(m: MetaN): Seq[Column] =
    m.cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(min(col(c).cast("long")).as(mnCol(i)), max(col(c).cast("long")).as(mxCol(i)))
    }

  /** Cluster `df` by the Z-curve over `cols` into `2^bucketBits` bucket
    * directories + the per-bucket stats table. Returns bucket count. */
  def writeZOrdered(df: DataFrame, layoutDir: String, cols: Seq[String],
      bucketBits: Int = 6): Int = {
    require(cols.nonEmpty && cols.length * Bits <= 64,
      s"1..4 clustering columns supported, got ${cols.length}")
    require(bucketBits >= 1 && bucketBits <= Bits, s"bucketBits out of range: $bucketBits")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("long")), max(col(c).cast("long"))))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val meta = MetaN(cols, bucketBits,
      cols.indices.map(i => r.getLong(2 * i)),
      cols.indices.map(i => r.getLong(2 * i + 1)))
    writeMeta(layoutDir, meta)
    df.withColumn(ZBucketCol, bucketExpr(meta))
      .repartition(col(ZBucketCol))
      .write.mode(SaveMode.Overwrite).partitionBy(ZBucketCol)
      .parquet(dataDir(layoutDir))
    val stats = statsAgg(meta)
    df.sparkSession.read.parquet(dataDir(layoutDir))
      .groupBy(col(ZBucketCol).as("bucket"))
      .agg(stats.head, stats.tail: _*)
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(statsDir(layoutDir))
    1 << bucketBits
  }

  /** Append with the SAVED curve; stats widen BEFORE data lands (see
    * [[DataLayout.append]]'s crash-ordering argument). */
  def append(df: DataFrame, layoutDir: String): Unit = {
    val m = readMeta(layoutDir)
    val spark = df.sparkSession
    val incStats = statsAgg(m)
    val inc = df.withColumn(ZBucketCol, bucketExpr(m))
      .groupBy(col(ZBucketCol).as("bucket"))
      .agg(incStats.head, incStats.tail: _*)
      .collect()
    val old = spark.read.parquet(statsDir(layoutDir)).collect()
    val cols = Seq("bucket") ++ m.cols.indices.flatMap(i => Seq(mnCol(i), mxCol(i)))
    val merged = (old ++ inc)
      .map(r => r.getInt(r.fieldIndex("bucket")) ->
        m.cols.indices.map(i => (r.getLong(r.fieldIndex(mnCol(i))), r.getLong(r.fieldIndex(mxCol(i))))))
      .groupBy(_._1).map { case (b, rows) =>
        val dims = m.cols.indices.map { i =>
          (rows.map(_._2(i)._1).min, rows.map(_._2(i)._2).max)
        }
        org.apache.spark.sql.Row.fromSeq(b +: dims.flatMap(d => Seq(d._1, d._2)))
      }.toSeq
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("bucket",
        org.apache.spark.sql.types.IntegerType) +:
        m.cols.indices.flatMap(i => Seq(
          org.apache.spark.sql.types.StructField(mnCol(i), org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField(mxCol(i), org.apache.spark.sql.types.LongType))))
    spark.createDataFrame(spark.sparkContext.parallelize(merged, 1), schema)
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(statsDir(layoutDir))
    df.withColumn(ZBucketCol, bucketExpr(m))
      .repartition(col(ZBucketCol))
      .write.mode(SaveMode.Append).partitionBy(ZBucketCol)
      .parquet(dataDir(layoutDir))
  }

  /** Buckets whose measured box intersects the query box; `ranges` maps
    * column → (lo, hi), and columns NOT constrained prune on nothing. */
  def prunedBuckets(spark: SparkSession, layoutDir: String,
      ranges: Map[String, (Long, Long)]): Seq[Int] = {
    val m = readMeta(layoutDir)
    spark.read.parquet(statsDir(layoutDir)).collect().toSeq
      .filter { r =>
        m.cols.zipWithIndex.forall { case (c, i) =>
          ranges.get(c).forall { case (lo, hi) =>
            r.getLong(r.fieldIndex(mnCol(i))) <= hi &&
              r.getLong(r.fieldIndex(mxCol(i))) >= lo
          }
        }
      }
      .map(r => r.getInt(r.fieldIndex("bucket"))).sorted
  }

  /** Box read: stats-pruned partition filter + exact residual. */
  def readPruned(spark: SparkSession, layoutDir: String,
      ranges: Map[String, (Long, Long)]): DataFrame = {
    val chosen = prunedBuckets(spark, layoutDir, ranges)
    val base = spark.read.parquet(dataDir(layoutDir))
      .filter(col(ZBucketCol).isin(chosen.map(Integer.valueOf): _*))
    ranges.foldLeft(base) { case (d, (c, (lo, hi))) =>
      d.filter(col(c).cast("long").between(lo, hi))
    }.drop(ZBucketCol)
  }
}
