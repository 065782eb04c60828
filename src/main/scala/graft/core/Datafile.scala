package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Spark-native `Datafile` (reference polars_dataset.py:309-338): a
  * path + index/id_vars metadata with load/write. The reference is
  * CSV-only; parquet/orc/json are first-class here because that is
  * what a 100 TB pipeline actually reads.
  *
  * `partitionBy` turns writes into Hive-style partitioned layouts
  * (`col=value/` directories): at scale this is the difference between
  * a full scan and partition pruning — a reader filtering on a
  * partition column touches only the matching directories, and the
  * columns are recovered on load via partition discovery.
  */
final case class Datafile(
    path: String,
    index: Option[String] = None,
    idVars: Seq[String] = Nil,
    format: String = "csv",
    partitionBy: Seq[String] = Nil) {

  val name: String = {
    val base = path.split('/').last
    val dot = base.lastIndexOf('.')
    if (dot > 0) base.substring(0, dot) else base
  }

  private def reader(spark: SparkSession) = format match {
    case "csv"  => spark.read.option("header", "true").option("inferSchema", "true")
    case other  => spark.read.format(other)
  }

  /** Load as a raw DataFrame when no index is set, else as a GDataset.
    * A missing path logs an error and returns None rather than throwing
    * (reference polars_dataset.py:316-323 FileNotFoundError handling). */
  def load(spark: SparkSession): Option[Either[DataFrame, GDataset]] =
    try {
      val df = format match {
        case "csv" => reader(spark).csv(path)
        case _     => reader(spark).load(path)
      }
      Some(index match {
        case None      => Left(df)
        case Some(idx) => Right(GDataset(df, idx, idVars))
      })
    } catch {
      case e: org.apache.spark.sql.AnalysisException
          if e.getCondition == "PATH_NOT_FOUND" =>
        org.apache.log4j.Logger.getLogger(getClass)
          .error(s"Could not find $path")
        None
    }

  def write(df: DataFrame): Unit = {
    val base = df.write.mode(SaveMode.Overwrite)
    val w = if (partitionBy.isEmpty) base else base.partitionBy(partitionBy: _*)
    format match {
      case "csv" => w.option("header", "true").csv(path)
      case other => w.format(other).save(path)
    }
  }

  def write(ds: GDataset): Unit = write(ds.df)

  override def toString: String =
    Seq(
      s"filename: $name",
      s"path: $path",
      s"index: ${index.getOrElse("None")}",
      s"id_vars: ${if (idVars.nonEmpty) idVars.mkString(", ") else "None"}"
    ).mkString("\n")
}
