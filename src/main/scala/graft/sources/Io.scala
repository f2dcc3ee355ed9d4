package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface — the reference's extract/load phases
  * (airflow_dag_calidad_aire.py:119 csv, :256-265 csv+snappy parquet,
  * :323-348 chunked JDBC) re-expressed as Spark readers/writers.
  *
  * Chunking disappears: partitioned parquet writes are the distributed
  * equivalent of the reference's 10k-row chunks, and `partitionBy` gives
  * partition pruning on read — the thing that matters at 100 TB.
  */
object Io {

  def readCsv(spark: SparkSession, path: String, schema: Option[StructType] = None,
      header: Boolean = true): DataFrame = {
    val r = spark.read.option("header", header.toString)
    schema.fold(r.option("inferSchema", "true"))(r.schema).csv(path)
  }

  /** `mergeSchema` reconciles files written with evolving schemas (new
    * nullable columns appear as nulls in old files) — off by default
    * because schema merging reads every file footer up front, a real cost
    * over 100 TB of files.
    */
  def readParquet(spark: SparkSession, path: String, mergeSchema: Boolean = false): DataFrame =
    spark.read.option("mergeSchema", mergeSchema.toString).parquet(path)

  def readJsonLines(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(r.schema).json(path)
  }

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", header.toString).csv(path)

  /** Snappy parquet (the reference's /tmp parquet load target), optionally
    * hive-partitioned by low-cardinality keys for pruning.
    *
    * Partitioned writes first shuffle on the partition keys: without
    * that, every task writes a file into every hive partition —
    * tasks × partitions tiny files (measured 3× the write time at 17.5M
    * rows / 365 dates). One shuffle, one file per partition.
    */
  def writeParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val out = if (partitionBy.nonEmpty)
      df.repartition(partitionBy.map(org.apache.spark.sql.functions.col): _*) else df
    val w = out.write.mode(SaveMode.Overwrite).option("compression", "snappy")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Chunked JDBC load — the reference's prepared Postgres path
    * (airflow_dag_calidad_aire.py:323-348, `to_sql(chunksize=1000)`).
    * `numPartitions` is the distributed analogue of the chunk size: each
    * partition opens one connection and batches `batchsize` rows.
    *
    * @note compile-checked only in this environment (zero egress, no DB);
    *       exercised in any deployment with a reachable JDBC endpoint.
    */
  def writeJdbc(df: DataFrame, url: String, table: String,
      props: java.util.Properties, numPartitions: Int = 8, batchSize: Int = 1000): Unit =
    df.repartition(numPartitions).write.mode(SaveMode.Append)
      .option("batchsize", batchSize.toString)
      .jdbc(url, table, props)

  /** Small-files compaction: rewrite a parquet dataset into files of
    * roughly `targetBytes` each. Small files are the silent killer of
    * 100 TB reads (per-file open/footer cost, starved scans, NameNode /
    * listing pressure): streaming sinks and over-parallel writers leave
    * thousands of KB-scale files behind. Sizing reads the actual on-disk
    * bytes (not row counts), writes to a temp dir, then swaps — the
    * dataset stays readable until the swap.
    */
  def compact(spark: SparkSession, path: String, targetBytes: Long = 128L * 1024 * 1024): Long = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    def dirSize(p: java.io.File): Long =
      if (p.isFile) p.length() else Option(p.listFiles()).map(_.map(dirSize).sum).getOrElse(0L)
    val bytes = dirSize(new java.io.File(path))
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val tmp = path + "__compacting"
    spark.read.parquet(path).repartition(nFiles)
      .write.mode(SaveMode.Overwrite).option("compression", "snappy").parquet(tmp)
    val dead = path + "__old"
    Files.move(Paths.get(path), Paths.get(dead), StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(tmp), Paths.get(path), StandardCopyOption.ATOMIC_MOVE)
    def rm(p: java.io.File): Unit = {
      Option(p.listFiles()).foreach(_.foreach(rm)); p.delete()
    }
    rm(new java.io.File(dead))
    nFiles.toLong
  }

  /** Bucketed managed table: both sides of a repeated equi-join written
    * with the same bucketing never shuffle again — the co-location
    * strategy for fact-fact joins at 100 TB. (Bucketing requires the
    * table catalog, hence `saveAsTable` rather than a path write.)
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, buckets: Int,
      sortCol: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .format("parquet").bucketBy(buckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }
}
