package graft.store

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Parquet-directory table store with atomic overwrite via
  * write-to-temp-then-swap (SURVEY §7.5 #1: no table format ships in
  * /opt/spark/jars, so SCD2 rewrites need their own atomicity).
  *
  * The swap is a local-filesystem rename; on a real cluster the same
  * pattern runs against a transactional table format or a
  * rename-is-atomic store — the engine code above this layer only sees
  * read/overwrite/append.
  */
class TableStore(spark: SparkSession, baseDir: String) {
  Files.createDirectories(Paths.get(baseDir))

  def path(name: String): String = s"$baseDir/$name"
  def exists(name: String): Boolean = Files.exists(Paths.get(path(name)))

  def read(name: String): DataFrame = spark.read.parquet(path(name))

  def readOrEmpty(name: String, schema: StructType): DataFrame =
    if (exists(name)) spark.read.schema(schema).parquet(path(name))
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Atomic overwrite: materialize to `<name>.tmp`, then swap dirs.
    * Readers either see the old or the new table, never a partial one. */
  def overwrite(name: String, df: DataFrame): Unit = {
    val tmp = Paths.get(path(s"$name.tmp"))
    deleteRecursively(tmp)
    df.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val live = Paths.get(path(name))
    val old = Paths.get(path(s"$name.old"))
    deleteRecursively(old)
    if (Files.exists(live)) Files.move(live, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(tmp, live, StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(old)
  }

  def append(name: String, df: DataFrame): Unit =
    df.write.mode(SaveMode.Append).parquet(path(name))

  /** Staged append: materialize the increment fully in `<name>.stage`,
    * then move the finished part-files into the live directory (parquet
    * part names carry a write-UUID, so moves never collide). A failure
    * while WRITING leaves only stage garbage (cleaned on the next call);
    * a failure mid-MOVE leaves a prefix of complete files — callers that
    * co-locate each logical key's rows in one file (repartition by key
    * before calling) therefore never expose a torn key, which a plain
    * [[append]] cannot promise (ADVICE r4: a mid-append crash persisted
    * some of an id's rows and the retry's anti-join then skipped the id
    * forever). Reads planned against the live dir also keep a stable
    * file listing while the stage materializes. */
  def appendStaged(name: String, df: DataFrame): Unit = {
    val stage = Paths.get(path(s"$name.stage"))
    deleteRecursively(stage)
    df.write.mode(SaveMode.Overwrite).parquet(stage.toString)
    val live = Paths.get(path(name))
    Files.createDirectories(live)
    Files.list(stage).filter(p => p.getFileName.toString.endsWith(".parquet"))
      .forEach(p => Files.move(p, live.resolve(p.getFileName.toString),
        StandardCopyOption.ATOMIC_MOVE))
    deleteRecursively(stage)
  }

  /** Append into a hive-partitioned layout (`col=value` subdirs). Reads
    * through [[read]] recover the partition column; scans filtered on it
    * prune whole directories. */
  def appendPartitioned(name: String, df: DataFrame, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Append).partitionBy(partitionCols: _*).parquet(path(name))

  /** Dynamic partition overwrite: replaces ONLY the partitions present in
    * `df`, leaving every other partition's files untouched on disk — the
    * scale path for partition-scoped rewrites (SCD2 touched-bucket MERGE).
    * Spark stages each partition's output and commits per partition, so
    * readers never see a half-written partition. */
  def overwritePartitionsDynamic(name: String, df: DataFrame,
      partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*).parquet(path(name))

  /** Partition-level delete on a hive-partitioned table: removes the
    * `col=value` subtree — O(partition), no rewrite of other partitions.
    * This is the scale path for the reference's device-scoped DELETE (S7,
    * STG_Firebase2Oracle.py:99-119); with no such partition the delete is
    * a no-op, like the SQL original. */
  def deletePartition(name: String, partitionCol: String, value: String): Unit =
    deleteRecursively(Paths.get(path(name), s"$partitionCol=$value"))

  /** Predicate delete fallback for non-partition predicates: rewrite
    * without the matching rows (parquet is immutable). Prefer
    * [[deletePartition]] when the predicate is a partition-column
    * equality. */
  def deleteWhere(name: String, schema: StructType, cond: org.apache.spark.sql.Column): Unit =
    if (exists(name)) overwrite(name, read(name).filter(!cond || cond.isNull))

  /** Small-file compaction: rewrite the table into ~`targetBytes` output
    * files (computed from the current on-disk size — a directory listing,
    * not a data scan). Streaming sinks and partition-scoped SCD2 rewrites
    * accrete small files; at 100 TB unmerged small files dominate task
    * scheduling and NameNode/listing cost, so periodic compaction is part
    * of the table lifecycle. Atomic via the same temp-then-swap as
    * [[overwrite]]. Hive-partitioned layouts keep their partition column
    * (repartitioned WITHIN each partition value so pruning survives). */
  def compact(name: String, targetBytes: Long = 128L * 1024 * 1024,
      partitionCols: Seq[String] = Seq.empty): Unit = {
    if (!exists(name)) return
    val size = Files.walk(Paths.get(path(name))).mapToLong(p =>
      if (Files.isRegularFile(p)) Files.size(p) else 0L).sum()
    val nFiles = math.max(1, math.ceil(size.toDouble / targetBytes).toInt)
    val df = read(name)
    val tmp = Paths.get(path(s"$name.tmp"))
    deleteRecursively(tmp)
    if (partitionCols.isEmpty)
      df.repartition(nFiles).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    else
      df.repartition(nFiles, partitionCols.map(df.col): _*)
        .write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*)
        .parquet(tmp.toString)
    val live = Paths.get(path(name))
    val old = Paths.get(path(s"$name.old"))
    deleteRecursively(old)
    if (Files.exists(live)) Files.move(live, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(tmp, live, StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(old)
  }

  /** Range-clustered rewrite: range-partition on `clusterCols` and sort
    * within partitions before writing, so each parquet file's footer
    * min/max for those columns covers a narrow, mostly-disjoint slice.
    * Point/range scans then skip whole files on footer stats alone — the
    * poor engine's Z-ORDER, and at 100 TB the difference between reading
    * one file and reading the table when the predicate is on the cluster
    * key. `repartitionByRange` samples the key distribution, so skewed
    * keys still yield balanced files. Same atomic tmp-then-swap as
    * [[overwrite]]. */
  def overwriteClustered(name: String, df: DataFrame,
      clusterCols: Seq[String], numFiles: Int = 0): Unit = {
    require(clusterCols.nonEmpty, "need at least one cluster column")
    val cols = clusterCols.map(df.col)
    val ranged =
      (if (numFiles > 0) df.repartitionByRange(numFiles, cols: _*)
       else df.repartitionByRange(cols: _*))
        .sortWithinPartitions(cols: _*)
    overwrite(name, ranged)
  }

  /** Z-order clustered rewrite: range-partition + sort on the Morton
    * interleave of `zCols` ([[graft.functions.ZOrder]]), so parquet
    * footer min/max stays tight in EVERY z dimension — a box predicate
    * on any subset of `zCols` prunes most files, where
    * [[overwriteClustered]]'s lexicographic layout prunes only on its
    * leading column. The z column is computed, used for layout, and
    * dropped — the stored schema is unchanged, which is also why reads
    * need no decoder: z-order is a LAYOUT, not a format. */
  def overwriteZOrdered(name: String, df: DataFrame,
      zCols: Seq[String], numFiles: Int = 0, bits: Int = 16): Unit = {
    val z = graft.functions.ZOrder.zValue(df, zCols, bits)
    val withZ = df.withColumn("__z", z)
    val ranged =
      (if (numFiles > 0) withZ.repartitionByRange(numFiles, col("__z"))
       else withZ.repartitionByRange(col("__z")))
        .sortWithinPartitions(col("__z"))
        .drop("__z")
    overwrite(name, ranged)
  }

  /** Drop one table (and its swap leftovers). No-op if absent. */
  def drop(name: String): Unit =
    Seq(name, s"$name.tmp", s"$name.old")
      .foreach(n => deleteRecursively(Paths.get(path(n))))

  /** Remove the whole store from disk — for temp stores whose results
    * have been materialized (e.g. layout demos). Callers must not read
    * through this store afterwards. */
  def destroy(): Unit = deleteRecursively(Paths.get(baseDir))

  private def deleteRecursively(p: Path): Unit =
    FsUtils.deleteRecursively(p)
}
