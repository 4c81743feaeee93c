package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core._
import graft.prepare.Prepare

/** Collection persistence: Parquet data + a JSON config sidecar
  * (reference: snapshot/2 + load_snapshot/2, collection.ex:135-164,
  * 376-433; SURVEY §2.1).
  *
  * Spark's job-commit protocol (_SUCCESS + task-attempt rename) replaces
  * the reference's temp-file+rename atomicity; Parquet footer checksums
  * replace its md5 extended_info. Load runs the same full-record
  * validation pass the reference performs (collection.ex:1184-1203) and
  * "rebuilds the index" by recomputing derived columns from canonical
  * data — the exact contract of the reference's rebuild-on-load.
  */
object CollectionStore {

  val ConfigFile = "_graft_config.json"

  /** Keys a load may override (collection.ex:54): structural fields
    * (dimensions, metric, normalize, compressed) are immutable. */
  val OverridableKeys: Set[String] = Set("name", "index", "score")

  private def configJson(c: CollectionConfig): String = {
    def q(s: String) = "\"" + s + "\""
    s"""{${q("snapshot_version")}: 1, ${q("name")}: ${q(c.name)}, ${q("dimensions")}: ${c.dimensions}, ${q("metric")}: ${q(c.metric.name)}, ${q("normalize")}: ${q(c.effectiveNormalize.name)}, ${q("score")}: ${q(c.score.name)}, ${q("index")}: ${q(c.index)}, ${q("compressed")}: ${c.compressed}}"""
  }

  /** Write the config sidecar alone (used by [[snapshot]] and by
    * GraftDb.persistIndex for indexed at-rest layouts). */
  def writeConfig(spark: SparkSession, path: String,
      config: CollectionConfig): Unit = {
    // temp + atomic rename, like ModelStore.writeString: an in-place
    // truncate would brick the layout if the JVM dies mid-write (valid
    // data + model, unparseable config)
    val conf = spark.sparkContext.hadoopConfiguration
    val dest = new Path(path, ConfigFile)
    val fs = dest.getFileSystem(conf)
    val tmp = new Path(path, ConfigFile + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(configJson(config).getBytes("UTF-8")) finally out.close()
    org.apache.hadoop.fs.FileContext.getFileContext(dest.toUri, conf)
      .rename(tmp, dest, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Read the config sidecar alone. */
  def readConfig(spark: SparkSession, path: String): CollectionConfig = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new Path(path, ConfigFile))
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    parseConfig(json)
  }

  private def parseConfig(json: String): CollectionConfig = {
    def str(key: String): String = {
      val m = ("\"" + key + "\"\\s*:\\s*\"([^\"]*)\"").r
      m.findFirstMatchIn(json).map(_.group(1))
        .getOrElse(throw new IllegalArgumentException(s"config missing $key"))
    }
    def int(key: String): Int = {
      val m = ("\"" + key + "\"\\s*:\\s*(\\d+)").r
      m.findFirstMatchIn(json).map(_.group(1).toInt)
        .getOrElse(throw new IllegalArgumentException(s"config missing $key"))
    }
    def bool(key: String): Boolean =
      ("\"" + key + "\"\\s*:\\s*true").r.findFirstIn(json).isDefined
    CollectionConfig(str("name"), int("dimensions"), Metric.fromName(str("metric")),
      Some(Normalize.fromName(str("normalize"))), ScoreMode.fromName(str("score")),
      str("index"), bool("compressed"))
  }

  /** Snapshot the collection: parquet + config sidecar. With
    * `packed = true` the snapshot also carries the packed-f32 binary
    * layout (`vector_f32`) so reloaded collections can serve
    * [[graft.search.Search.flatSearchPacked]] straight off the scan —
    * the at-rest format that matters when the snapshot IS the serving
    * copy at scale. */
  def snapshot(df: DataFrame, config: CollectionConfig, path: String,
      packed: Boolean = false): Unit = {
    val out0 =
      if (packed && !df.columns.contains("vector_f32")) Prepare.withPackedVector(df)
      else df
    out0.write.mode("overwrite").parquet(path)
    writeConfig(df.sparkSession, path, config)
  }

  /** Load a snapshot: read config sidecar, apply (whitelisted) overrides,
    * validate every record against the config, recompute derived columns
    * that are missing. Throws on corrupt rows like the reference's
    * verify-on-load. */
  def load(spark: SparkSession, path: String,
      overrides: Map[String, String] = Map.empty): (DataFrame, CollectionConfig) = {
    val bad = overrides.keySet.diff(OverridableKeys)
    require(bad.isEmpty, s"override keys not allowed: ${bad.mkString(",")}")
    val base = readConfig(spark, path)
    val config = base.copy(
      name = overrides.getOrElse("name", base.name),
      index = overrides.getOrElse("index", base.index),
      score = overrides.get("score").map(ScoreMode.fromName).getOrElse(base.score))

    var df = spark.read.parquet(path)
    val invalid = Prepare.invalidRows(df, config).limit(1).collect()
    if (invalid.nonEmpty)
      throw new IllegalStateException(
        s"snapshot contains invalid record id=${invalid.head.getAs[String]("id")}")
    // rebuild derived acceleration state from canonical columns
    if (!df.columns.contains("binary_vector"))
      df = df.withColumn("binary_vector",
        graft.functions.VectorFunctions.packSignBits(col("vector")))
    (df, config)
  }
  /** Diff two collection frames (snapshots, a snapshot vs live, two
    * epochs of a layout): one row per id that is `added` (only in
    * `after`), `removed` (only in `before`), or `changed` (present in
    * both with a different md5 over the compared columns — default:
    * every common non-id column, name-sorted so the fingerprint is
    * schema-order-independent). Unchanged ids are omitted — at 100 TB
    * the diff is the small output, never a materialized copy. One
    * md5 projection per side + one full outer join on id. */
  def diffSnapshots(before: org.apache.spark.sql.DataFrame,
      after: org.apache.spark.sql.DataFrame, idCol: String = "id",
      compareCols: Seq[String] = Nil): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val cols =
      if (compareCols.nonEmpty) compareCols.sorted
      else (before.columns.toSet intersect after.columns.toSet - idCol)
        .toSeq.sorted
    require(cols.nonEmpty, "no comparable columns")
    def keyed(df: org.apache.spark.sql.DataFrame, fp: String) =
      df.select(col(idCol).as("_did"),
        md5(to_json(struct(cols.map(c => col(c).as(c)): _*))).as(fp))
    val b = keyed(before, "_fp_b")
    val a = keyed(after, "_fp_a").withColumnRenamed("_did", "_did_a")
    b.join(a, col("_did") <=> col("_did_a"), "full")
      .withColumn("status",
        when(col("_fp_b").isNull, lit("added"))
          .when(col("_fp_a").isNull, lit("removed"))
          .when(col("_fp_a") =!= col("_fp_b"), lit("changed"))
          .otherwise(lit(null)))
      .filter(col("status").isNotNull)
      .select(coalesce(col("_did"), col("_did_a")).as(idCol), col("status"))
  }
}

/** Bucketed at-rest layout: rows hash-clustered and sorted by a key at
  * write time, so joins and aggregations ON THAT KEY are co-located —
  * Catalyst plans a SortMergeJoin with NO shuffle exchange on either
  * side. This is the 100 TB answer to repeated large-large joins
  * (e.g. chunk embeddings joined back to documents by doc id): pay the
  * cluster-by once at ingest, never at query time.
  */
object Bucketing {

  /** Write `df` as a managed parquet table bucketed+sorted by `key`.
    * Both sides of a future join must use the same bucket count. */
  def writeBucketed(df: org.apache.spark.sql.DataFrame, table: String,
      buckets: Int, key: String): Unit = {
    require(buckets > 0, "buckets must be positive")
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)
  }
}

/** Table maintenance for parquet layouts: the small-file problem.
  * Streaming appends and fine-grained partitioned writes accumulate
  * files far below the ideal scan granularity; at cluster scale, task
  * scheduling and footer reads then dominate the scan. `compact`
  * rewrites a directory into ceil(bytes / targetBytes) files via a
  * temp-dir + atomic swap (never reads and overwrites the same path in
  * one job, which Spark forbids).
  *
  * Compaction is a MAINTENANCE WINDOW operation: the swap replaces the
  * files under `path`, so DataFrames whose file listing predates the
  * call fail when next evaluated. Quiesce readers around it.
  */
object Compaction {

  /** Rewrite `path` with ~targetBytes per output file; returns the new
    * total file count. Hive-partitioned layouts (`col=value`
    * subdirectories, e.g. IvfPq.writePartitioned cells) are preserved:
    * each partition directory is compacted independently, so partition
    * pruning — and the exact directory-name values — survive. */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val partitionDirs = listPartitionDirs(spark, path)
    if (partitionDirs.nonEmpty)
      partitionDirs.map(st => compact(spark, st.getPath.toString, targetBytes)).sum
    else rewriteDir(spark, path, targetBytes, identity)
  }

  /** Delete rows by id from an at-rest layout with a BOUNDED rewrite:
    * only directories that actually hold a deleted id are rewritten
    * (same staged-swap crash protocol as [[compact]]); every other
    * partition directory keeps its files byte-identical. At 100 TB a
    * right-to-be-forgotten batch touches the handful of cells its ids
    * live in, not the corpus — and the affected-directory probe is one
    * column-pruned scan of (id, partition value). Ids absent from the
    * layout delete nothing (idempotent: a replayed delete is a no-op).
    * Returns the number of rows removed. */
  def deleteIds(spark: org.apache.spark.sql.SparkSession, path: String,
      ids: Seq[Any], targetBytes: Long = 128L * 1024 * 1024): Long = {
    require(ids.nonEmpty, "need at least one id to delete")
    require(targetBytes > 0, "targetBytes must be positive")
    import org.apache.spark.sql.functions.col
    val full = spark.read.parquet(path)
    val hit = full.filter(col("id").isin(ids: _*))
    val partitionDirs = listPartitionDirs(spark, path)
    val drop = (df: org.apache.spark.sql.DataFrame) =>
      df.filter(!col("id").isin(ids: _*))
    if (partitionDirs.isEmpty) {
      val n = hit.count()
      if (n > 0) rewriteDir(spark, path, targetBytes, drop)
      n
    } else {
      val partCol = partitionDirs.head.getPath.getName.split('=')(0)
      val affected = hit.groupBy(col(partCol)).count().collect()
      val parent = new org.apache.hadoop.fs.Path(path)
      affected.foreach { r =>
        val dir = new org.apache.hadoop.fs.Path(parent, s"$partCol=${r.get(0)}")
        rewriteDir(spark, dir.toString, targetBytes, drop)
      }
      affected.map(_.getLong(1)).sum
    }
  }

  private def listPartitionDirs(spark: org.apache.spark.sql.SparkSession,
      path: String): Array[org.apache.hadoop.fs.FileStatus] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p)
      .filter(st => st.isDirectory && st.getPath.getName.contains("=") &&
        !st.getPath.getName.startsWith("."))
  }

  /** The staged-swap rewrite of ONE directory (no partition
    * subdirectories): read → transform → write beside → two renames.
    * A crash at any point leaves either the old dir (recoverable on
    * the next call) or a complete new one, sidecars included. */
  private def rewriteDir(spark: org.apache.spark.sql.SparkSession,
      path: String, targetBytes: Long,
      transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    // Staging dirs are SIBLINGS named with a leading '.', which Spark's
    // file index ignores — a stale leftover can never be parsed as an
    // extra partition directory (the old `<dir>._compact_old` names
    // contained '=' inside hive-partitioned roots and were).
    val parent = p.getParent
    val tmp = new org.apache.hadoop.fs.Path(parent, "._compact_tmp_" + p.getName)
    val old = new org.apache.hadoop.fs.Path(parent, "._compact_old_" + p.getName)
    // recover from a crash between the two swap renames (data staged
    // away, replacement never landed), then clear stale staging
    if (!fs.exists(p) && fs.exists(old))
      require(fs.rename(old, p), s"could not recover $path from staged copy")
    fs.delete(tmp, true)
    fs.delete(old, true)
    val totalBytes = fs.getContentSummary(p).getLength
    val files = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    transform(spark.read.parquet(path)).repartition(files)
      .write.parquet(tmp.toString)
    // metadata sidecars (`_graft_config.json`, `_graft_model.json`, …)
    // live beside the data files and are invisible to the parquet read
    // (underscore prefix), so the rewrite above does not carry them.
    // COPY them into the staged replacement BEFORE the swap renames:
    // the directory landing at `path` is complete at swap time, so a
    // crash at any point leaves either the old dir (recoverable) or a
    // full new one — never a layout whose only sidecar copy sits in a
    // staging dir the next run deletes.
    fs.listStatus(p)
      .filter(st => st.isFile && st.getPath.getName.startsWith("_") &&
        st.getPath.getName != "_SUCCESS")
      .foreach { st =>
        val dest = new org.apache.hadoop.fs.Path(tmp, st.getPath.getName)
        require(org.apache.hadoop.fs.FileUtil.copy(fs, st.getPath, fs, dest,
          false, conf), s"could not preserve sidecar ${st.getPath.getName}")
      }
    require(fs.rename(p, old), s"could not stage $path")
    require(fs.rename(tmp, p), s"could not swap compacted files into $path")
    fs.delete(old, true)
    files
  }
}
