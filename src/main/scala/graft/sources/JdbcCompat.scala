package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}

/** S1/S4 compat mode: the reference's actual store is a MySQL table reached
  * over JDBC (`/root/reference/Server/main.go:70-78` opens the DSN,
  * `:217,230` insert/update `employees`). A user migrating from the
  * reference keeps that edge: `spark.read/write.format("jdbc")` against the
  * same database, with Spark pushing filters into the RDBMS and — for large
  * tables — splitting the read into range-partitioned parallel queries.
  *
  * Scale notes: a single-connection JDBC read is a 1-task scan; always give
  * big tables a `partitionColumn` + bounds so each executor opens its own
  * cursor over a key range. Writes append batched INSERTs per partition
  * (`batchsize`); update-in-place at scale goes through the keyed-latest /
  * MERGE path (q23c), not per-row UPDATEs like the reference.
  *
  * Tested against embedded Derby (pure-JVM, on the Spark classpath) in
  * JdbcSpec — the protocol surface (url/driver/dbtable/partitioning
  * options) is identical for MySQL, only the DSN changes.
  */
object JdbcCompat {

  private def base(s: SparkSession, url: String, table: String,
      driver: Option[String]): DataFrameReader = {
    val r = s.read.format("jdbc").option("url", url).option("dbtable", table)
    driver.fold(r)(d => r.option("driver", d))
  }

  /** Single-cursor read — fine for dimension-sized tables. */
  def read(s: SparkSession, url: String, table: String,
      driver: Option[String] = None): DataFrame =
    base(s, url, table, driver).load()

  /** Range-partitioned parallel read: `numPartitions` concurrent cursors,
    * each scanning one slice of `[lower, upper]` on `partitionColumn`.
    */
  def readPartitioned(s: SparkSession, url: String, table: String,
      partitionColumn: String, lower: Long, upper: Long, numPartitions: Int,
      driver: Option[String] = None): DataFrame =
    base(s, url, table, driver)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lower.toString)
      .option("upperBound", upper.toString)
      .option("numPartitions", numPartitions.toString)
      .load()

  /** Append rows (S4 sink shape): batched INSERTs, one connection per
    * partition. `overwrite=true` truncates/recreates first (bootstrap).
    *
    * String columns are created as bounded VARCHAR rather than the dialect
    * default (Derby would pick CLOB, which cannot be compared, breaking
    * predicate pushdown on the way back). The width is caller-configurable;
    * the default 1024 holds any reference-shaped row with margin (the
    * reference's MySQL schema uses VARCHAR(255),
    * `/root/reference/Server/main.go` fields are short). The default is NOT
    * larger because declared width is not free on MySQL: with utf8mb4 each
    * VARCHAR(n) reserves 4n of the 65535-byte row limit, so VARCHAR(4096)
    * columns cap a table at 3 string columns before CREATE TABLE fails
    * (error 1118). Callers with known long text should widen explicitly
    * (Derby caps VARCHAR at 32672; on MySQL widths ≥ 16384 need TEXT).
    */
  def append(df: DataFrame, url: String, table: String,
      driver: Option[String] = None, overwrite: Boolean = false,
      varcharLen: Int = 1024): Unit = {
    require(varcharLen > 0, s"varcharLen must be positive, got $varcharLen")
    val stringCols = df.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.StringType)
      .map(f => s"${f.name} VARCHAR($varcharLen)").mkString(", ")
    val w = df.write.format("jdbc").option("url", url).option("dbtable", table)
    val w2 = if (stringCols.nonEmpty) w.option("createTableColumnTypes", stringCols) else w
    val wd = driver.fold(w2)(d => w2.option("driver", d))
    wd.mode(if (overwrite) "overwrite" else "append").save()
  }
}
