package graft

import graft.sources.JdbcCompat
import org.apache.spark.sql.functions._

/** S1/S4 JDBC compat mode against embedded Derby (pure JVM, on the Spark
  * classpath): the employee-table round trip the reference does against
  * MySQL (Server/main.go:70-78,217,230), plus the two properties that make
  * the JDBC edge scale — predicate pushdown into the RDBMS and
  * range-partitioned parallel reads.
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val driver = Some("org.apache.derby.jdbc.EmbeddedDriver")

  System.setProperty("derby.system.home", "/tmp/derby")

  test("S1/S4: employee view round-trips through a JDBC table") {
    val emp = queries.RelationalPipeline.employeeView(spark, sf)
      .filter($"id" <= 200)
    JdbcCompat.append(emp, url, "employees", driver, overwrite = true)
    val back = JdbcCompat.read(spark, url, "employees", driver)
    assert(back.count() == emp.count())
    assert(back.except(emp).isEmpty && emp.except(back).isEmpty,
      "JDBC round trip must preserve every row")
    // S4 append semantics: a second write adds rows, not replaces
    val extra = emp.filter($"id" <= 10)
    JdbcCompat.append(extra, url, "employees", driver)
    assert(JdbcCompat.read(spark, url, "employees", driver).count() ==
      emp.count() + extra.count())
  }

  test("JDBC scan pushes predicates into the database") {
    val emp = queries.RelationalPipeline.employeeView(spark, sf)
      .filter($"id" <= 200)
    JdbcCompat.append(emp, url, "employees_pushdown", driver, overwrite = true)
    val filtered = JdbcCompat.read(spark, url, "employees_pushdown", driver)
      .filter($"id" < 50 && $"segment" === "BUILDING")
      .select($"id", $"salary")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:"), plan)
    assert(plan.contains("LessThan(") || plan.contains("ID < 50"), plan)
    assert(plan.contains("EqualTo(") || plan.contains("BUILDING"), plan)
    // and the values agree with computing the filter in Spark
    val expected = emp.filter($"id" < 50 && $"segment" === "BUILDING")
      .select($"id", $"salary")
    assert(filtered.except(expected).isEmpty && expected.except(filtered).isEmpty)
  }

  test("partitioned JDBC read opens one range cursor per partition") {
    val emp = queries.RelationalPipeline.employeeView(spark, sf)
      .filter($"id" <= 200)
    JdbcCompat.append(emp, url, "employees_part", driver, overwrite = true)
    val part = JdbcCompat.readPartitioned(spark, url, "employees_part",
      "id", lower = 1L, upper = 200L, numPartitions = 4, driver = driver)
    assert(part.rdd.getNumPartitions == 4)
    assert(part.count() == emp.count(), "range partitions must cover all rows")
    // rows actually spread across cursors (no empty-middle degenerate split)
    val perPart = part.groupBy(spark_partition_id().as("p")).count()
      .filter($"count" > 0).count()
    assert(perPart >= 2, "rows must spread over multiple range partitions")
  }
}
