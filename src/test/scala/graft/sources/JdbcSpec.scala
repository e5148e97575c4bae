package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** S7 (JDBC row source) against a real database: Spark ships Derby (for
  * the Hive metastore), so the embedded engine gives the JDBC path a
  * true round-trip — DDL + inserts over java.sql, then plain and
  * range-partitioned Spark reads. */
class JdbcSpec extends SparkSpec {

  test("JdbcSource round-trips an embedded Derby table, plain and partitioned") {
    val dir = java.nio.file.Files.createTempDirectory("graft-derby")
    val url = s"jdbc:derby:${dir.resolve("db")};create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE posts (id INT PRIMARY KEY, category VARCHAR(32), followers INT)")
      val ps = conn.prepareStatement("INSERT INTO posts VALUES (?, ?, ?)")
      (0 until 100).foreach { i =>
        ps.setInt(1, i); ps.setString(2, s"cat${i % 5}"); ps.setInt(3, i * 10)
        ps.addBatch()
      }
      ps.executeBatch()
    } finally conn.close()

    val plain = JdbcSource.read(spark, url, "posts", "app", "")
    assert(plain.count() == 100)
    assert(plain.columns.map(_.toLowerCase).toSet == Set("id", "category", "followers"))

    // partitioned bulk read: 4 range predicates on the key column
    val parted = JdbcSource.read(spark, url, "posts", "app", "",
      partitionColumn = Some("id"), lowerBound = 0L, upperBound = 100L,
      numPartitions = 4)
    assert(parted.rdd.getNumPartitions == 4,
      "partitioned JDBC read must produce one partition per range predicate")
    assert(parted.agg(sum("followers")).head().getLong(0) ==
      (0 until 100).map(_ * 10L).sum)
    assertSameRows(plain, parted, "plain vs partitioned JDBC read")
  }
}
