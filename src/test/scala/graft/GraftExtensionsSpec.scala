package graft

import org.apache.spark.sql.functions._

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("registered SQL functions evaluate through spark.sql") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c, " +
        "graft_l2sq(array(0.0d, 0.0d), array(3.0d, 4.0d)) AS d, " +
        "graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS p").head()
    assert(r.getDouble(0) === 1.0)
    assert(r.getDouble(1) === 25.0)
    assert(r.getDouble(2) === 11.0)
  }

  test("wrong arity fails with a clear message") {
    GraftExtensions.register(spark)
    val e = intercept[Exception](spark.sql("SELECT graft_dot(array(1.0d))").head())
    assert(e.getMessage.contains("graft_dot"))
  }
}
