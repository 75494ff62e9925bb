package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Fnv1a
import graft.functions.GraftExtensions

/** The extensions-registered SQL surface of the native expressions. */
class ExtensionsSpec extends AnyFunSuite {

  test("fnv1a32, arr_dot, rolling_hash31 callable from SQL via GraftExtensions") {
    // Extensions bind at session build; getOrCreate would return the shared
    // test session without them. Clear the default/active session so the
    // builder constructs a fresh one (reusing the JVM's SparkContext), then
    // restore the shared session for later suites.
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val spark = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val hash = spark.sql("SELECT fnv1a32('foobar')").collect().head.getLong(0)
      assert(hash == Fnv1a.hash32("foobar"))
      val dot = spark.sql(
        "SELECT arr_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))")
        .collect().head.getDouble(0)
      assert(dot == 11.0)
      val rh = spark.sql("SELECT rolling_hash31('abc')")
        .collect().head.getLong(0)
      // ((0*31+97)*31+98)*31+99 masked to 31 bits.
      assert(rh == (((97L * 31 + 98) * 31 + 99) & 0x7FFFFFFFL))
    } finally {
      prior.foreach { s =>
        SparkSession.setDefaultSession(s)
        SparkSession.setActiveSession(s)
      }
    }
  }
}
