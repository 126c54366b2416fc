package graft

/** The SQL surface of graft's native expressions, registered into the shared
  * session (the withExtensions builder path uses the identical builder list —
  * see GraftExtensions.functions).
  */
class ExtensionsSpec extends SparkSpec {

  test("graft functions are callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT dot_product(array(1d, 2d), array(3d, 4d)) AS dp,
                size(shingles('a b c d', 2)) AS ns,
                size(winnow('abcdefghij', 3, 2)) AS nw""").collect().head
    assert(r.getDouble(0) == 11.0)
    assert(r.getInt(1) == 3)
    assert(r.getInt(2) >= 1)
  }

  test("hash and int8 kernels are callable from SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT splitmix64(42L) AS sm,
                poly_hash('abc') AS ph,
                dot_product_int8(array(1Y, 2Y), array(3Y, 4Y)) AS d8""").collect().head
    assert(r.getLong(0) == graft.plans.MixHash.splitmix64(42L))
    assert(r.getLong(1) == graft.plans.MixHash.polyHash("abc"))
    assert(r.getLong(2) == 11L)
  }
}
