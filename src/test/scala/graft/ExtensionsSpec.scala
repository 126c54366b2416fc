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

  test("array_pairs enumerates all ordered pairs, empty below two elements") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT array_pairs(array(1L, 2L, 3L)) AS p3,
                array_pairs(array(7L)) AS p1,
                array_pairs(CAST(array() AS ARRAY<BIGINT>)) AS p0""").collect().head
    val p3 = r.getSeq[org.apache.spark.sql.Row](0)
      .map(x => (x.getLong(0), x.getLong(1)))
    assert(p3 == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(r.getSeq[Any](1).isEmpty && r.getSeq[Any](2).isEmpty)
  }

  test("stride_sample is callable from SQL and matches the substring form") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT stride_sample('abcdefgh', 4) AS s,
                transform(sequence(0, 3),
                  i -> ascii(substring('abcdefgh', (i * 8) DIV 4 + 1, 1))) AS want
      """).collect().head
    assert(r.getSeq[Int](0) == r.getSeq[Int](1))
    assert(r.getSeq[Int](0) == Seq('a'.toInt, 'c'.toInt, 'e'.toInt, 'g'.toInt))
  }

  test("count_substring and minibpe_merges are callable from SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT count_substring('aaa the aaa', 'aa') AS c, " +
        "minibpe_merges('the') AS m, minibpe_merges('') AS z").collect().head
    assert(r.getInt(0) == 2)          // non-overlapping: 'aaa' counts once
    // 'th' merges (vocabulary pair), leaving 'e' — exactly one merge
    assert(r.getInt(1) == 1 && r.getInt(2) == 0)
  }
}
