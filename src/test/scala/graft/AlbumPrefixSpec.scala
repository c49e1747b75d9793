package graft

/** dm_album_parent_prefix: the generalized album_mapping.sql collapse —
  * planted catalog pins the longest-base pick, the already-mapped
  * anti-join, and the no-base / base-itself exclusions; the corpus test
  * re-derives every parent as the longest proper-prefix album.
  */
class AlbumPrefixSpec extends SparkSuite {

  private def run(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    core.ExtraQueries
      .albumParentPrefixOn(rows.toDF("p_partkey", "p_name", "p_brand"))
      .collect()
  }

  test("planted catalog: longest base wins, mapped children excluded") {
    val out = run(Seq(
      (1L, "Style", "1989 TV"),
      (2L, "Style", "1989 TV"), // variant-group child of 1 -> already mapped
      (3L, "Wildest", "1989 TV Deluxe"), // two bases match; longest is 1989 TV
      (4L, "AllTooWell", "Red"), // no base album is a prefix
      (5L, "Seven", "Folklore"),
      (6L, "Cardigan", "Folk"), // the base itself never maps
      (7L, "Shake", "1989") // the base itself never maps
    ))
    val byKey = out.map(r => r.getAs[Long]("child_partkey") ->
      (r.getAs[String]("child_album"), r.getAs[String]("parent_album"))).toMap
    assert(byKey.keySet == Set(1L, 3L, 5L))
    assert(byKey(1L) == ("1989 TV", "1989"))
    assert(byKey(3L) == ("1989 TV Deluxe", "1989 TV"))
    assert(byKey(5L) == ("Folklore", "Folk"))
  }

  test("corpus entry: every parent is the LONGEST proper-prefix album") {
    val out = core.ExtraQueries.albumParentPrefix(spark, sf).collect()
    assert(out.nonEmpty)
    val albums = Tables.part(spark, sf)
      .select("p_brand").distinct().collect().map(_.getString(0)).toSet
    out.foreach { r =>
      val child = r.getAs[String]("child_album")
      val parent = r.getAs[String]("parent_album")
      assert(child.startsWith(parent) && child != parent, r.toString)
      val expected = albums
        .filter(a => a != child && child.startsWith(a)).maxBy(_.length)
      assert(parent == expected, s"child=$child parent=$parent")
    }
  }
}
