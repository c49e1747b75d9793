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

  test("parent rollup: conserves listening mass and album counts") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rolled = mart.MartQueries.albumParentRollup(spark, sf)
    val albums = Tables.part(spark, sf)
      .select("p_brand").distinct().count()
    // every album lands under exactly one parent (itself when unmapped)
    assert(rolled.agg(sum($"n_albums")).head().getLong(0) == albums)
    // total minutes under parents == total minutes under raw albums
    // (both sides half-up-rounded per group, so compare the unrounded
    // source mass: the rollup must not drop or double-route any fact)
    val factMin = mart.MartQueries.listeningFacts(spark, sf)
      .agg(sum($"sec_played")).head().getDecimal(0)
    val parentSec = rolled.agg(sum($"total_time_min")).head().getDouble(0)
    assert(math.abs(parentSec - factMin.doubleValue() / 60.0) <
      0.1 * rolled.count(), "rounding-bounded mass conservation")
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
