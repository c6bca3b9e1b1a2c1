package graft

import org.apache.spark.sql.functions._

/** q178 Z-order layout: the shared Morton template against a bit-level
  * Scala reference (the DuckDB rendering of the same template is
  * exercised by the oracle gate), the bucket table against a sequential
  * recomputation from raw fixture rows, and the locality guarantee —
  * every bucket's bounding box spans at most ~1/8 of each dimension's
  * corpus range — which IS the multi-dimensional file-pruning property
  * the layout exists for.
  */
class ZOrderSpec extends SparkSuite {

  private def spreadRef(x: Long): Long =
    (0 until 8).map(i => ((x >> i) & 1L) << (2 * i)).sum

  private def mortonRef(u: Long, v: Long): Long =
    (spreadRef(u) << 1) | spreadRef(v)

  test("mortonZ16 matches the bit-level reference for all 8-bit inputs") {
    import spark.implicits._
    val cases = for (u <- 0L to 255L by 17; v <- 0L to 255L by 13) yield (u, v)
    val sparkZ = graft.queries.Pipeline.mortonZ16("u8", "d8",
      (x, n) => s"shiftleft($x, $n)")
    val got = cases.toDF("u8", "d8").select(col("u8"), col("d8"),
      expr(sparkZ).as("z")).collect()
    got.foreach { r =>
      assert(r.getLong(2) == mortonRef(r.getLong(0), r.getLong(1)),
        s"morton(${r.getLong(0)}, ${r.getLong(1)})")
    }
    // the interleave is a bijection on the 16-bit domain — no two inputs
    // may collide (a mask typo collapses bits silently otherwise)
    assert(got.map(_.getLong(2)).distinct.length == cases.size)
  }

  test("q178 buckets match a sequential reference and bound both spans") {
    val ev = Tables(spark, sf(), "events")
      .select(col("user_id"),
        expr("CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01') AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val (umin, umax) = (ev.map(_._1).min, ev.map(_._1).max)
    val (dmin, dmax) = (ev.map(_._2).min, ev.map(_._2).max)
    val (ru, rd) = (umax - umin + 1, dmax - dmin + 1)
    val expected = ev.map { case (u, d) =>
      val z = mortonRef((u - umin) * 256 / ru, (d - dmin) * 256 / rd)
      (z / 1024, u, d)
    }.groupBy(_._1).map { case (b, rows) =>
      b -> ((rows.size.toLong, rows.map(_._2).min, rows.map(_._2).max,
        rows.map(_._3).min, rows.map(_._3).max))
    }
    val got = graft.queries.Catalog.all("q178_zorder_layout")
      .build(spark, sf()).collect().map { r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      }.toMap
    assert(got.keySet == expected.keySet,
      s"buckets spark=${got.keySet.toSeq.sorted} ref=${expected.keySet.toSeq.sorted}")
    expected.foreach { case (b, (n, ulo, uhi, dlo, dhi)) =>
      val (gn, gul, guh, gdl, gdh, us, ds) = got(b)
      assert((gn, gul, guh, gdl, gdh) == ((n, ulo, uhi, dlo, dhi)),
        s"bucket $b")
      assert(us == guh - gul && ds == gdh - gdl, s"span columns of $b")
      // locality: a bucket fixes the top 3 normalized bits of each dim,
      // so each raw span is < range/8 + 1 (the pruning guarantee)
      assert(us * 8 <= ru + 7, s"bucket $b user span $us vs range $ru")
      assert(ds * 8 <= rd + 7, s"bucket $b day span $ds vs range $rd")
    }
    assert(expected.size > 1, "fixture must exercise more than one bucket")
  }
}
