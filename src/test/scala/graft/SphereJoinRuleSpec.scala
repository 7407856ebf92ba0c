package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.functions.GraftFunctions.st

/** SQL planner surface for geography (spherical) joins: a SQL user writing
  * `JOIN ON st_dwithinsphere(a, b, r)` must get the two-level-grid plan,
  * not a quadratic BroadcastNestedLoopJoin. */
class SphereJoinRuleSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def beforeAll(): Unit = {
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.install(spark)
  }
  override def afterAll(): Unit = spark.stop()

  private def planString(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def withBroadcastOff[T](body: => T): T = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  private def ruleOff[T](body: => T): T = {
    spark.conf.set("spark.graft.join.sphere.enabled", "false")
    try body finally spark.conf.set("spark.graft.join.sphere.enabled", "true")
  }

  /** lon over the full ring (wrap pairs at ±180), lat to ±89.5. */
  private def pts(n: Int, seed: Int, idc: String, gc: String): DataFrame =
    spark.range(n).select(col("id").as(idc),
      st.point(pmod(hash(col("id") * 3 + seed), lit(7200)) / 20.0 - 180.0,
        pmod(hash(col("id") * 11 + seed), lit(3580)) / 20.0 - 89.5).as(gc))

  private def assertGrid(p: String): Unit = {
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"sphere rewrite must purge BNLJ/cartesian:\n${p.take(3000)}")
    assert(p.toLowerCase.contains("gridcells_sphere"),
      s"spherical grid explode missing:\n${p.take(3000)}")
  }

  test("SQL st_dwithinsphere join: grid plan, results ≡ rule-off BNLJ") {
    pts(220, 71, "aid", "ag").createOrReplaceTempView("sph_a")
    pts(220, 73, "bid", "bg").createOrReplaceTempView("sph_b")
    val sql = "SELECT aid, bid FROM sph_a JOIN sph_b " +
      "ON st_dwithinsphere(ag, bg, 300000.0)"
    val (p, got) = withBroadcastOff {
      val df = spark.sql(sql)
      (planString(df), df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
    }
    assertGrid(p)
    val expect = ruleOff {
      spark.sql(sql).collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    }
    assert(got.nonEmpty && got == expect)
  }

  test("SQL st_distancesphere < d: strict boundary survives the inclusive candidates") {
    // place one pair at EXACTLY distance d (same meridian, d = R * dLat):
    // <= admits it, < must not
    spark.sql("""SELECT * FROM VALUES
        (1L, st_point(10.0D, 0.0D)), (2L, st_point(50.0D, 30.0D))
      AS t(aid, ag)""").createOrReplaceTempView("sphs_a")
    spark.sql("""SELECT * FROM VALUES
        (10L, st_point(10.0D, 1.0D)), (20L, st_point(-120.0D, -70.0D))
      AS t(bid, bg)""").createOrReplaceTempView("sphs_b")
    val d = spark.sql(
      "SELECT st_distancesphere(st_point(10.0D, 0.0D), st_point(10.0D, 1.0D))")
      .collect().head.getDouble(0)
    val strict = s"SELECT aid, bid FROM sphs_a JOIN sphs_b " +
      s"ON st_distancesphere(ag, bg) < CAST($d AS DOUBLE)"
    val incl = s"SELECT aid, bid FROM sphs_a JOIN sphs_b " +
      s"ON st_distancesphere(ag, bg) <= CAST($d AS DOUBLE)"
    withBroadcastOff {
      assert(spark.sql(strict).collect().isEmpty, "strict must exclude the boundary pair")
      val inclRows = spark.sql(incl).collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(inclRows.toSeq == Seq((1L, 10L)), "inclusive must admit exactly the boundary pair")
    }
  }

  test("SQL st_intersectssphere join incl. polar caps + dateline: grid plan ≡ rule-off") {
    val caps = spark.sql("""SELECT aid, st_geomfromwkt(w) AS ag FROM VALUES
      (1000L, 'POLYGON ((0 71, 30 71, 60 71, 90 71, 120 71, 150 71, 180 71, -150 71, -120 71, -90 71, -60 71, -30 71, 0 71))'),
      (1001L, 'POLYGON ((175 -20, -175 -20, -175 20, 175 20, 175 -20))')
      AS t(aid, w)""")
    val polys = spark.range(40).selectExpr("id AS aid",
      """st_makeenvelope(CAST(pmod(hash(id), 300) AS DOUBLE) - 150.0,
         CAST(pmod(hash(id*7), 120) AS DOUBLE) - 60.0,
         CAST(pmod(hash(id), 300) AS DOUBLE) - 145.0,
         CAST(pmod(hash(id*7), 120) AS DOUBLE) - 55.0) AS ag""")
      .unionAll(caps)
    polys.createOrReplaceTempView("sphi_a")
    spark.range(250).selectExpr("id AS bid",
      """st_point(CAST(pmod(hash(id*3), 340) AS DOUBLE) - 170.0,
         CAST(pmod(hash(id*11), 160) AS DOUBLE) - 80.0) AS bg""")
      .createOrReplaceTempView("sphi_b")
    val sql = "SELECT aid, bid FROM sphi_a JOIN sphi_b ON st_intersectssphere(ag, bg)"
    val (p, got) = withBroadcastOff {
      val df = spark.sql(sql)
      (planString(df), df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
    }
    assertGrid(p)
    val expect = ruleOff {
      spark.sql(sql).collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    }
    assert(got.nonEmpty && got == expect)
    assert(got.exists(_._1 >= 1000L), "cap/dateline rows must participate")
  }

  test("SQL st_containssphere with swapped args inverts to within, ≡ rule-off") {
    spark.range(30).selectExpr("id AS aid",
      """st_makeenvelope(CAST(pmod(hash(id), 300) AS DOUBLE) - 150.0,
         CAST(pmod(hash(id*7), 120) AS DOUBLE) - 60.0,
         CAST(pmod(hash(id), 300) AS DOUBLE) - 140.0,
         CAST(pmod(hash(id*7), 120) AS DOUBLE) - 50.0) AS ag""")
      .createOrReplaceTempView("sphc_a")
    spark.range(250).selectExpr("id AS bid",
      """st_point(CAST(pmod(hash(id*3), 340) AS DOUBLE) - 170.0,
         CAST(pmod(hash(id*11), 160) AS DOUBLE) - 80.0) AS bg""")
      .createOrReplaceTempView("sphc_b")
    // polygon side is the SECOND table: pred args arrive (right, left)
    val sql = "SELECT aid, bid FROM sphc_b JOIN sphc_a ON st_containssphere(ag, bg)"
    val (p, got) = withBroadcastOff {
      val df = spark.sql(sql)
      (planString(df), df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
    }
    assertGrid(p)
    val expect = ruleOff {
      spark.sql(sql).collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    }
    assert(got.nonEmpty && got == expect)
  }

  test("SQL LEFT OUTER st_dwithinsphere join keeps unmatched left rows") {
    pts(150, 81, "laid", "lag").createOrReplaceTempView("spho_a")
    pts(60, 83, "rbid", "rbg").createOrReplaceTempView("spho_b")
    val sql = "SELECT laid, rbid FROM spho_a LEFT JOIN spho_b " +
      "ON st_dwithinsphere(lag, rbg, 200000.0)"
    def key(x: org.apache.spark.sql.Row) =
      (x.getLong(0), if (x.isNullAt(1)) Long.MinValue else x.getLong(1))
    val (p, got) = withBroadcastOff {
      val df = spark.sql(sql)
      (planString(df), df.collect().map(key).sorted.toSeq)
    }
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"outer sphere rewrite must purge BNLJ:\n${p.take(3000)}")
    val expect = ruleOff {
      spark.sql(sql).collect().map(key).sorted.toSeq
    }
    assert(got.nonEmpty && got == expect)
    assert(got.exists(_._2 == Long.MinValue), "some left rows must be unmatched")
  }

  test("SQL LEFT SEMI / LEFT ANTI st_dwithinsphere joins: grid plan ≡ rule-off") {
    pts(150, 91, "said", "sag").createOrReplaceTempView("sphsa_a")
    pts(60, 93, "sbid", "sbg").createOrReplaceTempView("sphsa_b")
    for (kind <- Seq("SEMI", "ANTI")) {
      val sql = s"SELECT said FROM sphsa_a LEFT $kind JOIN sphsa_b " +
        "ON st_dwithinsphere(sag, sbg, 200000.0)"
      val (p, got) = withBroadcastOff {
        val df = spark.sql(sql)
        (planString(df), df.collect().map(_.getLong(0)).sorted.toSeq)
      }
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"$kind sphere rewrite must purge BNLJ:\n${p.take(3000)}")
      val expect = ruleOff {
        spark.sql(sql).collect().map(_.getLong(0)).sorted.toSeq
      }
      assert(got.nonEmpty && got == expect, s"$kind results differ")
      assert(got == got.distinct, s"$kind must emit each left row at most once")
    }
  }

  test("SQL LEFT OUTER with SAME-NAMED columns on both sides rewrites positionally") {
    pts(150, 95, "id", "g").createOrReplaceTempView("sphn_a")
    pts(60, 97, "id", "g").createOrReplaceTempView("sphn_b")
    val sql = "SELECT a.id AS aid, b.id AS bid FROM sphn_a a LEFT JOIN sphn_b b " +
      "ON st_dwithinsphere(a.g, b.g, 200000.0)"
    def key(x: org.apache.spark.sql.Row) =
      (x.getLong(0), if (x.isNullAt(1)) Long.MinValue else x.getLong(1))
    val (p, got) = withBroadcastOff {
      val df = spark.sql(sql)
      (planString(df), df.collect().map(key).sorted.toSeq)
    }
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"same-named outer sphere rewrite must purge BNLJ:\n${p.take(3000)}")
    val expect = ruleOff { spark.sql(sql).collect().map(key).sorted.toSeq }
    assert(got.nonEmpty && got == expect)
    assert(got.exists(_._2 == Long.MinValue), "some left rows must be unmatched")
  }

  test("tiny side declines the rewrite; extra conjuncts survive as remainder") {
    // 3-row side under minSideBytes with broadcast on: BNLJ is the right
    // plan, the rule must not fire
    pts(3, 91, "aid", "ag").createOrReplaceTempView("spht_a")
    pts(200, 93, "bid", "bg").createOrReplaceTempView("spht_b")
    val tiny = spark.sql("SELECT aid, bid FROM spht_a JOIN spht_b " +
      "ON st_dwithinsphere(ag, bg, 500000.0)")
    assert(planString(tiny).contains("BroadcastNestedLoopJoin"),
      "tiny side should keep the broadcast BNLJ")
    // remainder conjunct (aid % 2 = bid % 2) filters pairs identically
    val sql = "SELECT aid, bid FROM spht_a JOIN spht_b " +
      "ON st_dwithinsphere(ag, bg, 500000.0) AND aid % 2 = bid % 2"
    val got = withBroadcastOff {
      spark.sql(sql).collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    }
    val expect = ruleOff {
      spark.sql(sql).collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    }
    assert(got == expect)
    // one small side does NOT excuse a BNLJ when the pair PRODUCT is
    // large — 1k x 30k is 30M geodesic refines, the grid must fire
    pts(1000, 95, "cid", "cg").createOrReplaceTempView("spht_c")
    pts(30000, 97, "did", "dg").createOrReplaceTempView("spht_d")
    val prod = spark.sql("SELECT cid, did FROM spht_c JOIN spht_d " +
      "ON st_dwithinsphere(cg, dg, 500000.0)")
    val pp = planString(prod)
    assert(!pp.contains("BroadcastNestedLoopJoin"),
      s"large pair product must engage the grid even with one small side:\n$pp")
  }

  test("LEFT OUTER declines rewrite when a side already has __spj_id/__spj_mid") {
    // the left-type rewrite tags the left with __spj_id and joins the
    // matched-id set as __spj_mid; a user column with either name would be
    // silently replaced / ambiguous, so the rule must keep the default plan
    // and still return correct results
    pts(150, 301, "aid", "ag")
      .withColumn("__spj_id", col("aid") * 1000)
      .createOrReplaceTempView("sphr_a")
    pts(150, 303, "bid", "bg").createOrReplaceTempView("sphr_b")
    val sql = "SELECT aid, __spj_id, bid FROM sphr_a LEFT JOIN sphr_b " +
      "ON st_dwithinsphere(ag, bg, 400000.0)"
    val got = spark.sql(sql).collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
      .sorted.toSeq
    val expect = ruleOff {
      spark.sql(sql).collect()
        .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
        .sorted.toSeq
    }
    assert(got.nonEmpty && got == expect)
    assert(got.forall { case (aid, sid, _) => sid == aid * 1000 },
      "user __spj_id column must survive untouched")
  }
}
