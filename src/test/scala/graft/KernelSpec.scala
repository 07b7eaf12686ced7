package graft

import java.sql.Timestamp

import graft.functions.{Enums, Geo, Hashing, TextFunctions}
import graft.operators.Dedup
import org.scalatest.funsuite.AnyFunSuite
class KernelSpec extends AnyFunSuite {
  import SparkTestSession._

  // ---------- Postgres timestamptz::TEXT rendering (SURVEY §7.4 risk 1) ----
  private def pgText(tsUs: Long): String = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    Seq(tsUs).toDF("us")
      .select(Hashing.pgTimestampText(timestamp_micros(col("us"))))
      .head().getString(0)
  }

  test("pgTimestampText matches Postgres rendering incl. zero-trimming") {
    // 2025-07-30 00:00:05.734539+00
    assert(pgText(1753833605734539L) == "2025-07-30 00:00:05.734539+00")
    // trailing zeros trimmed: .5, not .500000
    assert(pgText(1753833605500000L) == "2025-07-30 00:00:05.5+00")
    // whole second: fraction omitted entirely
    assert(pgText(1753833605000000L) == "2025-07-30 00:00:05+00")
    // single trailing zero inside the fraction is kept
    assert(pgText(1753833605734500L) == "2025-07-30 00:00:05.7345+00")
    // sub-millisecond
    assert(pgText(1753833605000007L) == "2025-07-30 00:00:05.000007+00")
  }

  test("rawEventHashId equals sha256 of device|pg_text (MessageDigest oracle)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val us = 1753833605500000L
    val got = Seq(("lake-605-8-0896", us)).toDF("dev", "us")
      .select(Hashing.rawEventHashId(col("dev"), timestamp_micros(col("us"))))
      .head().getString(0)
    val text = "lake-605-8-0896|2025-07-30 00:00:05.5+00"
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val want = md.digest(text.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    assert(got == want)
  }

  // ---------- enum totality ----------
  test("enum mapping is total: every input maps, junk and null go to unknown") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val inputs = (Enums.stateMap.keys.toSeq.map(k => k.toUpperCase + " ") ++
      Seq("junkstate", "", null)).map(Tuple1(_))
    val out = inputs.toDF("s").select(Enums.mapState(col("s"))).collect()
    val allowed = Set("unknown", "idle", "active", "loading", "hauling",
      "dumping", "maintenance", "stopped")
    assert(out.forall(r => allowed.contains(r.getString(0))))
    assert(out.takeRight(3).forall(_.getString(0) == "unknown"))
  }

  // ---------- point-in-polygon ----------
  test("ray casting agrees with the winding sign test on the real polygons") {
    val rnd = new scala.util.Random(5)
    def windingInside(lon: Double, lat: Double,
        vs: Seq[(Double, Double)]): Boolean = {
      // for convex CCW polygons: inside iff all cross products positive
      vs.indices.forall { i =>
        val (x1, y1) = vs(i); val (x2, y2) = vs((i + 1) % vs.length)
        (x2 - x1) * (lat - y1) - (y2 - y1) * (lon - x1) > 0
      }
    }
    val pits = graft.operators.FeatureEngineering.lbpZones
      .filter(_._1.startsWith("Pit"))
    for (_ <- 1 to 2000) {
      val lon = -97.8410 + rnd.nextDouble() * 0.0095
      val lat = 33.2695 + rnd.nextDouble() * 0.0075
      pits.foreach { case (name, vs) =>
        assert(Geo.pointInPolygon(lon, lat, vs) == windingInside(lon, lat, vs),
          s"$name disagrees at ($lon, $lat)")
      }
    }
  }

  test("parsePosition kernel: valid forms, malformed nulls, strict grammar") {
    assert(Geo.parsePositionKernel("{33.2, -97.8, 250.5}")
      .contains(Geo.Position(-97.8, 33.2, 250.5)))
    assert(Geo.parsePositionKernel(" { 1e2 , +5 , -3.5 } ")
      .contains(Geo.Position(5.0, 100.0, -3.5)))
    assert(Geo.parsePositionKernel("garbage").isEmpty)
    assert(Geo.parsePositionKernel("{1, 2}").isEmpty)
    assert(Geo.parsePositionKernel("{1, 2, 3, 4}").isEmpty)
    assert(Geo.parsePositionKernel("{NaN, 2, 3}").isEmpty)
    assert(Geo.parsePositionKernel("{.5, 2, 3}").isEmpty)
    assert(Geo.parsePositionKernel(null).isEmpty)
  }

  // ---------- shingles + minhash ----------
  test("minhash similarity estimates jaccard (property)") {
    val words = Array("spark", "scala", "data", "mine", "truck", "load",
      "dump", "haul", "zone", "shift")
    val rnd = new scala.util.Random(17)
    for (_ <- 1 to 100) {
      val base = Array.fill(60)(words(rnd.nextInt(words.length)))
      val a = base.mkString(" ")
      val b = base.drop(rnd.nextInt(31)).mkString(" ")
      val sa = TextFunctions.wordShingleKernel(a, 3).toSet
      val sb = TextFunctions.wordShingleKernel(b, 3).toSet
      if (sa.nonEmpty && sb.nonEmpty) {
        val jac = sa.intersect(sb).size.toDouble / sa.union(sb).size
        val ma = Dedup.minhashSig(sa.toSeq, 128)
        val mb = Dedup.minhashSig(sb.toSeq, 128)
        val est = ma.zip(mb).count { case (x, y) => x == y } / 128.0
        assert(math.abs(est - jac) < 0.3, s"est $est vs jac $jac")
      }
    }
  }

  test("simhash: identical texts collide, small edits stay near") {
    val t1 = "the quick brown fox jumps over the lazy dog again and again"
    val t2 = t1 + " extra"
    val s1 = Dedup.simHash64(TextFunctions.charShingleKernel(t1, 5))
    val s1b = Dedup.simHash64(TextFunctions.charShingleKernel(t1, 5))
    val s2 = Dedup.simHash64(TextFunctions.charShingleKernel(t2, 5))
    assert(s1 == s1b)
    assert(java.lang.Long.bitCount(s1 ^ s2) <= 12)
  }

  test("portable md5 shingle hash matches DuckDB md5_number_upper bits") {
    // DuckDB: SELECT md5_number_upper('abc') = 12704604231530709392
    //         (first 8 md5 bytes little-endian); as a signed long that is
    //         12704604231530709392 - 2^64
    val md = java.security.MessageDigest.getInstance("MD5")
    assert(Dedup.hash64Md5(md, "abc") == -5742139842178842224L)
    assert(Dedup.hash64Md5(md, "") == java.lang.Long.reverseBytes(
      java.lang.Long.parseUnsignedLong("d41d8cd98f00b204", 16)))
    // portable SimHash is deterministic and differs from the murmur one
    val sh = TextFunctions.charShingleKernel("the quick brown fox", 5)
    assert(Dedup.simHash64Md5(sh) == Dedup.simHash64Md5(sh))
  }

  test("simhash multi-chunk blocking is complete at maxHamming 7") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // mutated copies of a few base texts → pairs across many Hamming radii
    val words = Seq("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet", "kilo", "lima")
    val rnd = new scala.util.Random(23)
    val docs = (0 until 40).map { i =>
      val base = Array.tabulate(30)(j => words((i / 10 + j) % words.length))
      if (i % 10 != 0) base(rnd.nextInt(base.length)) = words(rnd.nextInt(words.length))
      (i.toLong, base.mkString(" "))
    }.toDF("doc_id", "text")
    val got = graft.operators.Dedup
      .simhashDupPairs(docs, "doc_id", "text", maxHamming = 7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // brute-force truth over the same signatures
    val sigs = docs.collect().map { r =>
      r.getLong(0) -> graft.operators.Dedup.simHash64(
        graft.functions.TextFunctions.charShingleKernel(r.getString(1), 5))
    }
    val truth = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs
      if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= 7
    } yield (ia, ib)).toSet
    assert(got == truth, s"missing=${truth -- got} extra=${got -- truth}")
    assert(truth.nonEmpty)
  }

  test("lang-ID covers the widened stopword tables") {
    import spark.implicits._
    val samples = Seq(
      "the cat sat on the mat and it was happy with this",
      "el perro corre por la calle y se va para el parque",
      "le chat est dans la maison et il dort pour le moment",
      "der hund ist in dem haus und er schlaeft nicht im garten",
      "il cane corre per la strada e non sono come gli altri",
      "o cachorro corre para a rua com um amigo e mais um",
      "de hond is in het huis en hij slaapt niet op de bank",
      "zzz qqq xxx")
    val out = samples.toDF("text")
      .select(graft.functions.TextFunctions.langId(org.apache.spark.sql
        .functions.col("text")).as("lang"))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("en", "es", "fr", "de", "it", "pt", "nl", "und"),
      out.mkString(","))
  }

  test("enum truth table matches the reference CASE arms exactly") {
    // 02_raw_telemetry_transform.py:282-327 — every WHEN arm pinned so a
    // refactor cannot silently drop or remap one
    val stateArms = Map(
      "idle" -> "idle", "loading" -> "loading",
      "loadingmaneuver" -> "loading", "dumping" -> "dumping",
      "dumpingmaneuver" -> "dumping", "loadtodump" -> "hauling",
      "dumptoload" -> "hauling", "leadqueueddumptoload" -> "hauling",
      "leadqueuedloadtodump" -> "hauling",
      "zonequeueddumptoload" -> "hauling",
      "zonequeuedloadtodump" -> "hauling", "waitingtodump" -> "stopped",
      "active" -> "active", "maintenance" -> "maintenance",
      "stopped" -> "stopped", "hauling" -> "hauling")
    assert(Enums.stateMap == stateArms)
    val swArms = Map(
      "fault" -> "fault", "start" -> "autonomous", "stop" -> "manual",
      "dump" -> "autonomous", "slow" -> "intervention",
      "wait" -> "autonomous", "manual" -> "manual",
      "autonomous" -> "autonomous", "intervention" -> "intervention",
      "disabled" -> "disabled", "calibrating" -> "calibrating")
    assert(Enums.softwareStateMap == swArms)
    val prndlArms = Map(
      "park" -> "park", "p" -> "park", "reverse" -> "reverse",
      "r" -> "reverse", "neutral" -> "neutral", "n" -> "neutral",
      "drive" -> "drive", "d" -> "drive", "low" -> "low", "l" -> "low")
    assert(Enums.prndlMap == prndlArms)
  }

  test("gopherStatsKernel matches the hand-computed repetition fixture") {
    import graft.functions.TextFunctions
    // lines: "a b" x3 + "c d" -> dlf (4-2)/4, dlcf (2*3)/(3*3+3)
    // norm "a b c d a b a b": top 2-gram "a b" count 3, chars 3, len 15
    // 5-grams all distinct -> dup5 0
    val (dlf, dlcf, tf, df) =
      TextFunctions.gopherStatsKernel("a b\nc d\na b\na b", 2, 5)
    assert(dlf == 0.5 && dlcf == 0.5)
    assert(tf == 9.0 / 15)
    assert(df == 0.0)
    // tie on counts -> lexicographically smallest gram wins
    val (_, _, tfTie, _) = TextFunctions.gopherStatsKernel("x y y x", 2, 5)
    assert(tfTie == 3.0 / 7)
    // degenerate loop: every 5-gram duplicated
    val loop = Seq.fill(8)("p q r s t").mkString(" ")
    val (_, _, _, dfLoop) = TextFunctions.gopherStatsKernel(loop, 2, 5)
    assert(dfLoop == 1.0)
    assert(TextFunctions.gopherStatsKernel("", 2, 5) ==
      ((0.0, 0.0, 0.0, 0.0)))
  }

  test("WKT POINT Z rendering matches the PostGIS ST_AsText shape") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((Some((-97.835, 33.269, 250.33))), (None))
      .toDF("p")
      .select(when(col("p").isNotNull, struct(
        col("p._1").as("lon"), col("p._2").as("lat"), col("p._3").as("alt")))
        .as("pos"))
    val out = df.select(Geo.toWktPointZ(col("pos"))).collect()
    assert(out(0).getString(0) == "POINT Z (-97.835 33.269 250.33)")
    assert(out(1).isNullAt(0))
  }
}
