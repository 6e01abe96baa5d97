package graft.domain

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** HTML-fixture extraction test (SURVEY §5) over a synthetic reed-shaped
  * page (structure mirrors the reference fixture; content is ours).
  */
class ExtractSpec extends SparkSpec {
  import spark.implicits._

  private val adHtml =
    """<html><head><script>
      |  dataLayer = [{
      |    jobId: 123456,
      |    jobPostedDate: '20/10/2021',
      |    jobTitle: 'Data Engineer',
      |    jobLocation: 'Leeds',
      |    jobRecruiterName: 'ACME Analytics',
      |    jobType: 'Permanent',
      |  }];
      |</script></head><body>
      |<span itemprop="baseSalary">
      |  <meta itemprop="currency" content="GBP">
      |  <meta itemprop="minValue" content="40000.00">
      |  <meta itemprop="maxValue" content="50000.00">
      |  <meta itemprop="value" content="45000.00">
      |  <meta itemprop="unitText" content="YEAR">
      |</span>
      |<span itemprop="description"><p>Great <b>opportunity</b> in data.</p></span>
      |</body></html>""".stripMargin

  private val competitiveHtml = adHtml
    .replaceAll("(?s)<span itemprop=\"baseSalary\">.*?</span>",
      "<span itemprop=\"baseSalary\">Competitive salary</span>")

  private val legacyHtml = "<html><body>listing page, no salary span</body></html>"

  test("reed extraction parses dataLayer, salary metas and description") {
    val out = Extract.reed(Seq(adHtml).toDF("text")).head()
    assert(out.getAs[String]("id") == "123456")
    assert(out.getAs[Timestamp]("created") ==
      Timestamp.valueOf("2021-10-20 00:00:00"))
    assert(out.getAs[String]("job_title_raw") == "Data Engineer")
    assert(out.getAs[String]("job_location_raw") == "Leeds")
    assert(out.getAs[String]("company_raw") == "ACME Analytics")
    assert(out.getAs[Double]("raw_min_salary") == 40000.0)
    assert(out.getAs[Double]("raw_max_salary") == 50000.0)
    assert(out.getAs[String]("raw_salary_unit") == "YEAR")
    assert(out.getAs[String]("raw_salary_currency") == "GBP")
    assert(!out.getAs[Boolean]("salary_competitive"))
    assert(out.getAs[String]("description") == "Great opportunity in data.")
  }

  test("competitive ads null the salary fields but set the flag") {
    val out = Extract.reed(Seq(competitiveHtml).toDF("text")).head()
    assert(out.getAs[Boolean]("salary_competitive"))
    assert(out.isNullAt(out.fieldIndex("raw_salary")))
    assert(out.isNullAt(out.fieldIndex("raw_salary_unit")))
  }

  test("legacy pages without baseSalary are dropped") {
    assert(Extract.reed(Seq(legacyHtml).toDF("text")).count() == 0)
  }

  // ---- Indeed (ref flows/extract/indeed.py:22-108; fixture mirrors the
  // structure of flows/extract/tests/ example_indeed_ad.html) ----

  private val indeedHtml =
    """<html><head><script>
      |window._initialData={"jobKey":"a1b2c3d4e5f6","jobTitle":"Data Scientist",
      |"jobLocation":"Manchester","hiringCompanyName":"ACME Robotics",
      |"salaryText":"£40000 a year","other":1}
      |</script></head><body>
      |<span class="indeed-apply-widget" data-indeed-apply-joburl="https://jobs.example/apply/a1b2c3d4e5f6"></span>
      |<div class="jobsearch-jobDescriptionText"><p>Build <b>models</b>.</p><p>Ship them.</p></div>
      |</body></html>""".stripMargin

  test("indeed extraction parses jobKey JSON fields, widget url, description") {
    val out = Extract.indeed(Seq(indeedHtml).toDF("text"), "2021-07-05").head()
    assert(out.getAs[String]("id") == "a1b2c3d4e5f6")
    assert(out.getAs[String]("data_source") == "Indeed")
    assert(out.getAs[String]("url") ==
      "https://jobs.example/apply/a1b2c3d4e5f6")
    assert(out.getAs[java.sql.Date]("created") ==
      java.sql.Date.valueOf("2021-07-05"))
    assert(out.getAs[String]("job_title_raw") == "Data Scientist")
    assert(out.getAs[String]("job_location_raw") == "Manchester")
    assert(out.getAs[String]("company_raw") == "ACME Robotics")
    assert(out.isNullAt(out.fieldIndex("contract_type_raw")))
    assert(out.getAs[String]("description") == "Build models . Ship them.")
    assert(out.isNullAt(out.fieldIndex("closing_date_raw")))
    assert(out.getAs[String]("job_salary_raw") == "£40000 a year")
  }

  test("indeed pages without a jobKey are dropped") {
    val noKey = indeedHtml.replace("\"jobKey\":\"a1b2c3d4e5f6\",", "")
    assert(Extract.indeed(Seq(noKey).toDF("text"), "2021-07-05").count() == 0)
  }
}

/** D2 vector dedup: planted duplicates produce high-score links. */
class VectorDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  test("identical vectors in the same window link with weight 1") {
    val dim = 8
    val v1 = Array.tabulate(dim)(i => (i + 1).toFloat)
    val far = Array.tabulate(dim)(i => ((i * 37) % 11 - 5).toFloat * 3f)
    val vecs = Seq(
      ("a", ts("2021-02-01"), v1),
      ("b", ts("2021-02-03"), v1), // exact dup of a
      ("c", ts("2021-02-05"), far),
    ).toDF("id", "created", "vector")
    val links = VectorDedup.nearDuplicateLinks(vecs, dim = dim,
      backgroundSample = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(links.exists { case (f, s, w) => f == "a" && s == "b" && w == 1.0 },
      s"got ${links.toSeq}")
    assert(!links.exists { case (f, s, _) => s == "c" || f == "c" })
  }

  test("hyperplanes are deterministic") {
    val a = VectorDedup.hyperplanes(4, 16)
    val b = VectorDedup.hyperplanes(4, 16)
    assert(a.flatten.toSeq == b.flatten.toSeq)
    assert(a.flatten.forall(x => x >= -1.0 && x < 1.0))
  }
}

/** Multimodal plumbing: real ImageIO decode through mapPartitions. */
class MultimodalSpec extends SparkSpec {
  import graft.multimodal.MultimodalQueries

  test("binary payloads produce stable checksum features") {
    import spark.implicits._
    val df = Seq((1L, "hello"), (2L, "")).toDF("doc_id", "payload_str")
      .select(col("doc_id"), col("payload_str").cast("binary").as("payload"))
    val out = MultimodalQueries.extractFeatures(df).collect()
      .map(f => f.doc_id -> f).toMap
    assert(out(1L).n_bytes == 5)
    // FNV-1a("hello") computed independently
    var ck = 1469598103934665603L
    "hello".getBytes("UTF-8").foreach { b =>
      ck ^= (b & 0xFFL); ck *= 1099511628211L
    }
    assert(out(1L).checksum == ck)
    assert(out(2L).n_bytes == 0)
    assert(out(2L).checksum == 1469598103934665603L) // empty = offset basis
    // determinism across partitionings
    val again = MultimodalQueries.extractFeatures(df.repartition(4))
      .collect().map(f => f.doc_id -> f).toMap
    assert(again == out)
  }

  test("PNG encode→decode roundtrip is pixel-exact") {
    val i = 3
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(MultimodalQueries.renderImage(i), "png", baos)
    val img = MultimodalQueries.decodeImage(baos.toByteArray)
    assert(img.getWidth == MultimodalQueries.imgWidth(i))
    assert(img.getHeight == MultimodalQueries.imgHeight(i))
    // spot-check pixels against the generation formulas
    for (x <- Seq(0, 5, img.getWidth - 1); y <- Seq(0, 7, img.getHeight - 1)) {
      val rgb = img.getRGB(x, y)
      assert(((rgb >> 16) & 0xFF) == (3 * x + i) % 256)
      assert(((rgb >> 8) & 0xFF) == (5 * y + i) % 256)
      assert((rgb & 0xFF) == (x + y + i) % 256)
    }
  }

  test("box resize is deterministic and 64 bytes; frame sampler explodes rows") {
    import spark.implicits._
    val img = MultimodalQueries.renderImage(0)
    val thumb = MultimodalQueries.boxResize(img, 8, 8)
    assert(thumb.length == 64)
    assert(thumb.toSeq == MultimodalQueries.boxResize(img, 8, 8).toSeq)
    // 16×12 image, cell (0,0) covers x∈{0,1}, y∈{0,1} (y·8/12 = 0 for
    // y ≤ 1): floor-average of the four formula luminances
    val lums = for (x <- 0 to 1; y <- 0 to 1)
      yield ((3 * x) % 256 + (5 * y) % 256 + (x + y) % 256) / 3
    assert((thumb(0) & 0xFF) == lums.sum / 4)

    val payload = Array.tabulate(1024)(i => (i % 251).toByte)
    val df = Seq((1L, payload), (2L, Array.empty[Byte]))
      .toDF("doc_id", "payload")
    val frames = MultimodalQueries.sampleFrames(df, frameBytes = 64, stride = 4)
      .collect()
    // doc 1: 1024/64 = 16 frames, strided by 4 → indices 0,4,8,12
    assert(frames.filter(_.doc_id == 1L).map(_.frame_idx).sorted.toSeq ==
      Seq(0, 4, 8, 12))
    assert(frames.forall(_.frame.length == 64))
    assert(frames.count(_.doc_id == 2L) == 0) // empty payload → no frames
  }

  test("wav roundtrip: decoded energies match the closed-form PCM exactly") {
    import graft.multimodal.MultimodalQueries._
    val out = audioEnergyWindows(fixtureClips(spark)).collect()
      .map(w => (w.clip_id, w.window_id) -> w).toMap
    assert(out.size == (0 until NumClips).map(clipWindows).sum)
    (0 until NumClips).foreach { i =>
      val pcm = clipSamples(i)
      pcm.grouped(WindowSamples).zipWithIndex.foreach { case (w, wi) =>
        val want = w.map(b => b.toLong * b.toLong).sum
        val got = out((i.toLong, wi))
        assert(got.energy == want, s"clip $i window $wi")
        assert(got.is_silence == (want < 1000L))
      }
    }
    // rotating silence: window w of clip i is silent iff w%3 == i%3
    out.values.foreach { w =>
      assert(w.is_silence == (w.window_id % 3 == w.clip_id % 3))
    }
  }
}
