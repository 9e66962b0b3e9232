package graft

import org.apache.spark.sql.functions._

/** Unit coverage for the text-canonicalization expressions
  * (plans/NormalizeText.scala) and the registered bloom probe — the pieces
  * q28k_normalize / q27h_dedup_bloom build on. Everything runs through a
  * DataFrame projection, so the codegen path (defineCodeGen) is what's
  * exercised.
  */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def install(): Unit = GraftExtensions.install(spark)

  test("nfc_normalize composes decomposed sequences to precomposed chars") {
    install()
    // "a" + combining acute (U+0301) must become U+00E1; precomposed input
    // is returned unchanged; ASCII passes through untouched.
    val rows = Seq("á", "á", "plain ascii", "éé")
      .toDF("s")
      .select(call_function("nfc_normalize", $"s").as("n"))
      .as[String].collect()
    assert(rows(0) == "á")
    assert(rows(1) == "á")
    assert(rows(2) == "plain ascii")
    assert(rows(3) == "éé")
  }

  test("strip_accents folds marks and survives round-trip idempotence") {
    install()
    val rows = Seq("áéíóú", "ñiño", "ça", "none")
      .toDF("s")
      .select(call_function("strip_accents", $"s").as("n"))
      .as[String].collect()
    assert(rows.toSeq == Seq("aeiou", "nino", "ca", "none"))
    // idempotent: stripping an already-clean string is identity
    val twice = Seq("áb́c").toDF("s")
      .select(call_function("strip_accents",
        call_function("strip_accents", $"s")).as("n"))
      .as[String].head()
    assert(twice == "abc")
  }

  test("strip_accents drops spacing (Mc) and enclosing (Me) marks, not just Mn") {
    install()
    // utf8proc STRIPMARK removes ALL mark categories; an Mn-only fold
    // diverges from DuckDB on e.g. Devanagari vowel signs (r8 ADVICE).
    // 0915 093E = KA + vowel sign AA (Mc); 0061 20DD = 'a' + enclosing
    // circle (Me); 0061 0301 = combining acute (Mn, the classic case).
    val rows = Seq("का", "a⃝", "á")
      .toDF("s")
      .select(call_function("strip_accents", $"s").as("n"))
      .as[String].collect()
    assert(rows.toSeq == Seq("क", "a", "a"),
      s"got ${rows.toSeq.map(_.map(c => f"U+${c.toInt}%04X").mkString)}")
  }

  test("normalization expressions propagate nulls") {
    install()
    val r = Seq[Option[String]](None).toDF("s")
      .select(call_function("nfc_normalize", $"s").as("a"),
        call_function("strip_accents", $"s").as("b"))
      .collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("bloom_might_contain probes a stat-built sketch with zero false negatives") {
    install()
    val keys = (0L until 1000L).map(i => s"key_$i").toDF("k")
    val bloom = keys.select(xxhash64($"k").as("h")).stat.bloomFilter("h", 10000, 0.01)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    val probe = (df: org.apache.spark.sql.DataFrame) => df.filter(
      call_function("bloom_might_contain", lit(bos.toByteArray), xxhash64($"k")))
    // no false negatives: every inserted key must pass the probe
    assert(probe(keys).count() == 1000L)
    // false-positive rate is bounded: probing 10k absent keys passes ~1%
    val absent = (0L until 10000L).map(i => s"other_$i").toDF("k")
    val fp = probe(absent).count()
    assert(fp < 500L, s"bloom false-positive count $fp way over the 1% design point")
  }
}
