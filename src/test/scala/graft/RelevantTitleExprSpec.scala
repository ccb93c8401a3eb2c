package graft

import org.apache.spark.sql.functions._
import graft.operators.Text
import graft.expressions.RelevantTitle

/** The native Catalyst expression must agree with the UDF twin and the
  * literal-phrase builtin form on every corner case — all three are the
  * same operator at different plan-time-knowledge levels.
  */
class RelevantTitleExprSpec extends SparkSpec {
  import spark.implicits._

  private val cases = Seq(
    ("State Bank of India cuts rates", false),
    ("Bank of India cuts rates", true),
    ("Vedanta, BPCL, Bank of India among gainers", true),
    ("rbi: bank of india fined", true),
    ("9 bank of india branches", true),
    ("state9bank of india", false),
    ("  bank of india leads", true),
    ("xbank of india", false),
    ("the-bank of india", true),
    ("BANKINDIA rallies", true),
    ("unrelated headline entirely", false))

  test("native expression == UDF == literal builtin on all corner cases") {
    val df = cases.map(_._1).toDF("t").select(col("t"),
      RelevantTitle(col("t"), lit("Bank of India Limited"), lit("BANKINDIA")).as("native"),
      Text.relevantTitleUdf(col("t"), lit("Bank of India Limited"), lit("BANKINDIA")).as("udf"),
      Text.relevantTitle(col("t"), "Bank of India Limited", "BANKINDIA").as("builtin"))
    df.collect().zip(cases).foreach { case (r, (title, expected)) =>
      assert(r.getBoolean(1) == expected, s"native: $title")
      assert(r.getBoolean(2) == expected, s"udf: $title")
      assert(r.getBoolean(3) == expected, s"builtin: $title")
    }
  }

  test("dynamic per-row names (non-foldable pattern) work under codegen") {
    val df = Seq(
      ("Hindustan Zinc gains", "Hindustan Zinc Ltd.", "HINDZINC", true),
      ("State Bank of India up", "Bank of India Limited", "BANKINDIA", false),
      ("TCS wins deal", "Tata Consultancy Services Limited", "TCS", true)
    ).toDF("t", "name", "tick", "expected")
    val out = df.select(
      RelevantTitle(col("t"), col("name"), col("tick")).as("got"), col("expected"))
    out.collect().foreach(r => assert(r.getBoolean(0) == r.getBoolean(1)))
  }

  test("null inputs follow ternary null semantics; empty ticker means no ticker term") {
    val df = Seq(("Bank of India up", null.asInstanceOf[String]))
      .toDF("t", "name")
      .select(RelevantTitle(col("t"), col("name"), lit("")).as("r"))
    assert(df.collect()(0).isNullAt(0))
    val noTick = Seq(("BANKINDIA rallies", "Bank of India Limited"))
      .toDF("t", "name")
      .select(RelevantTitle(col("t"), col("name"), lit("")).as("r"))
    assert(!noTick.collect()(0).getBoolean(0)) // ticker match unavailable
  }
}

class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.expressions.NfcNormalize

  test("decomposed and precomposed spellings normalize to identical bytes") {
    val df = Seq(
      (" cafe\u0301 nai\u0308ve", " caf\u00e9 na\u00efve"), // NFD vs NFC
      ("plain ascii", "plain ascii")
    ).toDF("a", "b").select(
      NfcNormalize(col("a")).as("na"), NfcNormalize(col("b")).as("nb"),
      length(col("a")).as("la"), length(col("na")).as("lna"))
    df.collect().foreach { r =>
      assert(r.getString(0) == r.getString(1))
    }
    // the decomposed row loses its two combining marks
    val first = df.collect()(0)
    assert(first.getInt(2) - first.getInt(3) == 2)
  }

  test("ASCII fast path is identity; null stays null; registry form resolves") {
    val out = Seq(("abc", null.asInstanceOf[String])).toDF("s", "n")
      .selectExpr("nfc_normalize(s) AS s2", "nfc_normalize(n) AS n2")
      .collect()(0)
    assert(out.getString(0) == "abc" && out.isNullAt(1))
  }
}
