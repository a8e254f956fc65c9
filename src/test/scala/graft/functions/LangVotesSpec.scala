package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Pins [[LangVotes]] to the formulation it replaced: one
  * `aggregate`-lambda stopword count per language and
  * `greatest(struct(score, lang))` for the argmax — including the tie
  * order (largest language code wins on equal scores) and the
  * empty-segment behavior of `split(text, ' ')`.
  */
class LangVotesSpec extends AnyFunSuite with SparkTestBase {

  private val lexicons = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "la", "de", "y", "que"),
    "fr" -> Seq("le", "la", "de", "et", "un"))

  private def corpus: Seq[String] = Seq(
    "", " ", "   ", "the a of and to", "la de", "de", "la la la",
    "der die das und ist the", "no stopwords here at all",
    "le la de et un el y que", "the  the   the", " leading the",
    "trailing to ", "und y et and", "a a a a a a", "LA DE",
    "the. a, of", "el la de y que el la de y que"
  ) ++ {
    // pseudo-random token soup over stopwords + noise, deterministic
    val pool = lexicons.flatMap(_._2) ++ Seq("zzz", "qqq", "", "x", "word")
    (0 until 100).map { i =>
      (0 until (i % 17)).map(j => pool(((i * 31 + j * 7) % pool.size + pool.size) % pool.size))
        .mkString(" ")
    }
  }

  test("LangVotes equals the aggregate+greatest chain, ties and empties included") {
    import spark.implicits._
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val words = split($"text", " ")
    def score(stops: Seq[String]) =
      aggregate(words, lit(0), (acc, w) => acc + when(w.isin(stops: _*), 1).otherwise(0))
    val scored = lexicons.map { case (l, stops) =>
      struct(score(stops).as("score"), lit(l).as("lang"))
    }
    val ref = df.select($"id",
        greatest(scored: _*).getField("score").as("score"),
        greatest(scored: _*).getField("lang").as("lang"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2)))).toMap
    val got = df.select($"id",
        LangVotes.langVotesCol($"text", lexicons).as("v"))
      .select($"id", $"v.score", $"v.lang")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2)))).toMap
    corpus.indices.foreach { i =>
      assert(got(i.toLong) == ref(i.toLong),
        s"LangVotes mismatch on doc $i '${corpus(i).take(60)}': " +
          s"got ${got(i.toLong)}, want ${ref(i.toLong)}")
    }
  }

  test("LangVotes eval path matches codegen through a simple expression eval") {
    val expr = LangVotes(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        "la de the", org.apache.spark.sql.types.StringType),
      lexicons)
    val row = expr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.expressions.GenericInternalRow]
    // la:es+fr, de:es+fr, the:en → es=2, fr=2, en=1 → tie es/fr → fr (larger)
    assert(row.getInt(0) == 2 && row.getUTF8String(1).toString == "fr")
  }

  test("LangVotes rejects unsorted lexicons") {
    intercept[IllegalArgumentException] {
      LangVotes(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          "x", org.apache.spark.sql.types.StringType),
        lexicons.reverse)
    }
  }
}
