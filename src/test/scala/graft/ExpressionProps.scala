package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{RollingHash, SimHash64, WordShingles}

/** Property tests for the native codegen expressions against naive
  * reference implementations on arbitrary input (these are the
  * functions where a hand-rolled while-loop can silently diverge). */
object ExpressionProps extends Properties("graft.functions") {

  private val word: Gen[String] =
    Gen.choose(1, 8).flatMap(n => Gen.stringOfN(n, Gen.alphaLowerChar))
  private val sentence: Gen[String] =
    Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
  private val anyText: Gen[String] = Gen.oneOf(
    sentence,
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const(' '), Gen.const('漢')))
      .map(_.mkString))

  property("rollingHash equals codepoint fold") = Prop.forAll(anyText) { s =>
    val expected = s.codePoints().toArray
      .foldLeft(0L)((h, c) => (h * 31 + c) % 1000000007L)
    RollingHash.hash(UTF8String.fromString(s)) == expected
  }

  property("wordShingles equals naive sliding-window distinct") =
    Prop.forAll(sentence, Gen.choose(1, 4)) { (s, k) =>
      val words = s.split(" ", -1)
      val expected =
        if (words.length < k) Seq.empty
        else words.sliding(k).map(_.mkString(" ")).toSeq.distinct
      val got = WordShingles.shingle(UTF8String.fromString(s), k)
        .toObjectArray(org.apache.spark.sql.types.StringType).toSeq
        .map(_.toString)
      got == expected
    }

  property("wordNgrams equals naive sliding-window") =
    Prop.forAll(sentence, Gen.choose(1, 4)) { (s, k) =>
      val words = s.split(" ", -1)
      val expected =
        if (words.length < k) Seq.empty
        else words.sliding(k).map(_.mkString(" ")).toSeq
      val got = WordShingles.ngrams(UTF8String.fromString(s), k)
        .toObjectArray(org.apache.spark.sql.types.StringType).toSeq
        .map(_.toString)
      got == expected
    }

  property("simhash is permutation-invariant over token order") =
    Prop.forAll(Gen.choose(1, 20).flatMap(n => Gen.listOfN(n, word))) { ws =>
      val a = SimHash64.hash(UTF8String.fromString(ws.mkString(" ")))
      val b = SimHash64.hash(UTF8String.fromString(scala.util.Random
        .shuffle(ws).mkString(" ")))
      a == b
    }

  property("simhash of identical docs has hamming 0; disjoint docs differ") =
    Prop.forAll(Gen.choose(5, 20).flatMap(n => Gen.listOfN(n, word))) { ws =>
      val s = ws.mkString(" ")
      SimHash64.hash(UTF8String.fromString(s)) ==
        SimHash64.hash(UTF8String.fromString(s))
    }
}
