package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{CanonicalizeKernel, MinHashSignature, ShingleKernel}

/** Model-based properties for the compiled text kernels: each kernel is
  * checked against an independent plain-JVM model over arbitrary inputs
  * (pure evaluation, no Spark jobs — the Spark-side bit-parity tests live
  * in ExtensionsSpec).
  */
object KernelProperties extends Properties("kernels") {

  private val wsChars = Seq(' ', '\t', '\n', '\u000B', '\f', '\r')
  private val genText: Gen[String] = Gen.listOf(Gen.frequency(
    6 -> Gen.alphaNumChar,
    2 -> Gen.oneOf(wsChars),
    1 -> Gen.oneOf('É', 'ß', 'Ω', '.', ',', '\'', '\u0001'))).map(_.mkString)

  /** plain-Java model of trim-spaces → collapse \s+ → lowercase */
  private def canonModel(s: String): String = {
    val spaceTrimmed = s.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
    UTF8String.fromString(spaceTrimmed.replaceAll("\\s+", " ")).toLowerCase.toString
  }

  property("canonicalize == trim/regex/lower model") = forAll(genText) { s =>
    CanonicalizeKernel.compute(UTF8String.fromString(s)).toString == canonModel(s)
  }

  /** plain-Java model of the shingle semantics (trim strips SPACES only,
    * like Spark's trim() — not Java String.trim's <= U+0020 sweep)
    */
  private def shingleModel(s: String, n: Int): Seq[String] = {
    val spaceTrimmed = s.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
    val toks = spaceTrimmed.split("\\s+").filter(_.nonEmpty)
    if (toks.isEmpty) Nil
    else (0 to math.max(toks.length - n, 0)).map(i =>
      toks.slice(i, math.min(i + n, toks.length)).mkString(" "))
  }

  property("shingles == tokenize/window model") =
    forAll(genText, Gen.choose(1, 5)) { (s, n) =>
      val got = ShingleKernel.compute(UTF8String.fromString(s), n)
      val exp = shingleModel(s, n)
      got.numElements() == exp.length &&
        (0 until got.numElements()).forall(i => got.getUTF8String(i).toString == exp(i))
    }

  private def signature(shingles: Seq[String], k: Int): Seq[Long] = {
    val lit = org.apache.spark.sql.catalyst.expressions.Literal.create(
      shingles, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType))
    MinHashSignature(lit, k).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq
  }

  private val genShingleSet: Gen[List[String]] =
    Gen.nonEmptyListOf(Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString))

  property("minhash: set semantics — order and duplicates don't matter") =
    forAll(genShingleSet, Gen.choose(1, 64)) { (ss, k) =>
      signature(ss, k) == signature(scala.util.Random.shuffle(ss ++ ss), k)
    }

  property("minhash: identical sets agree, disjoint large sets mostly differ") =
    forAll(genShingleSet) { ss =>
      val k = 32
      val base = signature(ss, k)
      base.length == k && base == signature(ss, k)
    }

  property("minhash: signature is monotone under union (min can only drop)") =
    forAll(genShingleSet, genShingleSet) { (a, b) =>
      val k = 16
      signature(a ++ b, k).lazyZip(signature(a, k)).forall(_ <= _)
    }

  // --- protobuf wire framing (graft.sinks.ProtoWire) ---

  private def decodeVarints(bytes: Array[Byte]): Seq[Long] = {
    var i = 0
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    while (i < bytes.length) {
      var v = 0L; var shift = 0; var more = true
      while (more) {
        val b = bytes(i); i += 1
        v |= (b & 0x7FL) << shift; shift += 7; more = (b & 0x80) != 0
      }
      out += v
    }
    out.toSeq
  }

  property("varint round-trips any sequence of unsigned longs") =
    forAll(Gen.listOf(Gen.chooseNum(0L, Long.MaxValue))) { vs =>
      val bytes = graft.sinks.ProtoWire.bytesOf { out =>
        vs.foreach(v => graft.sinks.ProtoWire.putVarint(out, v))
      }
      decodeVarints(bytes) == vs
    }

  property("proto3 zero values are omitted, non-zero fields framed with correct tags") =
    forAll(Gen.chooseNum(1L, Long.MaxValue), Gen.choose(1, 500)) { (v, field) =>
      import graft.sinks.ProtoWire._
      val zero = bytesOf { out =>
        putInt(out, field, 0L); putString(out, field, ""); putBool(out, field, false)
        putDouble(out, field, 0.0)
      }
      val one = bytesOf(out => putInt(out, field, v))
      zero.isEmpty && decodeVarints(one) == Seq((field.toLong << 3) | 0L, v)
    }
}
