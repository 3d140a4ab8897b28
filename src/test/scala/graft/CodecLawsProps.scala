package graft

import graft.operators.MediaCodec
import graft.sources.{TFExample, TFRecordIO}
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Totality and round-trip laws for the binary parsers. The decode side of
  * each codec must be TOTAL over arbitrary byte garbage (return
  * None / raise a clean IOException — never crash the task with an
  * uncontrolled error), and encode∘decode must be the identity on valid
  * inputs. This is the property class the PPM header-overflow bug lived in.
  */
object CodecLawsProps extends Properties("CodecLaws") {

  private val bytesGen: Gen[Array[Byte]] =
    Gen.chooseNum(0, 512).flatMap(n => Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)))
      .map(_.toArray)

  // adversarial PPM-ish prefixes: valid magic + arbitrary header bytes
  private val ppmishGen: Gen[Array[Byte]] =
    bytesGen.map(b => "P6\n".getBytes ++ b)

  property("decodePpm is total over garbage") = forAll(Gen.oneOf(bytesGen, ppmishGen)) { b =>
    MediaCodec.decodePpm(b) match { case Some(_) | None => true }
  }

  property("decodeWav is total over garbage") = forAll(bytesGen) { b =>
    MediaCodec.decodeWav("RIFF".getBytes ++ b) match { case Some(_) | None => true }
  }

  property("PPM encode/decode round-trips") =
    forAll(Gen.chooseNum(1, 8), Gen.chooseNum(1, 8), Gen.long) { (w, h, seed) =>
      val rnd = new scala.util.Random(seed)
      val rgb = Array.fill[Byte](w * h * 3)(rnd.nextInt().toByte)
      val img = MediaCodec.decodePpm(MediaCodec.encodePpm(MediaCodec.PpmImage(w, h, rgb)))
      img.exists(i => i.width == w && i.height == h && i.rgb.toSeq == rgb.toSeq)
    }

  property("WAV encode/decode round-trips") =
    forAll(Gen.chooseNum(8000, 48000), Gen.nonEmptyListOf(Gen.choose(Short.MinValue, Short.MaxValue))) {
      (sr, samples) =>
        val wav = MediaCodec.decodeWav(MediaCodec.encodeWav(
          MediaCodec.WavAudio(sr, 1, samples.toArray)))
        wav.exists(a => a.sampleRate == sr && a.samples.toSeq == samples)
    }

  property("TFRecord framing round-trips and rejects truncation") = forAll(bytesGen) { payload =>
    val framed = TFRecordIO.frame(payload)
    val back = TFRecordIO.readStreamFully(new java.io.ByteArrayInputStream(framed)).toSeq
    val truncated =
      if (framed.length > 1)
        try { TFRecordIO.readStreamFully(
          new java.io.ByteArrayInputStream(framed.dropRight(1))).toSeq; false }
        catch { case _: java.io.IOException => true }
      else true
    back.map(_.toSeq) == Seq(payload.toSeq) && truncated
  }

  private val featureGen: Gen[TFExample.Feature] = Gen.oneOf(
    Gen.nonEmptyListOf(bytesGen).map(bs => TFExample.BytesList(bs)),
    Gen.nonEmptyListOf(Gen.chooseNum(-1e6f, 1e6f)).map(TFExample.FloatList(_)),
    Gen.nonEmptyListOf(Gen.long).map(TFExample.Int64List(_)))

  property("tf.train.Example decode is total over garbage") = forAll(bytesGen) { b =>
    try { TFExample.decode(b); true }
    catch { case _: java.io.IOException => true } // clean failure, never AIOOBE
  }

  property("tf.train.Example encode/decode round-trips") =
    forAll(Gen.mapOf(Gen.zip(Gen.identifier, featureGen))) { features =>
      val decoded = TFExample.decode(TFExample.encode(features))
      decoded.keySet == features.keySet && features.forall { case (k, f) =>
        (decoded(k), f) match {
          case (TFExample.BytesList(a), TFExample.BytesList(b)) =>
            a.map(_.toSeq) == b.map(_.toSeq)
          case (a, b) => a == b
        }
      }
    }
}
