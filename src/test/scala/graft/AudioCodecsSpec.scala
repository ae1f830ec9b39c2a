package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.AudioCodecs
import graft.pipeline.AudioCodecs.DecodedAudio

/** Real RIFF/WAVE PCM codec: round trips across widths and channel
  * counts, metadata-chunk skipping, word-alignment padding, and
  * error paths. */
class AudioCodecsSpec extends AnyFunSuite {

  private def audio(n: Int, channels: Int, bits: Int, seed: Int): DecodedAudio = {
    val samples = new Array[Int](n * channels)
    var j = 0
    while (j < samples.length) {
      samples(j) =
        if (bits == 8) (seed * 37 + j * 11) % 256 - 128
        else (seed * 37 + j * 11) % 4096 - 2048
      j += 1
    }
    DecodedAudio(8000, channels, bits, samples)
  }

  test("round trips: 8/16-bit, mono/stereo/4-channel, odd frame counts") {
    for (bits <- Seq(8, 16); channels <- Seq(1, 2, 4); n <- Seq(1, 63, 128)) {
      val src = audio(n, channels, bits, bits + channels + n)
      val dec = AudioCodecs.decodeWav(AudioCodecs.encodeWav(src))
      assert(dec.sampleRate == 8000 && dec.channels == channels &&
        dec.bitsPerSample == bits && dec.frames == n, s"$bits/$channels/$n")
      assert(dec.samples.toSeq == src.samples.toSeq, s"$bits/$channels/$n")
    }
  }

  test("LIST metadata chunk before data is skipped (with odd-size padding)") {
    val src = audio(40, 2, 16, 5)
    val withList = AudioCodecs.encodeWav(src, extraChunk = true)
    val dec = AudioCodecs.decodeWav(withList)
    assert(dec.samples.toSeq == src.samples.toSeq)
    // the LIST payload is 19 bytes (odd) — the skip must honor the
    // RIFF word-alignment pad byte or every later read shifts by one
    assert(new String(withList.slice(36, 40), "US-ASCII") == "LIST")
  }

  test("8-bit storage is unsigned on the wire, signed-centered decoded") {
    val src = DecodedAudio(8000, 1, 8, Array(-128, -1, 0, 1, 127))
    val bytes = AudioCodecs.encodeWav(src)
    // data chunk payload = stored + 128
    val data = bytes.takeRight(5).map(b => b & 0xff).toSeq
    assert(data == Seq(0, 127, 128, 129, 255))
    assert(AudioCodecs.decodeWav(bytes).samples.toSeq == Seq(-128, -1, 0, 1, 127))
  }

  test("malformed payloads fail loudly with the typed error") {
    val good = AudioCodecs.encodeWav(audio(16, 1, 16, 1))
    intercept[IllegalArgumentException] {
      AudioCodecs.decodeWav(java.util.Arrays.copyOfRange(good, 0, 20)) // no data chunk
    }
    intercept[IllegalArgumentException] {
      AudioCodecs.decodeWav("RIFFxxxxNOPE".getBytes("US-ASCII"))
    }
    // compressed format tag rejected
    val bad = good.clone()
    bad(20) = 2 // audioFormat = ADPCM
    intercept[IllegalArgumentException](AudioCodecs.decodeWav(bad))
    // truncated data chunk: declared size exceeds remaining bytes
    intercept[IllegalArgumentException] {
      AudioCodecs.decodeWav(java.util.Arrays.copyOfRange(good, 0, good.length - 4))
    }
  }

  test("distributed decode stats equal a driver-side reference") {
    val spark = SparkTestSession.spark
    val media = graft.operators.Multimodal.syntheticAudio(spark, 50)
    val got = graft.operators.Multimodal.decodeAudioStats(media)
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getLong(5), r.getLong(6), r.getInt(7), r.getInt(8)))).toMap
    for (id <- 0L until 50L) {
      val channels = 1 + (id % 2).toInt
      val bits = if (id % 2 == 0) 8 else 16
      val frames = 64 + (id % 97).toInt
      val vs = (0 until frames * channels).map { j =>
        if (bits == 8) ((id * 37 + j * 11) % 256).toInt - 128
        else ((id * 37 + j * 11) % 4096).toInt - 2048
      }
      val want = (8000 + (id % 5).toInt * 1000, channels, bits, frames,
        vs.map(_.toLong).sum, vs.map(v => math.abs(v).toLong).sum, vs.min, vs.max)
      assert(got(id) == want, s"id $id")
    }
  }
}
