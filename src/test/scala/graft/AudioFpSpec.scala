package graft

import org.apache.spark.sql.functions._
import graft.operators.Audio

/** L48b audio content fingerprint: cross-container hamming-0 on
  * identical PCM (WAV mono / WAV stereo / FLAC verbatim), perturbation
  * locality, corrupt→None degrade, real CRC validation, and the
  * planted-pair law over the synthetic clip generator. */
class AudioFpSpec extends SparkSpec {
  import spark.implicits._

  private def tone(n: Int, sr: Int, hz: Double, amp: Double = 0.6): Array[Short] =
    Array.tabulate(n)(i => (amp * 32000.0 * math.sin(2.0 * math.Pi * hz * i / sr)).toShort)

  test("WAV and FLAC round-trip identical PCM; stereo mixdown matches mono") {
    val sr = 16000
    val pcm = tone(4096, sr, 800.0)
    val wav = Audio.decodePcm(Audio.wavBytes(pcm, sr)).get
    val wav2 = Audio.decodePcm(Audio.wavBytes(pcm, sr, channels = 2)).get
    val flac = Audio.decodePcm(Audio.flacBytes(pcm, sr)).get
    assert(wav._2 == sr && flac._2 == sr && wav2._2 == sr)
    assert(wav._1.length == 4096 && flac._1.length == 4096 && wav2._1.length == 4096)
    assert(wav._1.sameElements(flac._1), "FLAC verbatim must decode to the exact WAV samples")
    assert(wav._1.sameElements(wav2._1), "equal-channel stereo must mix down to the mono samples")
  }

  test("signature: same content through different containers lands at hamming 0") {
    val sigs = (0L until 24L).map { id =>
      val bytes = Audio.syntheticAudioClip(id)
      val (pcm, sr) = Audio.decodePcm(bytes).get
      id -> Audio.audioFp64(pcm, sr).get
    }.toMap
    (0L until 24L by 2).foreach { a =>
      assert(sigs(a) == sigs(a + 1), s"pair ($a, ${a + 1}) must collide exactly")
    }
    // distinct k give distinct patterns (different band activity)
    val distinct = sigs.collect { case (k, v) if k % 2 == 0 => v }.toSet
    assert(distinct.size == 12, s"12 clip patterns expected, got ${distinct.size}")
  }

  test("perturbation locality: small noise moves hamming a little, a different clip a lot") {
    val sr = 16000
    val n = Audio.Frames * 256
    val rnd = new scala.util.Random(7)
    val base = Audio.decodePcm(Audio.syntheticAudioClip(0L)).get._1
    val sig0 = Audio.audioFp64(base, sr).get
    val noisy = base.map(v => v + 0.01 * (rnd.nextDouble() - 0.5))
    val sigN = Audio.audioFp64(noisy, sr).get
    assert(java.lang.Long.bitCount(sig0 ^ sigN) <= 3,
      s"1% noise must stay near: hamming ${java.lang.Long.bitCount(sig0 ^ sigN)}")
    val other = Audio.decodePcm(Audio.syntheticAudioClip(10L)).get._1
    val sigO = Audio.audioFp64(other, sr).get
    assert(java.lang.Long.bitCount(sig0 ^ sigO) > 6,
      s"different content must be far: hamming ${java.lang.Long.bitCount(sig0 ^ sigO)}")
    assert(n == base.length)
  }

  test("degrade contract: corrupt/truncated/foreign bytes and silence yield None") {
    val sr = 16000
    val pcm = tone(4096, sr, 800.0)
    // unknown container
    assert(Audio.decodePcm("not audio at all".getBytes("UTF-8")).isEmpty)
    // truncated WAV data chunk
    val wav = Audio.wavBytes(pcm, sr)
    assert(Audio.decodePcm(wav.take(wav.length / 2)).isEmpty)
    // FLAC with a flipped PCM byte fails the frame CRC-16 — never a wrong signature
    val flac = Audio.flacBytes(pcm, sr)
    val bad = flac.clone(); bad(flac.length / 2) = (bad(flac.length / 2) ^ 0x55).toByte
    assert(Audio.decodePcm(bad).isEmpty)
    // FLAC with a corrupted header byte fails CRC-8
    val badHdr = flac.clone(); badHdr(42 + 2) = (badHdr(42 + 2) ^ 0x01).toByte
    assert(Audio.decodePcm(badHdr).isEmpty)
    // non-PCM WAV fmt code rejects
    val nonPcm = wav.clone(); nonPcm(20) = 2
    assert(Audio.decodePcm(nonPcm).isEmpty)
    // too short for a signature; pure silence has no active band
    assert(Audio.audioFp64(new Array[Double](100), sr).isEmpty)
    assert(Audio.audioFp64(new Array[Double](8192), sr).isEmpty)
  }

  test("fpPairs: planted consecutive-id pairs at hamming 0, nothing else") {
    val payloads = (0L until 40L).map(id => (id, Audio.syntheticAudioClip(id)))
      .toDF("media_id", "content")
    val got = Audio.fpPairs(payloads, col("media_id"), col("content"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = (0L until 40L by 2).map(a => (a, a + 1, 0)).toSet
    assert(got == want, s"got $got")
  }

  test("fpSignatures plan: payloads never shuffle — signatures come straight off the scan") {
    val payloads = (0L until 8L).map(id => (id, Audio.syntheticAudioClip(id)))
      .toDF("media_id", "content")
    val plan = Audio.fpSignatures(payloads, col("media_id"), col("content"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
