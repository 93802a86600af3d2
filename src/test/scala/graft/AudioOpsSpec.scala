package graft

import graft.functions.AudioOps
import graft.model.Fixtures

/** The audio modality: a REAL RIFF/WAV chunk walker (no codec dependency),
  * feature extraction in integer arithmetic, and the fixture contract that
  * makes the DuckDB oracle analytic (decode parses only the bytes; the
  * oracle recomputes expectations from the synthesis parameters).
  */
class AudioOpsSpec extends SparkTestBase {

  /** Hand-assemble a minimal mono PCM16 WAV around explicit samples. */
  private def wavOf(samples: Array[Short], sr: Int = 8000,
      channels: Int = 1, extraChunk: Boolean = false): Array[Byte] = {
    val dataLen = samples.length * 2
    val listChunk =
      if (extraChunk) Array[Byte]('L', 'I', 'S', 'T', 5, 0, 0, 0,
        'I', 'N', 'F', 'O', 'x', 0) // odd length 5 + pad byte
      else Array.emptyByteArray
    val buf = java.nio.ByteBuffer
      .allocate(44 + listChunk.length + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII"))
      .putInt(36 + listChunk.length + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put(listChunk)
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sr)
      .putInt(sr * channels * 2).putShort((channels * 2).toShort).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  test("parseWav reads back hand-built samples exactly") {
    val samples = Array[Short](100, -200, 300, 0, -50)
    val w = AudioOps.parseWav(wavOf(samples)).get
    assert(w.sampleRate === 8000)
    assert(w.channels === 1)
    assert(w.samples.toSeq === samples.toSeq)
    val (peak, sumSq, zc) = AudioOps.features(w.samples)
    assert(peak === 300)
    assert(sumSq === 100L * 100 + 200L * 200 + 300L * 300 + 50L * 50)
    // strict sign flips: (100,-200) and (-200,300); zero breaks the chain
    assert(zc === 2L)
  }

  test("chunk walker skips unknown chunks and honors word alignment") {
    val samples = Array[Short](7, -7)
    val w = AudioOps.parseWav(wavOf(samples, extraChunk = true))
    assert(w.isDefined, "LIST chunk (odd length + pad) must be skipped")
    assert(w.get.samples.toSeq === samples.toSeq)
  }

  test("malformed payloads return None, never throw") {
    val good = wavOf(Array[Short](1, 2, 3))
    val badMagic = good.clone(); "JUNK".getBytes.copyToArray(badMagic, 0)
    val truncated = good.take(good.length - 3)
    val lyingLen = good.clone()
    // data chunk claims more bytes than exist
    val dataAt = 36
    java.nio.ByteBuffer.wrap(lyingLen).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(dataAt + 4, 1 << 20)
    assert(AudioOps.parseWav(badMagic).isEmpty)
    assert(AudioOps.parseWav(truncated).isEmpty)
    assert(AudioOps.parseWav(lyingLen).isEmpty)
    assert(AudioOps.parseWav(null).isEmpty)
    assert(AudioOps.parseWav(Array.emptyByteArray).isEmpty)
  }

  test("stereo de-interleave keeps channel-0 features (fixture carries -s on ch1)") {
    val doc = Fixtures.audios(spark, 64)
      .filter(d => d.channels == 2 && !d.corrupt).head()
    val w = AudioOps.parseWav(doc.bytes).get
    assert(w.channels === 2)
    assert(w.samples.length === doc.n_frames)
    val expected = Array.tabulate(doc.n_frames)(i =>
      Fixtures.audioSample(i, doc.amp, doc.half_period))
    assert(w.samples.toSeq === expected.toSeq,
      "channel 0 must survive de-interleaving untouched")
  }

  test("ZCR fingerprint: analytic parity, amplitude invariance, pitch " +
      "sensitivity") {
    // analytic parity: the decoded-sample count per window equals the
    // multiples-of-half_period formula the DuckDB oracle evaluates
    Fixtures.audios(spark, 128).filter(!_.corrupt).collect().foreach { d =>
      val w = AudioOps.parseWav(d.bytes).get
      val len = d.n_frames / AudioOps.ZcrWindows
      var expect = 0L
      for (wi <- 0 until AudioOps.ZcrWindows) {
        val lo = wi * len
        val hi = math.min((wi + 1) * len, d.n_frames - 1)
        val c = hi / d.half_period - lo / d.half_period
        expect |= math.min(c, 15).toLong << (4 * wi)
      }
      assert(AudioOps.zcrFingerprint(w.samples) === expect,
        s"analytic mismatch for ${d.audio_id} (hp=${d.half_period}, n=${d.n_frames})")
    }
    // amplitude invariance: the half-amplitude twin's REAL decoded bytes
    // produce the identical print; a pitch change produces a different one
    val origs = Fixtures.audios(spark, 64).filter(!_.corrupt).collect()
    val twins = Fixtures.audioTwins(spark, 64).filter(!_.corrupt).collect()
      .map(d => d.audio_id.stripSuffix("_t") -> d).toMap
    origs.foreach { d =>
      val fpO = AudioOps.zcrFingerprint(AudioOps.parseWav(d.bytes).get.samples)
      val fpT = AudioOps.zcrFingerprint(
        AudioOps.parseWav(twins(d.audio_id).bytes).get.samples)
      assert(fpO === fpT, s"amplitude changed the print for ${d.audio_id}")
    }
    val base = origs.head
    val shifted = Array.tabulate(base.n_frames)(i =>
      Fixtures.audioSample(i, base.amp, base.half_period * 3))
    assert(AudioOps.zcrFingerprint(shifted) !==
      AudioOps.zcrFingerprint(AudioOps.parseWav(base.bytes).get.samples),
      "a 3x half-period change must move the print")
  }

  test("audioZcrNearDups: every twin pair found at hamming 0, banding is " +
      "lossless at the pigeonhole radius, corrupt rows never appear") {
    import org.apache.spark.sql.functions._
    val n = 256L
    val dups = graft.operators.TrainingOps.audioZcrNearDups(spark, n)
      .persist()
    try {
      val docs = Fixtures.audios(spark, n).collect()
      val clean = docs.filter(!_.corrupt).map(_.audio_id).toSet
      // recall on the planted twins: (id, id_t) sorts as id < id_t, so the
      // pair must surface with hamming 0 for every non-corrupt original
      val twinPairs = dups
        .filter(col("audio_b") === concat(col("audio_a"), lit("_t")))
        .collect()
      assert(twinPairs.map(_.getString(0)).toSet === clean)
      assert(twinPairs.forall(r => r.getLong(2) == 0L && r.getBoolean(3)))
      // losslessness: hamming <= 3 of 60 over 4 bands pigeonholes at least
      // one equal band, so the banded candidate set contains EVERY true
      // pair within the radius — verified against the O(n²) truth
      val prints = graft.functions.AudioOps.fingerprints(
        Fixtures.audios(spark, n).unionByName(Fixtures.audioTwins(spark, n)))
        .collect().map(r => r.getString(0) -> r.getLong(1))
      val truth = (for {
        (ia, fa) <- prints; (ib, fb) <- prints if ia < ib
        h = java.lang.Long.bitCount(fa ^ fb) if h <= 3
      } yield (ia, ib)).toSet
      val found = dups.filter(col("is_dup"))
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(found === truth, "banded is_dup set differs from O(n²) truth")
      // corrupt payloads (and their twins) must never reach the output
      val corruptIds = docs.filter(_.corrupt)
        .flatMap(d => Seq(d.audio_id, d.audio_id + "_t")).toSet
      assert(dups.collect().forall(r =>
        !corruptIds(r.getString(0)) && !corruptIds(r.getString(1))))
    } finally dups.unpersist()
  }

  test("decodeMeta matches the analytic oracle formulas on every fixture row") {
    import spark.implicits._
    val n = 256L
    val docs = Fixtures.audios(spark, n).collect().map(d => d.audio_id -> d).toMap
    val metas = AudioOps.decodeMeta(Fixtures.audios(spark, n)).collect()
    assert(metas.length === n.toInt)
    var corrupts = 0
    metas.foreach { m =>
      val d = docs(m.audio_id)
      assert(m.n_bytes === d.bytes.length.toLong)
      if (d.corrupt) {
        corrupts += 1
        assert((m.sr, m.channels, m.n_frames) === ((-1, -1, -1)))
        assert((m.peak, m.sum_sq, m.zero_crossings) === ((0, 0L, 0L)))
      } else {
        assert(m.sr === d.sample_rate)
        assert(m.channels === d.channels)
        assert(m.n_frames === d.n_frames)
        assert(m.peak === d.amp)
        assert(m.sum_sq === d.n_frames.toLong * d.amp * d.amp)
        assert(m.zero_crossings === ((d.n_frames - 1) / d.half_period).toLong)
      }
    }
    assert(corrupts > 0, "fixture must exercise the error-isolation path")
  }
}
