package graft

import graft.functions.VideoOps
import graft.model.Fixtures

/** The video modality's decode-and-sample path: real GVID parsing against
  * the analytic ground truth (the same formulas the DuckDB oracle
  * evaluates), stride-sampling law, strict-parse rejection of malformed
  * containers, and corrupt-row exclusion.
  */
class VideoOpsSpec extends SparkTestBase {

  test("parseVideo: strict header walk — magic, sanity, exact length") {
    val good = (0L until 32L).map(Fixtures.videoDoc).find(!_.corrupt).get
    val v = VideoOps.parseVideo(good.bytes).get
    assert(v.w === good.w && v.h === good.h &&
      v.nFrames === good.n_frames && v.fps === good.fps)
    // corrupted magic, truncation, trailing garbage, and a header whose
    // dimensions disagree with the payload length must all be rejected
    assert(VideoOps.parseVideo(null).isEmpty)
    assert(VideoOps.parseVideo(Array.fill[Byte](10)(0)).isEmpty)
    val junk = good.bytes.clone(); "JUNK".getBytes.copyToArray(junk, 0)
    assert(VideoOps.parseVideo(junk).isEmpty)
    assert(VideoOps.parseVideo(good.bytes.dropRight(1)).isEmpty)
    assert(VideoOps.parseVideo(good.bytes :+ 0.toByte).isEmpty)
    val badHdr = good.bytes.clone()
    java.nio.ByteBuffer.wrap(badHdr).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, good.w + 1)
    assert(VideoOps.parseVideo(badHdr).isEmpty)
  }

  test("frameSampleStats: analytic parity on every fixture row, stride " +
      "law, corrupt exclusion") {
    val n = 256L
    val got = VideoOps.frameSampleStats(Fixtures.videos(spark, n))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getInt(3), r.getInt(4))).toMap
    // expected from the synthesis parameters alone — the decoded bytes
    // must EARN the match (same formulas as the q_video_frames oracle)
    val docs = (0L until n).map(Fixtures.videoDoc)
    val expect = docs.filter(!_.corrupt).flatMap { d =>
      val k = math.max(1, d.n_frames / VideoOps.FramesPerVideo)
      Iterator.range(0, d.n_frames, k).map { f =>
        val vf = (d.base + f * d.step) & 255
        val wrap = math.max(0, vf + d.w - 256)
        val sum = d.h.toLong * (d.w.toLong * vf + d.w.toLong * (d.w - 1) / 2
          - 256L * wrap)
        val mn = if (wrap > 0) 0 else vf
        val mx = if (wrap > 0) 255 else vf + d.w - 1
        (d.video_id, f) -> (sum, mn, mx)
      }
    }.toMap
    assert(got === expect,
      "decoded frame features differ from the analytic ground truth")
    // stride law restated independently: per video, sampled indices are
    // exactly {0, k, 2k, …} ∩ [0, n_frames), 8–15 frames each
    val byVid = got.keys.groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted)
    docs.filter(!_.corrupt).foreach { d =>
      val k = math.max(1, d.n_frames / VideoOps.FramesPerVideo)
      assert(byVid(d.video_id) === (0 until d.n_frames by k).toSeq)
      assert(byVid(d.video_id).size >= VideoOps.FramesPerVideo &&
        byVid(d.video_id).size <= 2 * VideoOps.FramesPerVideo)
    }
    // corrupt payloads never produce frames
    val corruptIds = docs.filter(_.corrupt).map(_.video_id).toSet
    assert(corruptIds.nonEmpty, "fixture must exercise the corrupt path")
    assert(got.keys.forall { case (id, _) => !corruptIds(id) })
  }
}
